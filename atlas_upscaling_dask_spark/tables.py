"""Loaders for the driver's TPC-H-ish parquet testdata.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (see TESTDATA.md).  Parquet scans get predicate
pushdown / column pruning from Catalyst for free, which is the point of
keeping every loader a plain ``spark.read.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The oracle (DuckDB) is timezone-naive; timestamp field extraction
    # (year/month/day) and literals follow Spark's session timezone, so a
    # non-UTC caller session would shift results.  Pin it here — every
    # suite query flows through this loader.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize the events ``ts`` column to a session-timezone TIMESTAMP.

    The driver's events.parquet has shipped ``ts`` in two physical forms
    across rounds, and the parquet reader surfaces a third:

    * INT64 TIMESTAMP(NANOS) — rejected by the Spark reader unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, then arrives as
      ``bigint`` nanos.  Rebuild micros via *integer* division — going
      through doubles would lose precision at 1e18 nanoseconds.
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false — Spark 4 infers
      ``timestamp_ntz`` (``spark.sql.parquet.inferTimestampNTZ.enabled``
      defaults true), which breaks ``unix_micros()`` / ``window()``
      downstream.  Cast to ``timestamp``: under the UTC-pinned session
      timezone this is a pure reinterpretation, matching the DuckDB
      oracle's timezone-naive epoch exactly.
    * TIMESTAMP(MICROS) adjusted to UTC — already ``timestamp``; no-op.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
