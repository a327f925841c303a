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
    """events.parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which the
    Spark parquet reader rejects outright.  Read nanos as raw longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
    microsecond-precision timestamp via *integer* division — going
    through doubles would lose precision at 1e18 nanoseconds.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
