"""JSONL (newline-delimited JSON) source + sharded sink for corpora.

The interchange format of training-data pipelines: one JSON object per
line, gzip-sharded.  Reading with an EXPLICIT schema matters doubly at
scale: schema inference is a full extra pass over 100 TB, and a drifted
field silently becomes NULL instead of failing fast — so the reader
takes a required schema and ``columnNameOfCorruptRecord`` captures bad
lines for quarantine instead of dropping them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        # bad lines land here instead of silently vanishing
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENT_SCHEMA
) -> DataFrame:
    """Schema-pinned JSONL scan; corrupt lines are quarantined in the
    ``_corrupt`` column, never silently dropped.

    Implemented as ``text`` scan + ``from_json`` rather than
    ``spark.read.json``: the native reader's internal corrupt-record
    column refuses any downstream plan that references only it
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the documented workaround is
    caching — a non-starter at 100 TB.  ``from_json`` honors the same
    PERMISSIVE/corrupt-record options as a plain expression, single
    pass, no special-casing."""
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    )
    return parsed.select("r.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) — route bad lines to a side table for triage.

    The quarantine keeps ``doc_id`` alongside the raw line: partly for
    triage, partly because Spark refuses plans that reference ONLY the
    internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select("doc_id", "_corrupt")
    return clean, bad


def export_jsonl(
    df: DataFrame,
    path: str,
    target_shard_mb: int = 256,
    est_bytes_per_row: int | None = None,
    compression: str = "gzip",
) -> int:
    """Write size-targeted JSONL shards; returns the shard count.

    Shard sizing is the operational knob at scale: too-small shards
    drown the consumer in file handles and scheduler tasks, too-large
    ones kill parallel restartability.  The row-width estimate defaults
    to a 1% sample (cheap relative to the write itself).
    """
    n_rows = df.count()
    if n_rows == 0:
        df.limit(0).write.mode("overwrite").json(path)
        return 0
    if est_bytes_per_row is None:
        sample = df.sample(0.01, seed=7).limit(1000).toJSON().collect() or (
            df.limit(100).toJSON().collect()
        )
        est_bytes_per_row = max(
            1, sum(len(s) + 1 for s in sample) // max(len(sample), 1)
        )
    total_mb = n_rows * est_bytes_per_row / 1e6
    shards = max(1, math.ceil(total_mb / target_shard_mb))
    (
        df.repartition(shards)
        .write.mode("overwrite")
        .option("compression", compression)
        .json(path)
    )
    return shards
