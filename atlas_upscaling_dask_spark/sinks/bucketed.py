"""Bucketed (hash-clustered) table storage — the co-located join path.

The reference never re-reads its own output for joins; at 100 TB the
dominant cost of a repeated fact-fact join (lineitem⋈orders on
orderkey, chunk⋈chunk on chunk key) is the shuffle of both sides.
Spark's bucketing (`DataFrameWriter.bucketBy`, public API) persists
each table pre-hash-partitioned on the join key, so a sort-merge join
of two tables bucketed on the same key with the same bucket count
reads co-located buckets and skips the Exchange entirely on BOTH
sides — the same reason the reference keeps its Zarr chunk grid
aligned across pyramid levels (`upscale_streaming_enhance.py:207-227`:
aligned chunking ⇒ level-local work).

Bucket-count choice at scale: buckets are fixed at write time (unlike
AQE shuffle partitions), so size them for the TARGET table size —
``rows_per_bucket ≈ bucket_bytes / row_width`` with bucket_bytes in
the 128 MB-1 GB range.  Too few buckets ⇒ giant tasks; too many ⇒
small-file explosion multiplied by partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    keys: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> DataFrame:
    """Persist ``df`` hash-bucketed by ``keys`` into ``num_buckets``
    buckets at ``path`` (external table registered as ``name``).

    ``sort_cols`` additionally sorts within each bucket file, which
    lets the sort-merge join skip its per-partition Sort when joining
    on a prefix of the sort columns.  Bucket keys get parquet bloom
    filters so point probes also skip row groups inside a bucket.
    Returns the re-read table (the bucketed scan, NOT the in-memory
    frame — only the former carries the bucketing metadata into join
    planning).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *keys)
    )
    # bloom filters on the bucket keys: point probes skip row groups
    # within a bucket file (buckets co-locate, blooms then prune I/O)
    for c in keys:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    # table + column stats feed the CBO's join-size estimates (broadcast
    # vs shuffle decisions on subsequent reads); cheap relative to the
    # write we just did
    cols = ", ".join(dict.fromkeys(keys + (sort_cols or [])))
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    return spark.table(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Scan a bucketed table.  Join planning sees the bucket spec only
    through the catalog — hence table-based, not path-based, reads."""
    return spark.table(name)


def is_shuffle_free(df: DataFrame) -> bool:
    """True if the physical plan for ``df`` contains no shuffle
    exchange (broadcast exchanges are fine — they move only the small
    side).  The assertion tool for co-located-join tests and for
    eyeballing plans at the REPL."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    markers = (
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange SinglePartition",
        "ShuffleQueryStage",
        "AQEShuffleRead",
    )
    return not any(m in plan for m in markers)
