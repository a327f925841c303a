"""JSONL (newline-delimited JSON) document ingestion + sharded export.

The text-corpus interchange format: crawl dumps, annotation exports,
and model-generated data all move as JSONL.  This module pins the
three decisions a 100 TB ingest gets wrong by default:

* **Explicit schema, never inference.**  Schema inference is a full
  extra pass over the data (doubling scan cost) and can silently widen
  types between drops; every reader here takes a DDL schema string.
* **Malformed lines are DATA, not exceptions.**  A crawl dump at scale
  ALWAYS contains truncated/garbled lines; a single bad record must
  not kill a 1000-executor job (FAILFAST), nor vanish silently
  (DROPMALFORMED's default temptation).  ``read_jsonl`` parses
  PERMISSIVE with a corrupt-record column and ``split_corrupt``
  separates survivors from a quarantine frame the pipeline can count,
  sample, and alert on.
* **Round-trip fidelity is tested, not assumed** (newlines, quotes,
  non-BMP unicode — the oracle-checked ``jsonl_roundtrip`` row writes
  the documents table out and reads it back distributed).

Implementation note: the scan is ``spark.read.text`` + ``from_json``
rather than the native ``spark.read.json``.  The native reader's
internal corrupt-record column refuses any downstream plan that
references only it (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the
documented workaround is caching the parsed frame — a non-starter at
100 TB.  ``from_json`` honors the same PERMISSIVE / FAILFAST /
corrupt-record options as a plain Catalyst expression: single pass,
splittable text scan, no analyzer special-casing, quarantine frame
usable without materializing anything.

No counterpart in the reference repo (its sources are raw volumes +
CSV dims); this is part of the LLM-data-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: Default schema: the synthetic ``documents`` table's shape — the
#: corpus this engine's text/dedup operators run over.
DOCUMENTS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a frame as JSONL, one object per line, distributed (one
    file per partition — at scale, size partitions before calling, or
    use :func:`export_jsonl` which sizes them for you).
    ``compression``: None | 'gzip' | 'zstd' (line-splittable readers
    need None or a splittable codec; gzip trades scan parallelism for
    ratio on cold archives)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_DDL,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-pinned JSONL scan.  In PERMISSIVE mode (the default and
    the one that survives real crawl dumps) malformed lines come back
    as rows whose ``_corrupt_record`` column holds the raw line and
    whose data columns are NULL — feed to :func:`split_corrupt`.
    ``mode='FAILFAST'`` raises on the first malformed line instead
    (for sources contractually guaranteed clean).

    Blank / whitespace-only lines are dropped BEFORE parsing: the
    native JSON reader skips them, and ``from_json`` would otherwise
    turn each into an all-NULL row with a NULL corrupt column — a
    phantom "clean" document injected per blank line, which crawl
    dumps routinely contain.  The filter is a narrow predicate on the
    text scan, so the plan shape is unchanged."""
    struct = T.StructType.fromDDL(schema).add(CORRUPT_COL, T.StringType())
    parsed = (
        spark.read.text(path)
        .filter(F.col("value").rlike(r"\S"))  # trim() only strips 0x20
        .select(
            F.from_json(
                F.col("value"),
                struct,
                {"mode": mode, "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r")
        )
    )
    return parsed.select("r.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column;
    quarantine keeps the raw line for counting/sampling/alerting.

    ``from_json`` leaves ``_corrupt_record`` NULL for well-formed
    lines, so the split is a narrow filter — no shuffle, no second
    scan, and (unlike the native JSON source) no analyzer restriction
    on a quarantine-only plan."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


def export_jsonl(
    df: DataFrame,
    path: str,
    target_shard_mb: int = 256,
    est_bytes_per_row: int | None = None,
    compression: str | None = "gzip",
) -> int:
    """Write size-targeted JSONL shards; returns the shard count.

    Shard sizing is the operational knob at scale: too-small shards
    drown the consumer in file handles and scheduler tasks; too-large
    ones kill parallel restartability (and, for gzip, cap scan
    parallelism at one task per shard).  The row-width estimate
    defaults to a 1% sample — cheap relative to the write itself and
    accurate enough for a sizing decision that only needs to be right
    within 2×."""
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
    w = df.repartition(shards).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return shards
