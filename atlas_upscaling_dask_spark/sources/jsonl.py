"""JSONL (newline-delimited JSON) document ingestion.

The text-corpus interchange format: crawl dumps, annotation exports,
and model-generated data all move as JSONL.  Spark's native JSON
source already does the right distributed thing — one task per file
split, schema enforced at scan time — so this module is a thin,
opinionated layer that pins the three decisions a 100 TB ingest gets
wrong by default:

* **Explicit schema, never inference.**  Schema inference is a full
  extra pass over the data (doubling scan cost) and can silently widen
  types between drops; every reader here takes a DDL schema string.
* **Malformed lines are DATA, not exceptions.**  A crawl dump at scale
  ALWAYS contains truncated/garbled lines; a single bad record must
  not kill a 1000-executor job (FAILFAST), nor vanish silently
  (DROPMALFORMED's default temptation).  ``read_jsonl`` reads
  PERMISSIVE with a corrupt-record column and ``split_corrupt``
  separates survivors from a quarantine frame the pipeline can count,
  sample, and alert on.
* **Round-trip fidelity is tested, not assumed** (newlines, quotes,
  non-BMP unicode — the oracle-checked ``jsonl_roundtrip`` row writes
  the documents table out and reads it back distributed).

No counterpart in the reference repo (its sources are raw volumes +
CSV dims); this is part of the LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a frame as JSONL, one object per line, distributed (one
    file per partition — at scale, size partitions before calling).
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
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-pinned JSONL scan.  In PERMISSIVE mode (the default and
    the one that survives real crawl dumps) malformed lines come back
    as rows whose ``_corrupt_record`` column holds the raw line and
    whose data columns are NULL — feed to :func:`split_corrupt`."""
    reader = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column;
    quarantine keeps only (raw line) for counting/sampling/alerting.

    Spark leaves ``_corrupt_record`` NULL for well-formed lines, so the
    split is a narrow filter — no shuffle, no second scan."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
