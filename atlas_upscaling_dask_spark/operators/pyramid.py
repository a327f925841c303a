"""T5 — multiscale pyramid by stride-2 decimation.

Reference semantics (``upscale_streaming_enhance.py:125-139``): level i
is every 2nd voxel of level i-1 on each axis (``prev[::2,::2,::2]``) —
*decimation*, never averaging, because labels are categorical.

Spark-first: a decimation level is a filter + coordinate rescale —
a narrow transform with full predicate pushdown.  ``build_pyramid``
stacks the levels into one DataFrame with a ``level`` column (the
write path partitions by it), deriving level i from level i-1 so the
base is computed once — deliberately NOT replicating the reference's
per-level recompute of the whole upscale graph (SURVEY.md §4.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decimate(voxels: DataFrame, stride: int = 2) -> DataFrame:
    """One decimation step: keep voxels whose coords are ≡0 (mod stride),
    rescaling coordinates.  ``level1[z,y,x] == level0[stride*z, ...]``."""
    s = F.lit(stride)
    return voxels.filter(
        (F.col("z") % s == 0) & (F.col("y") % s == 0) & (F.col("x") % s == 0)
    ).select(
        (F.col("z") / s).cast("long").alias("z"),
        (F.col("y") / s).cast("long").alias("y"),
        (F.col("x") / s).cast("long").alias("x"),
        "label",
    )


def build_pyramid(voxels: DataFrame, levels: int, cache_base: bool = True) -> DataFrame:
    """Stack `levels` pyramid levels (level 0 = input) into one frame.

    The base is cached before deriving levels so the upstream plan runs
    once — the fix for the reference's per-level recompute
    (upscale_streaming_enhance.py:134-138 slices the *lazy* base, so
    each ``da.store`` re-executes the whole upscale chain).
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    base = voxels
    if cache_base and levels > 1:
        base = base.cache()
    out = base.withColumn("level", F.lit(0))
    cur = base
    for i in range(1, levels):
        cur = decimate(cur, 2)
        out = out.unionByName(cur.withColumn("level", F.lit(i)))
    return out


def pyramid_scales(
    spacing: tuple[float, float, float], scale: int, levels: int
) -> list[tuple[float, float, float]]:
    """Per-level coordinate transforms for multiscale metadata.

    Mirrors the scale math of ``upscale_streaming_enhance.py:229-243``:
    level i spacing = base_spacing / scale * 2**i on each axis.
    """
    return [
        tuple(sp / scale * (2**i) for sp in spacing)  # type: ignore[misc]
        for i in range(levels)
    ]


def downsample_mode(voxels: DataFrame, stride: int = 2) -> DataFrame:
    """Majority-vote downsampling: each stride³ block votes, the most
    frequent label wins (ties → smallest label, deterministic).

    The label-safe alternative to stride decimation (``decimate``):
    decimation samples one corner voxel and can drop thin structures
    entirely; the mode keeps the dominant region per block.  Two
    shuffles: block-label counting (partial-aggregated map-side) and
    the per-block argmax window — both on the block key, so AQE can
    pipeline them.  Never averages: interpolation is forbidden for
    categorical labels (reference README.md:32).
    """
    from pyspark.sql import Window

    if stride < 2:
        raise ValueError(f"stride must be >= 2, got {stride}")
    s = F.lit(stride)
    counts = voxels.groupBy(
        (F.col("z") / s).cast("long").alias("z"),
        (F.col("y") / s).cast("long").alias("y"),
        (F.col("x") / s).cast("long").alias("x"),
        "label",
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("z", "y", "x").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("z", "y", "x", "label")
    )
