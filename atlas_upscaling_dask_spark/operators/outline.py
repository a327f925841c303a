"""T4 — outline / boundary extraction.

Reference semantics (``upscale_streaming_enhance.py:107-119``): keep the
label where it differs from any of its 6 axis neighbors, else 0:
``d * ((d != roll(d, 1, 0)) | (d != roll(d, -1, 0)) | ...)``.

Note the quirk called out in SURVEY.md §4.3.3: ``da.roll`` *wraps
around* at volume borders (torus semantics), so a voxel on the z=0 face
compares against the z=Z-1 face.  We implement non-wrapping (clamped —
out-of-range neighbor counts as "same", contributing no boundary) as the
default and offer ``wrap=True`` for bug-compatibility.

Spark-first: two strategies, identical results —

* ``outline_window`` (default): for each axis run ``lag``/``lead`` over
  a window partitioned by the other two coordinates.  Three shuffles of
  the narrow (z,y,x,label) relation, each a sort within small
  partitions; at 100 TB this stays bounded because each window partition
  is one scanline (≤ X voxels).
* ``outline_join``: six self-equi-joins on shifted coordinates — the
  plan Catalyst turns into sort-merge joins; useful when the volume is
  sparse (COO with gaps), where scanline windows would be wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _neighbor_expr(col, lagged, leaded, wrap_first, wrap_last, wrap: bool):
    """Boundary test for one axis: differs from prev or next neighbor.

    Out-of-range neighbors: with ``wrap`` they are the opposite face
    (torus, the reference's ``da.roll`` behavior); without, they are
    treated as equal (no boundary contribution).
    """
    prev = F.coalesce(lagged, wrap_last if wrap else col)
    nxt = F.coalesce(leaded, wrap_first if wrap else col)
    return (col != prev) | (col != nxt)


def outline_window(voxels: DataFrame, wrap: bool = False) -> DataFrame:
    """Outline via per-axis scanline windows (lag/lead).

    For the wrap variant, the opposite-face value is ``first``/``last``
    over the scanline window — exactly what ``da.roll`` would deliver.
    """
    out = voxels
    for axis, others in (("x", ("z", "y")), ("y", ("z", "x")), ("z", ("y", "x"))):
        w = Window.partitionBy(*others).orderBy(axis)
        wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        lab = F.col("label")
        expr = _neighbor_expr(
            lab,
            F.lag("label", 1).over(w),
            F.lead("label", 1).over(w),
            F.first("label").over(wfull),
            F.last("label").over(wfull),
            wrap,
        )
        out = out.withColumn(f"b_{axis}", expr)
    return out.select(
        "z",
        "y",
        "x",
        F.when(F.col("b_x") | F.col("b_y") | F.col("b_z"), F.col("label"))
        .otherwise(F.lit(0))
        .alias("label"),
    )


def outline_join(
    voxels: DataFrame, shape: tuple[int, int, int], wrap: bool = False
) -> DataFrame:
    """Outline via six self-joins on shifted coordinates.

    ``pmod(z+1, Z)`` implements the torus wrap; the non-wrap variant
    leaves out-of-range neighbors unmatched (left join → null → treated
    as same).  Correct also for sparse/COO volumes with gaps.
    """
    zdim, ydim, xdim = shape
    dims = {"z": zdim, "y": ydim, "x": xdim}
    base = voxels.select("z", "y", "x", "label")
    acc = base.withColumn("is_boundary", F.lit(False))
    for axis in ("z", "y", "x"):
        for delta in (1, -1):
            n = base.select(
                F.col("z").alias("nz"),
                F.col("y").alias("ny"),
                F.col("x").alias("nx"),
                F.col("label").alias("nlabel"),
            )
            shifted = F.col(axis) + delta
            key = F.pmod(shifted, F.lit(dims[axis])) if wrap else shifted
            cond = (
                (n["nz"] == (key if axis == "z" else F.col("z")))
                & (n["ny"] == (key if axis == "y" else F.col("y")))
                & (n["nx"] == (key if axis == "x" else F.col("x")))
            )
            acc = (
                acc.join(n, cond, "left")
                .withColumn(
                    "is_boundary",
                    F.col("is_boundary")
                    | (F.col("nlabel").isNotNull() & (F.col("nlabel") != F.col("label"))),
                )
                .drop("nz", "ny", "nx", "nlabel")
            )
    return acc.select(
        "z",
        "y",
        "x",
        F.when(F.col("is_boundary"), F.col("label")).otherwise(F.lit(0)).alias("label"),
    )


def morphology(voxels: DataFrame, op: str = "erode", wrap: bool = False) -> DataFrame:
    """Grayscale morphology over the 6-neighborhood + center.

    ``erode`` = min over the 7-cell cross, ``dilate`` = max — the
    neighbor-access pattern of the outline kernel
    (upscale_streaming_enhance.py:107-119) generalized from "differs?"
    to an aggregate, using the same per-axis scanline windows (three
    shuffles, each sorting one-scanline partitions; identical cost
    profile to T4 at any scale).  Out-of-range neighbors are the center
    value (non-wrap) or the opposite face (wrap — da.roll semantics).
    """
    if op not in ("erode", "dilate"):
        raise ValueError(f"op must be erode|dilate, got {op!r}")
    combine = F.least if op == "erode" else F.greatest
    out = voxels
    neighbor_cols = []
    for axis, others in (("x", ("z", "y")), ("y", ("z", "x")), ("z", ("y", "x"))):
        w = Window.partitionBy(*others).orderBy(axis)
        wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        lab = F.col("label")
        prev = F.coalesce(
            F.lag("label", 1).over(w),
            F.last("label").over(wfull) if wrap else lab,
        )
        nxt = F.coalesce(
            F.lead("label", 1).over(w),
            F.first("label").over(wfull) if wrap else lab,
        )
        out = out.withColumn(f"p_{axis}", prev).withColumn(f"n_{axis}", nxt)
        neighbor_cols += [f"p_{axis}", f"n_{axis}"]
    return out.select(
        "z",
        "y",
        "x",
        combine(F.col("label"), *[F.col(c) for c in neighbor_cols]).alias("label"),
    )


def region_adjacency(voxels: DataFrame) -> DataFrame:
    """Region adjacency graph: distinct (label_a < label_b) pairs whose
    voxels touch along any of the 6 face-neighbor axes (non-wrapping).

    The outline operator's neighbor pattern (T4) inverted: instead of
    asking "does my label differ from a neighbor", collect WHICH labels
    meet.  Three shifted equi-joins on coordinates (one +1 shift per
    axis covers both directions after canonicalizing the pair), each a
    narrow-key sort-merge join at scale; the result is the atlas's
    region-contact graph — what viewers and QA diff against the
    ontology hierarchy.
    """
    pairs = None
    for sz, sy, sx in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        a = voxels.select(
            F.col("z").alias("az"),
            F.col("y").alias("ay"),
            F.col("x").alias("ax"),
            F.col("label").alias("la"),
        )
        b = voxels.select(
            (F.col("z") - sz).alias("az"),
            (F.col("y") - sy).alias("ay"),
            (F.col("x") - sx).alias("ax"),
            F.col("label").alias("lb"),
        )
        touch = (
            a.join(b, ["az", "ay", "ax"])
            .filter(F.col("la") != F.col("lb"))
            .select(
                F.least("la", "lb").alias("label_a"),
                F.greatest("la", "lb").alias("label_b"),
            )
        )
        pairs = touch if pairs is None else pairs.unionByName(touch)
    return pairs.distinct()
