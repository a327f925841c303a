"""V1–V3 — verification / QA operators.

The reference checks a single golden point after upscaling
(``verify_labels.py:18-24``: orig(100,200,200) == up(200,400,400) ==
15857).  We generalize the point check to a *full* distributed proof:
zero mismatches over every source voxel — an anti-join-style mismatch
count that Catalyst executes as a sort-merge join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upscale_mismatches(orig: DataFrame, up: DataFrame, scale: int) -> DataFrame:
    """V1 — rows where ``up[s*z, s*y, s*x] != orig[z,y,x]``.

    Empty result == the invariant of ``verify_labels.py:18-24`` holds
    everywhere.  Also catches *missing* scaled coordinates via the left
    join (null up_label counts as a mismatch).
    """
    s = F.lit(scale)
    up_sel = up.select(
        F.col("z").alias("uz"),
        F.col("y").alias("uy"),
        F.col("x").alias("ux"),
        F.col("label").alias("up_label"),
    )
    joined = orig.join(
        up_sel,
        (up_sel.uz == orig.z * s) & (up_sel.uy == orig.y * s) & (up_sel.ux == orig.x * s),
        "left",
    )
    return joined.filter(
        F.col("up_label").isNull() | (F.col("up_label") != F.col("label"))
    ).select("z", "y", "x", "label", "up_label")


def label_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    """The no-interpolation contract (reference README.md:21,32):
    distinct label sets identical before/after a label-preserving op."""
    da, db = a.select("label").distinct(), b.select("label").distinct()
    return da.exceptAll(db).isEmpty() and db.exceptAll(da).isEmpty()


def volume_extents(voxels: DataFrame) -> DataFrame:
    """V3 — smoke check: coordinate extents + voxel count
    (shape/dtype/sample of load_test.py:7-9, relationally)."""
    return voxels.agg(
        (F.max("z") + 1).alias("dim_z"),
        (F.max("y") + 1).alias("dim_y"),
        (F.max("x") + 1).alias("dim_x"),
        F.count("*").alias("n_voxels"),
        F.countDistinct("label").alias("n_labels"),
    )
