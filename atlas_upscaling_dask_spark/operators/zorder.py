"""Z-order (Morton-curve) layout for multi-dimensional data skipping.

The reference's chunk grid gives locality in exactly one layout
(`upscale_streaming.py:59-74` picks one chunk geometry); parquet
min/max row-group stats prune well only on the *leading* sort column.
Interleaving the coordinate bits into one Morton code and range-
partitioning + sorting by it gives every axis tight min/max ranges per
file, so point lookups (Q1, `load_test.py:9`) and small box queries
prune files/row-groups on z AND y AND x simultaneously — the standard
multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER) in
plain open Spark.

Everything is integer arithmetic (shift/mask built-ins) — a narrow,
codegen'd projection replayed exactly by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_expr(cols: list[str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT
    Morton code.  ``cols[0]`` contributes the most significant bit of
    each interleaved group.  With n columns the code uses n·bits bits,
    so n·bits must stay ≤ 62 (int64, sign bit spared)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds int64 range")
    code = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, n * b + (n - 1 - j))
    return code


def morton_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton code as portable ANSI SQL arithmetic
    (``(col // 2^b) % 2 * 2^pos`` terms) for the DuckDB oracle."""
    n = len(cols)
    terms = [
        f"(({c} // {1 << b}) % 2) * {1 << (n * b + (n - 1 - j))}"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-axis skipping: range-partition on the
    Morton code (equal-ish sized output files along the curve), sort
    within partitions so parquet writes tight per-row-group min/max
    stats on every axis.  One shuffle, then the layout serves every
    future point/box query for free."""
    code = morton_expr(cols, bits).alias("_morton")
    clustered = df.select("*", code)
    parted = (
        clustered.repartitionByRange(num_partitions, "_morton")
        if num_partitions
        else clustered.repartitionByRange("_morton")
    )
    return parted.sortWithinPartitions("_morton").drop("_morton")
