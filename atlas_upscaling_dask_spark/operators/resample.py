"""Time-series resampling with forward fill — gap-filling an event
stream onto a regular grid.

The reference has no time-series surface (SURVEY.md §2.8), but a
metrics/feature pipeline over an ``events`` table needs "the value as
of each grid instant" constantly.  Spark-first plan, same shape as the
as-of join (operators/asof.py):

1. derive each key's [min, max] span and explode a ``sequence()`` of
   grid instants — rows are generated executor-side, never on the
   driver;
2. union grid rows (null value) with real events and run ONE window
   per key ordered by (time, is_grid, event tiebreak) carrying
   ``last(value, ignorenulls=True)`` forward;
3. keep only grid rows.

Cost: one shuffle of events on the key plus a per-key sort — identical
to a groupBy, independent of grid density.  Grid size is (span /
step) × keys rows; the step is the caller's lever when spans are long.
Skewed keys (one user with millions of events) are AQE's skew-join
case, and the window is per-key so no global sort ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key regular grid (key's hour-truncated min → max, every
    ``step``) with the last observed value at or before each instant.

    Events sharing a timestamp resolve deterministically: the highest
    ``tiebreak_col`` wins (real rows order before grid rows at the same
    instant, so a grid point lands *after* every event at its own
    timestamp).
    """
    bounds = events.groupBy(key_col).agg(
        F.date_trunc("hour", F.min(time_col)).alias("lo"),
        F.max(time_col).alias("hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {step}"))
        ).alias("gts"),
    ).select(
        F.col(key_col),
        F.col("gts").alias(time_col),
        F.lit(None).cast("double").alias(value_col),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(1).alias("_is_grid"),
    )
    real = events.select(
        F.col(key_col),
        F.col(time_col),
        F.col(value_col).cast("double"),
        F.col(tiebreak_col).cast("long").alias("_tb"),
        F.lit(0).alias("_is_grid"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col, "_is_grid", F.coalesce("_tb", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        real.unionByName(grid)
        .withColumn("filled", F.last(value_col, ignorenulls=True).over(w))
        .filter(F.col("_is_grid") == 1)
        .select(
            key_col,
            F.col(time_col).alias("grid_ts"),
            F.col("filled").alias(value_col),
        )
    )


def resample_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key regular grid with LINEAR interpolation between the
    nearest observations (constant extrapolation at the edges).

    Same union-and-window shape as :func:`resample_ffill` — one shuffle
    on the key, a per-key sort, no global operation — but each grid
    instant carries BOTH neighbors: two frame-bounded windows pick the
    previous and next real observation (value and epoch-micros), and
    the interpolation is the closed-form
    ``pv + (nv - pv) * (t - pt)/(nt - pt)``.

    Determinism contract: the time ratio is one IEEE division of exact
    integer microsecond deltas and the remaining arithmetic has a fixed
    operation order, so results are bitwise reproducible across engines
    and partitionings.  Null-valued events are dropped up front so the
    value/timestamp window pairs can never desynchronize.
    """
    bounds = events.groupBy(key_col).agg(
        F.date_trunc("hour", F.min(time_col)).alias("lo"),
        F.max(time_col).alias("hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.expr(f"interval {step}"))).alias(
            time_col
        ),
        F.lit(None).cast("double").alias(value_col),
        F.lit(1).alias("_is_grid"),
    )
    real = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        F.col(time_col),
        F.col(value_col).cast("double"),
        F.lit(0).alias("_is_grid"),
    )
    order = [F.col(time_col).asc(), F.col("_is_grid").asc()]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us = F.when(F.col("_is_grid") == 0, F.unix_micros(time_col))
    t = F.unix_micros(time_col)
    pv = F.last(value_col, ignorenulls=True).over(w_prev)
    pt = F.last(us, ignorenulls=True).over(w_prev)
    nv = F.first(value_col, ignorenulls=True).over(w_next)
    nt = F.first(us, ignorenulls=True).over(w_next)
    interp = pv + (nv - pv) * (
        (t - pt).cast("double") / (nt - pt).cast("double")
    )
    filled = (
        real.unionByName(grid)
        .select(
            key_col,
            time_col,
            "_is_grid",
            F.when(pt.isNotNull() & nt.isNotNull(), interp)
            .when(pt.isNotNull(), pv)
            .otherwise(nv)
            .alias("_v"),
        )
        .filter(F.col("_is_grid") == 1)
    )
    return filled.select(
        key_col, F.col(time_col).alias("grid_ts"), F.col("_v").alias(value_col)
    )
