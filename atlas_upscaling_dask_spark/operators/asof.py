"""As-of join — a time-series operator Spark lacks natively.

For each left row, pick the single right row with the greatest
right-time ≤ left-time within the same equi-key.  The reference has no
time-series surface (SURVEY.md §2.8), but a training-data/events
pipeline needs this constantly (joining events to the most recent
dimension state).

Spark-first implementation: the **union + window** strategy —

1. tag both sides and union them into one stream of (key, time, ...) rows;
2. a single window per key ordered by (time, side-tag) carries the last
   seen right-side payload forward (``last(..., ignorenulls=True)``);
3. keep only left rows.

Cost: ONE shuffle of each side on the equi-key (the same cost as any
join) and a per-key sort — no driver loops, no per-row lookups, skew
handled by AQE.  This scales to 100 TB exactly like a sort-merge join,
and unlike a naive ``LEFT JOIN ... ON t_r <= t_l`` + window-dedup it
never materializes the quadratic intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with time ≤ left time per key
    (``direction="backward"``, the default) or earliest right row with
    time ≥ left time (``direction="forward"`` — the "next state"
    lookup); both inclusive, as in ``pd.merge_asof(direction=...)``.

    Right side should be unique per (key, time); pre-aggregate if not,
    or the carried row among exact ties is the last in (time, side)
    order.  Returns all left columns plus ``payload_cols`` from the
    matched right row (NULL when no prior right row exists).
    Inclusive semantics (right time == left time matches), as in DuckDB
    ASOF JOIN and ``pd.merge_asof``.

    ``tolerance``: optional maximum allowed ``left_time - right_time``
    (same units as the time columns — a number for numeric times, a
    ``datetime.timedelta``-compatible interval literal is NOT accepted;
    convert timestamps to epoch first).  Matches older than the
    tolerance are nulled out, as in ``pd.merge_asof(tolerance=...)``.
    """
    lcols = list(left.columns)
    overlap = set(lcols) & set(payload_cols)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {overlap}")

    l = left.select(
        *lcols,
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in payload_cols],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    unioned = l.unionByName(r)
    # Right rows sort before left rows at equal times (__side 0 < 1), so a
    # right row at exactly t is visible to a left row at t.  Forward is
    # the same scan in reverse time order — the carried "last seen"
    # right row is then the EARLIEST at-or-after each left row.
    order = (
        [F.col("__t").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rt_cols = (
        [
            F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True)
            .over(w)
            .alias("__rt")
        ]
        if tolerance is not None
        else []
    )
    carried = unioned.select(
        *lcols,
        "__side",
        "__t",
        *rt_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__rt")
            if direction == "backward"
            else F.col("__rt") - F.col("__t")
        )
        within = F.col("__rt").isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            *lcols,
            "__t",
            "__rt",
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload_cols],
        )
    return out.select(*lcols, *payload_cols)
