"""Ordered funnel analysis over an event stream.

The classic product-analytics question: of the users who did step 1,
how many went on to do step 2 AFTER it, then step 3 after that —
view → signup → purchase.  Not in the reference's surface (its events
are spatial), but a first-class citizen of any event-table engine; the
suite oracle-checks it against the identical SQL chain.

Plan shape: one shrinking per-step chain — each step is a
filter → (join previous survivors) → per-user min aggregate.  Every
join and aggregate is keyed on ``user_id``, so after the first
exchange the chain reuses one hash partitioning (EnsureRequirements
inserts no further user-side exchanges); survivors shrink
monotonically, so later steps run on ever-smaller frames.  At 100 TB
the event scan prunes to the funnel's event types via pushed
``event_type IN (...)`` filters before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
) -> DataFrame:
    """Per-user funnel completion times.

    Returns one row per user who completed step 1, with columns
    ``ts_1 .. ts_k`` (null from the first uncompleted step on) and
    ``depth`` = number of steps completed.  Step i's timestamp is the
    EARLIEST occurrence strictly after step i-1's timestamp — the
    standard unordered-set-free funnel semantics (re-doing an earlier
    step never helps).

    ``within_us`` adds a CONVERSION WINDOW: every step must land within
    that many microseconds of the user's FIRST step-1 event (the
    anchor).  Anchoring at the first occurrence is the deterministic
    product-analytics convention; a user whose only in-window sequence
    starts at a LATER step-1 occurrence counts as depth 1 by design
    (re-anchoring variants are a different metric).  Given the fixed
    anchor, taking each step's earliest valid occurrence is optimal —
    it maximizes the time remaining for deeper steps.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # prune the scan to the funnel's event types before any shuffle
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
    )
    out = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = out.select(
            "user_id",
            F.col(f"ts_{i - 1}").alias("__prev"),
            F.col("ts_1").alias("__anchor"),
        )
        nxt = ev.filter(F.col("event_type") == step).join(prev, "user_id").filter(
            F.col("ts") > F.col("__prev")
        )
        if within_us is not None:
            nxt = nxt.filter(
                F.unix_micros("ts")
                <= F.unix_micros("__anchor") + F.lit(within_us)
            )
        nxt = nxt.groupBy("user_id").agg(F.min("ts").alias(f"ts_{i}"))
        out = out.join(nxt, "user_id", "left")
    # build innermost-first: the LAST wrap is the outermost test, so
    # ascending order puts the deepest step's check on the outside
    depth = F.lit(0)
    for i in range(1, len(steps) + 1):
        depth = F.when(F.col(f"ts_{i}").isNotNull(), i).otherwise(depth)
    return out.select("user_id", *[f"ts_{i + 1}" for i in range(len(steps))],
                      depth.cast("int").alias("depth"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen period,
    counted per periods-elapsed of later activity.

    (cohort, periods_since, n_users) — the n_users of periods_since=0
    row is the cohort size.  Plan: one per-user min aggregate, one
    per-(user, period) distinct, a user-keyed join that reuses the
    aggregate's partitioning, and the final (cohort, offset) count —
    every key fixed-width, no window over the whole history.
    """
    if period not in ("week", "month", "day"):
        raise ValueError(f"unsupported period {period!r}")
    per_day = {"week": 7, "day": 1}
    first = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    active = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc(period, F.col(ts_col)).alias("p"),
        )
        .distinct()
    )
    joined = active.join(first, "user_id")
    if period == "month":
        offset = (
            (F.year("p") - F.year("cohort")) * 12 + F.month("p") - F.month("cohort")
        )
    else:
        offset = (
            F.datediff(F.to_date("p"), F.to_date("cohort")) / per_day[period]
        ).cast("int")
    return (
        joined.select("user_id", "cohort", offset.alias("periods_since"))
        .groupBy("cohort", "periods_since")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Step-level conversion summary: (step, step_name, n_users),
    n_users monotonically non-increasing down the funnel.

    One aggregate over the per-user frame (k conditional sums in a
    single pass), unpivoted to rows — never k re-runs of the funnel
    chain."""
    per_user = funnel(events, steps, user_col, type_col, ts_col)
    k = len(steps)
    wide = per_user.agg(
        *[
            F.sum(F.when(F.col("depth") >= i, 1).otherwise(0)).alias(f"s{i}")
            for i in range(1, k + 1)
        ]
    )
    stack = ", ".join(f"{i}, '{steps[i - 1]}', s{i}" for i in range(1, k + 1))
    return wide.select(
        F.expr(f"stack({k}, {stack}) AS (step, step_name, n_users)")
    ).select(F.col("step").cast("int").alias("step"), "step_name", "n_users")
