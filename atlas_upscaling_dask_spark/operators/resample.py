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


def ewma(
    events: DataFrame,
    lookback: int = 16,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key exponentially-weighted moving average with a bounded
    lookback — the smoothing half of a streaming-metrics feature stack.

    Weight for the observation ``k`` rows before the current one is
    ``2^-k`` (half-life = one row), truncated at ``lookback`` rows, and
    the average renormalizes over the weights actually present, so the
    first rows of a key are unbiased.  The decay base 2 is deliberate:
    ``value × 2^-k`` is an exact IEEE scaling (exponent arithmetic, no
    mantissa rounding), and each term is then rounded to 12 places and
    summed as DECIMAL — the aggregate is order-independent and the SQL
    oracle matches bitwise (same contract as lm_score / BM25).

    Plan: one rank window keyed on ``key_col``, then a self-join on the
    key with a rank-band predicate (≤ ``lookback`` partners per row —
    bounded fan-out, not a cross join), one aggregation back to event
    grain.  Both wide ops key on ``key_col``; per-key row explosion is
    the AQE skew case.  A frame-bounded window would avoid the join but
    makes the weighted sum order-sensitive; the join form keeps every
    term explicit and exact.
    """
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    ranked = events.select(
        F.col(key_col).alias("k"),
        F.col(time_col).alias("t"),
        F.col(tiebreak_col).alias("eid"),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
    )
    cur = ranked.select(
        F.col("k"), F.col("t"), F.col("eid"), F.col("v"), F.col("rn")
    )
    prev = ranked.select(
        F.col("k").alias("pk"), F.col("v").alias("pv"), F.col("rn").alias("prn")
    )
    joined = cur.join(
        prev,
        (F.col("k") == F.col("pk"))
        & (F.col("prn") <= F.col("rn"))
        & (F.col("prn") > F.col("rn") - F.lit(lookback)),
    )
    # 2^-k as an exact rational: 1 / (1 << k) — no libm pow in the
    # exactness contract at all
    # shiftleft on an INT wraps the shift amount mod 32 in the JVM; shift a
    # BIGINT so every lookback up to 63 is exact
    if lookback > 63:
        raise ValueError(f"ewma lookback must be <= 63, got {lookback}")
    wt = F.lit(1.0) / F.expr(
        "shiftleft(CAST(1 AS BIGINT), rn - prn)"
    ).cast("double")
    num = F.round(F.col("pv") * wt, 12).cast("decimal(28,12)")
    den = F.round(wt, 12).cast("decimal(28,12)")
    return (
        joined.groupBy("k", "t", "eid", "v")
        .agg(
            (F.sum(num).cast("double") / F.sum(den).cast("double")).alias("ewma"),
            F.count("*").cast("int").alias("n_terms"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("t").alias(time_col),
            F.col("eid").alias(tiebreak_col),
            F.col("v").alias(value_col),
            "ewma",
            "n_terms",
        )
    )


def zscore_outliers(
    events: DataFrame,
    threshold: float = 3.0,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score anomaly screen: events whose value sits more
    than ``threshold`` population standard deviations from their
    group's mean.

    Exactness: values are cast to DECIMAL(18,2) before summing (sum and
    sum-of-squares are exact, order-independent integers-in-disguise);
    mean/variance/sqrt then run in doubles, where every step is an IEEE
    operation on identical inputs — bitwise portable, no rounding
    needed.  Plan: one partial-aggregated exchange for the group stats
    (group cardinality ~ event types, tiny), broadcast back, narrow
    filter — the scan-heavy half never shuffles.
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    stats = (
        events.groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).alias("s"),
            F.sum(dec * dec).alias("ss"),
        )
        .select(
            group_col,
            "n",
            (F.col("s").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.col("ss").cast("double") / F.col("n")
                    - (F.col("s").cast("double") / F.col("n"))
                    * (F.col("s").cast("double") / F.col("n")),
                )
            ).alias("std"),
        )
    )
    z = (F.col(value_col) - F.col("mean")) / F.col("std")
    return (
        events.join(F.broadcast(stats), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            F.col("mean"),
            F.col("std"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > threshold)
    )


def mad_outliers(
    events: DataFrame,
    threshold: float = 3.5,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Robust per-group outlier screen via the median absolute
    deviation: modified z-score ``0.6745·(v − med)/mad`` (Iglewicz &
    Hoaglin), flagged when |mz| > ``threshold`` (3.5 is their
    recommended cut).  Unlike ``zscore_outliers`` the estimator has a
    50% breakdown point — a heavy-tailed group can't hide its own
    outliers by inflating the standard deviation.

    When a group's MAD is 0 (over half its values identical) the score
    is undefined: mz comes back NULL and any value ≠ median is flagged
    (infinitely many MADs away).

    Exactness: exact interpolated medians (sort-based, the
    `percentile_quantity` parity rule) and pure IEEE arithmetic — no
    order-dependent double sums anywhere.  Plan: two grouped
    aggregations (group cardinality ~ event types) broadcast back onto
    the scan; the data-sized side never shuffles.
    """
    med = events.groupBy(group_col).agg(
        F.expr(f"median({value_col})").alias("med")
    )
    j = events.join(F.broadcast(med), group_col)
    mad = j.groupBy(group_col).agg(
        F.expr(f"median(abs({value_col} - med))").alias("mad")
    )
    j2 = j.join(F.broadcast(mad), group_col)
    dev = F.lit(0.6745) * (F.col(value_col) - F.col("med"))
    mz = F.when(F.col("mad") == 0, F.lit(None).cast("double")).otherwise(
        dev / F.col("mad")
    )
    flag = ((F.col("mad") == 0) & (F.col(value_col) != F.col("med"))) | (
        (F.col("mad") > 0) & (F.abs(dev / F.col("mad")) > F.lit(threshold))
    )
    return j2.filter(flag).select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        "med",
        "mad",
        mz.alias("mz"),
    )


def rolling_median(
    events: DataFrame,
    window_rows: int = 25,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Exact rolling median of the last ``window_rows`` values per key
    — an aggregate Spark's window functions don't provide (only
    percentile_approx): implemented as a sorted-array median over a
    ``collect_list`` rows-frame.  Even-length frames interpolate the
    two middle values, matching ``median`` everywhere (DuckDB's native
    windowed median is the oracle — an independent implementation).

    Per-row state is O(window_rows) — bound it to the tens/hundreds;
    this is the running-median dashboard primitive, not a full-table
    quantile (use ``quantile_sketch`` for that).  One keyed exchange.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    k = F.size(arr)
    lo = F.element_at(arr, ((k + 1) / 2).cast("int"))
    hi_a = F.element_at(arr, (k / 2).cast("int"))
    hi_b = F.element_at(arr, (k / 2 + 1).cast("int"))
    # collect_list drops NULLs, so the median runs over the frame's
    # non-null values (DuckDB's median does the same); an ALL-null
    # frame leaves k=0 — guard it to NULL or element_at(arr, 0) throws
    med = (
        F.when(k == 0, F.lit(None).cast("double"))
        .when(k % 2 == 1, lo)
        .otherwise((hi_a + hi_b) / 2)
    )
    return events.select(
        F.col(id_col),
        F.col(key_col),
        med.alias("rolling_med"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    value_scale: int = 100,
) -> DataFrame:
    """Per-key time-weighted average (TWAP) under step-function
    semantics: each observation holds until the next one, so the mean
    weights every value by how LONG it was current, not how often it
    was sampled — the difference that matters for irregular streams
    (a sensor that reports rarely when stable would otherwise dominate).

    Exactness contract: values are fixed-point at ``value_scale``
    (centi-units by default — exact for 2-decimal inputs), durations
    are integer microseconds from ``unix_micros``, and the weighted sum
    ``Σ scaled_value·Δµs`` accumulates as BIGINT — an associative,
    order-independent integer sum, divided ONCE at the end by
    ``value_scale · span_µs``.  The SQL oracle reproduces it bitwise
    (same contract as ewma / lm_score).  Overflow headroom: the sum is
    bounded by max|scaled value| · span_µs; 2⁶³ allows ~30 years of span
    at |value| ≤ 10⁶ — guarded by the DECIMAL cast DuckDB also applies.

    Plan: ONE lead() window per key + ONE aggregation, both keyed on
    ``key_col`` — no self-join, cost identical to a groupBy.  Keys with
    a single event have zero observed span and are reported with
    ``twap = value`` (the only defensible answer) and ``span_us = 0``.
    """
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    us = F.unix_micros(F.col(time_col))
    stepped = events.select(
        F.col(key_col).alias("k"),
        F.round(F.col(value_col) * value_scale).cast("long").alias("sv"),
        (F.lead(us).over(w) - us).alias("dur_us"),
        F.row_number().over(w).alias("rn"),
    )
    agg = stepped.groupBy("k").agg(
        F.sum(F.when(F.col("dur_us").isNotNull(), F.col("sv") * F.col("dur_us"))).alias(
            "wsum"
        ),
        F.sum("dur_us").alias("span_us"),
        F.count("*").cast("long").alias("n_events"),
        # deterministic fallback: the (time, tiebreak)-first value —
        # portable as MAX(CASE WHEN rn=1 ...) in the oracle
        F.max(F.when(F.col("rn") == 1, F.col("sv"))).alias("first_sv"),
    )
    return agg.select(
        F.col("k").alias(key_col),
        F.when(
            F.col("span_us") > 0,
            F.col("wsum").cast("double")
            / (F.col("span_us") * F.lit(value_scale)).cast("double"),
        )
        .otherwise(F.col("first_sv").cast("double") / F.lit(value_scale))
        .alias("twap"),
        F.coalesce(F.col("span_us"), F.lit(0)).cast("long").alias("span_us"),
        "n_events",
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Collapse overlapping/adjacent intervals per key into maximal
    disjoint "islands" — the gaps-and-islands classic (coverage spans,
    on-call windows, sessionized availability).

    An interval starts a new island iff its start exceeds the running
    maximum end of all earlier intervals (ordered by start; touching
    intervals merge).  The island id is then a running count of such
    breaks, and one aggregation emits (key, island start, island end,
    n_intervals).  Two windows + one aggregation, ALL keyed on
    ``key_col`` — no self-join, no driver loop; per-key sorts are the
    AQE skew case, and the running max/sum are frame-bounded windows
    Spark evaluates in one pass over each key's sorted run.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.select(
        F.col(key_col).alias("k"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.when(prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1)
        .otherwise(0)
        .alias("brk"),
    )
    w2 = Window.partitionBy("k").orderBy("s", "e")
    islands = flagged.withColumn(
        "island", F.sum("brk").over(w2.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("k", "island")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.count("*").cast("long").alias("n_intervals"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("island").cast("int").alias("island"),
            "island_start",
            "island_end",
            "n_intervals",
        )
    )


def seasonal_decompose(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
    id_col: str = "event_id",
    period_us: int = 86_400_000_000,
    n_phases: int = 24,
    with_level: bool = True,
) -> DataFrame:
    """Seasonal-means decomposition: value = level + seasonal + residual.

    The classical additive decomposition with a phase-mean seasonal
    model (the "hour-of-day profile" every ops dashboard and anomaly
    screen starts from): each event's phase is its position inside the
    repeating period bucketed into ``n_phases`` slots
    (``((epoch_us mod period) · n_phases) div period`` — pure integer
    arithmetic), ``level`` is the per-key mean, ``seasonal`` is the
    per-(key, phase) mean minus the level (so seasonal components sum
    to ~0 across phases), and ``residual = value − level − seasonal``
    is what anomaly screens should threshold INSTEAD of the raw value
    — a 9am spike that is normal for 9am no longer trips a global
    z-score.

    Exactness: both means use the zscore contract — DECIMAL(18,2) sums
    (exact, order-independent) finished by one IEEE division; the
    subtractions are IEEE ops on identical inputs, so the whole result
    is bitwise-portable across engines.

    Plan shape: TWO tiny partial-aggregated exchanges (keys·phases and
    keys rows) broadcast-joined back onto the scan — the event-sized
    side never shuffles, exactly the zscore_outliers pattern.  At
    100 TB the stats frames stay kilobytes regardless of row count.
    """
    if n_phases < 1 or period_us < n_phases:
        raise ValueError("need n_phases >= 1 and period_us >= n_phases")
    us = F.unix_micros(F.col(ts_col))
    dec = F.col(value_col).cast("decimal(18,2)")
    base = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("eid"),
        us.alias("ts_us"),
        F.col(value_col).alias("v"),
        F.expr(
            f"CAST(((unix_micros({ts_col}) % {period_us}) * {n_phases})"
            f" div {period_us} AS INT)"
        ).alias("phase"),
        dec.alias("vd"),
    )
    ph = base.groupBy("k", "phase").agg(
        (F.sum("vd").cast("double") / F.count("*")).alias("phase_mean")
    )
    joined = base.join(F.broadcast(ph), ["k", "phase"])
    if not with_level:
        # the de-seasonalized screen only needs the residual; skipping
        # the level join halves the stats subtrees downstream
        # compositions re-execute (see seasonal_anomalies' plan budget)
        return joined.select(
            F.col("k").alias(key_col),
            F.col("eid").alias(id_col),
            "ts_us",
            "phase",
            F.col("v").alias(value_col),
            (F.col("v") - F.col("phase_mean")).alias("residual"),
        )
    lv = base.groupBy("k").agg(
        (F.sum("vd").cast("double") / F.count("*")).alias("level")
    )
    return (
        joined.join(F.broadcast(lv), "k")
        .select(
            F.col("k").alias(key_col),
            F.col("eid").alias(id_col),
            "ts_us",
            "phase",
            F.col("v").alias(value_col),
            "level",
            (F.col("phase_mean") - F.col("level")).alias("seasonal"),
            (F.col("v") - F.col("phase_mean")).alias("residual"),
        )
    )
