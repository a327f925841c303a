"""Table profiling — ANALYZE-grade per-column statistics in ONE pass.

The maintenance companion of `sinks/bucketed.py`'s ANALYZE hook and the
`sketches` module: a data-engineering pipeline profiles every ingested
table (null rates, cardinalities, ranges) before trusting it, and at
100 TB that profile must come from a single scan, not a per-column
loop of jobs.

Plan shape: one aggregation computes count(*), and per column
(n_nulls, exact n_distinct, min, max).  Spark plans the multi-column
DISTINCT aggregate with an Expand (one duplicated stream per distinct
column) — the standard engine answer, linear in n_cols × rows with
map-side partials, no joins, no driver loops.  The wide 1-row result
then unpivots to one row per column (driver-side width, |cols| cells).

Numeric/timestamp columns report min/max as DOUBLE (exact for ints
below 2^53; timestamps as epoch seconds), strings as strings — both
engines compare and cast these identically, which keeps the whole
profile oracle-checkable (suite row ``profile_lineitem``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_numeric, max_numeric, min_string, max_string).

    Numeric (and timestamp, as epoch seconds) columns fill the numeric
    min/max; string columns fill the string min/max; each row's unused
    pair is null.  ``n_distinct`` is exact COUNT(DISTINCT col) —
    null-excluding on both engines.  Unsupported types raise rather
    than profile wrong.

    ``approx=True`` swaps exact NDV for HyperLogLog++
    (``approx_count_distinct``, default ~2% rsd) — the 100 TB mode:
    the exact multi-distinct plans an Expand that streams the data
    once PER PROFILED COLUMN, while the sketch aggregate is a single
    pass with constant per-column state.  Everything else stays exact.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(cols) if cols is not None else list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # epoch seconds as exact-micros / 1e6 — one IEEE division,
            # the same op the oracle's epoch_us(...)/1000000.0 performs
            # (the session is UTC, so NTZ -> TS is identity)
            num = F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1000000.0)
        elif isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
        elif isinstance(dt, T.StringType):
            num = None
        else:
            raise ValueError(f"profile_columns: unsupported type {dt} for {c!r}")
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(
            (
                F.approx_count_distinct(F.col(c))
                if approx
                else F.countDistinct(F.col(c))
            ).alias(f"__ndv_{c}")
        )
        if num is not None:
            aggs.append(F.min(num).alias(f"__min_{c}"))
            aggs.append(F.max(num).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c)).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        is_str = isinstance(fields[c], T.StringType)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                (F.lit(None).cast("double") if is_str else F.col(f"__min_{c}"))
                .alias("min_numeric"),
                (F.lit(None).cast("double") if is_str else F.col(f"__max_{c}"))
                .alias("max_numeric"),
                (F.col(f"__min_{c}") if is_str else F.lit(None).cast("string"))
                .alias("min_string"),
                (F.col(f"__max_{c}") if is_str else F.lit(None).cast("string"))
                .alias("max_string"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def check_constraints(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Data-quality constraint suite (Deequ-style) evaluated in ONE scan.

    Each constraint is a dict with a ``kind`` and its parameters:

    * ``{"kind": "not_null", "col": c}`` — no NULLs in ``c``.
    * ``{"kind": "unique", "cols": [...]}`` — no duplicate key tuples;
      violations = ``count(*) - count(DISTINCT cols)``, so rows whose
      key contains a NULL also count as violations (SQL COUNT DISTINCT
      drops them) — a primary-key check, not a mere multiplicity check.
    * ``{"kind": "in_range", "col": c, "lo": x, "hi": y}`` — values
      inside ``[lo, hi]``; NULLs don't violate (pair with not_null).
    * ``{"kind": "in_set", "col": c, "values": [...]}`` — value
      membership; NULLs don't violate.
    * ``{"kind": "expr", "name": n, "predicate": sql}`` — arbitrary SQL
      predicate; a row violates when the predicate is not TRUE (NULL
      counts as a violation — three-valued logic made strict).

    An EMPTY input passes every constraint (zero rows = zero
    violations — sums coalesce to 0, never NULL).

    Output: one row per constraint — (constraint, kind, n_rows,
    n_violations, passed).  ALL constraints compile into a single
    aggregation, so a 100-constraint suite over 100 TB is one scan with
    map-side partials (plus one Expand stream per ``unique`` constraint
    — the same cost profile as `profile_columns`'s exact-NDV mode).
    The per-constraint names stay deterministic, so the suite output is
    oracle-checkable (suite row ``check_constraints_lineitem``).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[tuple[str, str]] = []  # (name, kind)
    for i, spec in enumerate(constraints):
        kind = spec["kind"]
        tag = f"__c{i}"
        if kind == "not_null":
            c = spec["col"]
            name = spec.get("name", f"not_null({c})")
            aggs.append(
                F.coalesce(
                    F.sum(F.col(c).isNull().cast("long")), F.lit(0)
                ).alias(tag)
            )
        elif kind == "unique":
            cols = spec["cols"]
            name = spec.get("name", f"unique({', '.join(cols)})")
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.countDistinct(*[F.col(c) for c in cols])
                ).alias(tag)
            )
        elif kind == "in_range":
            c, lo, hi = spec["col"], spec["lo"], spec["hi"]
            name = spec.get("name", f"in_range({c}, {lo}, {hi})")
            viol = (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
            aggs.append(
                F.coalesce(
                    F.sum(F.coalesce(viol, F.lit(False)).cast("long")),
                    F.lit(0),
                ).alias(tag)
            )
        elif kind == "in_set":
            c, values = spec["col"], spec["values"]
            name = spec.get("name", f"in_set({c})")
            viol = ~F.col(c).isin(*values) & F.col(c).isNotNull()
            aggs.append(
                F.coalesce(F.sum(viol.cast("long")), F.lit(0)).alias(tag)
            )
        elif kind == "expr":
            pred, name = spec["predicate"], spec["name"]
            aggs.append(
                F.coalesce(
                    F.sum(F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))),
                    F.lit(0),
                ).alias(tag)
            )
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        names.append((name, kind))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.lit(kind).alias("kind"),
            F.col("__n").alias("n_rows"),
            F.col(f"__c{i}").alias("n_violations"),
            (F.col(f"__c{i}") == 0).alias("passed"),
        )
        for i, (name, kind) in enumerate(names)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str] | None = None,
    bins: int = 10,
) -> DataFrame:
    """Distribution drift between two snapshots of a table — the
    monitoring step after `profile_columns` (shape) and
    `check_constraints` (contracts): did yesterday's data and today's
    data still look alike?

    Per column the two value distributions are histogrammed on SHARED
    bins — numeric columns on ``bins`` equal-width buckets spanning the
    OLD snapshot's [min, max] (out-of-range new values clamp to the
    edge buckets; NULL is its own bucket), categorical columns on the
    value itself — and compared by **total-variation distance**
    ``tv = ½·Σ|p_bin − q_bin|`` ∈ [0, 1].  TV instead of the
    ln-based PSI for the same reason BM25 has a rational idf mode
    (`retrieval.py`): every term is one exact integer division, so the
    DuckDB oracle reproduces it bit-for-bit, while ``ln`` is libm- and
    engine-dependent.  Per-bin terms round to 9 digits and sum as
    DECIMAL(28,9) — the repo's order-independent float contract.

    Plan shape: one 1-row min/max aggregate over OLD (broadcast), then
    per side ONE scan → per-column bin explode → (column, bin) count;
    everything after the two count aggregates is |cols|·|bins|-sized.
    Returns (column, tv) — alert thresholds are the caller's policy
    (0.1/0.2 are the common PSI-style heuristics).  A snapshot with
    zero rows has no distribution: tv comes back NULL, not 0 — "no
    data" must never read as "no drift".
    """
    categorical_cols = list(categorical_cols or [])
    if not numeric_cols and not categorical_cols:
        raise ValueError("profile_drift needs at least one column")
    stats_aggs = []
    for c in numeric_cols:
        stats_aggs.append(F.min(F.col(c).cast("double")).alias(f"mn_{c}"))
        stats_aggs.append(F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
    stats = old.agg(*stats_aggs) if stats_aggs else None

    def histogram(df: DataFrame, tag: str) -> DataFrame:
        d = df.crossJoin(F.broadcast(stats)) if stats is not None else df
        entries = []
        for c in numeric_cols:
            mn, mx = F.col(f"mn_{c}"), F.col(f"mx_{c}")
            v = F.col(c).cast("double")
            raw = F.floor((v - mn) * F.lit(bins) / (mx - mn))
            b = (
                F.when(v.isNull() | mn.isNull(), F.lit(-1))
                .when(mx == mn, F.lit(0))
                .otherwise(
                    F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
                )
            )
            entries.append(
                F.struct(
                    F.lit(c).alias("column"), b.cast("string").alias("bin")
                )
            )
        for c in categorical_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.coalesce(F.col(c).cast("string"), F.lit("__null__"))
                    .alias("bin"),
                )
            )
        return (
            d.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.*")
            .groupBy("column", "bin")
            .agg(F.count(F.lit(1)).alias(f"c_{tag}"))
        )

    from pyspark.sql import Window

    j = histogram(old, "old").join(
        histogram(new, "new"), ["column", "bin"], "full_outer"
    ).select(
        "column",
        "bin",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    wcol = Window.partitionBy("column")
    # try_divide: an EMPTY side puts 0 in the denominator — that must
    # surface as NULL tv (documented), not an ANSI arithmetic error
    p = F.try_divide(F.col("c_old"), F.sum("c_old").over(wcol))
    q = F.try_divide(F.col("c_new"), F.sum("c_new").over(wcol))
    term = F.round(F.abs(p - q), 9).cast("decimal(28,9)")
    return (
        j.select("column", term.alias("t"))
        .groupBy("column")
        .agg((F.sum("t").cast("double") / 2).alias("tv"))
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    k: int = 32,
    n_ranges: int = 32,
) -> DataFrame:
    """EXACT equi-depth (equal-height) histogram: ``k`` buckets; the
    0-based rank ``r`` lands in bucket ``floor(r·k/N)``, so bucket ``b``
    holds ``ceil((b+1)·N/k) − ceil(b·N/k)`` rows of the sorted multiset,
    reported as (bucket, n_rows, lo, hi).

    Equi-WIDTH histograms (``value_histogram``) mislead on skewed
    distributions — one bucket swallows the mass; the equi-depth
    variant is what optimizers and drift monitors actually keep.
    The output is TIE-ORDER INDEPENDENT: bucket populations are fixed
    by the rank formula alone, and a run of equal values straddling a
    boundary contributes that same value to both buckets' lo/hi
    whichever duplicate lands where — so no total order is needed.

    Global ranks come from the sorted-neighborhood machinery (range
    repartition → sortWithinPartitions → consecutive per-partition ids
    from monotonically_increasing_id → broadcast prefix-sum offsets):
    NO single-partition global sort, no driver collect; the only
    data-sized exchange is the range repartition.  N arrives as a
    broadcast 1-row frame, never a driver round-trip.  The rank lineage
    is localCheckpoint-ed once so every consumer reads one numbering.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vals = df.select(F.col(value_col).alias("val"))
    local = (
        vals.repartitionByRange(n_ranges, "val")
        .sortWithinPartitions("val")
        .withColumn("_mid", F.monotonically_increasing_id())
        .select(
            "val",
            F.shiftright("_mid", 33).alias("_pid"),
            (F.col("_mid").bitwiseAND((1 << 33) - 1) + 1).alias("_lrn"),
        )
        .localCheckpoint()
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    total = counts.agg(F.sum("_n").alias("_total"))
    ranked = (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            "val",
            F.expr(f"CAST(((_lrn + _off - 1) * {k}) div _total AS INT)").alias(
                "bucket"
            ),
        )
    )
    return ranked.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )
