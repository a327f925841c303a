"""Incremental aggregate maintenance — materialized-view updates that
never rescan history.

At 100 TB the defining property of a dashboard aggregate is that
yesterday's 99.99% of the data does not get touched when today's batch
lands.  The standard mechanism is an ALGEBRAIC STATE table: keep the
mergeable partials (count, sum, min, max) per group key, fold each
delta batch into the state with one keyed aggregation over
``state ∪ partial(delta)``, and derive the presentation row (avg etc.)
from the state at read time.  This is the batch half of what the
streaming module's stateful operators do with watermarks — and it
composes with `operators/merge.apply_changelog` (CDC upserts feed
deltas; this module folds them into downstream rollups).

Cost model: ``incremental_update`` scans ONLY the delta (one partial-
aggregated exchange on the group key, sized by the delta's distinct
keys) plus the state table, which is |group keys| rows — never the
base data.  The merge is associative and commutative, so daily deltas
can themselves be folded in parallel (tree reduction) and a lost
update is repaired by re-folding that delta alone.

Retraction discipline: ``count`` and ``sum`` are group-invertible, so
deletions fold in as ``sign = -1`` rows.  ``min``/``max`` are NOT
invertible — with retractions enabled the state tracks them as
insert-only bounds (a deleted extremum is only reconciled by a
rebuild), which is the honest contract every incremental-view engine
documents for extrema.

Exactness: sums ride DECIMAL(18,2) partials (associative, order-
independent — the suite-wide discipline), so the incrementally
maintained state is BIT-IDENTICAL to a full recompute; the
``incremental_agg`` oracle proves exactly that, with the oracle doing
the full recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUM_T = "decimal(18,2)"


#: exact second-moment carrier: DECIMAL(18,2)² sums fit comfortably
SQ_T = "decimal(38,4)"


def _partial(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    sign_col: str | None = None,
    square_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Per-key algebraic partials of one batch: cnt, sum_<c>, min_<c>,
    max_<c>.  ``sign_col`` (+1 insert / -1 retract) flows into cnt and
    the sums; extrema ignore it (see module docstring).  ``square_cols``
    adds exact second moments ``sq_<c>`` (DECIMAL, order-independent) —
    the carrier for incrementally-maintained variance/σ."""
    sign: Column = F.col(sign_col) if sign_col else F.lit(1)
    aggs = [F.sum(sign).cast("long").alias("cnt")]
    for c in sum_cols:
        aggs += [
            F.sum(F.col(c).cast(SUM_T) * sign).cast(SUM_T).alias(f"sum_{c}"),
            F.min(F.col(c).cast(SUM_T)).alias(f"min_{c}"),
            F.max(F.col(c).cast(SUM_T)).alias(f"max_{c}"),
        ]
    for c in square_cols:
        aggs.append(
            F.sum(F.col(c).cast(SUM_T) * F.col(c).cast(SUM_T) * sign)
            .cast(SQ_T)
            .alias(f"sq_{c}")
        )
    return df.groupBy(*keys).agg(*aggs)


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    square_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Initial state table from a base batch (inserts only)."""
    return _partial(df, keys, sum_cols, square_cols=square_cols)


def merge_states(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    square_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Fold two state tables: counts/sums add, extrema combine.
    One keyed aggregation over the union — state-sized, not data-sized."""
    aggs = [F.sum("cnt").cast("long").alias("cnt")]
    for c in sum_cols:
        aggs += [
            F.sum(f"sum_{c}").cast(SUM_T).alias(f"sum_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    for c in square_cols:
        aggs.append(F.sum(f"sq_{c}").cast(SQ_T).alias(f"sq_{c}"))
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def incremental_update(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    sign_col: str | None = None,
    square_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Fold a delta batch into the state: scans the DELTA only."""
    return merge_states(
        state,
        _partial(delta, keys, sum_cols, sign_col, square_cols=square_cols),
        keys,
        sum_cols,
        square_cols=square_cols,
    )


def finalize(state: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    """Presentation rows from the state: derived averages, doubles out.
    Groups whose retractions cancelled every row (cnt = 0) disappear."""
    cols: list[Column] = [F.col(k) for k in keys] + [F.col("cnt")]
    for c in sum_cols:
        cols += [
            F.col(f"sum_{c}").cast("double").alias(f"sum_{c}"),
            # one IEEE division of exactly-carried values — engine-portable
            # (decimal/bigint division scale rules are not)
            (
                F.col(f"sum_{c}").cast("double") / F.col("cnt").cast("double")
            ).alias(f"avg_{c}"),
            F.col(f"min_{c}").cast("double").alias(f"min_{c}"),
            F.col(f"max_{c}").cast("double").alias(f"max_{c}"),
        ]
    return state.filter(F.col("cnt") > 0).select(*cols)


def incremental_join_update(
    prev_view: DataFrame | None,
    prev_left: DataFrame | None,
    prev_right: DataFrame | None,
    delta_left: DataFrame | None,
    delta_right: DataFrame | None,
    key: str,
) -> DataFrame:
    """Incremental maintenance of a materialized INNER-join view under
    append-only deltas — the classic IVM delta rule:

        V' = V ∪ (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

    Only the delta sides drive new work: each term joins a batch-sized
    frame against one snapshot (or the other delta), so maintaining a
    100 TB join view costs O(|Δ| ⋈-matched rows) per batch, never a
    re-join of the bases.  The snapshots are the PRE-batch states (the
    delta-delta term covers new-new matches exactly once).

    Append-only by contract: retractions need signed rows (the
    aggregate module's discipline) or a rebuild; this mirrors what
    incremental-view engines document for join views.  Any ``None``
    input is treated as empty.
    """
    parts = []
    if prev_view is not None:
        parts.append(prev_view)
    if delta_left is not None and prev_right is not None:
        parts.append(delta_left.join(prev_right, key))
    if prev_left is not None and delta_right is not None:
        parts.append(prev_left.join(delta_right, key))
    if delta_left is not None and delta_right is not None:
        parts.append(delta_left.join(delta_right, key))
    if not parts:
        raise ValueError("incremental_join_update: every input is None")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
