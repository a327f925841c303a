"""Mergeable distinct-count sketches (KMV / bottom-k).

At 100 TB you cannot re-scan the corpus every time a dashboard needs a
distinct count at a different rollup level.  The standard answer is a
*mergeable sketch* materialized once per fine-grained group, then
merged up any aggregation lattice without touching the raw data.

This module implements the KMV ("k minimum values" / bottom-k) sketch
(Bar-Yossef et al. 2002; the same estimator family as Theta sketches):

* **sketch** of a value set = the ``k`` smallest md5 hashes of its
  distinct values (kept as a sorted array column);
* **merge** = the ``k`` smallest of the union of the input sketches —
  associative, commutative, idempotent, so it parallelizes like any
  algebraic aggregate;
* **estimate** = exact ``|sketch|`` when the sketch is not full, else
  ``(k-1) / u_k`` where ``u_k`` is the k-th smallest hash mapped to
  ``(0,1)``.

Why KMV instead of HyperLogLog here: the sketch state is a plain
``array<string>`` column — buildable, mergeable, and estimable with
*built-in* DataFrame operations (window rank + collect + one division),
no UDF or binary blob, and the DuckDB oracle reproduces it BITWISE
(md5 hex is engine-identical; the estimate is one IEEE division of
exact integers).  Spark's native ``approx_count_distinct`` (HLL++) is
the fire-and-forget alternative when no reusable sketch state is
needed; this module exists for the "materialize once, roll up many
ways" pattern HLL state columns would need private binary codecs for.

Accuracy: relative standard error ≈ 1/sqrt(k-2) (~12% at k=64, ~9% at
k=128).  Hash space: the first 13 hex digits (52 bits) are compared as
*strings* (lexicographic == numeric for fixed-width hex), so no engine
does integer conversion until the single estimate division.

Plan shape: building sketches over N rows is distinct → one window
rank per group → one collect aggregate (two exchanges, both partial-
aggregated); merging sketches never touches raw rows at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_DIGITS = 13  # 52 bits: exact in int64 and in an IEEE double mantissa
HASH_SPACE = 16**HEX_DIGITS


def _hash_expr(value_col: str) -> Column:
    return F.substring(F.md5(F.col(value_col).cast("string")), 1, HEX_DIGITS)


def kmv_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV sketch of ``value_col``'s distinct values.

    Returns ``group_cols + [sketch]`` where ``sketch`` is the sorted
    array of the ``k`` smallest distinct value hashes.  Two partial-
    aggregated exchanges; the sketch column is ≤ ``13·k`` bytes per
    group regardless of input size.
    """
    hashes = df.select(*group_cols, _hash_expr(value_col).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        hashes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge sketches up to a coarser grouping: k smallest of the union.

    ``sketches`` must have a ``sketch`` array column; ``group_cols`` is
    the COARSER key to merge to (columns dropped from the build key are
    what gets rolled up).  Never touches the raw data — merging a year
    of daily sketches is an exchange of kilobytes.
    """
    exploded = sketches.select(
        *group_cols, F.explode("sketch").alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        exploded.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
    )


def kmv_estimate_expr(sketch_col: Column | str = "sketch", k: int = 64) -> Column:
    """Distinct-count estimate from a sketch column (name or Column).

    Exact (= sketch size) below ``k``; else ``(k-1)/u_k`` computed as a
    single IEEE division of exact integers — bitwise reproducible
    across engines.
    """
    if isinstance(sketch_col, str):
        sketch_col = F.col(sketch_col)
    kth = F.conv(F.element_at(sketch_col, k), 16, 10).cast("long")
    full_est = F.lit((k - 1) * HASH_SPACE).cast("double") / kth.cast("double")
    return F.when(
        F.size(sketch_col) < k,
        F.size(sketch_col).cast("double"),
    ).otherwise(full_est)


def ndv_rollup(
    df: DataFrame,
    value_col: str,
    fine_cols: list[str],
    coarse_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Build fine-grained sketches, merge to the coarse key, estimate.

    The demonstration composition: per-``fine_cols`` sketches (the
    materialize-once step) merged up to ``coarse_cols`` (the re-use
    step), with the estimate evaluated on the merged sketch.  Returns
    ``coarse_cols + [ndv_est, sketch_size]``.
    """
    fine = kmv_sketch(df, value_col, fine_cols, k)
    merged = kmv_merge(fine, coarse_cols, k)
    return merged.select(
        *coarse_cols,
        kmv_estimate_expr("sketch", k).alias("ndv_est"),
        F.size("sketch").alias("sketch_size"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (bottom-k uniform row sample)
# ---------------------------------------------------------------------------


def _row_hash_expr(key_col: str, salt: str = "q") -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        1,
        HEX_DIGITS,
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per-group mergeable quantile sketch: the ``k`` rows whose salted
    row-key hashes are smallest, carried as a sorted ``array<struct<h,
    v>>`` column.

    Because the hash is uniform over row keys, the kept rows are a
    uniform random sample of the group — and like KMV, "k smallest of
    the union" makes the merge associative/commutative/idempotent, so
    sketches roll up any aggregation lattice without rescanning rows.
    Quantiles from a k-sample have standard error ~ sqrt(p(1-p)/k) in
    rank space (~3% at k=256 for the median): the classic
    bounded-space answer when a full sort is off the table.  Unlike
    KMV this samples ROWS (duplicated values stay duplicated —
    quantiles need the multiset, distinct-hashing would bias them).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    return (
        df.select(
            *group_cols,
            _row_hash_expr(key_col).alias("h"),
            F.col(value_col).alias("v"),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("h", "v"))).alias("qsketch"))
    )


def quantile_sketch_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Merge quantile sketches to a coarser key: k smallest of the union."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    return (
        sketches.select(*group_cols, F.explode("qsketch").alias("e"))
        .select(*group_cols, F.col("e.h").alias("h"), F.col("e.v").alias("v"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("h", "v"))).alias("qsketch"))
    )


def quantile_estimate(
    sketches: DataFrame, group_cols: list[str], probs: list[float]
) -> DataFrame:
    """Interpolated quantile estimates from sketch samples.

    Explodes only the sketch (≤ k rows per group) and applies the same
    sort-based ``percentile`` aggregate the exact path uses — which is
    also why the DuckDB oracle (``quantile_cont`` over the replayed
    sample) matches bitwise.
    """
    vals = sketches.select(*group_cols, F.explode("qsketch").alias("e")).select(
        *group_cols, F.col("e.v").alias("v")
    )
    aggs = [
        F.expr(f"percentile(v, {p!r})").alias(f"q{int(p * 100)}") for p in probs
    ] + [F.count("*").alias("sample_size")]
    return vals.groupBy(*group_cols).agg(*aggs)


def kmv_set_ops(
    sketches: DataFrame,
    group_col: str,
    group_a,
    group_b,
    k: int = 64,
) -> DataFrame:
    """Set-operation NDV estimates for two groups' KMV sketches — the
    Theta-sketch style union/intersection estimator over the already-
    materialized sketch state, never the raw rows.

    * union sketch = k smallest of the two sketches' union; its
      estimate is the standard KMV formula;
    * intersection estimate = (|A ∩ B ∩ U| / |U|) · union_est — the
      fraction of the union sketch's uniform hash sample that both
      input sets contain, scaled by the union estimate (Theta sketch
      a-priori estimator);
    * jaccard estimate = |A ∩ B ∩ U| / |U| directly.

    One row out: (ndv_a_est, ndv_b_est, union_est, inter_est,
    jaccard_est, union_sample).  Both inputs are one-row frames by
    construction (a sketch per group), so the combining crossJoin is a
    broadcast of a kilobyte — no data-sized exchange anywhere.  All
    arithmetic is division/multiplication of exact integers in a fixed
    order, so an oracle on another engine reproduces it bitwise.
    """

    a = sketches.filter(F.col(group_col) == group_a).select(
        F.col("sketch").alias("ska")
    )
    b = sketches.filter(F.col(group_col) == group_b).select(
        F.col("sketch").alias("skb")
    )
    # fail loudly on a missing group (typo, or no rows): a silent
    # empty result would read as "no data" downstream.  The sketches
    # frame is one row per group by construction, so this is cheap.
    for side, g in ((a, group_a), (b, group_b)):
        if side.limit(1).count() == 0:
            raise ValueError(f"no sketch for {group_col}={g!r}")
    both = a.crossJoin(b)
    u = F.slice(F.array_sort(F.array_union(F.col("ska"), F.col("skb"))), 1, k)
    combined = both.select(
        F.col("ska"),
        F.col("skb"),
        u.alias("u"),
        F.size(u).alias("usz"),
        F.size(
            F.array_intersect(u, F.array_intersect(F.col("ska"), F.col("skb")))
        ).alias("common"),
    )
    union_est = kmv_estimate_expr(F.col("u"), k)
    frac = F.col("common").cast("double") / F.col("usz").cast("double")
    return combined.select(
        kmv_estimate_expr(F.col("ska"), k).alias("ndv_a_est"),
        kmv_estimate_expr(F.col("skb"), k).alias("ndv_b_est"),
        union_est.alias("union_est"),
        (frac * union_est).alias("inter_est"),
        frac.alias("jaccard_est"),
        F.col("usz").alias("union_sample"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def _cms_bucket_expr(row_col: str, value_col: str, width: int) -> Column:
    # same md5 convention as the KMV family: 52 portable hash bits,
    # reduced mod width — reproduced verbatim by the SQL oracle
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(row_col).cast("string"),
                        F.lit(":"),
                        F.col(value_col).cast("string"),
                    )
                ),
                1,
                HEX_DIGITS,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of ``value_col``'s frequency distribution:
    ``depth`` hash rows × ``width`` buckets, stored as (r, bucket, cnt)
    rows — at most ``depth·width`` of them regardless of input size.

    Mergeable by summing cnt on (r, bucket) (algebraic, like every
    sketch here), so shards/days sketch independently and roll up
    without rescanning — the bounded-space answer to "how often does
    ANY value occur" when the value domain (terms, urls, ids) is too
    large to count exactly.  Build cost: one narrow explode (depth
    rows per input row) + ONE partial-aggregated exchange.
    """
    rows = (
        df.select(F.col(value_col).cast("string").alias("_v"))
        .selectExpr("_v", f"explode(sequence(0, {depth - 1})) as r")
        .withColumn("bucket", _cms_bucket_expr("r", "_v", width))
    )
    return rows.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Frequency estimates for ``probes``' values from a built sketch:
    min over the depth rows of the probed buckets.

    Never underestimates (every occurrence hashed into every row);
    overestimates by collision mass ~ n/width per row, driven down
    exponentially in depth by the min.  The sketch side is ≤
    depth·width rows — always the broadcast side of the probe join.
    """
    p = (
        probes.select(F.col(value_col).alias("_v"))
        .distinct()
        .selectExpr("_v", f"explode(sequence(0, {depth - 1})) as r")
        .withColumn("bucket", _cms_bucket_expr("r", "_v", width))
    )
    joined = p.join(F.broadcast(cms), ["r", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy("_v").agg(F.min("cnt").alias("cms_est")).select(
        F.col("_v").alias(value_col), "cms_est"
    )


# ---------------------------------------------------------------------------
# Bloom filter (bitmap as long words) + semi-join reduction
# ---------------------------------------------------------------------------


def _bloom_pos_expr(hash_idx: str, value_col: str, m_bits: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("b"),
                        F.col(hash_idx).cast("string"),
                        F.lit(":"),
                        F.col(value_col).cast("string"),
                    )
                ),
                1,
                HEX_DIGITS,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def _bloom_words(
    keys_str: DataFrame, m_bits: int, k_hashes: int
) -> DataFrame:
    """Bitmap words from a distinct string-key frame (column ``_v``)."""
    pos = keys_str.selectExpr(
        "_v", f"explode(sequence(0, {k_hashes - 1})) as j"
    ).withColumn("pos", _bloom_pos_expr("j", "_v", m_bits))
    return (
        pos.select(
            F.expr("pos div 64").alias("widx"),
            # BIGINT shift: exact up to 63 (a 32-bit shift would wrap)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 65536, k_hashes: int = 5
) -> DataFrame:
    """Bloom filter over ``key_col``: an ``m_bits`` bitmap stored as
    (widx, word) long rows — ≤ m_bits/64 of them, mergeable by
    ``bit_or`` on widx.  One narrow explode + ONE aggregation.
    """
    keys = df.select(F.col(key_col).cast("string").alias("_v")).distinct()
    return _bloom_words(keys, m_bits, k_hashes)


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k_hashes: int = 5,
) -> DataFrame:
    """Semi-join reduction via a Bloom runtime filter: build the filter
    from the SMALL side's keys, screen the big side against the
    broadcast bitmap (a false-positive-prone, false-negative-FREE
    prefilter), then take the EXACT semi-join on the survivors.

    The result equals ``big.join(small, key, "left_semi")`` — the
    bloom only prunes rows before the real exchange, which is the
    point at 100 TB: the big side's shuffle carries only keys that
    (probably) match, instead of the whole table.  The exactness
    contract is oracle-enforced (the SQL twin is the plain semi-join,
    so a false NEGATIVE — a dropped match — fails the gate; false
    positives are removed by the final exact join).

    Guard rails (a runtime filter must never be worse than no filter):

    * ``m_bits=None`` (default) sizes the bitmap from the small side's
      actual distinct-key count — next power of two ≥ 16·n, ~0.14%
      false positives at k=5 — instead of trusting a fixed default a
      100× bigger build side would saturate;
    * an explicitly-passed ``m_bits`` that the key count saturates
      (n·8 > m) falls back to the PLAIN semi-join: a saturated filter
      passes ~every key, and broadcasting ~all big-side keys as
      "hits" is an OOM, not an optimization;
    * BOTH sides' keys are hashed at the join's COMMON type (derived
      from Catalyst's own coercion via an ``array(a, b)`` probe, with
      ``-0.0`` normalized to ``+0.0``): casting one side to the
      other's type is wrong whenever the common type widens the probe
      side too (big long vs small double coerces big to double — a
      long-typed hash would miss 2^53+1's rounded match), and an
      underivable common type falls back to the plain semi-join.

    Construction is EAGER by contract: sizing/saturation need the
    small side's distinct-key count, so building this operator runs
    one job over the small side (the keys are localCheckpoint'd and
    reused by the bitmap build — scanned once, not twice).
    """
    common = _common_key_type(big, small, key_col)
    if common is None:
        return big.join(small.select(key_col), key_col, "left_semi")

    def _keystr(df: DataFrame) -> Column:
        c = F.col(key_col).cast(common)
        if common.typeName() in ("double", "float"):
            c = c + F.lit(0.0).cast(common)  # -0.0 == 0.0 in joins
        return c.cast("string").alias("_v")

    skeys = small.select(_keystr(small)).distinct().localCheckpoint()
    n = skeys.count()
    if m_bits is None:
        m_bits = 1 << max(10, (max(16 * n, 1) - 1).bit_length())
    elif n * 8 > m_bits:
        return big.join(small.select(key_col), key_col, "left_semi")
    bloom = _bloom_words(skeys, m_bits, k_hashes)
    probes = (
        big.select(_keystr(big))
        .distinct()
        .selectExpr("_v", f"explode(sequence(0, {k_hashes - 1})) as j")
        .withColumn("pos", _bloom_pos_expr("j", "_v", m_bits))
        .select(
            "_v",
            F.expr("pos div 64").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
    )
    hits = (
        probes.join(F.broadcast(bloom), "widx", "left")
        .withColumn(
            "set",
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("bit"))
                != 0
            ).cast("int"),
        )
        .groupBy("_v")
        .agg(F.min("set").alias("all_set"))
        .filter(F.col("all_set") == 1)
        .select(F.col("_v").cast(common).alias(key_col))
    )
    screened = big.join(F.broadcast(hits), key_col, "left_semi")
    return screened.join(small.select(key_col), key_col, "left_semi")


def _common_key_type(big: DataFrame, small: DataFrame, key_col: str):
    """The type Spark's join coercion would compare ``key_col`` at —
    derived by asking Catalyst to type ``array(a, b)`` over the two
    sides' key types (the same widening family join keys use).
    Returns None when no common type exists."""
    pt = big.schema[key_col].dataType
    bt = small.schema[key_col].dataType
    if pt == bt:
        return pt
    from pyspark.sql.types import StructField, StructType

    spark = big.sparkSession
    probe = spark.createDataFrame(
        [], StructType([StructField("a", pt), StructField("b", bt)])
    )
    try:
        arr = probe.select(F.array("a", "b").alias("x"))
        return arr.schema["x"].dataType.elementType
    except Exception:  # noqa: BLE001 — incompatible types: caller falls back
        return None


# ---------------------------------------------------------------------------
# HyperLogLog (dense-array-free, exact-register) distinct-count sketch
# ---------------------------------------------------------------------------
#
# The KMV sketch above keeps 13·k bytes per group; HyperLogLog (Flajolet
# et al. 2007) gets the same job done in m registers of ≤6 bits — the
# sketch of choice when the GROUP BY is huge (per-domain, per-user NDV
# at 100 TB) and even kilobytes per group is too much state.  Registers
# here are derived from the same md5 contract as KMV so the DuckDB
# oracle reproduces them EXACTLY: bucket = first ``b`` bits of the
# digest (hex-aligned), sub-stream = the next 52 bits, and
# rho = position of the sub-stream's leftmost 1-bit (53 when zero) is
# pure integer arithmetic (string length of bin()) in both engines.
#
# State: a sorted array of (bucket, rho) structs for NON-EMPTY buckets
# only — no binary blob, no private codec, mergeable by explode +
# per-bucket max (associative, commutative, idempotent).  The harmonic
# sum is kept in integer space: sum_j 2^(-rho_j) over all m registers
# (empty register => rho 0) equals S / 2^53 where
# S = zeros·2^53 + sum 2^(53-rho) is an EXACT BIGINT (max m·2^53 =
# 2^61 at the b=8 ceiling), so the raw estimate
# alpha_m·m²·2^53 / S is ONE IEEE division of exact integers —
# bitwise reproducible across engines, like every estimator here.
#
# Building never needs a distinct: duplicates cannot move a register's
# max.  Plan: one partial-aggregated exchange at (group, bucket), one
# tiny collect at (group) — on a 100 TB scan the map-side combine
# reduces each task's output to <= m rows per group.

HLL_SUB_HEX = 13  # 52-bit sub-stream: exact in int64 and a double mantissa
_HLL_RHO_MAX = 4 * HLL_SUB_HEX + 1  # 53: all-zero sub-stream


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hll_check_b(b: int) -> int:
    if b % 4 or not 4 <= b <= 10:
        # hex-aligned bucket prefix keeps the oracle a substr(); b<=10
        # keeps the integer harmonic sum m·2^53 inside int64
        raise ValueError(f"b must be 4 or 8 (hex-aligned, <=10), got {b}")
    return 1 << b


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], b: int = 8
) -> DataFrame:
    """Per-group HLL registers for ``value_col`` (NULLs ignored, like
    COUNT DISTINCT).  Returns ``group_cols + [sketch]`` where sketch is
    the sorted array of (bucket, rho) structs of non-empty buckets."""
    _hll_check_b(b)
    nb = b // 4
    hx = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(hx, 1, nb), 16, 10).cast("int")
    sub = F.conv(F.substring(hx, nb + 1, HLL_SUB_HEX), 16, 10).cast("long")
    rho = F.when(sub == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(sub))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list(F.struct("bucket", "rho"))).alias("sketch")
        )
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches to a coarser key: per-bucket max over the union.
    Never touches raw rows; exchanges are register-count-sized."""
    return (
        sketches.select(*group_cols, F.explode("sketch").alias("e"))
        .groupBy(*group_cols, F.col("e.bucket").alias("bucket"))
        .agg(F.max("e.rho").alias("rho"))
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list(F.struct("bucket", "rho"))).alias("sketch")
        )
    )


def hll_harmonic_expr(sketch_col: str = "sketch", b: int = 8) -> Column:
    """The EXACT integer harmonic sum S = zeros·2^53 + Σ 2^(53-rho)
    (so Σ_j 2^(-M_j) over all m registers = S / 2^53)."""
    m = _hll_check_b(b)
    # rho in [1, 53] => shift amount in [0, 52]; S <= m·2^53 = 2^61
    return F.expr(
        f"(CAST({m} AS BIGINT) - size({sketch_col}))"
        f" * CAST({1 << _HLL_RHO_MAX} AS BIGINT)"
        f" + aggregate({sketch_col}, CAST(0 AS BIGINT),"
        f" (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT),"
        f" {_HLL_RHO_MAX} - x.rho))"
    )


def hll_estimate_expr(
    sketch_col: str = "sketch", b: int = 8, correct_small: bool = True
) -> Column:
    """NDV estimate: raw = alpha_m·m²·2^53 / S (one IEEE division of
    exact integers — engine-bitwise).  With ``correct_small`` (the
    practical default), the standard linear-counting regime
    (raw <= 2.5m with empty registers) uses m·ln(m/zeros) instead —
    accurate, but ln() is a libm call whose last ulp is not contracted
    across engines, so exactness-gated oracles compare the raw form."""
    m = _hll_check_b(b)
    num = _hll_alpha(m) * m * m * float(1 << _HLL_RHO_MAX)
    s = hll_harmonic_expr(sketch_col, b)
    raw = F.lit(num) / s.cast("double")
    if not correct_small:
        return raw
    zeros = F.lit(m) - F.size(F.col(sketch_col))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)


def hll_ndv_rollup(
    df: DataFrame,
    value_col: str,
    fine_cols: list[str],
    coarse_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Materialize-once / roll-up-many for HLL: fine sketches merged to
    the coarse key, estimated with the exactness-gated raw form plus
    the exact harmonic sum so the oracle can compare integers."""
    merged = hll_merge(hll_sketch(df, value_col, fine_cols, b), coarse_cols)
    return merged.select(
        *coarse_cols,
        F.size("sketch").cast("int").alias("nonempty"),
        hll_harmonic_expr("sketch", b).alias("s_scaled"),
        hll_estimate_expr("sketch", b, correct_small=False).alias("ndv_raw"),
    )
