"""Round-3 additions: BM25 retrieval, KMV sketches, graph analytics,
weighted sampling, linear interpolation."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_term_density(spark):
    from atlas_upscaling_dask_spark.extensions.retrieval import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "spark spark spark runs fast"),
            (2, "spark is a system"),
            (3, "nothing relevant here at all"),
            (4, "ducks in a row"),
        ],
    )
    out = bm25_topk(docs, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # non-matchers filtered
    assert out[0]["score"] > out[1]["score"]
    assert [r["rank"] for r in out] == [1, 2]


def test_bm25_ln_and_rational_agree_on_ranking(spark):
    from atlas_upscaling_dask_spark.extensions.retrieval import bm25_topk

    docs = _docs(
        spark,
        [
            (i, " ".join(["alpha"] * (i % 5) + ["beta"] * (i % 3) + ["pad"] * i))
            for i in range(1, 30)
        ],
    )
    rat = bm25_topk(docs, ["alpha", "beta"], k=8, idf_mode="rational").collect()
    ln = bm25_topk(docs, ["alpha", "beta"], k=8, idf_mode="ln").collect()
    # The rational idf is a monotone-in-df stand-in for the ln idf: the
    # retrieved set matches and the head of the ranking agrees (deep
    # ties may swap where the two idfs weight the terms differently).
    assert {r["doc_id"] for r in rat} == {r["doc_id"] for r in ln}
    assert [r["doc_id"] for r in rat][:3] == [r["doc_id"] for r in ln][:3]


def test_bm25_length_normalization(spark):
    from atlas_upscaling_dask_spark.extensions.retrieval import bm25_topk

    # Same tf; the shorter document must score higher (b > 0).
    docs = _docs(
        spark,
        [
            (1, "needle short doc"),
            (2, "needle " + " ".join(["filler"] * 50)),
        ],
    )
    out = bm25_topk(docs, ["needle"], k=2).collect()
    assert out[0]["doc_id"] == 1 and out[0]["score"] > out[1]["score"]


# ---------------------------------------------------------------------------
# KMV sketches
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        kmv_estimate_expr,
        kmv_sketch,
    )

    df = spark.range(40).select(
        F.lit("g").alias("g"), (F.col("id") % 17).alias("v")
    )
    sk = kmv_sketch(df, "v", ["g"], k=64)
    est = sk.select(kmv_estimate_expr("sketch", 64).alias("e")).collect()[0]["e"]
    assert est == 17.0  # not full: the sketch IS the distinct set


def test_kmv_estimate_within_error(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        kmv_estimate_expr,
        kmv_sketch,
    )

    n = 5000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    k = 128
    sk = kmv_sketch(df, "v", ["g"], k=k)
    est = sk.select(kmv_estimate_expr("sketch", k).alias("e")).collect()[0]["e"]
    # RSE ~ 1/sqrt(k-2) ≈ 9%; allow 4 sigma.
    assert abs(est - n) / n < 0.36


def test_kmv_merge_equals_direct(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import kmv_merge, kmv_sketch

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("child"), (F.col("id") % 911).alias("v")
    )
    k = 32
    fine = kmv_sketch(df, "v", ["child"], k=k).withColumn("root", F.lit(1))
    merged = kmv_merge(fine, ["root"], k=k).collect()[0]["sketch"]
    direct = (
        kmv_sketch(df.withColumn("root", F.lit(1)), "v", ["root"], k=k)
        .collect()[0]["sketch"]
    )
    assert merged == direct  # the merge identity: k-smallest of the union


# ---------------------------------------------------------------------------
# Graph analytics
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_count_k4_plus_square(spark):
    from atlas_upscaling_dask_spark.operators.graph import triangle_stats

    # K4 (4 triangles) + a disjoint 4-cycle (0 triangles).
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    square = [(10, 11), (11, 12), (12, 13), (10, 13)]
    out = triangle_stats(_edges(spark, k4 + square)).collect()[0]
    assert out["n_nodes"] == 8
    assert out["n_edges"] == 10
    assert out["n_triangles"] == 4


def test_triangle_count_orientation_handles_duplicates_and_order(spark):
    from atlas_upscaling_dask_spark.operators.graph import (
        canonical_edges,
        triangle_stats,
    )

    # Raw pairs: duplicates, reversed orientation, self-loop — must
    # canonicalize to one triangle.
    raw = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 1), (1, 1)], "x long, y long"
    )
    edges = canonical_edges(raw, "x", "y")
    out = triangle_stats(edges).collect()[0]
    assert out["n_edges"] == 3 and out["n_triangles"] == 1


def test_pagerank_star_center_wins_and_mass_conserved(spark):
    from atlas_upscaling_dask_spark.operators.graph import PR_SCALE, pagerank

    star = [(0, i) for i in range(1, 9)]
    out = pagerank(_edges(spark, star), n_iter=4).collect()
    ranks = {r["node"]: r["rank_scaled"] for r in out}
    assert max(ranks, key=ranks.get) == 0
    leaves = {ranks[i] for i in range(1, 9)}
    assert len(leaves) == 1  # symmetric leaves rank identically
    # Integer floors only ever LOSE mass, and not much of it.
    total = sum(ranks.values())
    assert 0.98 * PR_SCALE < total <= PR_SCALE


def test_pagerank_deterministic_across_partitionings(spark):
    from atlas_upscaling_dask_spark.operators.graph import pagerank

    edges = [(i, (i * 7 + 1) % 23) for i in range(23) if i != (i * 7 + 1) % 23]
    e1 = _edges(spark, edges).repartition(1)
    e2 = _edges(spark, edges).repartition(13)
    from atlas_upscaling_dask_spark.operators.graph import canonical_edges

    r1 = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(canonical_edges(e1, "a", "b"), n_iter=3).collect()
    )
    r2 = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(canonical_edges(e2, "a", "b"), n_iter=3).collect()
    )
    assert r1 == r2  # integer arithmetic: partitioning-independent


# ---------------------------------------------------------------------------
# Weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_prefers_heavy_rows(spark):
    from atlas_upscaling_dask_spark.extensions.training import weighted_sample

    # One row with overwhelming weight vs 200 light rows: u^(1/w) → 1
    # as w → ∞, so the heavy row is effectively always in a k=20 sample.
    df = spark.range(201).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, 10_000_000).otherwise(1).alias("w"),
    )
    out = weighted_sample(df, "w", 20, key_col="doc_id")
    assert 0 in {r["doc_id"] for r in out.collect()}


def test_weighted_sample_deterministic_and_seed_sensitive(spark):
    from atlas_upscaling_dask_spark.extensions.training import weighted_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    s1 = {r["doc_id"] for r in weighted_sample(df, "w", 30, seed=1).collect()}
    s2 = {r["doc_id"] for r in weighted_sample(df, "w", 30, seed=1).collect()}
    s3 = {r["doc_id"] for r in weighted_sample(df, "w", 30, seed=2).collect()}
    assert s1 == s2
    assert s1 != s3


# ---------------------------------------------------------------------------
# Linear interpolation
# ---------------------------------------------------------------------------


def test_resample_interpolate_manual(spark):
    from atlas_upscaling_dask_spark.operators.resample import resample_interpolate

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def at(h, m=0):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    ev = spark.createDataFrame(
        [
            (1, at(0), 0.0),
            (1, at(2), 2.0),
            (1, at(3, 30), 5.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["grid_ts"]: r["value"]
        for r in resample_interpolate(ev).collect()
    }
    assert out[at(0)] == 0.0  # exact observation at the instant
    assert out[at(1)] == 1.0  # midpoint of [0, 2]
    assert out[at(2)] == 2.0
    assert out[at(3)] == 2.0 + 3.0 * (1.0 / 1.5)  # 2/3 into [2.0, 5.0]


def test_resample_interpolate_edge_extrapolation(spark):
    from atlas_upscaling_dask_spark.operators.resample import resample_interpolate

    t0 = datetime.datetime(2026, 1, 1, 0, 30, 0)
    ev = spark.createDataFrame(
        [(1, t0, 7.0), (1, t0 + datetime.timedelta(hours=1), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = resample_interpolate(ev).collect()
    # Grid starts at the hour-truncated min: the first instant PRECEDES
    # the first observation and must extrapolate it constantly.
    first = min(rows, key=lambda r: r["grid_ts"])
    assert first["value"] == 7.0


def test_bm25_index_matches_inline_and_prunes(spark, tmp_path):
    from atlas_upscaling_dask_spark.extensions.retrieval import (
        bm25_index_topk,
        bm25_topk,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["alpha"] * (i % 4) + ["beta"] * (i % 2) + ["pad"] * (i % 7)))
            for i in range(1, 60)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_text_index(docs, path)
    inline = bm25_topk(docs, ["alpha", "beta"], k=12).collect()
    indexed = bm25_index_topk(spark, path, ["alpha", "beta"], k=12).collect()
    assert [(r["doc_id"], r["score"]) for r in inline] == [
        (r["doc_id"], r["score"]) for r in indexed
    ]
    # The probe scan must carry PartitionFilters on the bucket column —
    # the reason query cost is independent of vocabulary/corpus size.
    from pyspark.sql import functions as F2

    probe = spark.read.parquet(path).filter(F2.col("bucket").isin([0, 1]))
    plan = probe._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance
# ---------------------------------------------------------------------------


def test_incremental_equals_full_recompute(spark):
    from atlas_upscaling_dask_spark.operators.incremental import (
        aggregate_state,
        finalize,
        incremental_update,
    )

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 37).cast("double").alias("v")
    )
    base = df.filter(F.col("id") % 3 != 0)
    delta = df.filter(F.col("id") % 3 == 0)
    inc = finalize(
        incremental_update(aggregate_state(base, ["g"], ["v"]), delta, ["g"], ["v"]),
        ["g"],
        ["v"],
    )
    full = finalize(aggregate_state(df, ["g"], ["v"]), ["g"], ["v"])
    a = sorted(tuple(r) for r in inc.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b  # bit-identical, not just approximately equal


def test_incremental_retraction_cancels_rows(spark):
    from atlas_upscaling_dask_spark.operators.incremental import (
        aggregate_state,
        finalize,
        incremental_update,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "g long, v double"
    )
    # retract (1, 20.0); insert (2, 7.0)
    delta = spark.createDataFrame(
        [(1, 20.0, -1), (2, 7.0, 1)], "g long, v double, sign int"
    )
    state = incremental_update(
        aggregate_state(base, ["g"], ["v"]), delta, ["g"], ["v"], sign_col="sign"
    )
    out = {r["g"]: r for r in finalize(state, ["g"], ["v"]).collect()}
    assert out[1]["cnt"] == 1 and out[1]["sum_v"] == 10.0
    assert out[2]["cnt"] == 2 and out[2]["sum_v"] == 12.0


def test_incremental_group_fully_retracted_disappears(spark):
    from atlas_upscaling_dask_spark.operators.incremental import (
        aggregate_state,
        finalize,
        incremental_update,
    )

    base = spark.createDataFrame([(1, 3.0)], "g long, v double")
    delta = spark.createDataFrame([(1, 3.0, -1)], "g long, v double, sign int")
    state = incremental_update(
        aggregate_state(base, ["g"], ["v"]), delta, ["g"], ["v"], sign_col="sign"
    )
    assert finalize(state, ["g"], ["v"]).count() == 0


def test_merge_states_associative(spark):
    from atlas_upscaling_dask_spark.operators.incremental import (
        aggregate_state,
        merge_states,
    )

    df = spark.range(300).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 11).cast("double").alias("v")
    )
    p1 = aggregate_state(df.filter("id % 3 = 0"), ["g"], ["v"])
    p2 = aggregate_state(df.filter("id % 3 = 1"), ["g"], ["v"])
    p3 = aggregate_state(df.filter("id % 3 = 2"), ["g"], ["v"])
    left = merge_states(merge_states(p1, p2, ["g"], ["v"]), p3, ["g"], ["v"])
    right = merge_states(p1, merge_states(p2, p3, ["g"], ["v"]), ["g"], ["v"])
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, right.collect()))


# ---------------------------------------------------------------------------
# Table diff
# ---------------------------------------------------------------------------


def test_table_diff_statuses(spark):
    from atlas_upscaling_dask_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
        "k long, name string, val double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0), (3, "c", 3.0)],
        "k long, name string, val double",
    )
    out = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    # k=1 unchanged (dropped), k=2 changed, k=3 NULL→3.0 must count as
    # changed (null-safe compare), k=4 added.
    assert out == {2: "changed", 3: "changed", 4: "added"}
    full = table_diff(old, new, ["k"], include_unchanged=True)
    assert {r["k"]: r["status"] for r in full.collect()}[1] == "unchanged"


def test_table_diff_removed_rows_carry_old_values(spark):
    from atlas_upscaling_dask_spark.operators.merge import table_diff

    old = spark.createDataFrame([(1, "x")], "k long, name string")
    new = spark.createDataFrame([], "k long, name string")
    r = table_diff(old, new, ["k"]).collect()[0]
    assert r["status"] == "removed" and r["old_name"] == "x" and r["new_name"] is None


# ---------------------------------------------------------------------------
# Quantile sketch
# ---------------------------------------------------------------------------


def test_quantile_sketch_exact_below_k(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    df = spark.range(101).select(
        F.lit("g").alias("g"),
        F.col("id").alias("key"),
        F.col("id").cast("double").alias("v"),
    )
    sk = quantile_sketch(df, "v", "key", ["g"], k=1000)  # sample = everything
    out = quantile_estimate(sk, ["g"], [0.5]).collect()[0]
    assert out["q50"] == 50.0 and out["sample_size"] == 101


def test_quantile_sketch_merge_equals_direct(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        quantile_sketch,
        quantile_sketch_merge,
    )

    df = spark.range(2000).select(
        (F.col("id") % 4).alias("child"),
        F.col("id").alias("key"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    fine = quantile_sketch(df, "v", "key", ["child"], k=64).withColumn(
        "root", F.lit(1)
    )
    merged = quantile_sketch_merge(fine, ["root"], k=64).collect()[0]["qsketch"]
    direct = quantile_sketch(
        df.withColumn("root", F.lit(1)), "v", "key", ["root"], k=64
    ).collect()[0]["qsketch"]
    assert merged == direct


def test_quantile_sketch_estimate_accuracy(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.col("id").alias("key"),
        F.col("id").cast("double").alias("v"),  # uniform 0..n-1
    )
    sk = quantile_sketch(df, "v", "key", ["g"], k=512)
    out = quantile_estimate(sk, ["g"], [0.25, 0.5, 0.75]).collect()[0]
    # rank-space SE ~ sqrt(p(1-p)/512) ≈ 2.2%; allow 4 sigma ≈ 9%.
    for p, got in ((0.25, out["q25"]), (0.5, out["q50"]), (0.75, out["q75"])):
        assert abs(got / n - p) < 0.09, (p, got)


def test_bfs_levels_matches_python_bfs(spark):
    # Hand graph with two components and a diameter > 1: distances from
    # the min node must equal a reference BFS; the unreachable component
    # must be absent (not dist=null, not dist=max_hops).
    from collections import deque

    from atlas_upscaling_dask_spark.operators.graph import bfs_levels

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6), (6, 5), (8, 9)]
    df = spark.createDataFrame(edges, "a long, b long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, dq = {1: 0}, deque([1])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    got = {r["node"]: r["dist"] for r in bfs_levels(df, max_hops=6).collect()}
    assert got == want


def test_bfs_levels_hop_bound(spark):
    # A 10-node path with max_hops=3 keeps only nodes within 3 hops.
    from atlas_upscaling_dask_spark.operators.graph import bfs_levels

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "a long, b long"
    )
    got = {r["node"]: r["dist"] for r in bfs_levels(df, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_time_weighted_avg_step_semantics(spark):
    # Value 10 held for 3 s then 40 for 1 s: twap = (10*3 + 40*1)/4 =
    # 17.5 — the arithmetic mean (25.0) would be wrong.  A single-event
    # key reports its own value with span 0.
    import datetime as dt

    from atlas_upscaling_dask_spark.operators.resample import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 10.0),
        (2, t0 + dt.timedelta(seconds=3), 1, 40.0),
        (3, t0 + dt.timedelta(seconds=4), 1, 40.0),
        (4, t0, 2, 7.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}
    assert got[1]["twap"] == (10.0 * 3 + 40.0 * 1) / 4.0
    assert got[1]["span_us"] == 4_000_000 and got[1]["n_events"] == 3
    assert got[2]["twap"] == 7.25 and got[2]["span_us"] == 0


def test_merge_intervals_islands(spark):
    # [0,10],[5,20] merge; [20,30] touches so merges too; [40,50] is a
    # new island; key isolation holds.
    from atlas_upscaling_dask_spark.operators.resample import merge_intervals

    rows = [
        (1, 0, 10), (1, 5, 20), (1, 20, 30), (1, 40, 50),
        (2, 0, 5),
    ]
    df = spark.createDataFrame(rows, "key long, start long, end long")
    got = sorted(
        (r["key"], r["island"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df).collect()
    )
    assert got == [(1, 1, 0, 30, 3), (1, 2, 40, 50, 1), (2, 1, 0, 5, 1)]
