"""Round-4 additions: HyperLogLog sketches, seasonal decomposition,
distributed covariance / PCA over embeddings."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_estimate_within_error(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        hll_estimate_expr,
        hll_sketch,
    )

    n = 5000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    sk = hll_sketch(df, "v", ["g"], b=8)
    est = sk.select(hll_estimate_expr("sketch", 8).alias("e")).collect()[0]["e"]
    # RSE ~ 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma.
    assert abs(est - n) / n < 0.26


def test_hll_duplicates_cannot_move_registers(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import hll_sketch

    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_sketch(base, "v", ["g"], b=8).collect()[0]["sketch"]
    b = hll_sketch(dup, "v", ["g"], b=8).collect()[0]["sketch"]
    assert a == b


def test_hll_merge_equals_direct(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import hll_merge, hll_sketch

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("child"), (F.col("id") % 911).alias("v")
    )
    fine = hll_sketch(df, "v", ["child"], b=8).withColumn("root", F.lit(1))
    merged = hll_merge(fine, ["root"]).collect()[0]["sketch"]
    direct = (
        hll_sketch(df.withColumn("root", F.lit(1)), "v", ["root"], b=8)
        .collect()[0]["sketch"]
    )
    assert merged == direct  # per-bucket max is associative over refinement


def test_hll_small_range_uses_linear_counting(spark):
    from atlas_upscaling_dask_spark.extensions.sketches import (
        hll_estimate_expr,
        hll_sketch,
    )

    n = 30  # far below 2.5·m = 640: the corrected path must engage
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    sk = hll_sketch(df, "v", ["g"], b=8)
    row = sk.select(
        hll_estimate_expr("sketch", 8, correct_small=True).alias("lc"),
        hll_estimate_expr("sketch", 8, correct_small=False).alias("raw"),
        F.size("sketch").alias("nonempty"),
    ).collect()[0]
    m = 256
    zeros = m - row["nonempty"]
    # ln() is libm: JVM and numpy may differ in the last ulp (the
    # documented reason exactness-gated oracles compare the raw form)
    assert abs(row["lc"] - m * float(np.log(m / zeros))) < 1e-9
    # linear counting is near-exact at tiny cardinalities
    assert abs(row["lc"] - n) / n < 0.10
    assert row["lc"] != row["raw"]


def test_hll_harmonic_sum_matches_python_model(spark):
    """Registers and the integer harmonic sum vs a plain-Python HLL
    built from the same md5 contract."""
    import hashlib

    from atlas_upscaling_dask_spark.extensions.sketches import (
        hll_harmonic_expr,
        hll_sketch,
    )

    vals = [str(v * 7919 % 1000) for v in range(900)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = hll_sketch(df.withColumn("g", F.lit(1)), "v", ["g"], b=8)
    row = sk.select("sketch", hll_harmonic_expr("sketch", 8).alias("s")).collect()[0]

    regs = {}
    for v in set(vals):
        h = hashlib.md5(v.encode()).hexdigest()
        bucket = int(h[:2], 16)
        sub = int(h[2:15], 16)
        rho = 53 if sub == 0 else 53 - sub.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    want_sketch = sorted(regs.items())
    want_s = (256 - len(regs)) * (1 << 53) + sum(
        1 << (53 - r) for r in regs.values()
    )
    assert [(e["bucket"], e["rho"]) for e in row["sketch"]] == want_sketch
    assert row["s"] == want_s


def test_hll_rejects_unaligned_b(spark):
    import pytest

    from atlas_upscaling_dask_spark.extensions.sketches import hll_sketch

    df = spark.range(3).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    for bad in (3, 6, 12):
        with pytest.raises(ValueError):
            hll_sketch(df, "v", ["g"], b=bad)


# ---------------------------------------------------------------------------
# Seasonal decomposition
# ---------------------------------------------------------------------------


def test_seasonal_decompose_recovers_planted_profile(spark):
    """A clean signal level + phase-profile must decompose exactly:
    residual 0 everywhere, seasonal = planted offset - its mean."""
    import datetime

    from atlas_upscaling_dask_spark.operators.resample import seasonal_decompose

    day_us = 86_400_000_000
    offsets = {0: 10.0, 1: -4.0, 2: 0.0, 3: -6.0}  # 4-phase profile
    level = 100.0
    rows = []
    eid = 0
    for day in range(5):
        for ph, off in offsets.items():
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=day, hours=6 * ph
            )
            rows.append((eid, ts, "t", level + off))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = seasonal_decompose(
        df, period_us=day_us, n_phases=4
    ).collect()
    mean_off = sum(offsets.values()) / len(offsets)
    for r in out:
        assert r["level"] == level + mean_off
        assert r["seasonal"] == offsets[r["phase"]] - mean_off
        assert r["residual"] == 0.0
        assert r["value"] == r["level"] + r["seasonal"] + r["residual"]


def test_seasonal_decompose_residual_identity_and_plan(spark):
    """On arbitrary data: value ≈ level + seasonal + residual (the sum
    telescopes algebraically; IEEE non-associativity leaves ulp-level
    error), and the two stats joins are broadcasts (scan side never
    shuffles)."""
    import datetime

    from atlas_upscaling_dask_spark.operators.resample import seasonal_decompose

    rows = [
        (
            i,
            datetime.datetime(2024, 3, 1) + datetime.timedelta(minutes=37 * i),
            "ab"[i % 2],
            float((i * 193) % 47) / 7.0,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = seasonal_decompose(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    for r in out.collect():
        assert abs(r["level"] + r["seasonal"] + r["residual"] - r["value"]) < 1e-9


def test_seasonal_decompose_rejects_bad_phases(spark):
    import pytest

    from atlas_upscaling_dask_spark.operators.resample import seasonal_decompose

    df = spark.range(1).select(
        F.col("id").alias("event_id"),
        F.current_timestamp().alias("ts"),
        F.lit("t").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(ValueError):
        seasonal_decompose(df, n_phases=0)
    with pytest.raises(ValueError):
        seasonal_decompose(df, period_us=3, n_phases=10)


# ---------------------------------------------------------------------------
# Covariance / PCA
# ---------------------------------------------------------------------------


def _toy_vectors(spark, n=120, d=6, seed=7, parts=1):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    base[:, 0] = base[:, 1] * 2.0 + rng.normal(scale=0.1, size=n)  # correlated
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return (df.repartition(parts) if parts > 1 else df), base


def test_embedding_covariance_matches_integer_model(spark):
    """The distributed moments must equal a plain-Python scaled-integer
    model EXACTLY — sums, counts, and the final division."""
    from atlas_upscaling_dask_spark.extensions.linalg import embedding_covariance

    df, base = _toy_vectors(spark)
    b = 20
    scale = float(1 << b)
    sc = base * scale
    x = (np.sign(sc) * np.floor(np.abs(sc) + 0.5)).astype(np.int64)
    got = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["sx"], r["sy"], r["cov"])
        for r in embedding_covariance(df, scale_bits=b).collect()
    }
    n, d = x.shape
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            sxy = int(x[:, i] @ x[:, j])
            sx, sy = int(x[:, i].sum()), int(x[:, j].sum())
            cov = float(n * sxy - sx * sy) / float(n * (n - 1) * (1 << (2 * b)))
            assert got[(i, j)] == (n, sxy, sx, sy, cov)


def test_embedding_covariance_partition_independent(spark):
    from atlas_upscaling_dask_spark.extensions.linalg import embedding_covariance

    df1, _ = _toy_vectors(spark, parts=1)
    df7, _ = _toy_vectors(spark, parts=7)
    a = sorted(map(tuple, embedding_covariance(df1).collect()))
    b = sorted(map(tuple, embedding_covariance(df7).collect()))
    assert a == b  # integer partials are associative


def test_embedding_covariance_block_split_stays_exact(spark):
    """Unnormalized large-magnitude vectors: |x|²·rows would wrap int64
    in a single GEMM, so the kernel must split the batch into safe
    blocks and still produce the EXACT integer moments (verified
    against arbitrary-precision Python ints)."""
    from atlas_upscaling_dask_spark.extensions.linalg import embedding_covariance

    # |v|=2850 at scale_bits=20 → |x| ~ 2.99e9, |x|² ~ 8.9e18: one row
    # fits int64 but TWO would overflow — forces one-row blocks.
    rng = np.random.default_rng(11)
    base = rng.uniform(-2000.0, 2000.0, size=(40, 3))
    base[0, 0] = 2850.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = 20
    sc = base * float(1 << b)
    x = (np.sign(sc) * np.floor(np.abs(sc) + 0.5)).astype(np.int64)
    got = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["sx"], r["sy"])
        for r in embedding_covariance(df.coalesce(1), scale_bits=b).collect()
    }
    xs = [[int(v) for v in row] for row in x]  # python ints: no wrap
    n, d = x.shape
    for i in range(d):
        for j in range(i, d):
            sxy = sum(r[i] * r[j] for r in xs)
            sx = sum(r[i] for r in xs)
            sy = sum(r[j] for r in xs)
            assert got[(i, j)] == (n, sxy, sx, sy)


def test_embedding_covariance_rejects_single_row_overflow(spark):
    """A magnitude the bound can't admit even for ONE row must be a
    hard error, never a silently wrapped covariance."""
    import pytest

    from atlas_upscaling_dask_spark.extensions.linalg import embedding_covariance

    # |x| ~ 3.2e12 at scale_bits=20 → |x|² ~ 1e25 >> 2^63
    df = spark.createDataFrame(
        [(1, [3.1e6, 1.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="int64-exact bound|exceeds"):
        embedding_covariance(df.coalesce(1), scale_bits=20).collect()


def test_embedding_covariance_rejects_ragged_and_null(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from atlas_upscaling_dask_spark.extensions.linalg import embedding_covariance

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises((Py4JJavaError, Exception)):
        embedding_covariance(bad.coalesce(1)).collect()
    nullv = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises((Py4JJavaError, Exception)):
        embedding_covariance(nullv.coalesce(1)).collect()


def test_pca_fit_matches_numpy(spark):
    from atlas_upscaling_dask_spark.extensions.linalg import pca_fit

    df, base = _toy_vectors(spark)
    m = pca_fit(df, k=3)
    comps, ev = m["components"], m["eigenvalues"]
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # descending eigenvalues, all >= 0 (covariance is PSD)
    assert ev[0] >= ev[1] >= ev[2] >= -1e-12
    # numpy PCA on the same data agrees up to the sign convention
    # (covariance differs only by the 2^-40 quantization)
    cov_np = np.cov(base, rowvar=False)
    w, v = np.linalg.eigh(cov_np)
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T
    signs = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * signs[:, None]
    assert np.allclose(comps, ref, atol=1e-4)
    assert np.allclose(ev, w[order], atol=1e-6)
    assert np.allclose(m["mean"], base.mean(axis=0), atol=1e-5)


def test_pca_project_matches_numpy_and_is_narrow(spark):
    from atlas_upscaling_dask_spark.extensions.linalg import pca_fit, pca_project

    df, base = _toy_vectors(spark)
    m = pca_fit(df, k=2)
    out = pca_project(df, m)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle projection
    got = {r["vec_id"]: np.array(r["pc"]) for r in out.collect()}
    want = (base - m["mean"]) @ m["components"].T
    for i in range(len(base)):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_pca_topk_recall_against_exact(spark):
    """Recall on LOW-RANK data (the case PCA reduction exists for: real
    embedding corpora concentrate variance in few directions; isotropic
    noise is the documented worst case)."""
    from atlas_upscaling_dask_spark.extensions.linalg import pca_topk
    from atlas_upscaling_dask_spark.extensions.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    latent = rng.normal(size=(200, 4))
    mixing = rng.normal(size=(4, 12))
    base = latent @ mixing + rng.normal(scale=0.05, size=(200, 12))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(q, df, k=5)
    approx = pca_topk(q, df, k=5, reduce_k=6, oversample=4)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(ap) == len(ex) == 40
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.85, recall


def test_seasonal_anomalies_catches_off_profile_spike(spark):
    """A value that is normal for 9am but planted at 3am must be
    flagged by the residual screen and MISSED by the raw z-score."""
    import datetime

    from atlas_upscaling_dask_spark.operators.resample import (
        seasonal_decompose,
        zscore_outliers,
    )

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for day in range(30):
        for hour in range(24):
            base = 100.0 if 8 <= hour <= 18 else 10.0  # busy days, quiet nights
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=day, hours=hour
            )
            rows.append((eid, ts, "t", base + float(rng.normal(scale=1.0))))
            eid += 1
    # the planted anomaly: a daytime-sized value at 3am
    spike_ts = datetime.datetime(2024, 2, 5, 3)
    rows.append((eid, spike_ts, "t", 100.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    dec = seasonal_decompose(df, with_level=False)
    res_flags = {
        r["event_id"]
        for r in zscore_outliers(
            dec, threshold=3.0, value_col="residual", id_col="event_id"
        ).collect()
    }
    raw_flags = {
        r["event_id"] for r in zscore_outliers(df, threshold=3.0).collect()
    }
    assert eid in res_flags  # de-seasonalized screen catches it
    assert eid not in raw_flags  # raw z-score cannot: 100 is a normal value


def test_seasonal_decompose_with_level_false_matches_residuals(spark):
    import datetime

    from atlas_upscaling_dask_spark.operators.resample import seasonal_decompose

    rows = [
        (
            i,
            datetime.datetime(2024, 3, 1) + datetime.timedelta(minutes=91 * i),
            "t",
            float(i % 13),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    full = {r["event_id"]: r["residual"] for r in seasonal_decompose(df).collect()}
    slim = {
        r["event_id"]: r["residual"]
        for r in seasonal_decompose(df, with_level=False).collect()
    }
    assert full == slim
