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
