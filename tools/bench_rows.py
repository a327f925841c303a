"""Isolated per-row timing harness for optimization iteration (r12).

Times a named subset of suite queries with the exact bench.py
methodology — warm JVM + worker pool, per-sample System.gc(), noop
sink, best-of-N with the full spread printed — so a candidate
optimization can be measured on one row in seconds instead of
re-running the whole 67-row suite.

Usage: python tools/bench_rows.py [--runs N] [--sf DIR] row [row ...]

Row names are suite.QUERIES keys.  This is a developer tool only; the
driver contract bench remains bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.operators.upscale import upscale_chunks
    from atlas_upscaling_dask_spark.session import get_spark
    from atlas_upscaling_dask_spark.volume import VolumeMeta, synthetic_chunks

    spark = get_spark("bench_rows")
    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = synthetic_chunks(spark, VolumeMeta(32, 32, 32), chunk=(8, 32, 32))
    warm_df = upscale_chunks(warm, 2)
    warm_df.write.format("noop").mode("overwrite").save()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    for name in args.rows:
        fn = suite.QUERIES.get(name)
        if fn is None:
            out[name] = "unknown row"
            continue
        spark.sparkContext.setJobDescription(f"bench_rows:{name}")
        # untimed warm pass so JIT/worker-fork debt stays out of sample 1
        try:
            force(fn(spark, args.sf))
        except Exception as e:  # noqa: BLE001 — harness guard
            out[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        t_runs = []
        for _ in range(max(args.runs, 2)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            force(fn(spark, args.sf))
            t_runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(t_runs), "spread": t_runs}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
