#!/usr/bin/env python
"""Round-10 sf-soak of the two heaviest un-soaked rows (r9 verdict #4).

* ``dedup_canonical_quality`` — the suite's slowest row (ngram-Jaccard
  pair generation + cluster-bucketed quality election): sf0.1 vs the
  resampled 10× sf1 corpus from ``tools/soak_sf1.py``.
* ``zarr3_4x_shard_export`` — the suite's noisiest row: the 2.46 GB
  bench shape (912,640,1056) vs 8× the voxels (1824,1280,2112 ≈
  19.7 GB logical), same chunk (57,80,132) and shard (2,2,2) geometry,
  so shard assembly is exercised at 8× the shard count with identical
  one-shard-in-memory bounds.

Protocol: bench.py's — 3 samples, min-of, per-sample JVM GC, untimed
warm pass first.  Run ALONE (no concurrent pytest/bench).  Prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".localdata", "sf1")


def main() -> None:
    # path insert must precede the import for `python -m tools.soak_r10`
    # to work (r10 advice: it was dead code below the import)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from soak_sf1 import generate_sf1  # same 10x corpus, same seed

    generate_sf1()

    from pyspark.sql import functions as F

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.session import get_spark
    from atlas_upscaling_dask_spark.sinks.zarr3 import write_zarr3
    from atlas_upscaling_dask_spark.volume import VolumeMeta, synthetic_chunks

    spark = get_spark("soak_r10")
    spark.range(1_000_000).agg(F.sum("id")).collect()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, runs: int = 3) -> list[float]:
        out = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 3))
        return out

    results: dict[str, dict] = {}

    # --- dedup_canonical_quality at 10x documents
    q = suite.QUERIES["dedup_canonical_quality"]
    force(q(spark, SF01))  # warm
    s = timed(lambda: force(q(spark, SF01)))
    force(q(spark, SF1))  # warm the big side too
    b = timed(lambda: force(q(spark, SF1)))
    results["dedup_canonical_quality"] = {
        "sf0.1_sec": min(s), "sf1_sec": min(b), "data_ratio": 10,
        "time_ratio": round(min(b) / min(s), 2),
        "spread": {"sf0.1": s, "sf1": b},
    }
    print(f"dedup_canonical_quality: {min(s)} -> {min(b)}", file=sys.stderr)

    # --- zarr3 sharded export at 8x voxels
    def export_row(scale_axes: int) -> list[float]:
        meta = VolumeMeta(
            912 * scale_axes, 640 * scale_axes, 1056 * scale_axes
        )
        chunks = synthetic_chunks(spark, meta, chunk=(57, 80, 132))
        zdir = tempfile.mkdtemp(prefix=f"soak_z3_{scale_axes}x_")
        try:
            path0 = os.path.join(zdir, "warm.zarr")
            write_zarr3(chunks, path0, meta, shard=(2, 2, 2))  # warm
            shutil.rmtree(path0, ignore_errors=True)
            out: list[float] = []
            for i in range(3):
                spark.sparkContext._jvm.System.gc()
                p = os.path.join(zdir, f"v{i}.zarr")
                t0 = time.perf_counter()
                write_zarr3(chunks, p, meta, shard=(2, 2, 2))
                out.append(round(time.perf_counter() - t0, 3))
                shutil.rmtree(p, ignore_errors=True)
            return out
        finally:
            shutil.rmtree(zdir, ignore_errors=True)

    s = export_row(1)
    b = export_row(2)
    results["zarr3_4x_shard_export"] = {
        "1x_sec": min(s), "8x_sec": min(b), "data_ratio": 8,
        "time_ratio": round(min(b) / min(s), 2),
        "spread": {"1x": s, "8x": b},
    }
    print(f"zarr3_shard_export: {min(s)} -> {min(b)}", file=sys.stderr)
    print(json.dumps({"soak_r10": results}, sort_keys=True))


if __name__ == "__main__":
    main()
