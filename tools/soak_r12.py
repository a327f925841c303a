#!/usr/bin/env python
"""sf0.1 → sf1 soak for the round-12 additions (r11 verdict #8).

Round-12 changed the per-document PDF kernel cost profile (CID
/ToUnicode CMap resolution on every third group; standard-security-
handler authentication + RC4/AES decryption on every seventh, cycling
all four cipher flavors) and added the compressed TFRecord transports.
This harness proves the repartition-from-work shape still holds at
10× documents for:

* ``pdf_info``              — census incl. cipher label + decrypted
                              Producer string
* ``pdf_text_extract``      — full 100%-coverage extraction (plain +
                              CID + encrypted×4 flavors)
* ``tfrecord_roundtrip_gzip`` — export + scan through the gzip member
* ``warc_zstd_scan``        — .warc.zst container x HTTP coding
* ``warc_cdx_index``        — CDXJ capture-index build (SURT + offsets)

Protocol: bench.py's — 3 samples, min-of, per-sample JVM GC, untimed
warm pass; sf1 corpus from tools/soak_sf1.generate_sf1 (same 10×
resample, seed 1042).  Run it ALONE (no concurrent pytest/bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".localdata", "sf1")

ROWS = [
    "pdf_info",
    "pdf_text_extract",
    "tfrecord_roundtrip_gzip",
    # late round-12 additions: transport matrix + capture index
    "warc_zstd_scan",
    "warc_cdx_index",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from soak_sf1 import generate_sf1  # same 10x corpus, same seed

    generate_sf1()

    from pyspark.sql import functions as F

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.session import get_spark

    spark = get_spark("soak_r12")
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
    for name in ROWS:
        q = suite.QUERIES[name]
        force(q(spark, SF01))  # warm
        s = timed(lambda q=q: force(q(spark, SF01)))
        force(q(spark, SF1))
        b = timed(lambda q=q: force(q(spark, SF1)))
        results[name] = {
            "sf0.1_sec": min(s), "sf1_sec": min(b), "data_ratio": 10,
            "time_ratio": round(min(b) / min(s), 2),
            "spread": {"sf0.1": s, "sf1": b},
        }
        print(f"{name}: {min(s)} -> {min(b)}", file=sys.stderr)
    print(json.dumps({"soak_r12": results}, sort_keys=True))


if __name__ == "__main__":
    main()
