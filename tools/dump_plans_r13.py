"""Dump .explain("formatted") plans for named suite queries (r13).

Writes plans/r13/<query>_<tag>.txt for each named query at the bench
scale factor, so before/after plan diffs of the optimization round are
committable evidence.

Usage: python tools/dump_plans_r13.py <tag> query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.session import get_spark

    spark = get_spark("dump_plans_r13")
    for name in names:
        fn = suite.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: unknown query")
            continue
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
