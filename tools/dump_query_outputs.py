"""Dump suite query outputs for old-vs-new equivalence diffs (r12).

Writes each named query's full result, sorted by every column, as a
single CSV under the given directory.  Run it before and after an
optimization (via git stash) and diff the files: byte-identical CSVs
prove the restructured query computes the same thing at that scale.

Usage: python tools/dump_query_outputs.py <out_dir> query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.session import get_spark

    spark = get_spark("dump_query_outputs")
    for name in names:
        fn = suite.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: unknown query")
            continue
        df = fn(spark, SF_DIR)
        pdf = df.toPandas()
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        if len(pdf):
            pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
        # repr floats at full precision so a ulp-level change shows up
        path = os.path.join(out_dir, f"{name}.csv")
        pdf.to_csv(path, index=False, float_format="%.17g")
        print(f"wrote {path} rows={len(pdf)}")


if __name__ == "__main__":
    main()
