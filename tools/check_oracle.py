"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and values (columns sorted by name, rows sorted by all columns)
— the same shape as the driver's order-insensitive hash compare.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duckdb={len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duckdb={dcols}")
    if problems:
        return problems
    s, d = normalize(sdf), normalize(ddf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {col}: {len(bad)}/{len(sv)} mismatches; first row {i}: "
                f"spark={a!r} ({type(a).__name__}) duckdb={b!r} ({type(b).__name__})"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from atlas_upscaling_dask_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(sdf)} rows)")
            n_weak += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
