"""Spark↔DuckDB output-dtype audit for every registered oracle pair.

The local value comparator (`tools/check_oracle.py`) is dtype-agnostic
(``np.int32(5) == np.int64(5)``), but the driver's correctness gate
hashes TYPED values — a Spark ``int`` against an oracle ``BIGINT`` (or
a DuckDB ``DECIMAL``/``HUGEINT`` literal against a Spark ``double``/
``bigint``) hash-mismatches even when every value is identical.  This
audit catches those latent reds without running either query: it
compares the Spark DataFrame schema against ``DESCRIBE <oracle sql>``
column-by-column.

Found on first run: 3 rows with int32-vs-BIGINT counts and 2 oracles
whose bare ``25.0``/``1.0`` literals typed as DECIMAL, all invisible
to the value comparator.

Run:  python tools/check_dtypes.py [sf_dir]     # exits 1 on mismatch
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Spark simpleString -> DuckDB DESCRIBE types that hash-compare cleanly.
COMPATIBLE = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
}


def main() -> int:
    import duckdb

    from atlas_upscaling_dask_spark import suite
    from atlas_upscaling_dask_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad, errs = [], []
    for name, sql in suite.ORACLES.items():
        try:
            duck = {r[0]: r[1] for r in con.sql(f"DESCRIBE {sql}").fetchall()}
            sdf = suite.QUERIES[name](spark, sf_dir)
            spk = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            errs.append((name, str(e).splitlines()[0][:120]))
            continue
        for col, st in spk.items():
            dt = duck.get(col)
            ok = COMPATIBLE.get(st, {st.upper()})
            if dt is None:
                bad.append((name, col, st, "MISSING IN ORACLE"))
            elif dt.upper() not in ok:
                bad.append((name, col, st, dt))
        for col in duck:
            if col not in spk:
                bad.append((name, col, "MISSING IN SPARK", duck[col]))
    for name, msg in errs:
        print(f"ERROR {name}: {msg}")
    for name, col, st, dt in bad:
        print(f"MISMATCH {name}.{col}: spark={st} duckdb={dt}")
    n = len(suite.ORACLES)
    print(f"{n - len({b[0] for b in bad}) - len(errs)}/{n} oracle pairs "
          f"dtype-aligned, {len(bad)} mismatched columns, {len(errs)} errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
