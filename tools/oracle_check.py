"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__ at a given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count + sorted-by-name
column schema + order-insensitive value comparison (rounded).

Usage: python tools/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    import __spark_entry__ as E
    from gdal_spark.session import get_session

    spark = get_session(master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]"))
    con = duck_con(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {str(exc)[:500]}")
            continue
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"duckdb error: {exc}"))
            print(f"FAIL {name}: duckdb error: {str(exc)[:500]}")
            continue
        if len(sdf) != len(odf):
            failed.append((name, f"row count {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: row count {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failed.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=2e-4)
            passed.append(name)
            print(f"PASS {name}: {len(sdf)} rows")
        except AssertionError as exc:
            failed.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch\n{str(exc)[:800]}")
            mism = a.compare(b) if a.shape == b.shape else None
            if mism is not None and not mism.empty:
                print(mism.head(5))
    print(
        f"\n== {len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} failed =="
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
