"""Closed-form oracle-backed raster contract queries: run each Spark query
at sf0.001 and compare against its DuckDB oracle exactly like the driver
does (row count + sorted-column schema + rounded value compare)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from gdal_spark.queries import closedform_raster as CF

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "nation.parquet")),
    reason="testdata not present",
)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(CF.SPARK))
def test_closedform_matches_duckdb(spark, name):
    got = _normalize(CF.SPARK[name](spark, SF).toPandas())
    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from '{SF}/nation.parquet'"
    )
    want = _normalize(con.execute(CF.ORACLE[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype({c: "float64" for c in got.columns}),
        want.astype({c: "float64" for c in want.columns}),
        atol=1e-9,
    )
