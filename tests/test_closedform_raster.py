"""Closed-form oracle-backed raster contract queries: run each Spark query
at sf0.001 and compare against its DuckDB oracle exactly like the driver
does (row count + sorted-column schema + rounded value compare)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from gdal_spark.queries import (
    closedform_dem,
    closedform_misc,
    closedform_morph,
    closedform_raster,
    closedform_vector,
)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "nation.parquet")),
    reason="testdata not present",
)

ALL = {
    name: (mod.SPARK[name], mod.ORACLE[name])
    for mod in (closedform_raster, closedform_vector, closedform_morph, closedform_dem, closedform_misc)
    for name in mod.SPARK
}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ALL))
def test_closedform_matches_duckdb(spark, name):
    fn, osql = ALL[name]
    got = _normalize(fn(spark, SF).toPandas())
    con = duckdb.connect()
    for t in ("nation", "region", "lineitem"):
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    want = _normalize(con.execute(osql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    num = {c: "float64" for c in got.columns if got[c].dtype.kind in "if"}
    pd.testing.assert_frame_equal(
        got.astype(num), want.astype(num), check_dtype=False, atol=1e-9
    )
