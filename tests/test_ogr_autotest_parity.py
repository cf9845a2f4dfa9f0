"""OGR SQL / spatial-filter parity with the reference's own autotest suite.

Loads the reference's canonical test layers (autotest/ogr/data/poly.shp,
idlink.dbf) through THIS engine's shapefile/dBase readers and re-runs the
ogr_sql_test.py / ogr_basic_test.py expectations through Spark SQL —
feature counts, exact result lists, aggregate values, spatial filter.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

OGR_DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(OGR_DATA), reason="reference autotest data not present"
)


@pytest.fixture(scope="module")
def views(spark):
    from gdal_spark.sources.vector_formats import read_dbf, read_shapefile

    poly = read_shapefile(spark, os.path.join(OGR_DATA, "poly.shp"))
    poly.createOrReplaceTempView("poly")
    idlink = read_dbf(spark, os.path.join(OGR_DATA, "idlink.dbf"))
    idlink.createOrReplaceTempView("idlink")
    return spark


def test_ogr_sql_1_attribute_filter(views):
    assert views.sql("SELECT * FROM poly WHERE eas_id < 167").count() == 3
    assert views.sql("SELECT * FROM poly").count() == 10


def test_ogr_sql_2_distinct(views):
    got = {
        r[0]
        for r in views.sql(
            "select distinct eas_id from poly where eas_id < 170"
        ).collect()
    }
    assert got == {168, 169, 166, 158, 165}


def test_ogr_sql_3_order_by(views):
    asc = [
        r[0]
        for r in views.sql(
            "select distinct eas_id from poly where eas_id < 170 order by eas_id"
        ).collect()
    ]
    assert asc == [158, 165, 166, 168, 169]
    desc = [
        r[0]
        for r in views.sql(
            "select distinct eas_id from poly where eas_id < 170 "
            "order by eas_id desc"
        ).collect()
    ]
    assert desc == [169, 168, 166, 165, 158]


def test_ogr_sql_4_distinct_strings(views):
    got = [
        r[0]
        for r in views.sql(
            "select distinct name from idlink order by name asc"
        ).collect()
    ]
    assert got == ["_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"]


def test_ogr_sql_5_column_functions(views):
    row = views.sql(
        "select max(eas_id) a, min(eas_id) b, avg(eas_id) c, "
        "stddev_pop(eas_id) d, stddev_samp(eas_id) e, "
        "sum(eas_id) f, count(eas_id) g from idlink"
    ).collect()[0]
    assert row["a"] == 179
    assert row["b"] == 158
    assert row["c"] == pytest.approx(168.142857142857, abs=1e-12)
    assert row["d"] == pytest.approx(5.9384599116647205, rel=1e-12)
    assert row["e"] == pytest.approx(6.414269805898183, rel=1e-12)
    assert row["f"] == 1177
    assert row["g"] == 7


def test_ogr_sql_6_count_star(views):
    assert views.sql("select count(*) from poly").collect()[0][0] == 10


def test_ogr_sql_7_fid(views):
    got = sorted(
        r[0]
        for r in views.sql(
            "select fid from poly where eas_id in (158,165)"
        ).collect()
    )
    assert got == [7, 8]


def test_ogr_sql_8_wildcard_in(views):
    got = sorted(
        r["PRFEDEA"]
        for r in views.sql("select * from poly where eas_id in (158,165)").collect()
    )
    assert got == ["35043369", "35043408"]


def test_ogr_sql_15_fid_lookup(views):
    rows = views.sql(
        "select fid, eas_id, PRFEDEA from poly where fid = 7"
    ).collect()
    assert len(rows) == 1 and rows[0]["fid"] == 7


def test_ogr_basic_spatial_filter(views):
    """ogr_basic_test.py test_ogr_basic_2: rect (479405, 4762826)-
    (480732, 4763590) intersects exactly ONE poly.shp feature."""
    from gdal_spark.functions import geom as G

    rows = views.sql("select fid, wkb from poly").collect()
    hits = [
        r["fid"]
        for r in rows
        if G.boxes_intersect_wkb(
            np.array([479405.0]), np.array([4762826.0]),
            np.array([480732.0]), np.array([4763590.0]),
            bytes(r["wkb"]),
        )[0]
    ]
    assert len(hits) == 1


def test_poly_shp_geometry_roundtrip(views):
    """Decoded ring areas match the layer's own AREA attribute (shapefile
    convention: |signed area|; fid 8 carries a negative AREA in the dbf)."""
    from gdal_spark.functions import geom as G

    rows = views.sql("select fid, wkb, AREA from poly").collect()
    assert len(rows) == 10
    for r in rows:
        got = G.wkb_area(bytes(r["wkb"]))
        assert got == pytest.approx(abs(r["AREA"]), rel=1e-3)


# ---------------------------------------------------------------------------
# ogr_sql_rfc28.py — expression-evaluation cases on poly.shp
# ---------------------------------------------------------------------------


def test_rfc28_expressions(views):
    cases = [
        ("SELECT * FROM poly WHERE 160+7 > eas_id", 3),  # rfc28_1
        ("SELECT * FROM poly WHERE CONCAT('x', PRFEDEA) = 'x35043423'", 1),
        ("SELECT * FROM poly WHERE 'x' || PRFEDEA = 'x35043423'", 1),  # '+' on strings
        ("SELECT * FROM poly WHERE EAS_ID % 5 = 1", 2),  # rfc28_4
        ('SELECT * FROM poly WHERE `EAS_ID` = 166', 1),  # quoted field
    ]
    for sql, expected in cases:
        assert views.sql(sql).count() == expected, sql


def test_rfc28_14_substr(views):
    got = sorted(
        r[0]
        for r in views.sql(
            "SELECT SUBSTR(PRFEDEA, 4, 5) FROM poly WHERE eas_id IN (168,179)"
        ).collect()
    )
    assert got == ["43411", "43423"]


def test_rfc28_15_concat_cast(views):
    got = sorted(
        r[0]
        for r in views.sql(
            "SELECT CONCAT(PRFEDEA, ' ', CAST(EAS_ID AS STRING)) "
            "FROM poly WHERE eas_id IN (168,179)"
        ).collect()
    )
    assert got == ["35043411 168", "35043423 179"]


def test_rfc28_16_negative_numbers(views):
    row = views.sql(
        "SELECT -1 AS a, 4 AS b, -3 AS c, 0.2 AS d, 2 AS e FROM poly LIMIT 1"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"], row["e"]) == (-1, 4, -3, 2)
    assert float(row["d"]) == pytest.approx(0.2)  # Spark literals are Decimal


def test_rfc28_arithmetic_precedence(views):
    # ogr_sql_rfc28: 'select -intfield + 1 + 2 * 3 + 5 - 3 * 2' == 4
    # with intfield == 0 here: -eas_id + eas_id + 1 + 2*3 + 5 - 3*2 == 6
    row = views.sql(
        "SELECT -eas_id + eas_id + 1 + 2 * 3 + 5 - 3 * 2 AS v FROM poly LIMIT 1"
    ).collect()[0]
    assert row["v"] == 6


# ---------------------------------------------------------------------------
# autotest/utilities/test_gdal_grid_lib.py test 1 — full circle through the
# DISTRIBUTED engine: n43's pixels become a point layer; a nearest-neighbor
# grid over the same nodes must reproduce the raster bit-exactly.
# ---------------------------------------------------------------------------


def test_gdal_grid_lib_1_nearest_roundtrip(spark):
    import numpy as np

    from gdal_spark.functions import checksum as CK
    from gdal_spark.functions import tiff
    from gdal_spark.operators import knn as KNN

    arr, meta = tiff.tiff_parse(
        open("/root/reference/autotest/gdrivers/data/n43.tif", "rb").read()
    )
    gt = meta["geotransform"]
    # every 3rd pixel keeps the roundtrip genuine at ~20x less work
    arr = arr[::3, ::3]
    h, w = arr.shape
    ys, xs = np.mgrid[0:121:3, 0:121:3]
    px = gt[0] + (xs + 0.5) * gt[1]
    py = gt[3] + (ys + 0.5) * gt[5]
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pt_id": np.arange(h * w, dtype=np.int64),
                "x": px.ravel(),
                "y": py.ravel(),
                "z": arr.astype(np.int64).ravel(),
            }
        )
    )
    qrs = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(h * w, dtype=np.int64),
                "qx": px.ravel(),
                "qy": py.ravel(),
            }
        )
    )
    nn = KNN.knn_join_cells(pts, qrs, k=1, res=6, ring=1).select(
        "query_id", "z"
    )
    out = nn.toPandas().sort_values("query_id")["z"].to_numpy()
    grid = out.reshape(h, w).astype(np.int16)
    assert np.array_equal(grid, arr)
    assert CK.checksum(grid.astype(np.int32)) == CK.checksum(
        arr.astype(np.int32)
    )
