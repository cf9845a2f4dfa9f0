"""SQLite/SpatiaLite vector driver vs the reference's own fixtures
(autotest/ogr/data/sqlite/, expectations from autotest/ogr/ogr_sqlite.py
and the shapefile the fixtures were loaded from)."""

import sqlite3

import numpy as np
import pytest

from gdal_spark.functions import wkb as W
from gdal_spark.sources import spatialite as S

DATA = "/root/reference/autotest/ogr/data/sqlite"
POLY_SHP = "/root/reference/autotest/ogr/data/poly.shp"

# ogr_sql_test.py expected EAS_ID scan order for poly
EAS_IDS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]


def test_list_layers_v3_and_v4():
    v3 = S.list_layers(f"{DATA}/poly_spatialite.sqlite")
    assert v3 == [
        {"table": "poly", "geom_col": "GEOMETRY", "type": "POLYGON",
         "srid": 32631, "format": "SpatiaLite"}
    ]
    v4 = S.list_layers(f"{DATA}/poly_spatialite4.sqlite")
    assert v4[0]["type"] == "POLYGON" and v4[0]["srid"] == 325834


def _fixture_geoms(name, geom_col="GEOMETRY", order="OGC_FID"):
    con = sqlite3.connect(f"{DATA}/{name}")
    try:
        rows = con.execute(
            f"SELECT {geom_col}, eas_id FROM poly ORDER BY {order}"
        ).fetchall()
    finally:
        con.close()
    return rows


def test_poly_spatialite_decode_vs_shapefile():
    # the fixture is poly.shp loaded into spatialite with COMPRESS_GEOM:
    # first/last ring vertices are exact doubles, intermediates are
    # float32 deltas -> compare against the shapefile within that budget
    rows = _fixture_geoms("poly_spatialite.sqlite")
    assert [int(r[1]) for r in rows] == EAS_IDS
    import struct as _s

    shp_polys = []
    with open(POLY_SHP, "rb") as fh:
        data = fh.read()
    pos = 100
    while pos < len(data):
        (_, clen) = _s.unpack(">ii", data[pos : pos + 8])
        from gdal_spark.sources.vector_formats import _parse_shp_record

        shp_polys.append(_parse_shp_record(data[pos + 8 : pos + 8 + 2 * clen]))
        pos += 8 + 2 * clen
    assert len(shp_polys) == len(rows) == 10
    for (blob, _), shp_wkb in zip(rows, shp_polys):
        srid, wkb = S.spatialite_to_wkb(blob)
        assert srid == 32631
        a = np.vstack([r for p in W.polygon_rings(wkb) for r in p])
        b = np.vstack([r for p in W.polygon_rings(shp_wkb) for r in p])
        assert a.shape == b.shape
        assert np.allclose(a, b, atol=0.51)  # float32 delta quantization
        # first and last vertex of each ring are stored uncompressed
        ra = W.polygon_rings(wkb)[0][0]
        rb = W.polygon_rings(shp_wkb)[0][0]
        assert np.array_equal(ra[0], rb[0]) and np.array_equal(ra[-1], rb[-1])


def test_poly_spatialite4_uncompressed_decode():
    rows = _fixture_geoms("poly_spatialite4.sqlite", geom_col="geometry")
    srid, wkb = S.spatialite_to_wkb(rows[0][0])
    assert srid == 325834
    rings = W.polygon_rings(wkb)
    assert len(rings) == 1 and len(rings[0][0]) == 20


def test_roundtrip_exact_uncompressed():
    rows = _fixture_geoms("poly_spatialite.sqlite")
    for blob, _ in rows:
        srid, wkb = S.spatialite_to_wkb(blob)
        again = S.wkb_to_spatialite(wkb, srid)
        srid2, wkb2 = S.spatialite_to_wkb(again)
        assert srid2 == srid and wkb2 == wkb


def test_roundtrip_compressed():
    rows = _fixture_geoms("poly_spatialite.sqlite")
    for blob, _ in rows:
        srid, wkb = S.spatialite_to_wkb(blob)
        srid2, wkb2 = S.spatialite_to_wkb(
            S.wkb_to_spatialite(wkb, srid, compressed=True)
        )
        a = np.vstack([r for p in W.polygon_rings(wkb) for r in p])
        b = np.vstack([r for p in W.polygon_rings(wkb2) for r in p])
        assert np.allclose(a, b, atol=0.51)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[-1], b[-1])


def test_multi_and_point_blobs():
    # multipolygon with 0x69 sub-geometry markers, point, linestring Z
    mp = W.write_multipolygon(
        [
            [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]])],
            [np.array([[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 10.0]])],
        ]
    )
    srid, back = S.spatialite_to_wkb(S.wkb_to_spatialite(mp, 4326))
    assert srid == 4326 and back == mp
    pt = W.write_point(3.5, -7.25)
    assert S.spatialite_to_wkb(S.wkb_to_spatialite(pt, 31370))[1] == pt
    lsz = W.write_linestring_z(np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]]))
    assert S.spatialite_to_wkb(S.wkb_to_spatialite(lsz, 0))[1] == lsz


def test_read_spatialite_spark(spark):
    df = S.read_spatialite(spark, f"{DATA}/poly_spatialite.sqlite")
    rows = df.orderBy("fid").collect()
    assert len(rows) == 10
    assert [int(r.eas_id) for r in rows] == EAS_IDS
    assert all(r.srid == 32631 for r in rows)
    assert rows[0].prfedea == "35043411"
    rings = W.polygon_rings(bytes(rows[0].wkb))
    assert len(rings[0][0]) == 20


def test_read_null_geometry_spark(spark):
    # first_geometry_null.db: row 1 has NULL geometry (regression fixture)
    df = S.read_spatialite(spark, f"{DATA}/first_geometry_null.db")
    rows = df.orderBy("fid").collect()
    assert rows[0].wkb is None
    assert rows[1].wkb is not None


def test_write_read_roundtrip_spark(spark, tmp_path):
    src = S.read_spatialite(spark, f"{DATA}/poly_spatialite.sqlite")
    out = str(tmp_path / "out.sqlite")
    n = S.write_spatialite(
        src.select("wkb", "area", "eas_id", "prfedea"),
        out, layer="poly", srid=32631, geom_type="POLYGON",
    )
    assert n == 10
    back = S.read_spatialite(spark, out).orderBy("fid").collect()
    orig = src.orderBy("fid").collect()
    assert [bytes(r.wkb) for r in back] == [bytes(r.wkb) for r in orig]
    assert [r.eas_id for r in back] == [r.eas_id for r in orig]
    # and the OGR-SQLite plain-WKB dialect
    out2 = str(tmp_path / "wkbfmt.sqlite")
    S.write_spatialite(
        src.select("wkb", "eas_id"), out2, layer="poly", srid=32631,
        spatialite=False,
    )
    assert S.list_layers(out2)[0]["format"] == "WKB"
    back2 = S.read_spatialite(spark, out2).orderBy("fid").collect()
    assert [bytes(r.wkb) for r in back2] == [bytes(r.wkb) for r in orig]
