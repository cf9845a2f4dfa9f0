"""explode_collections / swap_xy (apps/gdalalg_vector_explode_collections.cpp,
apps/gdalalg_vector_swap_xy.cpp)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

from gdal_spark.functions import geom as G
from gdal_spark.functions import wkb as W
from gdal_spark.operators.vectorops import (
    check_geometry,
    check_ring,
    explode_collections,
    make_point,
    swap_xy,
)


def _square(x0, y0, s):
    return np.array(
        [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)],
        dtype=np.float64,
    )


def _df(spark, rows):
    schema = T.StructType(
        [T.StructField("fid", T.LongType()), T.StructField("wkb", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema=schema)


def test_explode_multipolygon(spark):
    multi = W.write_multipolygon([[_square(0, 0, 2)], [_square(10, 0, 3)]])
    single = W.write_polygon([_square(50, 50, 1)])
    df = _df(spark, [(1, bytearray(multi)), (2, bytearray(single))])

    out = explode_collections(df).toPandas().sort_values(["fid", "part_idx"])
    assert list(zip(out["fid"], out["part_idx"])) == [(1, 0), (1, 1), (2, 0)]
    areas = [G.wkb_area(bytes(b)) for b in out["wkb"]]
    assert areas == [4.0, 9.0, 1.0]
    # every exploded part is a simple polygon
    for b in out["wkb"]:
        t, _ = W.parse(bytes(b))
        assert t == W.WKB_POLYGON


def test_swap_xy_roundtrip(spark):
    poly = W.write_polygon([_square(3, 7, 2)])
    pt = W.write_point(1.5, -4.0)
    df = _df(spark, [(1, bytearray(poly)), (2, bytearray(pt))])

    out = swap_xy(df).toPandas().sort_values("fid")
    swapped_poly = bytes(out.iloc[0]["wkb"])
    assert W.bbox(swapped_poly) == (7.0, 3.0, 9.0, 5.0)
    assert G.wkb_area(swapped_poly) == 4.0  # area invariant under swap
    t, p = W.parse(bytes(out.iloc[1]["wkb"]))
    assert t == W.WKB_POINT and (p[0], p[1]) == (-4.0, 1.5)

    # swap twice == identity
    back = swap_xy(swap_xy(df)).toPandas().sort_values("fid")
    assert bytes(back.iloc[0]["wkb"]) == bytes(poly)


def test_check_ring_kernel():
    assert check_ring(_square(0, 0, 2)) is None
    bowtie = np.array(
        [(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)], dtype=np.float64
    )
    err = check_ring(bowtie)
    assert err == ("self-intersection", 1.0, 1.0)
    dup = np.array(
        [(0, 0), (2, 0), (2, 0), (2, 2), (0, 2), (0, 0)], dtype=np.float64
    )
    assert check_ring(dup) == ("repeated point", 2.0, 0.0)
    open_ring = np.array([(0, 0), (2, 0), (2, 2), (0, 2)], dtype=np.float64)
    assert check_ring(open_ring)[0] == "ring not closed"
    tiny = np.array([(0, 0), (1, 1), (0, 0)], dtype=np.float64)
    assert check_ring(tiny)[0] == "too few points in ring"


def test_check_geometry_df(spark):
    good = W.write_polygon([_square(0, 0, 2)])
    bowtie = W.write_polygon(
        [np.array([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)], dtype=np.float64)]
    )
    df = _df(spark, [(1, bytearray(good)), (2, bytearray(bowtie))])
    out = check_geometry(df).toPandas()
    assert list(out["fid"]) == [2]  # only invalid rows by default
    assert out.iloc[0]["error"] == "self-intersection"
    both = check_geometry(df, include_valid=True).toPandas()
    assert len(both) == 2


def test_make_point(spark):
    df = spark.createDataFrame(
        [(1, 3.5, -2.0), (2, 0.0, 10.0)], "fid long, px double, py double"
    )
    out = make_point(df, "px", "py").toPandas().sort_values("fid")
    t, p = W.parse(bytes(out.iloc[0]["wkb"]))
    assert t == W.WKB_POINT and (p[0], p[1]) == (3.5, -2.0)


def test_reproject_wkb_roundtrip_and_mercator(spark):
    """reproject_wkb: 4326->32631->4326 returns the original vertices to
    1e-9 deg; 4326->3857 matches the closed-form mercator columns."""
    import math

    import numpy as np

    from gdal_spark.functions.wkb import parse, write_polygon
    from gdal_spark.operators.vectorops import reproject_wkb

    ring = np.array(
        [[3.0, 48.0], [4.0, 48.0], [4.0, 49.0], [3.0, 49.0], [3.0, 48.0]]
    )
    df = spark.createDataFrame(
        [(1, bytearray(write_polygon([ring])))], "fid int, wkb binary"
    )
    back = reproject_wkb(
        reproject_wkb(df, "EPSG:4326", "EPSG:32631"), "EPSG:32631", "EPSG:4326"
    )
    _, rings = parse(bytes(back.first().wkb))
    assert np.abs(rings[0] - ring).max() < 1e-9

    merc = reproject_wkb(df, "EPSG:4326", "EPSG:3857")
    _, mrings = parse(bytes(merc.first().wkb))
    k = 6378137.0 * math.pi / 180.0
    assert abs(mrings[0][0, 0] - 3.0 * k) < 1e-6
    want_y = math.log(math.tan((90 + 48.0) * math.pi / 360.0)) / (math.pi / 180.0) * k
    assert abs(mrings[0][0, 1] - want_y) < 1e-6


def test_convert_with_t_srs(spark, tmp_path):
    """ogr2ogr -t_srs through the format dispatch: geojson -> geojson
    reprojected to web mercator."""
    import json
    import math

    from gdal_spark.sources.vector_formats import convert

    src = tmp_path / "in.geojson"
    src.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature", "properties": {"name": "p"},
            "geometry": {"type": "Point", "coordinates": [10.0, 20.0]},
        }],
    }))
    dst = str(tmp_path / "out.geojson")
    n = convert(spark, str(src), "geojson", dst, "geojson", t_srs="EPSG:3857")
    assert n == 1
    out = json.loads(open(dst).read())
    x, y = out["features"][0]["geometry"]["coordinates"]
    assert abs(x - 10.0 * 6378137.0 * math.pi / 180.0) < 1e-6
