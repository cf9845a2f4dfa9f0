"""Thin schema/type verbs (gdal raster set-type, gdal vector
set-field-type / set-geom-type / rename-layer / export-schema)."""

import json

import numpy as np

from gdal_spark.functions import wkb as W
from gdal_spark.operators.schema_ops import (
    export_schema,
    rename_layer,
    set_field_type,
    set_geom_type,
    set_type_array,
)

RING = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])


def test_set_type_clamps_and_rounds():
    a = np.array([[-5.0, 0.4, 254.6, 300.0]])
    out = set_type_array(a, "Byte")
    assert out.dtype == np.uint8
    assert list(out[0]) == [0, 0, 255, 255]
    out16 = set_type_array(a, "Int16")
    assert out16.dtype == np.int16 and out16[0, 0] == -5
    f32 = set_type_array(a, "Float32")
    assert f32.dtype == np.float32 and f32[0, 3] == 300.0


def test_set_field_type(spark):
    df = spark.createDataFrame([("1", 2.7)], "a string, b double")
    out = set_field_type(set_field_type(df, "a", "Integer"), "b", "String")
    row = out.collect()[0]
    assert row.a == 1 and row.b == "2.7"
    assert dict(out.dtypes)["a"] == "int"


def test_set_geom_type_promote_demote(spark):
    poly = W.write_polygon([RING])
    multi = W.write_multipolygon([[RING], [RING + 10.0]])
    df = spark.createDataFrame(
        [("p", bytearray(poly)), ("m", bytearray(multi)), ("n", None)],
        "fid string, wkb binary",
    )
    up = {r.fid: r.wkb for r in set_geom_type(df, "MULTIPOLYGON").collect()}
    assert W.parse(bytes(up["p"]))[0] == 6
    assert W.parse(bytes(up["m"]))[0] == 6
    assert up["n"] is None
    down = {r.fid: r.wkb for r in set_geom_type(df, "POLYGON").collect()}
    assert W.parse(bytes(down["m"]))[0] == 3
    # demoted multi keeps its FIRST member only (OGR_G_ForceToPolygon)
    rings = W.parse(bytes(down["m"]))[1]
    assert np.allclose(rings[0][: len(RING)], RING)


def test_rename_layer_and_export_schema(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0, bytearray(W.write_polygon([RING])))],
        "fid long, name string, area double, wkb binary",
    )
    df.createOrReplaceTempView("old_layer")
    rename_layer(df, "old_layer", "new_layer")
    assert spark.sql("select count(*) c from new_layer").collect()[0].c == 1

    schema = json.loads(export_schema(df, layer_name="new_layer"))
    layer = schema["layers"][0]
    assert layer["name"] == "new_layer"
    assert layer["geometry_fields"] == [{"name": "wkb", "type": "Unknown"}]
    types = {f["name"]: f["type"] for f in layer["fields"]}
    assert types == {"fid": "Integer64", "name": "String", "area": "Real"}
