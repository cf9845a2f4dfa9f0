"""Thin schema/type verbs — the remaining `gdal raster/vector`
subcommands that are pure metadata or cast operations:

  * set_type_array  — `gdal raster set-type`
    (apps/gdalalg_raster_set_type.cpp -> VRT eDataType override):
    convert the pixel type with GDALCopyWords semantics — integer
    targets clamp + round, float targets pass through.
  * set_field_type  — `gdal vector set-field-type`
    (apps/gdalalg_vector_set_field_type.cpp): cast a field following
    OGR's SetField coercions (numeric<->string, int<->real).
  * set_geom_type   — `gdal vector set-geom-type`
    (apps/gdalalg_vector_set_geom_type.cpp): promote Polygon ->
    MultiPolygon (wrap) or demote Multi -> first member, the
    OGR_G_ForceTo conversions this engine's WKB model supports;
    NULL and already-conforming geometries pass through.
  * rename_layer    — `gdal vector rename-layer`: re-register the
    DataFrame under a new temp-view name (layer name == view name in
    this engine's catalog model).
  * export_schema   — `gdal vector export-schema`
    (apps/gdalalg_vector_export_schema.cpp): the layer's field
    name/type listing as the JSON shape the reference emits.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import wkb as W

_GDAL_TYPES = {
    "Byte": np.uint8, "UInt8": np.uint8, "Int8": np.int8,
    "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "Float32": np.float32, "Float64": np.float64,
}


def set_type_array(arr: np.ndarray, dtype: str | np.dtype) -> np.ndarray:
    """GDALCopyWords conversion: clamp + round into integer targets."""
    dt = np.dtype(_GDAL_TYPES.get(str(dtype), dtype))
    a = np.asarray(arr)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        return np.clip(np.round(a.astype(np.float64)), info.min, info.max).astype(dt)
    return a.astype(dt)


def set_field_type(df: DataFrame, field: str, target: str) -> DataFrame:
    """OGR SetField coercion via Spark cast; `target` uses OGR names
    (Integer, Integer64, Real, String) or Spark type names."""
    spark_t = {
        "Integer": "int", "Integer64": "long", "Real": "double",
        "String": "string",
    }.get(target, target)
    return df.withColumn(field, F.col(field).cast(spark_t))


def _to_multi(buf: bytes | None) -> bytes | None:
    if buf is None:
        return None
    t, body = W.parse(bytes(buf))
    if t == 6:  # already MultiPolygon
        return bytes(buf)
    if t == 3:  # Polygon -> wrap
        return W.write_multipolygon([body])
    return bytes(buf)


def _to_single(buf: bytes | None) -> bytes | None:
    if buf is None:
        return None
    t, body = W.parse(bytes(buf))
    if t == 6:  # MultiPolygon -> first member (OGR_G_ForceToPolygon)
        return W.write_polygon(body[0]) if body else None
    return bytes(buf)


def set_geom_type(
    df: DataFrame, target: str, wkb_col: str = "wkb"
) -> DataFrame:
    conv = _to_multi if target.upper().startswith("MULTI") else _to_single

    @F.pandas_udf(T.BinaryType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: None if v is None else bytearray(conv(bytes(v)))
        )

    return df.withColumn(wkb_col, _udf(F.col(wkb_col)))


def rename_layer(df: DataFrame, old_name: str, new_name: str) -> None:
    spark = df.sparkSession
    spark.catalog.dropTempView(old_name)
    df.createOrReplaceTempView(new_name)


_OGR_FIELD = {
    "LongType": "Integer64", "IntegerType": "Integer",
    "DoubleType": "Real", "FloatType": "Real", "StringType": "String",
    "BooleanType": "Integer", "DateType": "Date",
    "TimestampType": "DateTime", "BinaryType": "Binary",
}


def export_schema(df: DataFrame, layer_name: str = "layer",
                  wkb_col: str = "wkb") -> str:
    """The `gdal vector export-schema` JSON shape: layer name, geometry
    fields, and per-field name/type."""
    fields = []
    geom_fields = []
    for f in df.schema.fields:
        if f.name == wkb_col:
            geom_fields.append({"name": f.name, "type": "Unknown"})
            continue
        fields.append(
            {
                "name": f.name,
                "type": _OGR_FIELD.get(type(f.dataType).__name__, "String"),
            }
        )
    return json.dumps(
        {
            "layers": [
                {
                    "name": layer_name,
                    "geometry_fields": geom_fields,
                    "fields": fields,
                }
            ]
        },
        indent=2,
    )
