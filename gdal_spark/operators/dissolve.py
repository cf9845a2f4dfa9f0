"""Dissolve: group features and geometrically union their geometries.

Reference: `gdal vector dissolve` (apps/gdalalg_vector_dissolve.cpp:120) —
GROUP BY key(s), then UnaryUnion of each group's geometries.

Spark shape: groupBy(keys).applyInPandas(union kernel). The union runs
on the slab-sweep kernel (gdal_spark.functions.polyunion), which is
robust to the collinear/shared-edge degeneracies that break
Greiner-Hormann clipping — grid-aligned dissolve inputs hit those
constantly.

Scale notes: one shuffle on the dissolve key (same as any groupBy); a
group's geometries must fit one task — at 100 TB, pre-dissolve per cell
(partial union inside mapPartitions keyed by (key, cell)) then final
union per key, the classic partial+final aggregate shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def union_wkbs(bufs: list[bytes]):
    """Union a list of polygon/multipolygon WKBs -> (region, n_parts, area)."""
    from gdal_spark.functions import polyclip as PC
    from gdal_spark.functions import polyunion as PU
    from gdal_spark.functions import wkb as W

    feats = []
    for buf in bufs:
        for rings in W.polygon_rings(bytes(buf)):
            feats.append(list(rings))
    region = PU.union_region(feats)
    area = PC.region_area(region)
    return region, len(region), float(area)


def dissolve(df: DataFrame, keys: list[str], wkb_col: str = "wkb") -> DataFrame:
    """Returns one row per key group: (keys..., wkb, n_parts, area)."""
    key_fields = [df.schema[k] for k in keys]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("wkb", T.BinaryType()),
            T.StructField("n_parts", T.IntegerType()),
            T.StructField("area", T.DoubleType()),
        ]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.operators.layer_algebra import _emit_wkb

        region, n, area = union_wkbs(list(pdf[wkb_col]))
        buf, area2 = _emit_wkb(region)
        return pd.DataFrame(
            [key + (buf, n, area2)], columns=keys + ["wkb", "n_parts", "area"]
        )

    return df.groupBy(*keys).applyInPandas(fn, schema)
