"""ogrmerge equivalent: merge vector layers into one dataset.

Re-expresses osgeo_utils/ogrmerge.py over DataFrames:

  * -single: all source layers union into ONE layer; fields reconcile by
    name (missing fields null-filled), like the reference's
    CreateField/SetFrom loop;
  * -nln / -src_layer_field_content patterns substitute {DS_NAME}
    {DS_BASENAME} {DS_INDEX} {LAYER_NAME} {LAYER_INDEX}
    (ogrmerge.py _build_layer_name_from_pattern);
  * -src_layer_field_name adds a per-feature source column (defaults to
    'source_ds_lyr' when only the content is given);
  * -src_geom_type keeps only layers whose geometry type matches
    (ogrmerge.py geom-type filter; in -single mode a no-match input is
    dropped from the union).

The union is unionByName(allowMissingColumns=True) — pure Catalyst, no
shuffle; per-layer outputs are independent DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEOM_NAMES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def subst_pattern(
    pattern: str, ds_name: str, ds_index: int, layer_name: str, layer_index: int
) -> str:
    base = os.path.splitext(os.path.basename(ds_name))[0]
    return (
        pattern.replace("{DS_NAME}", ds_name)
        .replace("{DS_BASENAME}", base)
        .replace("{DS_INDEX}", str(ds_index))
        .replace("{LAYER_NAME}", layer_name)
        .replace("{LAYER_INDEX}", str(layer_index))
    )


def layer_geom_type(df: DataFrame, wkb_col: str = "wkb") -> str | None:
    """geometry type name of a layer from its first non-null feature
    (the layer-definition geom type the reference filters on)."""
    row = df.select(wkb_col).filter(F.col(wkb_col).isNotNull()).first()
    if row is None:
        return None
    buf = bytes(row[0])
    if len(buf) < 5:
        return None
    import struct

    code = struct.unpack("<I" if buf[0] == 1 else ">I", buf[1:5])[0]
    return _GEOM_NAMES.get(int(code % 1000 % 100))


def ogrmerge(
    inputs,
    single: bool = False,
    nln: str | None = None,
    src_layer_field_name: str | None = None,
    src_layer_field_content: str | None = None,
    src_geom_type: str | None = None,
    wkb_col: str = "wkb",
):
    """inputs: [(ds_name, layer_name, DataFrame), ...] in dataset order.
    Returns [(out_layer_name, DataFrame), ...] — one entry in -single
    mode (possibly none if -src_geom_type excludes everything)."""
    if src_layer_field_content and src_layer_field_name is None:
        src_layer_field_name = "source_ds_lyr"
    if src_layer_field_name and src_layer_field_content is None:
        src_layer_field_content = "{DS_NAME}/{LAYER_NAME}"

    ds_index = {}
    per_ds_layer = {}
    expanded = []
    for ds_name, layer_name, df in inputs:
        if ds_name not in ds_index:
            ds_index[ds_name] = len(ds_index)
            per_ds_layer[ds_name] = 0
        li = per_ds_layer[ds_name]
        per_ds_layer[ds_name] += 1
        if src_geom_type is not None:
            gt = layer_geom_type(df, wkb_col)
            if gt != src_geom_type.upper():
                continue
        expanded.append((ds_name, ds_index[ds_name], layer_name, li, df))

    if not expanded:
        return []

    if single:
        parts = []
        for ds_name, di, layer_name, li, df in expanded:
            if src_layer_field_name:
                content = subst_pattern(
                    src_layer_field_content, ds_name, di, layer_name, li
                )
                df = df.withColumn(src_layer_field_name, F.lit(content))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        name = nln or "merged"
        return [(name, out)]

    outputs = []
    for ds_name, di, layer_name, li, df in expanded:
        name = (
            subst_pattern(nln, ds_name, di, layer_name, li) if nln else layer_name
        )
        if src_layer_field_name:
            content = subst_pattern(
                src_layer_field_content, ds_name, di, layer_name, li
            )
            df = df.withColumn(src_layer_field_name, F.lit(content))
        outputs.append((name, df))
    return outputs
