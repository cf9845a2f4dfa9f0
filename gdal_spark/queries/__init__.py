"""Driver-contract query catalog.

Each module exposes SPARK (name -> fn(spark, sf_dir) -> DataFrame) and
ORACLE (name -> DuckDB SQL). Column names are aliased identically on both
sides (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from gdal_spark.queries import (
    calc_entries,
    closedform_dem,
    closedform_extra,
    closedform_misc,
    closedform_morph,
    closedform_raster,
    closedform_vector,
    cog_entries,
    crs_entries,
    geoparquet_entries,
    images_join_cf,
    vsi_entries,
    gridding,
    gti_entries,
    layer_algebra_entries,
    mdim_entries,
    morph_entries,
    ogrsql_entries,
    rat_entries,
    raster_entries,
    raster_extra,
    raster_pipeline,
    relational,
    similarity,
    simplify_entries,
    spatial_sql,
    sql_extra,
    streaming_entries,
    vector_fmt_entries,
    vision_entries,
    multimodal_entries,
    textops,
    retile_entries,
    xyz_entries,
    wave4_entries,
    wave6_entries,
    wave7_entries,
    wave8_entries,
    wave9_entries,
    wave10_entries,
    wave11_entries,
    wave12_entries,
    sozip_entries,
    quarantine_entries,
    webp_entries,
    lerc_entries,
    epsg_entries,
    curve_entries,
    extcodec_entries,
)

MODULES = [
    relational, spatial_sql, textops, similarity,
    raster_entries, raster_pipeline, layer_algebra_entries,
    morph_entries, gridding, raster_extra, sql_extra, crs_entries,
    rat_entries, ogrsql_entries, vision_entries, gti_entries, mdim_entries,
    vector_fmt_entries, streaming_entries, simplify_entries,
    closedform_raster, closedform_vector, closedform_morph, closedform_dem, closedform_misc,
    cog_entries, vsi_entries, geoparquet_entries, images_join_cf,
    closedform_extra, calc_entries, retile_entries, xyz_entries,
    multimodal_entries, wave4_entries, wave6_entries,
    wave7_entries, wave8_entries, wave9_entries, wave10_entries, wave11_entries, wave12_entries,
    sozip_entries, quarantine_entries, webp_entries, lerc_entries,
    epsg_entries, curve_entries, extcodec_entries,
]


def all_queries():
    out = {}
    for m in MODULES:
        out.update(m.SPARK)
    return out


def all_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLE)
    return out
