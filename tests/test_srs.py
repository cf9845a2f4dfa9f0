"""WKT1 SRS import/export/auto-identify (functions/srs.py) — including
the reference's OWN .prj fixtures (ESRI flavor)."""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import crs as C
from gdal_spark.functions.srs import (
    epsg_from_wkt,
    parse_wkt,
    srs_params,
    transform_wkt,
    wkt_from_epsg,
)

_SUPPORTED = [
    "EPSG:4326", "EPSG:3857", "EPSG:32631", "EPSG:32712",
    "EPSG:2154", "EPSG:3347", "EPSG:5070", "EPSG:3413", "EPSG:3031",
]


def test_export_import_roundtrip_all_supported():
    for code in _SUPPORTED:
        wkt = wkt_from_epsg(code)
        assert epsg_from_wkt(wkt) == code, code
        # AUTHORITY node carries the code too
        assert f'AUTHORITY["EPSG","{code.split(":")[1]}"]' in wkt


def test_reference_farsite_prj_identifies_utm12():
    """The reference's own ESRI-flavor .prj (NAD83 UTM 12N) must resolve
    to the zone-12 transform (NAD83==WGS84 equivalence, sub-mm)."""
    with open(
        "/root/reference/autotest/gdrivers/data/lcp/test_FARSITE_UTM12.prj"
    ) as fh:
        wkt = fh.read()
    assert epsg_from_wkt(wkt) == "EPSG:32612"
    info = srs_params(parse_wkt(wkt))
    assert info["projection"] == "Transverse_Mercator"
    assert info["params"]["central_meridian"] == -111.0
    assert info["datum"] == "D_North_American_1983"
    assert info["spheroid"][0] == 6378137.0


def test_parse_handles_esri_parameter_spellings():
    wkt = (
        'PROJCS["x",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",3.0],'
        'PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
    )
    assert epsg_from_wkt(wkt) == "EPSG:32631"


def test_transform_wkt_matches_code_transform():
    rng = np.random.default_rng(4)
    lon = rng.uniform(0.5, 5.5, 50)
    lat = rng.uniform(40.0, 55.0, 50)
    e1, n1 = transform_wkt(
        wkt_from_epsg("EPSG:4326"), wkt_from_epsg("EPSG:32631"), lon, lat
    )
    e2, n2 = C.transform("EPSG:4326", "EPSG:32631", lon, lat)
    assert np.allclose(e1, e2, atol=0) and np.allclose(n1, n2, atol=0)


def test_geographic_wkt_is_4326():
    assert epsg_from_wkt(wkt_from_epsg("EPSG:4326")) == "EPSG:4326"


def test_unrecognized_returns_none():
    wkt = (
        'PROJCS["weird",GEOGCS["GCS",DATUM["D",SPHEROID["S",6377563.396,'
        '299.3249646]],PRIMEM["Greenwich",0],UNIT["Degree",0.017453]],'
        'PROJECTION["Cassini_Soldner"],PARAMETER["Central_Meridian",10],'
        'UNIT["Meter",1]]'
    )
    assert epsg_from_wkt(wkt) is None


def test_geokeys_from_reference_byte_tif():
    """byte.tif carries ProjectedCSTypeGeoKey 26711 (NAD27 / UTM 11N) —
    the resolver must surface it even though no transform is registered."""
    from gdal_spark.functions.srs import epsg_from_geokeys
    from gdal_spark.functions.tiff import tiff_parse

    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        _, meta = tiff_parse(fh.read())
    assert epsg_from_geokeys(meta["geokeys"]) == "EPSG:26711"
