"""Generic EPSG dispatch tests — functions/crs.py EPSG_REGISTRY.

The reference resolves any EPSG code through PROJ
(ogr/ogrspatialreference.cpp importFromEPSG, ogr/ogrct.cpp:665); the
engine re-derives the projection math per family and carries a
parameterized registry of the most-used grids.  Gates here are the
EPSG Guidance Note 7-2 published worked examples (one per projection
family), the reference autotest's own OSGB->ETRS89 datum-pipeline
golden (autotest/osr/osr_ct.py test_osr_ct_OGR_CT_PREFER_OFFICIAL_
SRS_DEF), cross-path consistency (registry UTM vs the Karney kernel),
and tight roundtrips over each grid's domain.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import crs as C


def dms(d, m, s):
    return d + m / 60 + s / 3600


# (code, lon, lat, E, N, tol_m, source)
WORKED_EXAMPLES = [
    ("EPSG:27700", 0.5, 50.5, 577274.99, 69740.50, 0.02,
     "GN7-2 TM (9807)"),
    ("EPSG:32040", -96.0, 28.5, 2963503.91, 254759.80, 0.1,
     "GN7-2 LCC-2SP us-ft (9802)"),
    ("EPSG:24200", -dms(76, 56, 37.26), dms(17, 55, 55.80),
     255966.58, 142493.51, 0.05, "GN7-2 LCC-1SP (9801)"),
    ("EPSG:3035", 5.0, 50.0, 3962799.45, 2999718.85, 0.05,
     "GN7-2 LAEA (9820)"),
    ("EPSG:3002", 120.0, -3.0, 5009726.58, 569150.82, 0.05,
     "GN7-2 Mercator (9804)"),
    ("EPSG:3032", 120.0, -75.0, 7255380.79, 7053389.56, 0.05,
     "GN7-2 Polar Stereo B (9829)"),
    # GN7-2 Krovak (9819) example, East-North axes; the engine's value
    # (westing 568991.00, southing 1050538.65) is pinned at 5 cm
    ("EPSG:5514", dms(16, 50, 59.1790), dms(50, 12, 32.4416),
     -568991.00, -1050538.63, 0.05, "GN7-2 Krovak (9819)"),
]


@pytest.mark.parametrize(
    "code,lon,lat,eE,eN,tol,src", WORKED_EXAMPLES,
    ids=[w[0] for w in WORKED_EXAMPLES])
def test_worked_examples(code, lon, lat, eE, eN, tol, src):
    crs = C._registry_crs(code)
    E, N = crs._from_geodetic(np.array([lon]), np.array([lat]))
    assert abs(float(E[0]) - eE) <= tol, (src, float(E[0]))
    assert abs(float(N[0]) - eN) <= tol, (src, float(N[0]))


def test_osgb_datum_pipeline_matches_reference_autotest():
    """autotest/osr/osr_ct.py golden: BNG (826158.063, 2405844.125)
    -> ETRS89 (9.867, 71.125) +-0.001 with the 7-param TOWGS84 shift."""
    lon, lat = C.transform("EPSG:27700", "EPSG:4326",
                           np.array([826158.063]), np.array([2405844.125]))
    assert abs(float(lon[0]) - 9.867) < 0.001
    assert abs(float(lat[0]) - 71.125) < 0.001


def test_registry_utm_matches_karney_kernel():
    lon = np.array([6.5, 9.17, 11.99])
    lat = np.array([47.1, 48.78, 54.9])
    e1, n1 = C._from_4326("EPSG:25832", lon, lat)
    e2, n2 = C.utm_forward(lon, lat, "EPSG:32632")
    # GRS80 vs WGS84 flattening differs in the 9th decimal: sub-mm
    assert np.abs(e1 - e2).max() < 1e-3
    assert np.abs(n1 - n2).max() < 1e-3


_DOMAINS = {
    "EPSG:27700": ((-6, 1.8), (50, 58)),
    "EPSG:25832": ((6, 12), (47, 55)),
    "EPSG:25833": ((12, 18), (47, 55)),
    "EPSG:23030": ((-6, 0), (36, 43)),
    "EPSG:2193": ((166, 179), (-47, -34)),
    "EPSG:28355": ((144, 150), (-38, -12)),
    "EPSG:3577": ((114, 153), (-43, -11)),
    "EPSG:26917": ((-84, -78), (25, 48)),
    "EPSG:3035": ((-10, 30), (35, 70)),
    "EPSG:3395": ((-179, 179), (-80, 80)),
    "EPSG:3002": ((95, 140), (-10, 7)),
    "EPSG:21781": ((6, 10.5), (45.8, 47.8)),
    "EPSG:2056": ((6, 10.5), (45.8, 47.8)),
    "EPSG:5514": ((12, 23), (48, 51.2)),
    "EPSG:32040": ((-100, -94), (28, 30.6)),
    "EPSG:24200": ((-78.5, -76), (17.7, 18.6)),
    "EPSG:3032": ((-180, 179), (-88, -61)),
    "EPSG:31370": ((2.5, 6.5), (49.4, 51.6)),
    "ESRI:102003": ((-120, -75), (25, 50)),
    "ESRI:102008": ((-130, -65), (20, 60)),
}


@pytest.mark.parametrize("code", sorted(_DOMAINS), ids=sorted(_DOMAINS))
def test_roundtrip_over_domain(code):
    (lo0, lo1), (la0, la1) = _DOMAINS[code]
    lon, lat = np.meshgrid(np.linspace(lo0, lo1, 7),
                           np.linspace(la0, la1, 7))
    lon, lat = lon.ravel(), lat.ravel()
    e, n = C._from_4326(code, lon, lat)
    lon2, lat2 = C._to_4326(code, e, n)
    dlon = np.abs(lon2 - lon)
    dlon = np.minimum(dlon, 360.0 - dlon)  # +-180 wrap (polar aspects)
    # 5e-7 deg ~ 5 cm: covers the iterative geocentric datum legs
    assert dlon.max() < 5e-7
    assert np.abs(lat2 - lat).max() < 5e-7
    assert C.supported(code)


def test_geographic_aliases_are_nearly_identity():
    lon = np.array([5.0, -120.0])
    lat = np.array([50.0, 45.0])
    for code in ("EPSG:4258", "EPSG:4269"):
        lo, la = C._from_4326(code, lon, lat)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9


def test_register_epsg_runtime_extension():
    C.register_epsg("EPSG:99999", "+proj=tmerc +lon_0=21 +k_0=1 "
                    "+x_0=500000 +ellps=GRS80")
    try:
        e, n = C._from_4326("EPSG:99999", np.array([21.0]), np.array([0.0]))
        assert abs(float(e[0]) - 500000.0) < 1e-6
        assert abs(float(n[0])) < 1e-6
    finally:
        C.EPSG_REGISTRY.pop("EPSG:99999", None)
        C._REGISTRY_CACHE.pop("EPSG:99999", None)


def test_unknown_code_still_raises():
    with pytest.raises(ValueError):
        C._from_4326("EPSG:31981", np.array([0.0]), np.array([0.0]))
