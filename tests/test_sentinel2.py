"""Sentinel-2 SAFE driver vs the reference autotest
(autotest/gdrivers/sentinel2.py test_sentinel2_l1c_1/2/3/4,
l1c_safe_compact_1/2/3, l2a_1/2)."""

import os

import pytest

from gdal_spark.raster.sentinel2 import sentinel2_open

D = "/root/reference/autotest/gdrivers/data/sentinel2"
L1C = os.path.join(D, "fake_l1c/S2A_OPER_PRD_MSIL1C.SAFE/"
                      "S2A_OPER_MTD_SAFL1C.xml")
L1C_COMPACT = os.path.join(D, "fake_l1c_safecompact/S2A_MSIL1C_test.SAFE/"
                              "MTD_MSIL1C.xml")
L2A = os.path.join(D, "fake_l2a/S2A_USER_PRD_MSIL2A.SAFE/"
                      "S2A_USER_MTD_SAFL2A.xml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)

_L1C_MD = {
    "CLOUD_COVERAGE_ASSESSMENT": "0.0",
    "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
    "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
    "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
    "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
    "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
    "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
    "DEGRADED_ANC_DATA_PERCENTAGE": "0",
    "DEGRADED_MSI_DATA_PERCENTAGE": "0",
    "FORMAT_CORRECTNESS_FLAG": "PASSED",
    "GENERAL_QUALITY_FLAG": "PASSED",
    "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
    "GEOMETRIC_QUALITY_FLAG": "PASSED",
    "PREVIEW_GEO_INFO": "BrowseImageFootprint",
    "PREVIEW_IMAGE_URL": "http://example.com",
    "PROCESSING_BASELINE": "01.03",
    "PROCESSING_LEVEL": "Level-1C",
    "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_TYPE": "S2MSI1C",
    "QUANTIFICATION_VALUE": "1000",
    "RADIOMETRIC_QUALITY_FLAG": "PASSED",
    "REFERENCE_BAND": "B1",
    "REFLECTANCE_CONVERSION_U": "0.97",
    "SENSOR_QUALITY_FLAG": "PASSED",
    "SPECIAL_VALUE_NODATA": "1",
    "SPECIAL_VALUE_SATURATED": "0",
}


def test_identify():
    from gdal_spark.sources.identify import identify_driver
    for p in (L1C, L1C_COMPACT, L2A):
        with open(p, "rb") as f:
            assert identify_driver(f.read(), p) == "SENTINEL2", p


def test_l1c_product_metadata():
    """test_sentinel2_l1c_1: main-dataset metadata incl. FOOTPRINT."""
    ds = sentinel2_open(L1C)
    want = dict(_L1C_MD)
    want["FOOTPRINT"] = "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))"
    assert ds.metadata == want


def test_l1c_subdatasets():
    ds = sentinel2_open(L1C)
    got = ds.subdatasets
    assert got == {
        "SUBDATASET_1_DESC":
            "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
        "SUBDATASET_1_NAME": f"SENTINEL2_L1C:{L1C}:10m:EPSG_32632",
        "SUBDATASET_2_DESC":
            "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, UTM 32N",
        "SUBDATASET_2_NAME": f"SENTINEL2_L1C:{L1C}:20m:EPSG_32632",
        "SUBDATASET_3_DESC":
            "Bands B1, B9, B10 with 60m resolution, UTM 32N",
        "SUBDATASET_3_NAME": f"SENTINEL2_L1C:{L1C}:60m:EPSG_32632",
        "SUBDATASET_4_DESC": "RGB preview, UTM 32N",
        "SUBDATASET_4_NAME": f"SENTINEL2_L1C:{L1C}:PREVIEW:EPSG_32632",
    }
    # all four must open
    for i in range(1, 5):
        sentinel2_open(got["SUBDATASET_%d_NAME" % i])


@pytest.mark.parametrize("bad", [
    "SENTINEL2_L1C:",
    "SENTINEL2_L1C:foo.xml:10m:EPSG_32632",
    "SENTINEL2_L1C:{x}",
    "SENTINEL2_L1C:{x}:",
    "SENTINEL2_L1C:{x}:10m",
    "SENTINEL2_L1C:{x}:10m:",
    "SENTINEL2_L1C:{x}:10m:EPSG_",
    "SENTINEL2_L1C:{x}:50m:EPSG_32632",
    "SENTINEL2_L1C:{x}:10m:EPSG_32633",
])
def test_l1c_invalid_subdataset_names(bad):
    with pytest.raises((ValueError, OSError)):
        sentinel2_open(bad.format(x=L1C))


def test_l1c_10m_subdataset():
    """test_sentinel2_l1c_2: the 10m mosaic over two tiles."""
    ds = sentinel2_open(f"SENTINEL2_L1C:{L1C}:10m:EPSG_32632")
    assert ds.metadata == _L1C_MD      # no FOOTPRINT at subdataset level
    assert (ds.width, ds.height) == (20984, 20980)
    assert ds.epsg == 32632
    assert ds.geotransform == (699960.0, 10.0, 0.0, 5100060.0, 0.0, -10.0)
    assert ds.band_count == 4

    b1 = ds.bands[0]
    assert b1.metadata == {
        "BANDNAME": "B4", "BANDWIDTH": "30", "BANDWIDTH_UNIT": "nm",
        "SOLAR_IRRADIANCE": "1500", "SOLAR_IRRADIANCE_UNIT": "W/m2/um",
        "WAVELENGTH": "665", "WAVELENGTH_UNIT": "nm",
    }
    assert b1.imagery == {"CENTRAL_WAVELENGTH_UM": "0.665",
                          "FWHM_UM": "0.030"}
    assert b1.color_interp == "Red"
    assert b1.dtype == "uint16" and b1.nbits == 12

    b4 = ds.bands[3]
    assert b4.color_interp == "NIR"
    assert b4.metadata["BANDNAME"] == "B8"
    assert b4.metadata["SOLAR_IRRADIANCE"] == "1000"

    # tile placements for band 4 (B8): second granule at 10004/10000
    safe = os.path.dirname(L1C)
    srcs = [(f, src, dst) for bi, f, src, dst in ds.sources if bi == 4]
    assert srcs == [
        (os.path.join(safe, "GRANULE/S2A_OPER_MSI_L1C_T32TQR_N01.03/"
                            "IMG_DATA/S2A_OPER_MSI_L1C_T32TQR_B08.jp2"),
         (0, 0, 10980, 10980), (0, 0, 10980, 10980)),
        (os.path.join(safe, "GRANULE/S2A_OPER_MSI_L1C_T32TRQ_N01.03/"
                            "IMG_DATA/S2A_OPER_MSI_L1C_T32TRQ_B08.jp2"),
         (0, 0, 10980, 10980), (10004, 10000, 10980, 10980)),
    ]


def test_l1c_60m_alpha():
    """test_sentinel2_l1c_3: ALPHA=YES adds a 4th alpha band."""
    ds = sentinel2_open(f"SENTINEL2_L1C:{L1C}:60m:EPSG_32632", alpha=True)
    assert ds.band_count == 4
    assert ds.bands[3].color_interp == "Alpha"
    assert [b.metadata.get("BANDNAME") for b in ds.bands[:3]] == \
        ["B1", "B9", "B10"]


def test_l1c_preview():
    """test_sentinel2_l1c_4: PREVIEW subdataset — 3 Byte RGB bands,
    file list = main XML + 2 granule XML + 2 jp2."""
    ds = sentinel2_open(f"SENTINEL2_L1C:{L1C}:PREVIEW:EPSG_32632")
    assert ds.band_count == 3
    assert ds.bands[0].color_interp == "Red"
    assert ds.bands[0].dtype == "uint8"
    assert len(ds.file_list) == 1 + 2 + 2


def test_l1c_safe_compact_product():
    """test_sentinel2_l1c_safe_compact_1."""
    ds = sentinel2_open(L1C_COMPACT)
    want = dict(_L1C_MD)
    want["FOOTPRINT"] = "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))"
    assert ds.metadata == want
    got = ds.subdatasets
    assert got["SUBDATASET_1_DESC"] == \
        "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N"
    assert got["SUBDATASET_4_DESC"] == "True color image, UTM 32N"
    assert got["SUBDATASET_4_NAME"] == \
        f"SENTINEL2_L1C:{L1C_COMPACT}:TCI:EPSG_32632"
    for i in range(1, 5):
        sentinel2_open(got["SUBDATASET_%d_NAME" % i])


def test_l1c_safe_compact_10m():
    """test_sentinel2_l1c_safe_compact_2."""
    ds = sentinel2_open(f"SENTINEL2_L1C:{L1C_COMPACT}:10m:EPSG_32632")
    assert (ds.width, ds.height) == (10980, 10980)
    assert ds.geotransform == (699960.0, 10.0, 0.0, 5100060.0, 0.0, -10.0)
    assert ds.band_count == 4
    assert ds.bands[0].metadata["BANDNAME"] == "B4"
    safe = os.path.dirname(L1C_COMPACT)
    srcs = [(f, src, dst) for bi, f, src, dst in ds.sources if bi == 1]
    assert srcs == [
        (os.path.join(safe, "GRANULE/FOO/IMG_DATA/BAR_B04.jp2"),
         (0, 0, 10980, 10980), (0, 0, 10980, 10980)),
    ]
    assert "GRANULE/FOO/IMG_DATA/BAR_B04.jp2" in ds.placement_vrt()


def test_l1c_safe_compact_tci():
    """test_sentinel2_l1c_safe_compact_3: TCI — 3 Byte bands,
    file list = main XML + 1 granule XML + 1 jp2."""
    ds = sentinel2_open(f"SENTINEL2_L1C:{L1C_COMPACT}:TCI:EPSG_32632")
    assert ds.band_count == 3
    assert ds.bands[0].color_interp == "Red"
    assert ds.bands[0].dtype == "uint8"
    assert len(ds.file_list) == 1 + 1 + 1


def test_l2a_product():
    """test_sentinel2_l2a_1: L2A-specific metadata + subdatasets."""
    ds = sentinel2_open(L2A)
    md = ds.metadata
    assert md["PROCESSING_LEVEL"] == "Level-2Ap"
    assert md["PRODUCT_TYPE"] == "S2MSI2Ap"
    assert md["L1C_TOA_QUANTIFICATION_VALUE"] == "1000"
    assert md["L1C_TOA_QUANTIFICATION_VALUE_UNIT"] == "none"
    assert md["L2A_AOT_QUANTIFICATION_VALUE"] == "1000.0"
    assert md["L2A_WVP_QUANTIFICATION_VALUE_UNIT"] == "cm"
    assert md["AOT_RETRIEVAL_ACCURACY"] == "0"
    assert md["CLOUD_SHADOW_PERCENTAGE"] == "0"
    assert md["SNOW_ICE_PERCENTAGE"] == "0"
    assert md["REFERENCE_BAND"] == "B1"
    assert md["FOOTPRINT"] == \
        "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))"
    got = ds.subdatasets
    assert got == {
        "SUBDATASET_1_DESC":
            "Bands B1, B2, B3, B4, B5, B6, B7, B9, B10, B11, B12, B8A, "
            "AOT, CLD, SCL, SNW, WVP with 60m resolution, UTM 32N",
        "SUBDATASET_1_NAME": f"SENTINEL2_L2A:{L2A}:60m:EPSG_32632",
        "SUBDATASET_2_DESC": "RGB preview, UTM 32N",
        "SUBDATASET_2_NAME": f"SENTINEL2_L2A:{L2A}:PREVIEW:EPSG_32632",
    }
    for i in range(1, 3):
        sentinel2_open(got["SUBDATASET_%d_NAME" % i])


def test_l2a_60m_subdataset():
    """test_sentinel2_l2a_2: 17-band 60m mosaic, AOT band 13, SCL
    categories."""
    ds = sentinel2_open(f"SENTINEL2_L2A:{L2A}:60m:EPSG_32632")
    assert "FOOTPRINT" not in ds.metadata
    assert (ds.width, ds.height) == (1830, 1830)
    assert ds.geotransform == (699960.0, 60.0, 0.0, 5100060.0, 0.0, -60.0)
    assert ds.band_count == 17

    b1 = ds.bands[0]
    assert b1.metadata == {
        "BANDNAME": "B1", "BANDWIDTH": "20", "BANDWIDTH_UNIT": "nm",
        "SOLAR_IRRADIANCE": "1900", "SOLAR_IRRADIANCE_UNIT": "W/m2/um",
        "WAVELENGTH": "443", "WAVELENGTH_UNIT": "nm",
    }
    assert b1.dtype == "uint16"

    b13 = ds.bands[12]
    assert b13.metadata == {"BANDNAME": "AOT"}
    assert b13.color_interp == "Undefined"

    scl = [b for b in ds.bands if b.metadata.get("BANDNAME") == "SCL"]
    assert len(scl) == 1
    assert scl[0].categories == [
        "NODATA", "SATURATED_DEFECTIVE", "DARK_FEATURE_SHADOW",
        "CLOUD_SHADOW", "VEGETATION", "BARE_SOIL_DESERT", "WATER",
        "CLOUD_LOW_PROBA", "CLOUD_MEDIUM_PROBA", "CLOUD_HIGH_PROBA",
        "THIN_CIRRUS", "SNOW_ICE",
    ]

    safe = os.path.dirname(L2A)
    srcs = [(f, src, dst) for bi, f, src, dst in ds.sources if bi == 1]
    assert srcs == [
        (os.path.join(
            safe, "GRANULE/S2A_USER_MSI_L2A_T32TQR_N01.03/IMG_DATA/R60m/"
                  "S2A_USER_MSI_L2A_T32TQR_B01_60m.jp2"),
         (0, 0, 1830, 1830), (0, 0, 1830, 1830)),
    ]
