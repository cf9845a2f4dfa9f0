"""gdalinfo report parity — the reference's own autotest expectations
(autotest/utilities/test_gdalinfo.py tests 1-5 shapes) on its own files."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster.info import gdal_info, info_table

GCORE = "/root/reference/autotest/gcore/data"
GDR = "/root/reference/autotest/gdrivers/data"


@pytest.fixture(scope="module")
def byte_tif():
    with open(os.path.join(GCORE, "byte.tif"), "rb") as fh:
        return fh.read()


def test_gdalinfo_1_driver_line(byte_tif):
    ret = gdal_info(byte_tif)
    assert ret.find("Driver: GTiff/GeoTIFF") != -1
    assert ret.find("Size is 20, 20") != -1


def test_gdalinfo_2_checksum(byte_tif):
    ret = gdal_info(byte_tif, checksum=True)
    assert ret.find("Checksum=4672") != -1
    assert gdal_info(byte_tif).find("Checksum") == -1


def test_gdalinfo_3_nomd(byte_tif):
    assert gdal_info(byte_tif).find("Metadata") != -1
    assert gdal_info(byte_tif, nomd=True).find("Metadata") == -1


def test_gdalinfo_4_color_table_noct():
    with open(os.path.join(GDR, "gif/bug407.gif"), "rb") as fh:
        gif = fh.read()
    ret = gdal_info(gif, fmt="gif")
    assert ret.find("0: 255,255,255,255") != -1
    assert ret.find("ColorInterp=Palette") != -1
    assert gdal_info(gif, fmt="gif", noct=True).find("0: 255,255,255,255") == -1


def test_gdalinfo_5_stats(byte_tif):
    assert gdal_info(byte_tif).find("STATISTICS_MINIMUM=74") == -1
    ret = gdal_info(byte_tif, stats=True)
    assert ret.find("STATISTICS_MINIMUM=74") != -1
    assert ret.find("STATISTICS_MAXIMUM=255") != -1


def test_corner_coordinates_format(byte_tif):
    ret = gdal_info(byte_tif)
    # byte.tif: gt (440720, 60, 0, 3751320, 0, -60), 20x20 pixels
    assert "Upper Left  (  440720.000, 3751320.000)" in ret
    assert "Lower Left  (  440720.000, 3750120.000)" in ret
    assert "Upper Right (  441920.000, 3751320.000)" in ret
    assert "Lower Right (  441920.000, 3750120.000)" in ret
    assert "Center      (  441320.000, 3750720.000)" in ret
    assert "Origin = (440720.000000000000000,3751320.000000000000000)" in ret
    assert "Pixel Size = (60.000000000000000,-60.000000000000000)" in ret


def test_band_line_and_block(byte_tif):
    ret = gdal_info(byte_tif)
    assert "Band 1 Block=20x20 Type=Byte, ColorInterp=Gray" in ret


def test_json_form(byte_tif):
    j = gdal_info(byte_tif, json=True, checksum=True, stats=True)
    assert j["driverShortName"] == "GTiff"
    assert j["size"] == [20, 20]
    assert j["geoTransform"] == [440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0]
    assert j["cornerCoordinates"]["upperLeft"] == [440720.0, 3751320.0]
    b = j["bands"][0]
    assert b["type"] == "Byte" and b["checksum"] == 4672
    assert b["metadata"]["STATISTICS_MINIMUM"] == "74"


def test_info_table_distributed(spark, byte_tif):
    df = spark.createDataFrame(
        [("a", bytearray(byte_tif), "tiff"), ("b", bytearray(byte_tif), "tiff")],
        "image_id string, bytes binary, fmt string",
    )
    out = {r.image_id: r.report for r in info_table(df, checksum=True).collect()}
    assert len(out) == 2
    assert out["a"].find("Checksum=4672") != -1


def test_ogrinfo_summary_on_reference_poly(spark):
    """ogrinfo -so shape on the reference's own poly.shp
    (autotest/utilities/test_ogrinfo.py expectations: Feature Count 10,
    the published extent, field names)."""
    from gdal_spark.raster.info import ogr_info
    from gdal_spark.sources.vector_formats import read_shapefile

    df = read_shapefile(spark, "/root/reference/autotest/ogr/data/poly.shp")
    ret = ogr_info(df, layer_name="poly")
    assert "Layer name: poly" in ret
    assert "Geometry: Polygon" in ret
    assert "Feature Count: 10" in ret
    assert "Extent: (478315.531250, 4762880.500000) - (481645.312500, 4765610.500000)" in ret
    assert "AREA: Real" in ret and "PRFEDEA: String" in ret


def test_coordinate_system_block(byte_tif):
    """byte.tif geokeys identify EPSG:26711; a UTM31 WGS84 GeoTIFF would
    print full WKT (supported transform)."""
    ret = gdal_info(byte_tif)
    assert "Coordinate System is:" in ret
    assert 'ID["EPSG",26711]' in ret
