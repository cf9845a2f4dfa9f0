"""gdal dataset identify / GDALIdentifyDriverEx parity
(gcore/gdaldrivermanager.cpp driver scan; per-driver Identify() magic
tests cited in sources/identify.py).

Checks identification of every engine-encodable format from bytes
alone, the reference's own data files, SQLite application_id dispatch
(GPKG vs MBTiles vs bare SQLite), extension-gated formats, and the
distributed identify_table column scan.
"""

import struct

import numpy as np

from gdal_spark.functions import codecs
from gdal_spark.sources.identify import identify_driver, identify_table

ARR = np.dstack([(np.arange(256).reshape(16, 16) % 97).astype(np.uint8)] * 3)

EXPECT = {
    "tiff": "GTiff", "png": "PNG", "bmp": "BMP", "pnm": "PNM",
    "gif": "GIF", "tga": "TGA", "qdct": "QDCT", "cog": "GTiff",
}


def test_identify_engine_formats():
    for fmt, drv in EXPECT.items():
        data = codecs.encode_image(ARR, fmt)
        assert identify_driver(data, f"x.{fmt}") == drv, fmt


def test_identify_reference_files():
    cases = [
        ("/root/reference/autotest/gcore/data/byte.tif", "GTiff"),
        ("/root/reference/autotest/gcore/data/rgba.tif", "GTiff"),
        ("/root/reference/autotest/gdrivers/data/jpeg/albania.jpg", "JPEG"),
    ]
    for path, drv in cases:
        with open(path, "rb") as fh:
            assert identify_driver(fh.read(), path) == drv, path


def test_identify_sqlite_family():
    # SQLite header + GPKG application_id at offset 68
    hdr = b"SQLite format 3\x00" + b"\x00" * 52 + b"GPKG" + b"\x00" * 28
    assert identify_driver(hdr, "a.gpkg") == "GPKG"
    plain = b"SQLite format 3\x00" + b"\x00" * 84
    assert identify_driver(plain, "a.mbtiles") == "MBTiles"
    assert identify_driver(plain, "a.sqlite") == "SQLite"


def test_identify_vector_and_misc():
    shp = struct.pack(">i", 9994) + b"\x00" * 96
    assert identify_driver(shp, "a.shp") == "ESRI Shapefile"
    assert identify_driver(b"ARROW1\x00\x00rest") == "Arrow"
    assert identify_driver(b'{"type": "FeatureCollection"}') == "GeoJSON"
    assert identify_driver(b'<?xml version="1.0"?><kml xmlns="x">') == "KML"
    assert identify_driver(b"<gpx version='1.1'>") == "GPX"
    assert identify_driver(b"<VRTDataset rasterXSize='1'>") == "VRT"
    assert identify_driver(b"CDF\x01rest") == "netCDF"
    assert identify_driver(b"CDF\x05rest") == "netCDF"
    # BigTIFF (version 43)
    assert identify_driver(b"II+\x00\x08\x00") == "GTiff"
    assert identify_driver(b"MM\x00+\x00\x08") == "GTiff"
    assert identify_driver(b"P5\n16 16\n255\n") == "PNM"
    assert identify_driver(b"\x00" * 32) is None
    assert identify_driver(b"\x00" * 32, "a.csv") == "CSV"
    # TGA footer beats missing extension
    tga = b"\x00" * 100 + b"TRUEVISION-XFILE.\x00"
    assert identify_driver(tga) == "TGA"


def test_identify_table_distributed(spark):
    rows = [
        (f"img{i}", codecs.encode_image(ARR, fmt), f"img{i}.{fmt}")
        for i, fmt in enumerate(EXPECT)
    ] + [("imgN", b"\x00" * 16, "imgN.bin")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, name string"
    )
    got = {
        r.image_id: r.driver
        for r in identify_table(df, filename_col="name").collect()
    }
    for i, fmt in enumerate(EXPECT):
        assert got[f"img{i}"] == EXPECT[fmt]
    assert got["imgN"] is None


def test_identify_round2_formats():
    """FlatGeobuf/NITF/DTED magic bytes + MVT/USGSDEM extension gates,
    on the reference's own files."""
    from gdal_spark.sources.identify import identify_driver

    base = "/root/reference/autotest"
    cases = [
        (f"{base}/ogr/data/testfgb/poly.fgb", "FlatGeobuf"),
        (f"{base}/gdrivers/data/nitf/rgb.ntf", "NITF"),
        (f"{base}/gdrivers/data/n43.dt0", "DTED"),
        (f"{base}/ogr/data/mvt/linestring/0/0/0.pbf", "MVT"),
        (f"{base}/gdrivers/data/usgsdem/4619old_truncated.dem", "USGSDEM"),
    ]
    for p, exp in cases:
        assert identify_driver(open(p, "rb").read(), p) == exp, p


def test_identify_round2_wave3_formats():
    """HFA/PCIDSK/RMF/Terragen/Leveller/BSB/GXF/OSM/PMTiles magics and
    extension gates, on the reference's own files."""
    from gdal_spark.sources.identify import identify_driver

    base = "/root/reference/autotest"
    cases = [
        (f"{base}/gcore/data/utmsmall.img", "HFA"),
        (f"{base}/gdrivers/data/pcidsk/utm.pix", "PCIDSK"),
        (f"{base}/gdrivers/data/rmf/byte.rsw", "RMF"),
        (f"{base}/gdrivers/data/rmf/big-endian.rsw", "RMF"),
        (f"{base}/gdrivers/data/rmf/float64.mtw", "RMF"),
        (f"{base}/gdrivers/data/terragen/float32.ter", "Terragen"),
        (f"{base}/gdrivers/data/leveller/ter6test.ter", "Leveller"),
        (f"{base}/gdrivers/data/bsb/rgbsmall.kap", "BSB"),
        (f"{base}/gdrivers/data/gxf/small.gxf", "GXF"),
        (f"{base}/ogr/data/osm/test.pbf", "OSM"),
        (f"{base}/ogr/data/pmtiles/poly.pmtiles", "PMTiles"),
    ]
    for p, exp in cases:
        assert identify_driver(open(p, "rb").read(1024), p) == exp, p


def test_identify_asciigrid_formats():
    """AAIGrid keyword sniff + GRASS ASCII north: gate."""
    from gdal_spark.sources.identify import identify_driver

    base = "/root/reference/autotest/gdrivers/data"
    cases = [
        (f"{base}/aaigrid/pixel_per_line.asc", "AAIGrid"),
        (f"{base}/aaigrid/byte.tif.grd", "AAIGrid"),
        (f"{base}/aaigrid/case_sensitive.ASC", "AAIGrid"),
        (f"{base}/grassasciigrid/grassascii.txt", "GRASSASCIIGrid"),
    ]
    for p, exp in cases:
        assert identify_driver(open(p, "rb").read(1024), p) == exp, p


def test_identify_xyz_srtm():
    from gdal_spark.sources.identify import identify_driver

    assert identify_driver(b"0 0 65\n0 1 66\n", "grid.xyz") == "XYZ"
    assert identify_driver(b"\x00" * 16, "N43W080.hgt") == "SRTMHGT"
    assert identify_driver(b"\x00" * 16, "n00e006.hgts") == "SRTMHGT"


def test_identify_fits():
    from gdal_spark.sources.identify import identify_driver

    p = "/root/reference/autotest/gdrivers/data/fits/byte_merc.fits"
    assert identify_driver(open(p, "rb").read(64), p) == "FITS"


def test_identify_vicar():
    from gdal_spark.sources.identify import identify_driver

    p = "/root/reference/autotest/gdrivers/data/vicar/vicar_byte.vic"
    assert identify_driver(open(p, "rb").read(64), p) == "VICAR"


def test_identify_s57():
    from gdal_spark.sources.identify import identify_driver

    p = "/root/reference/autotest/ogr/data/s57/1B5X02NE.000"
    assert identify_driver(open(p, "rb").read(64), p) == "S57"


def test_identify_gsg():
    from gdal_spark.sources.identify import identify_driver

    base = "/root/reference/autotest/gdrivers/data/gsg"
    assert identify_driver(open(f"{base}/gsg_ascii.grd", "rb").read(16)) == "GSAG"
    assert identify_driver(open(f"{base}/gsg_binary.grd", "rb").read(16)) == "GSBG"
    assert identify_driver(open(f"{base}/gsg_7binary.grd", "rb").read(16)) == "GS7BG"


def test_identify_wave5_formats():
    from gdal_spark.sources.identify import identify_driver

    base = "/root/reference/autotest"
    cases = [
        (f"{base}/gdrivers/data/iris/iristest.dat", "IRIS"),
        (f"{base}/gdrivers/data/pcraster/ldd.map", "PCRaster"),
        (f"{base}/ogr/data/xlsx/test.xlsx", "XLSX"),
        (f"{base}/ogr/data/ods/test.ods", "ODS"),
        (f"{base}/ogr/data/gtfs/gtfs_extract.zip", "GTFS"),
        (f"{base}/ogr/data/mapml/poly.mapml", "MapML"),
        (f"{base}/gdrivers/data/esric/Usa.tpkx", "ESRIC"),
        (f"{base}/ogr/data/jsonfg/two_feature_types.json", "JSONFG"),
    ]
    for p, exp in cases:
        assert identify_driver(open(p, "rb").read(1024), p) == exp, p


def test_identify_round2_wave_formats():
    """Magic-byte identify for the round-2 wave drivers, against real
    reference fixtures where available."""
    from gdal_spark.sources.identify import identify_driver

    fixtures = [
        ("/root/reference/autotest/gdrivers/data/hdf4/hdifftst2.hdf",
         "", "HDF4"),
        ("/root/reference/autotest/gdrivers/data/cphd/test.cphd",
         "", "CPHD"),
        ("/root/reference/autotest/gdrivers/data/dds/"
         "stefan_full_rgba_no_compression.dds", "", "DDS"),
        ("/root/reference/autotest/ogr/data/xls/test972000xp.xls",
         "t.xls", "XLS"),
        ("/root/reference/autotest/ogr/data/vfk/bylany.vfk",
         "t.vfk", "VFK"),
        ("/root/reference/autotest/ogr/data/ili/Beispiel.itf",
         "", "Interlis 1"),
    ]
    import os
    for path, name, want in fixtures:
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fh:
            assert identify_driver(fh.read(1024), name) == want, path

    # synthetic magics
    assert identify_driver(b"GSATIMG" + b"\x00" * 300) == "GFF"
    assert identify_driver(
        b"time_first_datarec 1\nnumber_lines 2\n" + b" " * 300) == "COASP"
    assert identify_driver(
        b"RECORD LENGTH IN BYTES =  100".ljust(400)
        + b"COMPRESSED JPL AIRCRAFT".ljust(400)) == "AirSAR"
    cosar = bytearray(64)
    cosar[28:32] = b"CSAR"
    assert identify_driver(bytes(cosar)) == "COSAR"
    assert identify_driver(b"CPHD/1.1.0\nX := 1\n\f\n") == "CPHD"
    assert identify_driver(
        b"FormatName                  : NATIVE".ljust(400)) == "MSGN"
    assert identify_driver(b'PRODUCT="MER_RR__1P"'.ljust(1247)) == "ESAT"
