"""SNAP_TIFF driver vs the reference autotest
(autotest/gdrivers/snap_tiff.py)."""

import io
import os
import zipfile

import pytest

from gdal_spark.raster.snap_tiff import snap_tiff_open

P = ("/root/reference/autotest/gdrivers/data/snap_tiff/"
     "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_01F9E2_E974"
     "_tnr_empty_truncated.tif.zip.zip")

pytestmark = pytest.mark.skipif(
    not os.path.exists(P), reason="reference autotest data missing"
)


def _data():
    z1 = zipfile.ZipFile(P)
    z2 = zipfile.ZipFile(io.BytesIO(z1.read(z1.namelist()[0])))
    return z2.read(z2.namelist()[0])


def test_snap_tiff():
    ds = snap_tiff_open(_data())
    assert (ds.width, ds.height) == (25548, 16716)
    assert ds.dtype_name == "Float32"
    assert ds.samples == 1
    assert ds.epsg == 4326
    assert ds.nodata == 0
    assert ds.band_name == "Intensity_VV"
    assert ds.unit == "intensity"
    assert ds.scale == 1 and ds.offset == 0
    assert ds.image_description == (
        "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_01F9E2_E974"
        "_tnr"
    )
    assert len(ds.gcps) == 4
    ids = [g[0] for g in ds.gcps]
    assert ids == ["TL", "TR", "BL", "BR"]
    tl, tr, bl, br = ds.gcps
    assert (tl[1], tl[2]) == (0.5, 0.5)
    assert tl[3] == -121.18662152623274
    assert tl[4] == 39.655540466308594
    assert (br[1], br[2]) == (25547.5, 16715.5)
    assert br[3] == -124.43485147116212
    assert br[4] == 38.550738598352105

    md = ds.geolocation_metadata("dummy.tif")
    assert md["LINE_STEP"] == "16.025886864813039"
    assert md["PIXEL_STEP"] == "16.02697616060226"
    assert md["LINE_OFFSET"] == "0" and md["PIXEL_OFFSET"] == "0"
    assert md["X_DATASET"] == 'SNAP_TIFF:"dummy.tif":GEOLOCATION'
    assert md["X_BAND"] == "1" and md["Y_BAND"] == "2"
