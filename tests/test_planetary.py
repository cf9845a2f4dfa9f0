"""PDS3 / ISIS2 / ISIS3 vs the reference autotest
(autotest/gdrivers/{pds,isis2,isis3}.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import planetary as P

GD = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def _cs(arr):
    a = np.asarray(arr)
    if np.issubdtype(a.dtype, np.floating):
        return checksum(a)  # GDALCopyWords float->int path
    return checksum(a.astype(np.int32))


def test_pds_mc02():
    # test_pds_1 with PDS_SampleProjOffset_Shift=-0.5
    arr, meta = P.pds_open(_read(f"{GD}/pds/mc02_truncated.img"),
                           proj_offset_shift=-0.5)
    assert _cs(arr) == 47151
    want = (-10668384.903788567, 926.1152744293213, 0,
            3852176.483988762, 0, -926.1152744293213)
    # autotest gt tolerance: 1/100 pixel
    assert np.allclose(meta["gt"], want, atol=abs(want[1]) / 100.0)
    assert meta["map_projection_type"] == "SIMPLE_CYLINDRICAL"


def test_pds_fl73n003():
    # test_pds_2: magellan sinusoidal + scale/offset/nodata
    arr, meta = P.pds_open(_read(f"{GD}/pds/fl73n003_truncated.img"),
                           proj_offset_shift=-0.5)
    assert _cs(arr) == 34962
    assert meta["nodata"] == 7
    assert meta["scale"] == pytest.approx(0.2)
    assert meta["offset"] == pytest.approx(-20.2)
    want_gt0 = 587861.55900405
    assert meta["gt"][0] == pytest.approx(want_gt0, abs=75.0 / 100.0)


def test_pds_fl73n003_alt_missing_constant():
    # #3939: MISSING_CONSTANT variant
    arr, meta = P.pds_open(_read(f"{GD}/pds/fl73n003_alt_truncated.img"),
                           proj_offset_shift=-0.5)
    assert meta["nodata"] == 7


def test_pds_messenger_16bit():
    # test_pds_3: MSB 16-bit image
    arr, meta = P.pds_open(_read(f"{GD}/pds/EN0001426030M_truncated.IMG"))
    assert arr.dtype == np.uint16
    assert _cs(arr) == 1367


def test_pds_detached_label_with_offset():
    # test_pds_4 (#3177): detached file + <BYTES> offset
    sib = {"small.raw": _read(f"{GD}/small.raw")}
    arr, meta = P.pds_open(_read(f"{GD}/pds/pds_3177.lbl"), siblings=sib)
    assert _cs(arr) == 3418


def test_isis2_arvidson():
    arr, meta = P.isis2_open(
        _read(f"{GD}/isis2/arvidson_original_truncated.cub")
    )
    assert arr.dtype == np.float32
    assert _cs(arr) == 382  # test_isis2_1
    assert meta["target"] == "VENUS"


def test_isis3_detached():
    lbl = _read(f"{GD}/isis3/isis3_detached.lbl")
    sib = {"isis3_detached.cub": _read(f"{GD}/isis3/isis3_detached.cub")}
    arr, meta = P.isis3_open(lbl, siblings=sib)
    assert arr.shape == (30, 317)
    assert meta["format"] == "BandSequential"
    assert _cs(arr) == 9978  # isis.py test_isis_2


def test_isis3_tiled():
    arr, meta = P.isis3_open(_read(f"{GD}/isis3/isis3_unit_test.cub"))
    assert meta["format"] == "Tile"
    assert arr.dtype == np.int16
    assert _cs(arr) == 42403  # isis.py test_isis_4
