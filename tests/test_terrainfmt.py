"""RMF, ILWIS, Terragen and Leveller drivers vs the reference's own
autotest checksums (autotest/gdrivers/{rmf,ilwis,terragen,leveller}.py)."""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import rmf as R
from gdal_spark.raster import terrainfmt as TF

GD = "/root/reference/autotest/gdrivers/data"


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


# -- RMF ---------------------------------------------------------------------

RMF_CASES = [
    ("byte.rsw", 1, 4672),        # test_rmf_1
    ("byte-lzw.rsw", 1, 40503),   # test_rmf_2
    ("float64.mtw", 1, 4672),     # test_rmf_3
    ("rgbsmall.rsw", 1, 21212),   # test_rmf_4
    ("rgbsmall.rsw", 2, 21053),
    ("rgbsmall.rsw", 3, 21349),
    ("big-endian.rsw", 1, 7782),  # test_rmf_6
    ("big-endian.rsw", 2, 8480),
    ("big-endian.rsw", 3, 4195),
    ("1bit.rsw", 1, 34325),       # test_rmf_33a
    ("4bit.rsw", 1, 55221),       # test_rmf_33b
    ("4bit-lzw.rsw", 1, 55221),   # test_rmf_33c
]


@pytest.mark.parametrize("name,band,want", RMF_CASES)
def test_rmf_checksums(name, band, want):
    data = _read(f"{GD}/rmf/{name}")
    info = R.open_rmf(data)
    assert checksum(R.read_band(data, info, band - 1)) == want


def test_rmf_color_table():
    data = _read(f"{GD}/rmf/1bit.rsw")
    info = R.open_rmf(data)
    pct = R.color_table(data, info)
    assert pct is not None and pct.shape[1] == 3


# -- ILWIS -------------------------------------------------------------------


def test_ilwis_landuse():
    # gdrivers/ilwis.py test 1: checksum 2351
    arr, kv = TF.ilwis_decode(
        open(f"{GD}/ilwis/LanduseSmall.mpr").read(),
        _read(f"{GD}/ilwis/LanduseSmall.mp#"),
    )
    assert arr.shape == (75, 75) and arr.dtype == np.uint8
    assert checksum(arr) == 2351


def test_ilwis_real_domain():
    # checksum 350 (Real = float64)
    arr, kv = TF.ilwis_decode(
        open(f"{GD}/ilwis/real_store_value_domain.mpr").read(),
        _read(f"{GD}/ilwis/real_store_value_domain.mp#"),
    )
    assert arr.dtype == np.float64
    assert checksum(arr.astype(np.float64)) == 350


# -- Terragen ----------------------------------------------------------------


def test_terragen_float32():
    # gdrivers/terragen.py: band 1 (raw int16, north-down) checksum 1128
    arr, meta = TF.terragen_decode(_read(f"{GD}/terragen/float32.ter"))
    assert arr.shape == (20, 20) and arr.dtype == np.int16
    assert checksum(arr) == 1128
    assert meta["heightscale"] == 6 and meta["baseheight"] == 2
    assert meta["scal"] == (60.0, 60.0, 60.0)


def test_terragen_roundtrip():
    arr = ((np.arange(300).reshape(15, 20) * 37) % 1021 - 510).astype(np.int16)
    back, meta = TF.terragen_decode(
        TF.terragen_encode(arr, heightscale=3, baseheight=-5, spacing=10.0)
    )
    assert np.array_equal(back, arr)
    assert meta["heightscale"] == 3 and meta["baseheight"] == -5


# -- Leveller ----------------------------------------------------------------


def test_leveller_ter6():
    # gdrivers/leveller.py: checksum 33441
    arr, meta = TF.leveller_decode(_read(f"{GD}/leveller/ter6test.ter"))
    assert arr.shape == (96, 64) and arr.dtype == np.float32
    assert checksum(arr) == 33441


def test_leveller_roundtrip():
    arr = (np.arange(150, dtype=np.float32).reshape(10, 15) * 0.75 - 20)
    back, _ = TF.leveller_decode(TF.leveller_encode(arr))
    assert np.array_equal(back, arr)
