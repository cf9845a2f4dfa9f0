"""GRIB edition 1 vs the reference autotest (autotest/gdrivers/grib.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import grib1 as G

GD = "/root/reference/autotest/gdrivers/data/grib"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GD), reason="reference autotest data not present"
)


def _read(name):
    with open(os.path.join(GD, name), "rb") as fh:
        return fh.read()


def test_quikscat():
    # test_grib_2: band 4 checksum + band nodata
    msgs = G.grib1_messages(_read("Sample_QuikSCAT.grb"))
    assert len(msgs) == 4
    assert checksum(msgs[3]["array"]) == 50714
    assert msgs[0]["nodata"] == 9999.0  # reset-to-9999 rule (max < 9999)
    # band 4's range sits above 9999 on both sides of neither bound:
    # min(ref)=1878 <= 9999 <= max -> missing stays at degrib's 9.999e20
    assert msgs[3]["nodata"] == pytest.approx(9.999e20)
    assert msgs[0]["array"].shape == (74, 66)


def test_quikscat_geotransform():
    msgs = G.grib1_messages(_read("Sample_QuikSCAT.grb"))
    gt = msgs[0]["gt"]
    assert gt[1] == pytest.approx(0.333, abs=1e-9)
    assert gt[5] == pytest.approx(-0.333, abs=1e-9)


def test_bug3246_different_sizes():
    # test_grib_read_different_sizes_messages: band 4 checksum 4081 is
    # the 21x28 message zero-padded into the 78x103 dataset grid
    msgs = G.grib1_messages(_read("bug3246.grb"))
    assert len(msgs) == 12
    assert msgs[0]["array"].shape == (78, 103)
    assert msgs[3]["array"].shape == (21, 28)
    big = np.zeros((78, 103))
    big[:21, :28] = msgs[3]["array"]
    assert checksum(big) == 4081


# -- GRIB2 ---------------------------------------------------------------------

def test_grib2_ds_mint():
    """test_grib_1: complex packing + 2nd-order spatial differencing,
    boustrophedon scan (0x50), degrib metric K->C normalization."""
    from gdal_spark.raster import grib2 as G2
    msgs = G2.grib2_messages(_read("ds.mint.bin"))
    assert len(msgs) == 2
    assert checksum(msgs[1]["array"]) == 46927
    # test_grib_grib2_read_nodata: both bands nodata 9999
    assert msgs[0]["nodata"] == 9999.0
    assert msgs[1]["nodata"] == 9999.0
    assert msgs[0]["array"].shape == (129, 177)
    # values are minimum temperatures in deg C after normalization
    v = msgs[1]["array"]
    v = v[v != 9999.0]
    assert 10 < v.min() < v.max() < 30


def test_grib2_no_normalization():
    from gdal_spark.raster import grib2 as G2
    msgs = G2.grib2_messages(_read("ds.mint.bin"), normalize_units=False)
    v = msgs[1]["array"]
    v = v[v != 9999.0]
    assert 283 < v.min() < v.max() < 303  # Kelvin
