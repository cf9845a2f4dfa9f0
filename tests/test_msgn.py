"""MSG Native reader (raster/msgn.py) over synthesized products."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster.msgn import (
    MPH_SIZE,
    SPH_SIZE,
    msgn_open,
    msgn_write,
)


def _product(seed=0, chans=(1, 4), lines=5, cols=8, hrv=False, **kw):
    rng = np.random.default_rng(seed)
    bands = {c: rng.integers(0, 1024, (lines, cols)).astype(np.uint16)
             for c in chans}
    if hrv:
        bands[12] = rng.integers(0, 1024, (3 * lines, 2 * cols)
                                 ).astype(np.uint16)
    return bands, msgn_write(bands, **kw)


def test_visir_roundtrip():
    bands, blob = _product(seed=3, chans=(1, 4, 9))
    f = msgn_open(blob)
    assert f.band_order == [1, 4, 9]
    assert (f.lines, f.columns) == (5, 8)
    for c in (1, 4, 9):
        np.testing.assert_array_equal(f.read_band(c), bands[c])


def test_hrv_roundtrip():
    bands, blob = _product(seed=5, chans=(2,), hrv=True)
    f = msgn_open(blob)
    assert f.band_order == [2, 12]
    np.testing.assert_array_equal(f.read_band(12), bands[12])
    assert f.read_band(12).shape == (15, 16)
    np.testing.assert_array_equal(f.read_band(2), bands[2])


def test_calibration_and_radiance():
    cal = [(0.01 * (i + 1), -float(i)) for i in range(12)]
    bands, blob = _product(seed=7, chans=(4,), calibration=cal)
    f = msgn_open(blob)
    assert f.calibration[3] == (0.04, -3.0)
    np.testing.assert_allclose(
        f.radiance(4), bands[4].astype(float) * 0.04 - 3.0)


def test_image_description_record():
    _, blob = _product(longitude_of_ssp=9.5)
    f = msgn_open(blob)
    idr = f.image_description
    assert idr["longitude_of_ssp"] == pytest.approx(9.5)
    assert idr["visir_grid"] == {"lines": 3712, "columns": 3712,
                                 "line_step": 3.0, "col_step": 3.0}
    assert idr["hrv_grid"]["lines"] == 11136


def test_headers_and_metadata():
    _, blob = _product()
    f = msgn_open(blob)
    assert f.mph["FormatName"] == "NATIVE"
    assert f.mph["SNIT"].startswith("20260821")
    assert f.sph["SelectedBandIDs"].startswith("X--X")
    assert blob[:MPH_SIZE + SPH_SIZE][:10] == b"FormatName"


def test_unselected_band_rejected():
    _, blob = _product(chans=(1,))
    f = msgn_open(blob)
    with pytest.raises(ValueError, match="not selected"):
        f.read_band(5)


def test_rejects_non_native():
    with pytest.raises(ValueError):
        msgn_open(b"FormatName                  : GRIB" + b" " * 4000)
