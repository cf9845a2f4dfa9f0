"""HFA / Erdas Imagine driver vs the reference's own autotest
expectations (autotest/gdrivers/hfa.py, gcore/data/utmsmall.img)."""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import hfa as H

DATA = "/root/reference/autotest/gdrivers/data/hfa"


def _open(path):
    with open(path, "rb") as fh:
        return H.open_hfa(fh.read())


def test_utmsmall_checksum_and_histogram():
    # test_hfa_histread expectations
    f = _open("/root/reference/autotest/gcore/data/utmsmall.img")
    layer = f.layers()[0]
    assert checksum(f.read_band(layer)) == 50054
    md = f.band_statistics(layer)
    assert md["STATISTICS_MINIMUM"] == "8"
    assert md["STATISTICS_MEDIAN"] == "148"
    assert md["STATISTICS_HISTOMAX"] == "255"
    assert md["STATISTICS_SKIPFACTORX"] == "1"
    assert md["STATISTICS_SKIPFACTORY"] == "1"
    hist = md["STATISTICS_HISTOBINVALUES"]
    assert hist.startswith("0|0|0|0|0|0|0|0|8|0|0|0|0|0|0|0|23|")
    assert hist.endswith("|105|0|0|0|0|0|0|0|824|")
    assert len(hist.split("|")) == 257  # 256 bins + trailing empty


def test_int_img():
    # test_hfa_int_read: checksum 6691; test_hfa_int_stats_1 metadata
    f = _open(f"{DATA}/int.img")
    layer = f.layers()[0]
    assert checksum(f.read_band(layer)) == 6691
    md = f.band_statistics(layer)
    assert md["STATISTICS_MINIMUM"] == "40918"
    assert md["STATISTICS_MAXIMUM"] == "41134"
    assert md["STATISTICS_MEDIAN"] == "41017"
    assert md["STATISTICS_MODE"] == "41013"
    assert md["STATISTICS_HISTOMIN"] == "40918"
    assert md["STATISTICS_HISTOMAX"] == "41134"


def test_float_img():
    # test_hfa_float_read: checksum 23529, pixel (100,100) ~ 41.0216598
    f = _open(f"{DATA}/float.img")
    arr = f.read_band(f.layers()[0])
    assert arr.dtype == np.float32
    assert checksum(arr) == 23529
    assert arr[100, 100] == pytest.approx(41.021659851074219, abs=1e-4)


def test_float_img_stats():
    # test_hfa_float_stats_1 tolerances
    f = _open(f"{DATA}/float.img")
    md = f.band_statistics(f.layers()[0])
    assert float(md["STATISTICS_MINIMUM"]) == pytest.approx(40.91858291626)
    assert float(md["STATISTICS_MAXIMUM"]) == pytest.approx(41.134323120117)
    assert float(md["STATISTICS_MEDIAN"]) == pytest.approx(41.017182931304)
    assert float(md["STATISTICS_HISTOMIN"]) == pytest.approx(40.91858291626)
    assert float(md["STATISTICS_HISTOMAX"]) == pytest.approx(41.134323120117)


def test_more_fixtures_decode():
    # compressed + palette + subsampled fixtures all decode cleanly
    for name, shape in [
        ("dem10.img", (210, 87)),
        ("small1bit.img", (300, 300)),
        ("87test.img", (24, 32)),
        ("bug_1109.img", (110, 100)),
        ("i8u_c_i.img", (250, 233)),
    ]:
        f = _open(f"{DATA}/{name}")
        arr = f.read_band(f.layers()[0])
        assert arr.shape == shape, name


def test_writer_roundtrip():
    bands = [
        np.arange(5000, dtype=np.uint8).reshape(50, 100) % 251,
        np.arange(5000, dtype=np.float32).reshape(50, 100) * 0.25 - 7,
        np.arange(5000, dtype=np.int16).reshape(50, 100) - 2500,
    ]
    f = H.open_hfa(H.write_hfa(bands))
    layers = f.layers()
    assert len(layers) == 3
    for layer, want in zip(layers, bands):
        assert np.array_equal(f.read_band(layer), want)


def test_dictionary_parser():
    types = H.parse_dictionary(
        "{1:lwidth,2:e2:no,yes,flagged,1:*oSub,vals,}Top,"
        "{1:dvalue,}Sub,"
    )
    assert [f.name for f in types["Top"]] == ["width", "flagged", "vals"]
    assert types["Top"][1].enums == ["no", "yes"]
    assert types["Top"][2].pointer == "*" and types["Top"][2].otype == "Sub"
