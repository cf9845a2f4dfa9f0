"""PDS3 TABLE reader vs the reference autotest (autotest/ogr/ogr_pds.py)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.sources.pdsvec import pds_table_open

D = "/root/reference/autotest/ogr/data/pds"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


@pytest.fixture(scope="module")
def read():
    files = {n.upper(): open(os.path.join(D, n), "rb").read()
             for n in os.listdir(D)}
    return lambda n: files.get(n.upper())


def test_ascii_table(read):
    """test_ogr_pds_1: MOLA PRDR ASCII table via ^STRUCTURE fmt."""
    with open(os.path.join(D, "ap01578l.lbl")) as fh:
        t = pds_table_open(fh.read(), read)
    assert t.rows == 74786           # declared feature count
    assert len(t.columns) == 25
    f0 = t.feature(0)
    assert f0["NOISE_COUNTS_1"] == 96
    f1 = t.feature(1)
    assert f1["MARS_RADIUS"] == 3385310.2
    # atoi semantics on an overlapping fixed-width column
    assert f0["NOISE_COUNTS_4"] == 80


def test_binary_table(read):
    """test_ogr_pds_2: MESSENGER MASCS binary table (MSB ints +
    IEEE_REAL, 512-item spectral arrays)."""
    with open(os.path.join(D, "virsvd_orb_11187_050618.lbl")) as fh:
        t = pds_table_open(fh.read(), read)
    f = t.feature(0)
    assert f["INCIDENCE_ANGLE"] == pytest.approx(3.56775538, abs=1e-7)
    assert f["TEMP_2"] == pytest.approx(28.1240005493164, abs=1e-7)
    # a 512-item column decodes as an array
    arrays = [c for c in t.columns if int(c.get("ITEMS", "1") or 1) > 1]
    assert arrays
    name = arrays[0]["NAME"]
    assert np.asarray(t.fields[name][0]).shape == (512,)


def test_rejects_tableless_label(read):
    with pytest.raises(ValueError, match="TABLE"):
        pds_table_open("PDS_VERSION_ID = PDS3\nEND\n", read)
