"""ADRG driver vs the reference autotest (autotest/gdrivers/adrg.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.adrg import adrg_datasets, adrg_decode, adrg_thf_gens

AD = "/root/reference/autotest/gdrivers/data/adrg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AD), reason="reference autotest data not present"
)


def _read(name):
    with open(os.path.join(AD, name), "rb") as fh:
        return fh.read()


def test_adrg_read_gen():
    arr, meta = adrg_decode(_read("SMALL_ADRG/ABCDEF01.GEN"),
                            _read("SMALL_ADRG/ABCDEF01.IMG"))
    assert checksum(arr[:, :, 0]) == 62833
    assert meta["metadata"]["ADRG_NAM"] == "ABCDEF01"
    assert meta["metadata"]["ADRG_ZNA"] == "1"


def test_adrg_read_transh():
    gens = adrg_thf_gens(_read("SMALL_ADRG/TRANSH01.THF"))
    assert gens == ["ABCDEF01.GEN"]
    arr, _ = adrg_decode(_read("SMALL_ADRG/" + gens[0]),
                         _read("SMALL_ADRG/ABCDEF01.IMG"))
    assert checksum(arr[:, :, 0]) == 62833


def test_adrg_zna_9():
    ds = adrg_datasets(_read("SMALL_ADRG_ZNA9/ABCDEF01.GEN"))[0]
    expected_gt = (-307675.73602473765, 100.09145391818853, 0.0,
                   -179477.5051066006, 0.0, -100.09145391818853)
    assert ds["gt"] == pytest.approx(expected_gt, abs=1e-5)
    assert ds["zna"] == 9


def test_adrg_zna_18():
    ds = adrg_datasets(_read("SMALL_ADRG_ZNA18/ABCDEF01.GEN"))[0]
    expected_gt = (-307675.73602473765, 100.09145391818853, 0.0,
                   179477.5051066006, 0.0, -100.09145391818853)
    assert ds["gt"] == pytest.approx(expected_gt, abs=1e-5)
    assert ds["zna"] == 18


def test_adrg_read_2subdatasets():
    gen = _read("subdataset/XXXXXX01.GEN")
    subs = adrg_datasets(gen)
    assert [(d["nam"], d["bad"]) for d in subs] == [
        ("XXXXXX01", "XXXXXX01.IMG"), ("XXXXXX02", "XXXXXX02.IMG")]
    arr, meta = adrg_decode(gen, _read("subdataset/XXXXXX02.IMG"),
                            nam="XXXXXX02")
    assert checksum(arr[:, :, 0]) == 62833
    assert meta["metadata"]["ADRG_NAM"] == "XXXXXX02"
