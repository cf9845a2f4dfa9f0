"""ASRP/USRP driver vs the reference autotest (autotest/gdrivers/srp.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.adrg import adrg_thf_gens
from gdal_spark.raster.srp import srp_decode

SD = "/root/reference/autotest/gdrivers/data/srp"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("pcb", (0, 4, 8))
def test_srp_1(pcb):
    base = os.path.join(SD, f"USRP_PCB{pcb}")
    arr, meta = srp_decode(_read(base + "/FKUSRP01.GEN"),
                           _read(base + "/FKUSRP01.IMG"),
                           _read(base + "/FKUSRP01.QAL")
                           if os.path.exists(base + "/FKUSRP01.QAL")
                           else None)
    assert checksum(arr) == 24576
    assert meta["gt"] == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
    assert meta["epsg"] == 32617
    ct = meta.get("color_table")
    if ct:
        assert len(ct) == 4
        assert ct[0] == (0, 0, 0, 255)
        assert ct[1] == (255, 0, 0, 255)
        md = meta["metadata"]
        for k, v in [("SRP_CLASSIFICATION", "U"),
                     ("SRP_CREATIONDATE", "20120505"),
                     ("SRP_EDN", "0"), ("SRP_NAM", "FKUSRP"),
                     ("SRP_PRODUCT", "USRP"),
                     ("SRP_REVISIONDATE", "20120505"),
                     ("SRP_SCA", "50000"), ("SRP_ZNA", "17"),
                     ("SRP_PSP", "100.0")]:
            assert md.get(k) == v, (k, md.get(k))


def test_srp_4_thf():
    base = os.path.join(SD, "USRP_PCB0")
    gens = adrg_thf_gens(_read(base + "/TRANSH01.THF"))
    assert gens and gens[0].upper().endswith(".GEN")
    arr, _ = srp_decode(_read(os.path.join(base, gens[0])),
                        _read(base + "/FKUSRP01.IMG"))
    assert checksum(arr) == 24576
