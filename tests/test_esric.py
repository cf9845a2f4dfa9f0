"""ESRIC driver vs the reference autotest (autotest/gdrivers/esric.py)."""

import os
import tarfile
import zipfile

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.esric import esric_conf, esric_level, tpkx_conf

D = "/root/reference/autotest/gdrivers/data/esric"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


@pytest.fixture()
def layers_tar():
    t = tarfile.open(os.path.join(D, "Layers.tar"))

    def read(name):
        try:
            return t.extractfile("Layers/" + name).read()
        except (KeyError, AttributeError):
            return None

    return esric_conf(t.extractfile("Layers/conf.xml").read()), read


def test_esric_2_conf(layers_tar):
    conf, read = layers_tar
    assert conf["wkid"] == 3857
    assert len(conf["lods"]) == 4  # full + 3 overviews
    arr, meta = esric_level(read, conf, max(conf["lods"]))
    assert arr.shape == (2048, 2048, 4)
    gt = meta["gt"]
    assert gt[0] == pytest.approx(-20037508, abs=1)
    assert gt[1] == pytest.approx(20037508 / 1024, abs=1)
    assert gt[3] == pytest.approx(20037508, abs=1)
    assert gt[5] == pytest.approx(-20037508 / 1024, abs=1)


def test_esric_3_missing_level_black(layers_tar):
    conf, read = layers_tar
    arr, _ = esric_level(read, conf, max(conf["lods"]))
    assert checksum(arr[:, :, 0]) == 0


def test_esric_4_png_tiles(layers_tar):
    conf, read = layers_tar
    arr, _ = esric_level(read, conf, 1)
    assert arr.shape == (512, 512, 4)
    assert checksum(arr[:, :, 1]) == 46857


def test_tpkx_2():
    zf = zipfile.ZipFile(os.path.join(D, "Usa.tpkx"))
    conf = tpkx_conf(zf.read("root.json"))
    assert conf["wkid"] == 3857

    def read(name):
        try:
            return zf.read(name)
        except KeyError:
            return None

    assert len(conf["lods"]) == 6  # maxLOD 5 -> 5 overviews
    arr, _ = esric_level(read, conf, max(conf["lods"]))
    assert arr.shape == (8192, 8192, 4)
