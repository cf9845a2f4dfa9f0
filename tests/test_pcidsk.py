"""PCIDSK driver vs the reference's own autotest checksums
(autotest/gdrivers/pcidsk.py)."""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import pcidsk as P

DATA = "/root/reference/autotest/gdrivers/data/pcidsk"


def _read(name):
    with open(f"{DATA}/{name}", "rb") as fh:
        return fh.read()


def test_utm_band_checksum():
    # test_pcidsk_1: band 1 checksum 39576
    data = _read("utm.pix")
    info = P.open_pcidsk(data)
    assert (info["width"], info["height"]) == (500, 7)
    assert info["interleaving"] == "BAND"
    arr = P.read_band(data, info, 0)
    assert arr.dtype == np.uint8
    assert checksum(arr) == 39576


@pytest.mark.parametrize("name", ["tile_v1.1.pix", "tile_v2.pix"])
def test_tiled_checksums(name):
    # test_pcidsk_tile_v1/v2: band checksum 49526, overview 12003
    data = _read(name)
    info = P.open_pcidsk(data)
    layers = P.tile_layers(data, info)
    assert len(layers) == 2
    assert (layers[0]["xsize"], layers[0]["ysize"]) == (65, 65)
    assert checksum(layers[0]["array"]) == 49526
    assert checksum(layers[1]["array"]) == 12003  # the overview layer


def test_tiled_via_read_band():
    data = _read("tile_v1.1.pix")
    info = P.open_pcidsk(data)
    assert info["chan"][0]["filename"].startswith("/SIS=")
    arr = P.read_band(data, info, 0)
    assert checksum(arr) == 49526


def test_writer_roundtrip():
    bands = [
        np.arange(35, dtype=np.uint8).reshape(5, 7),
        np.arange(35, dtype=np.int16).reshape(5, 7) * -3,
        np.arange(35, dtype=np.float32).reshape(5, 7) * 0.5,
    ]
    enc = P.write_pcidsk(bands)
    info = P.open_pcidsk(enc)
    assert info["channels"] == 3 and info["interleaving"] == "BAND"
    for i, b in enumerate(bands):
        assert np.array_equal(P.read_band(enc, info, i), b)


def test_rle_decompress():
    # sdk RLE: <128 = repeat next byte, 128+n = n literals
    raw = bytes([3, 7, 128 + 2, 1, 2, 2, 9])
    assert P._rle_decompress(raw, 7) == bytes([7, 7, 7, 1, 2, 9, 9])
