"""COG writer / reader / validator / distributed tile scan.

Layout contract = the reference's frmts/gtiff/cogdriver.cpp output as
checked by its own autotest/gcore/validate_cloud_optimized_geotiff.py:
IFDs before data, overview chain, smallest-overview-first imagery,
row-major tiles, BLOCK_LEADER/TRAILER ghost conventions.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.functions.tiff import tiff_encode, tiff_parse
from gdal_spark.raster.cog import (
    cog_info,
    cog_tile_index,
    decode_cog_tile,
    read_cog_level,
    scan_cog_tiles,
    validate_cog,
    write_cog,
)
from gdal_spark.raster.kernels import block_reduce


def _img(h=130, w=200, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_roundtrip_levels_exact():
    a = _img()
    cog = write_cog(a, blocksize=64, compress="lzw")
    lv0 = read_cog_level(cog, 0)
    assert np.array_equal(lv0, a)
    # overview chain = repeated engine block_reduce
    expect = a
    info = cog_info(cog)
    assert len(info["levels"]) == 3  # 200 -> 100 -> 50 (<= 64 stops)
    for li in range(1, len(info["levels"])):
        expect = block_reduce(expect, 2, 2, "average")
        assert np.array_equal(read_cog_level(cog, li), expect)


def test_rgb_and_geotransform():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    gt = (500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0)
    cog = write_cog(a, geotransform=gt, blocksize=32, compress="none")
    assert validate_cog(cog) == []
    arr, meta = tiff_parse(cog)
    assert np.array_equal(arr, a)
    assert meta["geotransform"] == pytest.approx(gt)
    # overview IFDs carry NewSubfileType=1 and halve dimensions
    lvls = cog_info(cog)["levels"]
    assert [l["subfile_type"] for l in lvls] == [0] + [1] * (len(lvls) - 1)
    assert lvls[1]["width"] == 45 and lvls[1]["height"] == 35


def test_validator_accepts_own_output_all_compressions():
    a = _img(96, 96)
    for comp in ("none", "lzw", "packbits"):
        assert validate_cog(write_cog(a, blocksize=32, compress=comp)) == []


def test_validator_rejects_strip_tiff():
    errs = validate_cog(tiff_encode(_img(64, 64)))
    assert any("not tiled" in e for e in errs)


def test_validator_rejects_data_before_ifds():
    """A tiled-but-not-cloud-optimized file: IFD written after imagery."""
    a = _img(64, 64)
    cog = bytearray(write_cog(a, blocksize=32, compress="none"))
    # move the main IFD to the end of the file, patch the header pointer
    info = cog_info(bytes(cog))
    off = info["levels"][0]["ifd_offset"]
    nxt_ifd = info["levels"][1]["ifd_offset"]
    chunk = bytes(cog[off:nxt_ifd])
    new_off = len(cog)
    cog += chunk
    # fix internal overflow pointers would be wrong — but the validator
    # must flag the layout before decoding anything
    struct.pack_into("<I", cog, 4, new_off)
    errs = validate_cog(bytes(cog))
    assert any("after the first imagery byte" in e for e in errs)


def test_validator_checks_leader_and_incompatible_edition():
    a = _img(64, 64)
    cog = bytearray(write_cog(a, blocksize=32, compress="none"))
    info = cog_info(bytes(cog))
    o = info["levels"][0]["tile_offsets"][0]
    struct.pack_into("<I", cog, o - 4, 12345)  # corrupt BLOCK_LEADER
    assert any("BLOCK_LEADER" in e for e in validate_cog(bytes(cog)))
    pos = bytes(cog).index(b"KNOWN_INCOMPATIBLE_EDITION=NO")
    cog[pos : pos + 30] = b"KNOWN_INCOMPATIBLE_EDITION=YES"
    assert any("KNOWN_INCOMPATIBLE_EDITION" in e for e in validate_cog(bytes(cog)))


def test_imagery_order_smallest_overview_first():
    cog = write_cog(_img(256, 256), blocksize=64)
    lvls = cog_info(cog)["levels"]
    firsts = [min(l["tile_offsets"]) for l in lvls]
    # level 2 (smallest) first, then level 1, full res last
    assert firsts == sorted(firsts, reverse=True)
    # row-major within each level
    for l in lvls:
        assert l["tile_offsets"] == sorted(l["tile_offsets"])


def test_tile_range_decode_matches_full_read():
    a = _img(150, 170)
    cog = write_cog(a, blocksize=64, compress="lzw")
    info = cog_info(cog)
    for li, ty, tx, off, cnt in cog_tile_index(cog):
        lv = info["levels"][li]
        tile = decode_cog_tile(cog[off : off + cnt], lv)
        full = read_cog_level(cog, li)
        ys = min(lv["tile_h"], lv["height"] - ty * lv["tile_h"])
        xs = min(lv["tile_w"], lv["width"] - tx * lv["tile_w"])
        ref = full[ty * 64 : ty * 64 + ys, tx * 64 : tx * 64 + xs]
        assert np.array_equal(tile[:ys, :xs, 0], ref)


def test_scan_cog_tiles_distributed(spark):
    a = _img(128, 128, seed=11)
    cog = write_cog(a, blocksize=64)
    df = spark.createDataFrame([("i0", bytearray(cog))], "image_id string, bytes binary")
    rows = {(r.level, r.ty, r.tx): r for r in scan_cog_tiles(spark, df).collect()}
    # 4 tiles level 0, 1 tile each level 1 (64x64) -> stop
    assert len(rows) == 5
    assert rows[(0, 0, 0)].tsum == int(a[:64, :64].sum())
    assert rows[(0, 1, 1)].tmax == int(a[64:, 64:].max())
    lv1 = block_reduce(a, 2, 2, "average")
    assert rows[(1, 0, 0)].tsum == int(lv1.sum())


def test_bigtiff_roundtrip_and_validator():
    a = _img(130, 200, seed=5)
    classic = write_cog(a, blocksize=64, bigtiff=False)
    big = write_cog(a, blocksize=64, bigtiff=True)
    assert big[2:4] == b"\x2b\x00"  # version 43
    assert validate_cog(big) == []
    for li in range(len(cog_info(classic)["levels"])):
        assert np.array_equal(read_cog_level(big, li), read_cog_level(classic, li))
    # ghost area present after the 16-byte BigTIFF header
    assert cog_info(big)["ghost"]["LAYOUT"] == "IFDS_BEFORE_DATA"


def test_bigtiff_tile_range_scan(spark):
    a = _img(96, 96, seed=9)
    cog = write_cog(a, blocksize=32, bigtiff=True, compress="packbits")
    info = cog_info(cog)
    for li, ty, tx, off, cnt in cog_tile_index(cog):
        lv = info["levels"][li]
        tile = decode_cog_tile(cog[off : off + cnt], lv)
        full = read_cog_level(cog, li)
        ys = min(lv["tile_h"], lv["height"] - ty * lv["tile_h"])
        xs = min(lv["tile_w"], lv["width"] - tx * lv["tile_w"])
        assert np.array_equal(
            tile[:ys, :xs, 0], full[ty * 32 : ty * 32 + ys, tx * 32 : tx * 32 + xs]
        )
    df = spark.createDataFrame([("b0", bytearray(cog))], "image_id string, bytes binary")
    got = {(r.level, r.ty, r.tx): r.tsum for r in scan_cog_tiles(spark, df).collect()}
    assert got[(0, 0, 0)] == int(a[:32, :32].sum())


def test_bigtiff_auto_threshold():
    # auto stays classic for small arrays (flips only past 4 GiB estimates)
    small = write_cog(_img(64, 64), blocksize=32)
    assert small[2:4] == b"\x2a\x00"
