"""Zstandard decoder tests (functions/zstd.py, RFC 8878 re-derivation).

Validation is content-based against the reference's committed
fixtures: every non-corrupt ZSTD / LERC_ZSTD TIFF variant must
reproduce byte.tif / rgbsmall.tif bit-exactly, the two corrupted
fixtures must raise (gcore/tiff_read.py test_tiff_read_zstd_corrupted*),
and the Zarr zstd chunk decodes to its documented [1, 2] content.
An instrumented sweep confirms the fixture set exercises the
Huffman-compressed-literal path (FSE-coded weights) and
FSE-compressed sequence tables, not just raw blocks."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.functions.zstd import _xxh64, zstd_decompress

GCORE = "/root/reference/autotest/gcore/data/"


def _dec(p):
    a = tiff_decode(open(p, "rb").read())
    return np.squeeze(a[0] if isinstance(a, tuple) else a)


def test_zstd_tiff_variants_bit_exact():
    ref_byte = _dec(GCORE + "byte.tif")
    ref_rgb = _dec(GCORE + "rgbsmall.tif")
    n = 0
    for p in sorted(glob.glob(GCORE + "gtiff/*ZSTD*.tif")):
        a = _dec(p)
        want = ref_byte if "byte" in p else ref_rgb
        assert np.array_equal(a, want), p
        n += 1
    # plain + LERC-wrapped x strips/tiles x pixel/planar
    assert n == 12


def test_plain_zstd_tiff():
    assert np.array_equal(_dec(GCORE + "byte_zstd.tif"),
                          _dec(GCORE + "byte.tif"))


@pytest.mark.parametrize(
    "name", ["byte_zstd_corrupted.tif", "byte_zstd_corrupted2.tif"]
)
def test_corrupted_fixtures_raise(name):
    with pytest.raises(ValueError):
        _dec(GCORE + name)


def test_zarr_zstd_chunk():
    from gdal_spark.sources.zarr import read_zarr_array

    res = read_zarr_array(
        "/root/reference/autotest/gdrivers/data/zarr/zstd.zarr"
    )
    arr = res[0] if isinstance(res, tuple) else res
    assert list(np.asarray(arr).ravel()) == [1, 2]


def test_xxh64_known_vectors():
    # public XXH64 test vectors
    assert _xxh64(b"") == 0xEF46DB3751D8E999
    assert _xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B


def test_raw_and_rle_blocks():
    # hand-built frames: raw block and RLE block
    raw = bytes.fromhex("28b52ffd") + bytes([0x00, 0x40]) + bytes(
        [(5 << 3) | 0 | 1]
    ) + b"\x00\x00" + b"hello"
    assert zstd_decompress(raw) == b"hello"
    rle = bytes.fromhex("28b52ffd") + bytes([0x00, 0x40]) + bytes(
        [(7 << 3) | 2 | 1]
    ) + b"\x00\x00" + b"z"
    assert zstd_decompress(rle) == b"zzzzzzz"


def test_skippable_frame():
    skip = bytes.fromhex("502a4d18") + (3).to_bytes(4, "little") + b"xyz"
    raw = bytes.fromhex("28b52ffd") + bytes([0x00, 0x40]) + bytes(
        [(2 << 3) | 1]
    ) + b"\x00\x00" + b"ab"
    assert zstd_decompress(skip + raw) == b"ab"


def test_hostile_bytes_never_hang():
    import random

    rng = random.Random(31337)
    for _ in range(300):
        n = rng.randrange(4, 64)
        blob = bytes.fromhex("28b52ffd") + bytes(
            rng.randrange(256) for _ in range(n)
        )
        try:
            zstd_decompress(blob, max_output=1 << 20)
        except Exception:
            pass  # any structured failure is fine; hangs/crashes are not


def test_huffman_and_fse_paths_exercised():
    """The fixture sweep must hit the compressed-literals (FSE weights)
    and FSE-sequence-table paths — guards against silently validating
    only raw blocks."""
    import struct as st

    import gdal_spark.functions.zstd as Z

    counts = {"huff": 0, "fse_seq": 0}
    orig_lit = Z._decode_literals
    orig_seq = Z._seq_table

    def lit_spy(data, pos, prev):
        if data[pos] & 3 == 2:
            counts["huff"] += 1
        return orig_lit(data, pos, prev)

    def seq_spy(data, pos, mode, defaults, acc, mx, prev, **kw):
        if mode == 2:
            counts["fse_seq"] += 1
        return orig_seq(data, pos, mode, defaults, acc, mx, prev, **kw)

    Z._decode_literals = lit_spy
    Z._seq_table = seq_spy
    try:
        for path in sorted(glob.glob(GCORE + "gtiff/*ZSTD*.tif")):
            d = open(path, "rb").read()
            pos = st.unpack_from("<I", d, 4)[0]
            (n,) = st.unpack_from("<H", d, pos)
            pos += 2
            tags = {}
            for i in range(n):
                tag, typ, cnt, val = st.unpack_from("<HHII", d, pos)
                pos += 12
                tags[tag] = (typ, cnt, val)

            def arr(t):
                typ, cnt, val = tags[t]
                if cnt == 1:
                    return [val]
                fmt = {3: "H", 4: "I"}[typ]
                return list(st.unpack_from(f"<{cnt}{fmt}", d, val))

            okey, ckey = (273, 279) if 273 in tags else (324, 325)
            for o, c in zip(arr(okey), arr(ckey)):
                Z.zstd_decompress(d[o : o + c])
    finally:
        Z._decode_literals = orig_lit
        Z._seq_table = orig_seq
    assert counts["huff"] > 0
    assert counts["fse_seq"] > 0


def test_rep_offset_carries_across_blocks():
    """RFC 8878 §3.1.1.5: repeat-offset history persists across blocks
    within a frame (reset only at frame start).  Hand-crafted 2-block
    frame: block 1 sets rep[0]=2 via a direct offset; block 2 uses
    repeat-code 1, which must resolve to that carried offset, not a
    freshly reset [1,4,8]."""
    from gdal_spark.functions.zstd import zstd_decompress

    blk1 = bytes([0x30]) + b"abcdef" + bytes([1, 0x54, 6, 2, 1, 0x05])
    blk2 = bytes([0x10]) + b"XY" + bytes([1, 0x54, 2, 0, 0, 0x01])
    frame = (
        b"\x28\xb5\x2f\xfd"          # magic
        + bytes([0x20, 15])           # FHD single-segment, fcs=15
        + (len(blk1) << 3 | 0x04).to_bytes(3, "little") + blk1
        + (len(blk2) << 3 | 0x05).to_bytes(3, "little") + blk2
    )
    assert zstd_decompress(frame) == b"abcdefefefXYXYX"


def test_accuracy_log_caps_per_table():
    """Offsets table caps at acc_log 8; a stream declaring 9 for the
    offset table must be rejected instead of allocating an oversized
    table (RFC 8878 table caps: LL 9, OF 8, ML 9, Huffman weights 6)."""
    import pytest
    from gdal_spark.functions.zstd import _read_ncount, _FwdBits

    # acc_log field = value+5; 4 → 9.  Minimal descriptor: prob for
    # symbol 0 = full table (value table_size+1 encoded).  We only need
    # the acc_log check to fire, so content past 4 bits is arbitrary.
    blob = bytes([0x04 | 0x00, 0xFF, 0xFF])
    with pytest.raises(ValueError):
        _read_ncount(_FwdBits(blob), 31, max_acc=8)
