"""LERC2 (Limited Error Raster Compression) decoder — pure numpy.

Re-derivation (no code copied) of the Lerc2 blob format the reference
vendors in third_party/LercLib and exposes through GTiff
COMPRESSION=LERC (frmts/gtiff/libtiff/tif_lerc.c):

  * header  — "Lerc2 " key, int32 version (<=4), uint32 Fletcher32
    checksum (v>=3, over everything after the checksum field),
    int32 nRows/nCols/[nDim v4]/numValidPixel/microBlockSize/blobSize/
    dataType, double maxZError/zMin/zMax  (Lerc2.cpp:201-283)
  * mask    — int32 byte count, then byte-RLE over the bit mask:
    little-endian int16 counts, >0 = literal run, <=0 = repeat next
    byte -count times, -32768 terminates  (RLE.cpp:298-331)
  * v4 per-band min/max vectors, const-band short cut
    (Lerc2.h:2041-2090)
  * one-sweep raw dump, or per-8x8-microblock tiles: comprFlag byte
    (bits 0-1: 0 raw / 1 bit-stuffed / 2 const-0 / 3 const-offset;
    bits 2-5: (j0>>3)&15 integrity code; bits 6-7: offset's storage
    type), variable-width offset, then BitStuffer2 payload
    (Lerc2.h:1211-1375)
  * BitStuffer2 — header byte (bits 0-4 numBits, bit 5 LUT mode,
    bits 6-7 size of the element count), LSB-first packing inside
    little-endian uint32 words, tail bytes not stored
    (BitStuffer2.cpp:159-290)
  * Huffman mode for 8-bit types (maxZError == 0.5): explicit
    per-symbol (length, code) table (lengths bit-stuffed, codes
    MSB-first inside little-endian uint32 words with wrap-around
    symbol range), then plain or row-delta coded values
    (Huffman.cpp:170-330, Lerc2.h:1871-2000)

Decode-only, like several reference read-only drivers: the engine
reads LERC-compressed TIFF/COG strips (optionally wrapped in zlib by
LERC_DEFLATE) and LERC_ZSTD via the engine's own pure-Python zstd
decoder (functions/zstd.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["lerc2_decode", "lerc_strip_decode"]

_DTYPES = {
    0: np.int8, 1: np.uint8, 2: np.int16, 3: np.uint16,
    4: np.int32, 5: np.uint32, 6: np.float32, 7: np.float64,
}
_DTSIZE = {0: 1, 1: 1, 2: 2, 3: 2, 4: 4, 5: 4, 6: 4, 7: 8}
_OFFSET_FMT = {0: "<b", 1: "<B", 2: "<h", 3: "<H", 4: "<i", 5: "<I",
               6: "<f", 7: "<d"}


def _fletcher32(data: bytes) -> int:
    sum1, sum2 = 0xFFFF, 0xFFFF
    n = len(data)
    words = n // 2
    pos = 0
    while words:
        tlen = min(words, 359)
        words -= tlen
        for _ in range(tlen):
            sum1 += data[pos] << 8
            sum1 += data[pos + 1]
            sum2 += sum1
            pos += 2
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if n & 1:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return ((sum2 << 16) | sum1) & 0xFFFFFFFF


def _rle_decompress(buf: bytes, pos: int, out_size: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        (cnt,) = struct.unpack_from("<h", buf, pos)
        pos += 2
        if cnt == -32768:
            break
        if cnt > 0:
            out += buf[pos : pos + cnt]
            pos += cnt
        else:
            out += buf[pos : pos + 1] * (-cnt)
            pos += 1
        if len(out) > out_size:
            raise ValueError("LERC: RLE mask overrun")
    return bytes(out), pos


class _WordBitReader:
    """MSB-first bits inside little-endian uint32 words (the Huffman
    code/value stream layout)."""

    __slots__ = ("words", "gpos")

    def __init__(self, buf: bytes, pos: int):
        n = (len(buf) - pos) // 4
        self.words = np.frombuffer(buf, dtype="<u4", count=n, offset=pos)
        self.gpos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            w = self.gpos >> 5
            bit = 31 - (self.gpos & 31)
            v = (v << 1) | ((int(self.words[w]) >> bit) & 1)
            self.gpos += 1
        return v

    def bytes_consumed(self) -> int:
        return 4 * ((self.gpos + 31) // 32)


def _bitstuff_decode(buf: bytes, pos: int, max_count: int,
                     version: int) -> tuple[np.ndarray, int]:
    """BitStuffer2.Decode re-derivation (v>=3 word layout only —
    version <= 2 blobs predate the checksum era)."""
    hdr = buf[pos]
    pos += 1
    bits67 = hdr >> 6
    nb = 4 if bits67 == 0 else 3 - bits67
    do_lut = bool(hdr & 0x20)
    num_bits = hdr & 31
    if nb == 1:
        num_elements = buf[pos]
    elif nb == 2:
        (num_elements,) = struct.unpack_from("<H", buf, pos)
    else:
        (num_elements,) = struct.unpack_from("<I", buf, pos)
    pos += nb
    if num_elements > max_count:
        raise ValueError("LERC: element count overrun")

    def unstuff_pre_v3(count: int, nbits: int,
                       pos: int) -> tuple[np.ndarray, int]:
        """Version <= 2 layout: MSB-first inside LE uint32 words; the
        tail bytes of the last word are not stored and the stored low
        bytes are shifted up (BitStuffer2.cpp BitUnStuff_Before_
        Lerc2v3)."""
        if count == 0 or nbits == 0:
            return np.zeros(count, dtype=np.uint32), pos
        num_uints = (count * nbits + 31) // 32
        tail_bits = (count * nbits) & 31
        tail_bytes = (4 - ((tail_bits + 7) >> 3)) if tail_bits else 0
        used = (count * nbits + 7) // 8
        raw = buf[pos : pos + used] + b"\x00" * (num_uints * 4 - used)
        words = np.frombuffer(raw, dtype="<u4").astype(np.uint64).copy()
        if tail_bytes:
            words[-1] = (words[-1] << np.uint64(8 * tail_bytes)) & np.uint64(
                0xFFFFFFFF
            )
        out = np.empty(count, dtype=np.uint32)
        gpos = 0
        for i in range(count):
            w = gpos >> 5
            off = gpos & 31
            if off + nbits <= 32:
                v = (int(words[w]) << off & 0xFFFFFFFF) >> (32 - nbits)
            else:
                hi = (int(words[w]) << off & 0xFFFFFFFF) >> (32 - nbits)
                v = hi | (int(words[w + 1]) >> (64 - nbits - off))
            out[i] = v
            gpos += nbits
        return out, pos + used

    def unstuff(count: int, nbits: int, pos: int) -> tuple[np.ndarray, int]:
        if version < 3:
            return unstuff_pre_v3(count, nbits, pos)
        if count == 0 or nbits == 0:
            return np.zeros(count, dtype=np.uint32), pos
        num_uints = (count * nbits + 31) // 32
        tail_bits = (count * nbits) & 31
        tail_bytes = (4 - ((tail_bits + 7) >> 3)) if tail_bits else 0
        used = num_uints * 4 - tail_bytes
        raw = buf[pos : pos + used] + b"\x00" * tail_bytes
        words = np.frombuffer(raw, dtype="<u4").astype(np.uint64)
        idx = np.arange(count, dtype=np.uint64) * np.uint64(nbits)
        w = (idx >> np.uint64(5)).astype(np.int64)
        off = (idx & np.uint64(31)).astype(np.uint64)
        lo = words[w] >> off
        need2 = (off + np.uint64(nbits)) > np.uint64(32)
        hi = np.zeros_like(lo)
        w2 = np.minimum(w + 1, len(words) - 1)
        hi[need2] = words[w2[need2]] << (np.uint64(32) - off[need2])
        vals = (lo | hi) & np.uint64((1 << nbits) - 1)
        return vals.astype(np.uint32), pos + used

    if not do_lut:
        vals, pos = unstuff(num_elements, num_bits, pos)
        return vals, pos
    n_lut = buf[pos] - 1
    pos += 1
    if num_bits == 0:
        raise ValueError("LERC: LUT with zero bit width")
    lut, pos = unstuff(n_lut, num_bits, pos)
    n_bits_lut = max(1, int(n_lut).bit_length())
    idxs, pos = unstuff(num_elements, n_bits_lut, pos)
    full = np.concatenate([[np.uint32(0)], lut])
    if idxs.size and int(idxs.max()) >= len(full):
        raise ValueError("LERC: LUT index overrun")
    return full[idxs], pos


def _read_huffman_table(buf: bytes, pos: int,
                        version: int) -> tuple[dict, int]:
    hver, size, i0, i1 = struct.unpack_from("<iiii", buf, pos)
    pos += 16
    if hver < 2 or size <= 0 or i0 >= i1:
        raise ValueError("LERC: bad Huffman table header")
    lengths, pos = _bitstuff_decode(buf, pos, i1 - i0, version)
    if len(lengths) != i1 - i0:
        raise ValueError("LERC: Huffman length count mismatch")
    # codes: MSB-first in LE uint32 words, only for symbols with len>0
    br = _WordBitReader(buf, pos)
    table: dict[tuple[int, int], int] = {}
    for i in range(i0, i1):
        k = i - size if i >= size else i
        ln = int(lengths[i - i0])
        if ln > 0:
            code = br.read(ln)
            table[(ln, code)] = k
    pos += br.bytes_consumed()
    return table, pos


def _huffman_decode_values(table: dict, buf: bytes, pos: int,
                           count: int) -> np.ndarray:
    br = _WordBitReader(buf, pos)
    out = np.empty(count, dtype=np.int64)
    maxlen = max(ln for ln, _ in table) if table else 0
    for i in range(count):
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                out[i] = sym
                break
            if ln > maxlen:
                raise ValueError("LERC: bad Huffman stream")
    return out


def lerc2_decode(buf: bytes):
    """-> (array (nRows, nCols) or (nRows, nCols, nDim), valid_mask
    bool (nRows, nCols), info dict)."""
    buf = bytes(buf)
    if buf[:6] != b"Lerc2 ":
        raise ValueError("not a Lerc2 blob")
    pos = 6
    (version,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if version > 4 or version < 1:
        raise ValueError(f"LERC: unsupported version {version}")
    checksum = None
    if version >= 3:
        (checksum,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    n_ints = 7 if version >= 4 else 6
    ints = struct.unpack_from(f"<{n_ints}i", buf, pos)
    pos += 4 * n_ints
    max_z_error, z_min, z_max = struct.unpack_from("<3d", buf, pos)
    pos += 24
    i = 0
    n_rows = ints[i]; i += 1
    n_cols = ints[i]; i += 1
    n_dim = ints[i] if version >= 4 else 1
    if version >= 4:
        i += 1
    num_valid = ints[i]; i += 1
    micro = ints[i]; i += 1
    blob_size = ints[i]; i += 1
    dt = ints[i]
    if dt not in _DTYPES or micro <= 0 or micro > 32:
        raise ValueError("LERC: bad header")
    if version >= 3:
        hdr_len = 6 + 4 + 4
        if _fletcher32(buf[hdr_len:blob_size]) != checksum:
            raise ValueError("LERC: checksum mismatch")
    dtype = _DTYPES[dt]
    info = {"version": version, "dt": dt, "n_rows": n_rows,
            "n_cols": n_cols, "n_dim": n_dim, "max_z_error": max_z_error,
            "z_min": z_min, "z_max": z_max, "blob_size": blob_size}

    # mask
    (n_mask_bytes,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    npix = n_rows * n_cols
    if num_valid == 0:
        mask = np.zeros(npix, dtype=bool)
    elif num_valid == npix:
        mask = np.ones(npix, dtype=bool)
    else:
        mask_bytes, pos2 = _rle_decompress(buf, pos, (npix + 7) // 8)
        if pos2 - pos != n_mask_bytes:
            pos2 = pos + n_mask_bytes
        pos = pos2
        bits = np.unpackbits(
            np.frombuffer(mask_bytes, dtype=np.uint8), count=npix
        )
        mask = bits.astype(bool)

    data = np.zeros(npix * n_dim, dtype=dtype)
    out_shape = (n_rows, n_cols) if n_dim == 1 else (n_rows, n_cols, n_dim)

    def done():
        return (data.reshape(out_shape), mask.reshape(n_rows, n_cols), info)

    if num_valid == 0:
        return done()
    if z_min == z_max:  # const image
        data[np.repeat(mask, n_dim)] = dtype(z_min) if dt < 6 else z_min
        return done()

    z_min_vec = [z_min] * n_dim
    z_max_vec = [z_max] * n_dim
    if version >= 4:
        vec = np.frombuffer(buf, dtype=dtype, count=2 * n_dim, offset=pos)
        pos += 2 * n_dim * dtype().itemsize
        z_min_vec = [float(v) for v in vec[:n_dim]]
        z_max_vec = [float(v) for v in vec[n_dim:]]
        if np.array_equal(vec[:n_dim], vec[n_dim:]):
            rep = np.repeat(mask, n_dim)
            full = np.tile(np.asarray(vec[:n_dim], dtype=dtype), npix)
            data[rep] = full[rep]
            return done()

    one_sweep = buf[pos]
    pos += 1
    if one_sweep:
        vals = np.frombuffer(buf, dtype=dtype, count=num_valid * n_dim,
                             offset=pos)
        sel = np.repeat(mask, n_dim)
        data[sel] = vals
        return done()

    try_huffman = version > 1 and dt in (0, 1) and max_z_error == 0.5
    if try_huffman:
        mode = buf[pos]
        pos += 1
        if mode > 2 or (version < 4 and mode > 1):
            raise ValueError("LERC: bad image encode mode")
        if mode in (1, 2):  # DeltaHuffman / Huffman
            table, pos = _read_huffman_table(buf, pos, version)
            vals = _huffman_decode_values(
                table, buf, pos, num_valid * n_dim
            )
            offset = 128 if dt == 0 else 0
            v = (vals - offset).astype(np.int64)
            m2 = mask.reshape(n_rows, n_cols)
            d2 = data.reshape(npix, n_dim)
            if mode == 2:  # plain Huffman, pixel-interleaved dims
                sel = np.repeat(mask, n_dim)
                d2.reshape(-1)[sel] = v.astype(dtype)
                return done()
            # DeltaHuffman: per dim, row-major delta with mask rules
            vi = 0
            for idim in range(n_dim):
                prev = 0
                for r in range(n_rows):
                    for c in range(n_cols):
                        k = r * n_cols + c
                        if not mask[k]:
                            continue
                        delta = int(v[vi]); vi += 1
                        if c > 0 and mask[k - 1]:
                            delta += prev
                        elif r > 0 and mask[k - n_cols]:
                            delta += int(d2[k - n_cols, idim])
                        else:
                            delta += prev
                        val = np.array(delta).astype(dtype).item()
                        d2[k, idim] = val
                        prev = val
            return done()

    # tiled microblocks
    d2 = data.reshape(n_rows, n_cols, n_dim)
    m2 = mask.reshape(n_rows, n_cols)
    tiles_v = (n_rows + micro - 1) // micro
    tiles_h = (n_cols + micro - 1) // micro
    for it in range(tiles_v):
        i0 = it * micro
        i1 = min(n_rows, i0 + micro)
        for jt in range(tiles_h):
            j0 = jt * micro
            j1 = min(n_cols, j0 + micro)
            for idim in range(n_dim):
                pos = _read_tile(
                    buf, pos, d2, m2, i0, i1, j0, j1, idim, dt, dtype,
                    max_z_error, z_max_vec[idim] if (version >= 4 and n_dim > 1)
                    else z_max, version,
                )
    return done()


def _dt_used(dt: int, bits67: int) -> int:
    if dt in (2, 4):      # Short, Int
        return dt - bits67
    if dt in (3, 5):      # UShort, UInt
        return dt - 2 * bits67
    if dt == 6:           # Float
        return 6 if bits67 == 0 else (2 if bits67 == 1 else 1)
    if dt == 7:           # Double
        return 7 if bits67 == 0 else dt - 2 * bits67 + 1
    return dt


def _read_tile(buf, pos, d2, m2, i0, i1, j0, j1, idim, dt, dtype,
               max_z_error, z_max, version):
    flag = buf[pos]
    pos += 1
    if ((flag >> 2) & 15) != ((j0 >> 3) & 15):
        raise ValueError("LERC: tile integrity code mismatch")
    bits67 = flag >> 6
    cf = flag & 3
    sub_mask = m2[i0:i1, j0:j1]
    if cf == 2:  # const 0
        d2[i0:i1, j0:j1, idim][sub_mask] = 0
        return pos
    if cf == 0:  # raw values for valid pixels
        cnt = int(sub_mask.sum())
        vals = np.frombuffer(buf, dtype=dtype, count=cnt, offset=pos)
        d2[i0:i1, j0:j1, idim][sub_mask] = vals
        return pos + cnt * dtype().itemsize
    dtu = _dt_used(dt, bits67)
    fmt = _OFFSET_FMT[dtu]
    (offset,) = struct.unpack_from(fmt, buf, pos)
    pos += _DTSIZE[dtu]
    if cf == 3:  # const offset
        d2[i0:i1, j0:j1, idim][sub_mask] = dtype(offset) if dt < 6 else offset
        return pos
    max_count = (i1 - i0) * (j1 - j0)
    vals, pos = _bitstuff_decode(buf, pos, max_count, version)
    inv_scale = 2.0 * max_z_error
    if vals.size == max_count:
        z = offset + vals.astype(np.float64) * inv_scale
        z = np.minimum(z, z_max)
        d2[i0:i1, j0:j1, idim] = z.reshape(i1 - i0, j1 - j0).astype(dtype)
    else:
        if vals.size == 0 and sub_mask.sum() > 0:
            vals = np.zeros(int(sub_mask.sum()), dtype=np.uint32)
        z = offset + vals.astype(np.float64) * inv_scale
        z = np.minimum(z, z_max)
        d2[i0:i1, j0:j1, idim][sub_mask] = z.astype(dtype)
    return pos


# --------------------------------------------------------------------------
# LERC v1 (CntZImage) — frmts/mrf/LERCV1/Lerc1Image.cpp re-derivation
# --------------------------------------------------------------------------

_STIB67 = (4, 2, 1, 0)


def _lerc1_blockread(buf: bytes, pos: int,
                     max_count: int) -> tuple[np.ndarray, int]:
    """Lerc1 bit-stuffed block (Lerc1Image.cpp:221-287): header byte =
    bits 0-5 value width + bits 6-7 element-count size; values packed
    MSB-first inside little-endian uint32 words, the final partial
    word's stored bytes sitting at its HIGH end."""
    hdr = buf[pos]
    n = _STIB67[hdr >> 6]
    num_bits = hdr & 63
    if num_bits >= 32 or n == 0:
        raise ValueError("LERC1: bad block header")
    pos += 1
    num_elements = int.from_bytes(buf[pos : pos + n], "little")
    pos += n
    if num_elements > max_count:
        raise ValueError("LERC1: block element overrun")
    if num_bits == 0:
        return np.zeros(num_elements, dtype=np.uint32), pos
    num_bytes = (num_elements * num_bits + 7) // 8
    raw = buf[pos : pos + num_bytes]
    full_words = num_bytes // 4
    words = list(np.frombuffer(raw, dtype="<u4", count=full_words))
    rest = num_bytes - full_words * 4
    if rest:
        tail = int.from_bytes(raw[full_words * 4 :], "little")
        words.append(tail << (8 * (4 - rest)))
    words = np.array(words, dtype=np.uint64)
    out = np.empty(num_elements, dtype=np.uint32)
    gpos = 0
    for i in range(num_elements):
        w = gpos >> 5
        off = gpos & 31
        if off + num_bits <= 32:
            v = (int(words[w]) << off & 0xFFFFFFFF) >> (32 - num_bits)
        else:
            v = (int(words[w]) << off & 0xFFFFFFFF) >> (32 - num_bits)
            v |= int(words[w + 1]) >> (64 - num_bits - off)
        out[i] = v
        gpos += num_bits
    return out, pos + num_bytes


def _lerc1_rle_mask(buf: bytes, pos: int, nbytes: int,
                    mask_size: int) -> bytes:
    out = bytearray()
    end = pos + nbytes
    sz = mask_size
    while sz > 0:
        cnt = int.from_bytes(buf[pos : pos + 2], "little", signed=True)
        pos += 2
        if cnt < 0:  # repeat next byte -cnt times
            out += buf[pos : pos + 1] * (-cnt)
            pos += 1
            sz += cnt
        else:
            out += buf[pos : pos + cnt]
            pos += cnt
            sz -= cnt
    cnt = int.from_bytes(buf[pos : pos + 2], "little", signed=True)
    if cnt != -32768:
        raise ValueError("LERC1: mask RLE missing EOT")
    if pos + 2 > end:
        raise ValueError("LERC1: mask RLE overrun")
    return bytes(out)


def lerc1_decode(buf: bytes):
    """CntZImage (LERC v1) -> (float32 (h, w), valid mask, info)."""
    buf = bytes(buf)
    if buf[:10] != b"CntZImage ":
        raise ValueError("not a CntZImage (LERC1) blob")
    version, typ, h, w = struct.unpack_from("<4i", buf, 10)
    (max_z_error,) = struct.unpack_from("<d", buf, 26)
    pos = 34
    if version != 11 or typ != 8:
        raise ValueError("LERC1: bad version/type")
    info = {"version": 1, "n_rows": h, "n_cols": w,
            "max_z_error": max_z_error}
    npix = h * w
    arr = np.zeros((h, w), dtype=np.float32)
    mask = np.ones(npix, dtype=bool)
    for z_part in (False, True):
        ntv, nth, nbytes = struct.unpack_from("<3i", buf, pos)
        (max_val,) = struct.unpack_from("<f", buf, pos + 12)
        pos += 16
        if not z_part:
            if ntv != 0 or nth != 0:
                raise ValueError("LERC1: tiled cnt part")
            if nbytes == 0:
                mask[:] = max_val != 0
            else:
                mb = _lerc1_rle_mask(buf, pos, nbytes, (npix + 7) // 8)
                mask = np.unpackbits(
                    np.frombuffer(mb, dtype=np.uint8), count=npix
                ).astype(bool)
        else:
            m2 = mask.reshape(h, w)
            tp = pos
            tile_h = h // ntv
            tile_w = w // nth
            if tile_h <= 0 or tile_w <= 0:
                raise ValueError("LERC1: bad tiling")
            for r0 in range(0, h, tile_h):
                r1 = min(h, r0 + tile_h)
                for c0 in range(0, w, tile_w):
                    c1 = min(w, c0 + tile_w)
                    tp = _lerc1_read_ztile(
                        buf, tp, arr, m2, r0, r1, c0, c1, max_z_error,
                        max_val,
                    )
        pos += nbytes
    return arr, mask.reshape(h, w), info


def _lerc1_read_ztile(buf, pos, arr, m2, r0, r1, c0, c1, max_z_error,
                      max_val):
    flag = buf[pos]
    pos += 1
    n = _STIB67[flag >> 6]
    flag &= 63
    if flag > 3 or n == 0:
        raise ValueError("LERC1: bad tile flag")
    sub_mask = m2[r0:r1, c0:c1]
    if flag == 2:  # whole tile (valid or not) = 0
        arr[r0:r1, c0:c1] = 0.0
        return pos
    if flag == 0:  # stored floats for valid pixels
        cnt = int(sub_mask.sum())
        vals = np.frombuffer(buf, dtype="<f4", count=cnt, offset=pos)
        arr[r0:r1, c0:c1][sub_mask] = vals
        return pos + 4 * cnt
    if n == 4:
        (minval,) = struct.unpack_from("<f", buf, pos)
    elif n == 2:
        (minval,) = struct.unpack_from("<h", buf, pos)
    else:
        (minval,) = struct.unpack_from("<b", buf, pos)
    pos += n
    if flag == 3:  # whole tile (valid or not) = minval
        arr[r0:r1, c0:c1] = np.float32(minval)
        return pos
    vals, pos = _lerc1_blockread(buf, pos, (r1 - r0) * (c1 - c0))
    q = 2.0 * max_z_error
    cnt = int(sub_mask.sum())
    if len(vals) != cnt:
        raise ValueError("LERC1: tile value count mismatch")
    z = np.minimum(max_val, (minval + q * vals.astype(np.float64))
                   ).astype(np.float32)
    arr[r0:r1, c0:c1][sub_mask] = z
    return pos


def lerc_strip_decode(raw: bytes):
    """A GTiff COMPRESSION=LERC strip/tile payload: raw Lerc2, or a
    zlib-wrapped one (LERC_DEFLATE), or a zstd-wrapped one (LERC_ZSTD,
    magic 28 b5 2f fd — functions/zstd.py)."""
    raw = bytes(raw)
    if raw[:6] == b"Lerc2 ":
        return lerc2_decode(raw)
    if raw[:10] == b"CntZImage ":
        return lerc1_decode(raw)
    if raw[:4] == b"\x28\xb5\x2f\xfd":
        from gdal_spark.functions.zstd import zstd_decompress

        return lerc2_decode(zstd_decompress(raw))
    if raw[:1] in (b"\x78", b"\x58", b"\x18"):
        import zlib

        return lerc2_decode(zlib.decompress(raw))
    raise ValueError("not a LERC strip")
