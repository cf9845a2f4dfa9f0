"""Arc/Info Binary Grid (AIG) reader.

Pure-numpy transcription of the reference coverage layout
(frmts/aigrid/gridlib.c block codecs, aigopen.c tile/index plumbing,
aigdataset.cpp byte-band presentation):

  hdr.adf      308-byte big-endian header: celltype i32@16 (1=int
               2=float), compressed-flag i32@20 (0 on disk == compressed),
               cellsize f64@256/@264, blocks-per-row i32@288,
               blocks-per-column i32@292, block w i32@296 / h i32@304.
  dblbnd.adf   4 big-endian doubles: LLX LLY URX URY.
  sta.adf      min/max/mean[/stddev] doubles (32-byte MSB or the 24-byte
               LSB variant).
  w001001x.adf block index: magic 00 00 27 0A FF FF, file length in
               shorts @24, then (offset, size) uint32 BE pairs from
               byte 100 — both in 2-byte units.
  w001001.adf  blocks; each starts with its size in shorts (2 bytes BE),
               then magic u8 + minsize u8 + min (minsize bytes,
               sign-extended) + payload per magic:
               0x00 const / 0x01 1-bit / 0x04 4-bit / 0x08 raw8 /
               0x10 raw16 / 0x20 raw32 / 0xE0 RLE i32 / 0xF0 RLE u16 /
               0xFC,0xF8 RLE u8 / 0xDF RLE min / 0xD7 literal u8 /
               0xCF literal u16 / marker>128 nodata run / 0xFF CCITT RLE
               (not supported here).

The reader takes a {lowercased filename: bytes} mapping so it can run
inside an Arrow batch over a directory listing — no driver-side IO.
"""

from __future__ import annotations

import struct

import numpy as np

ESRI_GRID_NO_DATA = -2147483647
ESRI_GRID_FLOAT_NO_DATA = np.float32(-3.4028234663852886e38)


def _signed_min(payload: bytes, minsize: int) -> int:
    if minsize == 0:
        return 0
    if minsize == 4:
        return struct.unpack(">i", payload[:4])[0]
    v = int.from_bytes(payload[:minsize], "big")
    if payload[0] > 127:
        v -= 1 << (8 * minsize)
    return v


def _rollover_i32(v: np.ndarray | int) -> np.ndarray | int:
    """int32 wraparound add semantics (AIGRolloverSignedAdd)."""
    return (np.asarray(v, np.int64) & 0xFFFFFFFF).astype(np.uint32).astype(
        np.int32
    )


def decode_block(block: bytes, bw: int, bh: int, celltype: int,
                 compressed: bool) -> np.ndarray:
    """One grid block -> (bh, bw) int32 (or float32 for celltype 2)."""
    n = bw * bh
    if len(block) == 0:
        return np.full((bh, bw), ESRI_GRID_NO_DATA, np.int32)
    size = struct.unpack(">H", block[:2])[0] * 2
    data = block[2:2 + size]
    if celltype == 2:
        vals = np.frombuffer(data, ">f4", n).astype(np.float32)
        return vals.reshape(bh, bw)
    if celltype == 1 and not compressed:
        vals = np.frombuffer(data, ">i4", n).astype(np.int32)
        return vals.reshape(bh, bw)
    magic, minsize = data[0], data[1]
    nmin = _signed_min(data[2:], minsize)
    payload = data[2 + minsize:]
    out = np.empty(n, np.int64)
    if magic == 0x00:
        out[:] = nmin
    elif magic == 0x08:
        out[:] = np.frombuffer(payload, np.uint8, n).astype(np.int64) + nmin
    elif magic == 0x04:
        half = (n + 1) // 2
        b = np.frombuffer(payload, np.uint8, half)
        px = np.empty(half * 2, np.int64)
        px[0::2] = b >> 4
        px[1::2] = b & 0x0F
        out[:] = px[:n] + nmin
    elif magic == 0x01:
        bits = np.unpackbits(np.frombuffer(payload, np.uint8,
                                           (n + 7) // 8))[:n]
        out[:] = bits.astype(np.int64) + nmin
    elif magic == 0x10:
        out[:] = np.frombuffer(payload, ">u2", n).astype(np.int64) + nmin
    elif magic == 0x20:
        out[:] = np.frombuffer(payload, ">i4", n).astype(np.int64) + nmin
    elif magic == 0xFF:
        raise ValueError("AIG CCITT-RLE (0xFF) blocks not supported")
    else:
        pos = 0
        filled = 0
        while filled < n and pos < len(payload):
            marker = payload[pos]
            pos += 1
            if magic == 0xE0:
                val = struct.unpack(">i", payload[pos:pos + 4])[0] + nmin
                pos += 4
                out[filled:filled + marker] = val
                filled += marker
            elif magic == 0xF0:
                val = struct.unpack(">H", payload[pos:pos + 2])[0] + nmin
                pos += 2
                out[filled:filled + marker] = val
                filled += marker
            elif magic in (0xFC, 0xF8):
                out[filled:filled + marker] = payload[pos] + nmin
                pos += 1
                filled += marker
            elif magic == 0xDF and marker < 128:
                out[filled:filled + marker] = nmin
                filled += marker
            elif magic == 0xD7 and marker < 128:
                cnt = min(marker, len(payload) - pos)
                out[filled:filled + cnt] = (
                    np.frombuffer(payload, np.uint8, cnt, pos).astype(np.int64)
                    + nmin
                )
                pos += cnt
                filled += cnt
            elif magic == 0xCF and marker < 128:
                cnt = min(marker, (len(payload) - pos) // 2)
                out[filled:filled + cnt] = (
                    np.frombuffer(payload, ">u2", cnt, pos).astype(np.int64)
                    + nmin
                )
                pos += 2 * cnt
                filled += cnt
            elif marker > 128:
                run = 256 - marker
                out[filled:filled + run] = ESRI_GRID_NO_DATA
                filled += run
            else:
                raise ValueError(f"AIG block magic 0x{magic:02X} unsupported")
        if filled < n:
            raise ValueError("AIG block ran out of data")
    return np.asarray(_rollover_i32(out)).reshape(bh, bw)


def read_cover(files: dict[str, bytes]) -> tuple[np.ndarray, dict]:
    """Decode a whole coverage directory ({lowercase name: bytes}).
    Returns (array, meta) — int32 with ESRI_GRID_NO_DATA holes, or
    float32 with NaN holes for float grids."""
    files = {k.lower(): v for k, v in files.items()}
    hdr = files["hdr.adf"]
    celltype, rawcomp = struct.unpack(">ii", hdr[16:24])
    compressed = not rawcomp
    cellx, celly = struct.unpack(">dd", hdr[256:272])
    bpr, bpc, bw = struct.unpack(">iii", hdr[288:300])
    bh, = struct.unpack(">i", hdr[304:308])
    llx, lly, urx, ury = struct.unpack(">4d", files["dblbnd.adf"][:32])
    npix = int((urx - llx + 0.5 * cellx) / cellx)
    nlin = int((ury - lly + 0.5 * celly) / celly)
    tile_w = bw * bpr
    tile_h = bh * bpc
    tiles_per_row = (npix - 1) // tile_w + 1
    tiles_per_col = (nlin - 1) // tile_h + 1
    if celltype == 2:
        full = np.full((tiles_per_col * tile_h, tiles_per_row * tile_w),
                       np.nan, np.float32)
    else:
        full = np.full((tiles_per_col * tile_h, tiles_per_row * tile_w),
                       ESRI_GRID_NO_DATA, np.int32)
    for ty in range(tiles_per_col):
        for tx in range(tiles_per_row):
            base = f"w{tx + 1:03d}{ty + 1:03d}"
            idx = files.get(base + "x.adf")
            grid = files.get(base + ".adf")
            if idx is None or grid is None:
                continue
            if idx[:3] != b"\x00\x00\x27" or idx[3] != 0x0A:
                raise ValueError("AIG block index magic corrupt")
            length = struct.unpack(">I", idx[24:28])[0] * 2
            nblocks = (length - 100) // 8
            entries = np.frombuffer(idx, ">u4", nblocks * 2, 100).reshape(
                nblocks, 2
            )
            for bi in range(min(nblocks, bpr * bpc)):
                off = int(entries[bi, 0]) * 2
                size = int(entries[bi, 1]) * 2
                brow, bcol = divmod(bi, bpr)
                blk = decode_block(
                    grid[off:off + size + 2] if size else b"",
                    bw, bh, celltype, compressed,
                )
                y0 = ty * tile_h + brow * bh
                x0 = tx * tile_w + bcol * bw
                full[y0:y0 + bh, x0:x0 + bw] = blk
    arr = full[:nlin, :npix]
    meta: dict = {
        "gt": (llx, cellx, 0.0, ury, 0.0, -celly),
        "celltype": "float" if celltype == 2 else "int",
    }
    sta = files.get("sta.adf")
    if sta is not None:
        if len(sta) >= 32:
            mn, mx, mean, std = struct.unpack(">4d", sta[:32])
            meta.update(min=mn, max=mx, mean=mean, stddev=std)
        elif len(sta) >= 24:
            mn, mx, mean = struct.unpack("<3d", sta[:24])
            meta.update(min=mn, max=mx, mean=mean)
    return arr, meta


def as_byte_band(arr: np.ndarray, meta: dict) -> tuple[np.ndarray, float]:
    """The aigdataset.cpp presentation rule: integer grids with
    statistics min >= 0 and max <= 254 surface as a Byte band with
    nodata 255."""
    if meta.get("celltype") == "int" and meta.get("min", -1) >= 0 \
            and meta.get("max", 256) <= 254:
        out = arr.copy()
        out[out == ESRI_GRID_NO_DATA] = 255
        return out.astype(np.uint8), 255.0
    return arr, float(ESRI_GRID_NO_DATA)


def read_clr(text: str) -> np.ndarray:
    """.clr colormap: 'index r g b' lines -> (256, 4) RGBA uint8."""
    ct = np.zeros((256, 4), np.uint8)
    for line in text.splitlines():
        toks = line.split()
        if len(toks) >= 4 and not line.lstrip().startswith("#"):
            try:
                i = int(toks[0])
                if 0 <= i <= 255:
                    ct[i] = [int(float(toks[1])), int(float(toks[2])),
                             int(float(toks[3])), 255]
            except ValueError:
                continue
    return ct
