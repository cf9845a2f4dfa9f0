"""RMF driver — Panorama RSW rasters / MTW DEMs (frmts/rmf:
rmfdataset.cpp, rmflzw.cpp).

Layout per the reference transcription (rmfdataset.cpp:1314-1440 field
offsets): 320-byte header — signature "RSW\\0" / "MTW\\0" / "\\0WSR"
(big endian), nBitDepth@52, nHeight@56, nWidth@60, nXTiles@64,
nYTiles@68, nTileHeight@72, nTileWidth@76, last-tile sizes@80/84,
color table@96/100, tile table@104/108 (uint32 offset + uint32 size
per tile, row-major), iCompression byte@208 (0 none / 1 LZW / 2 JPEG /
32 DEM), nodata double@296.

Pixel formats: 8bpp palette/gray, 24bpp BGR interleaved (GDAL band 1 =
red = byte 2), 32bpp BGRX, 16bpp packed 555, 1/4bpp MSB-first packed
palette indexes; MTW carries int/float elevation per nBitDepth
(64 = float64).

RMF LZW (rmflzw.cpp LZWReadStream, re-derived): 12-bit codes packed
two-per-three-bytes, string table hashed by
(((pred + signed(follow)) | 0x800)^2 >> 6) & 0xFFF with the +101
linear-probe chain, table frozen after 4096-256 insertions, the usual
KwKwK new-code case.

Scale shape: the tile table turns the raster into independent
(offset, size) ranges — per-task ranged reads.
"""

from __future__ import annotations

import struct

import numpy as np

RMF_NONE, RMF_LZW, RMF_JPEG, RMF_DEM = 0, 1, 2, 32


def open_rmf(data: bytes) -> dict:
    sig = bytes(data[:4])
    if sig == b"\x00WSR":
        be, kind = True, "RSW"
    elif sig == b"RSW\x00":
        be, kind = False, "RSW"
    elif sig == b"MTW\x00":
        be, kind = False, "MTW"
    else:
        raise ValueError("not an RMF file")
    e = ">" if be else "<"

    def u32(o):
        return struct.unpack_from(e + "I", data, o)[0]

    info = {
        "kind": kind, "be": be,
        "bitdepth": u32(52), "height": u32(56), "width": u32(60),
        "xtiles": u32(64), "ytiles": u32(68),
        "tile_h": u32(72), "tile_w": u32(76),
        "last_tile_h": u32(80), "last_tile_w": u32(84),
        "clr_off": u32(96), "clr_size": u32(100),
        "tbl_off": u32(104), "tbl_size": u32(108),
        "compression": data[208],
        "nodata": struct.unpack_from(e + "d", data, 296)[0],
    }
    n = info["tbl_size"] // 8
    info["tiles"] = [
        (u32(info["tbl_off"] + 8 * i), u32(info["tbl_off"] + 8 * i + 4))
        for i in range(n)
    ]
    return info


def color_table(data: bytes, info: dict) -> np.ndarray | None:
    if not info["clr_size"]:
        return None
    raw = np.frombuffer(
        data, np.uint8, info["clr_size"], offset=info["clr_off"]
    ).reshape(-1, 4)
    return raw[:, [2, 1, 0]].copy()  # stored BGR0


def lzw_decompress(src: bytes, out_size: int) -> bytes:
    """rmflzw.cpp LZWReadStream."""
    NO_PRED = 0xFFFF
    used = np.zeros(4096, dtype=bool)
    nxt = np.zeros(4096, dtype=np.uint16)
    pred = np.full(4096, NO_PRED, dtype=np.uint32)
    follow = np.zeros(4096, dtype=np.uint8)

    def update(p, f):
        sf = f - 256 if f >= 128 else f
        loc = ((p + sf) & 0xFFFFFFFF | 0x800)
        loc = ((loc * loc) >> 6) & 0xFFF
        nx = loc
        if used[loc]:
            while nxt[loc] != 0:
                loc = nxt[loc]
            nx = (loc + 101) & 0xFFF
            while used[nx]:
                nx += 1
                if nx >= 4096:
                    nx = 0
            nxt[loc] = nx
        used[nx] = True
        nxt[nx] = 0
        pred[nx] = p
        follow[nx] = f

    for c in range(256):
        update(NO_PRED, c)

    out = bytearray()
    pos = 0
    n = len(src)
    code = ((src[0] << 4) & 0xFF0) | ((src[1] >> 4) & 0x0F)
    pos = 1
    old = code
    bitsleft = True
    fin = int(follow[code])
    out.append(fin)
    count = 4096 - 256
    while pos < n:
        if bitsleft:
            code = (src[pos] & 0x0F) << 8
            pos += 1
            if pos >= n:
                break
            code |= src[pos]
            pos += 1
            bitsleft = False
        else:
            code = (src[pos] << 4) & 0xFF0
            pos += 1
            if pos >= n:
                break
            code |= (src[pos] >> 4) & 0x0F
            bitsleft = True
        in_code = code
        new_code = False
        last_char = 0
        if not used[code]:
            code = old
            last_char = fin
            new_code = True
        stack = bytearray()
        while pred[code] != NO_PRED:
            stack.append(int(follow[code]))
            code = int(pred[code])
        fin = int(follow[code])
        out.append(fin)
        out += stack[::-1]
        if new_code:
            fin = last_char
            out.append(fin)
        if count > 0:
            count -= 1
            update(old, fin)
        old = in_code
        if len(out) >= out_size:
            break
    return bytes(out[:out_size])


def read_band(data: bytes, info: dict, band: int = 0) -> np.ndarray:
    """One band, assembled from the tile table."""
    w, h = info["width"], info["height"]
    tw, th = info["tile_w"], info["tile_h"]
    bd = info["bitdepth"]
    e = ">" if info["be"] else "<"
    kind = info["kind"]
    if kind == "MTW":
        dt = {8: e + "i1", 16: e + "i2", 32: e + "i4",
              64: e + "f8"}[bd]
        nbands = 1
        bpp = bd // 8
    elif bd in (24, 32):
        nbands = 3
        bpp = bd // 8
        dt = "u1"
    else:
        nbands = 1
        bpp = None  # packed or byte
        dt = "u1"
    nx, ny = info["xtiles"], info["ytiles"]
    out = np.zeros((ny * th, nx * tw), dtype=np.dtype(dt).newbyteorder("="))
    for t, (off, size) in enumerate(info["tiles"][: nx * ny]):
        ty, tx = t // nx, t % nx
        if size == 0:
            continue
        # edge tiles are stored truncated to the last-tile dimensions
        cw = info["last_tile_w"] if tx == nx - 1 and info["last_tile_w"] else tw
        chh = info["last_tile_h"] if ty == ny - 1 and info["last_tile_h"] else th
        raw = bytes(data[off : off + size])
        if bd in (1, 4):
            rowbytes = (cw * bd + 7) // 8
            want = rowbytes * chh
        elif bpp:
            want = cw * chh * bpp
        else:
            want = cw * chh
        if info["compression"] == RMF_LZW:
            raw = lzw_decompress(raw, want)
        elif info["compression"] != RMF_NONE:
            raise ValueError(
                f"unsupported RMF compression {info['compression']}"
            )
        if bd in (1, 4):
            rowbytes = (cw * bd + 7) // 8
            packed = np.frombuffer(raw, np.uint8,
                                   rowbytes * chh).reshape(chh, rowbytes)
            if bd == 1:
                bits = np.unpackbits(packed, axis=1)[:, :cw]
            else:  # 4bpp: LOW nibble first (autotest 4bit.rsw 55221)
                bits = np.empty((chh, rowbytes * 2), dtype=np.uint8)
                bits[:, 0::2] = packed & 0x0F
                bits[:, 1::2] = packed >> 4
                bits = bits[:, :cw]
            tile = bits
        elif nbands == 3:
            px = np.frombuffer(raw, np.uint8,
                               cw * chh * bpp).reshape(chh, cw, bpp)
            # stored BGR(X): GDAL band 1 = red = byte index 2
            tile = px[:, :, 2 - band]
        else:
            tile = np.frombuffer(raw, dt, cw * chh).reshape(chh, cw)
        out[ty * th : ty * th + chh, tx * tw : tx * tw + cw] = tile
    return out[:h, :w]
