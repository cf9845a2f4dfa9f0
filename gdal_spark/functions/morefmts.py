"""Additional raster format drivers: BMP, PNM (PPM P6), GIF.

GDAL ships each of these as a standalone driver (frmts/bmp/bmpdataset.cpp,
frmts/pnm/pnmdataset.cpp, frmts/gif/gifdataset.cpp); here each is a
pure-numpy codec registered in the same ``fmt`` dict the engine's Arrow
decode UDFs dispatch on (functions/codecs.py), so new formats need zero
changes anywhere else in the engine.

  * "bmp" — Windows V3 DIB, 24-bit BI_RGB, bottom-up, BGR byte order,
    4-byte row padding. Lossless.
  * "pnm" — binary PPM ("P6", maxval 255), with comment/whitespace
    tolerant header parsing. Lossless.
  * "gif" — GIF89a, single frame, global color table, GIF-flavor LZW
    (LSB-first bit packing, variable initial code size — distinct from
    TIFF's MSB-first early-change variant in functions/tiff.py). Encode
    uses the exact palette when the image has <= 256 distinct colors
    (then the codec is lossless); otherwise it falls back to the
    engine's median-cut quantizer (raster/quantize.py) and is lossy by
    nature, like any GIF writer. Decode supports interlaced and
    non-interlaced frames and local color tables.

All codecs operate on (h, w, 3) uint8 arrays, the engine-wide contract.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (frmts/bmp/bmpdataset.cpp: BITMAPFILEHEADER + BITMAPINFOHEADER,
# 24 bpp BI_RGB)
# ---------------------------------------------------------------------------


def bmp_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header (OS/2) variant not supported")
    w, h, _planes, bpp, comp = struct.unpack_from("<iiHHI", data, 18)
    if comp not in (0, 1, 2):
        raise ValueError(f"BMP compression {comp} not supported")
    top_down = h < 0
    h = abs(h)
    if comp in (1, 2):
        # BI_RLE8 / BI_RLE4 (frmts/bmp/bmpdataset.cpp RLE decode)
        ncol = struct.unpack_from("<I", data, 46)[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, ncol * 4, 14 + hdr_size)
        pal = pal.reshape(ncol, 4)[:, 2::-1]
        idx = np.zeros((h, w), np.uint8)
        x = y = 0
        i = off
        n = len(data)
        while i + 1 < n:
            cnt, val = data[i], data[i + 1]
            i += 2
            if cnt:
                m = max(0, min(cnt, w - x))
                if comp == 1:
                    idx[y, x:x + m] = val
                else:
                    pair = np.array([val >> 4, val & 0x0F], np.uint8)
                    run = np.tile(pair, (cnt + 1) // 2)
                    idx[y, x:x + m] = run[:m]
                x += cnt
            elif val == 0:      # end of line
                x, y = 0, y + 1
                if y >= h:
                    break
            elif val == 1:      # end of bitmap
                break
            elif val == 2:      # delta
                x += data[i]
                y += data[i + 1]
                i += 2
            else:               # absolute mode
                cnt = val
                m = max(0, min(cnt, w - x))
                if comp == 1:
                    idx[y, x:x + m] = np.frombuffer(data, np.uint8, cnt, i)[:m]
                    i += (cnt + 1) & ~1
                else:
                    nb = (cnt + 1) // 2
                    raw = np.frombuffer(data, np.uint8, nb, i)
                    nib = np.column_stack([raw >> 4, raw & 0x0F]).ravel()
                    idx[y, x:x + m] = nib[:m]
                    i += (nb + 1) & ~1
                x += cnt
        arr = pal[np.minimum(idx, ncol - 1)]
        return np.ascontiguousarray(arr if top_down else arr[::-1])
    if bpp in (1, 4):
        ncol = struct.unpack_from("<I", data, 46)[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, ncol * 4, 14 + hdr_size)
        pal = pal.reshape(ncol, 4)[:, 2::-1]
        rowbits = w * bpp
        stride = ((rowbits + 31) // 32) * 4
        raw = np.frombuffer(data, np.uint8, h * stride, off).reshape(h, stride)
        if bpp == 1:
            idx = np.unpackbits(raw, axis=1)[:, :w]
        else:
            nib = np.stack([raw >> 4, raw & 0x0F], axis=2).reshape(h, -1)
            idx = nib[:, :w]
        arr = pal[np.minimum(idx, ncol - 1)]
        return np.ascontiguousarray(arr if top_down else arr[::-1])
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(data, np.uint8, h * stride, off).reshape(h, stride)
        arr = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:
        stride = w * 4
        rows = np.frombuffer(data, np.uint8, h * stride, off).reshape(h, w, 4)
        arr = rows[:, :, 2::-1]  # BGRA -> RGB
    elif bpp == 8:
        # palette image: color table follows the info header (BGRX quads)
        ncol = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(data, np.uint8, ncol * 4, 14 + hdr_size)
        pal = pal.reshape(ncol, 4)[:, 2::-1]  # -> RGB
        stride = (w + 3) & ~3
        idx = np.frombuffer(data, np.uint8, h * stride, off).reshape(h, stride)
        arr = pal[idx[:, :w]]
    else:
        raise ValueError(f"BMP bpp {bpp} not supported")
    return np.ascontiguousarray(arr if top_down else arr[::-1])


# ---------------------------------------------------------------------------
# PNM / PPM  (frmts/pnm/pnmdataset.cpp: "P6" binary, maxval <= 255)
# ---------------------------------------------------------------------------


def pnm_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr).tobytes()


def _pnm_tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ints, skipping '#' comments."""
    vals: list[int] = []
    while len(vals) < n:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return vals, pos


def pnm_decode(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("only binary PPM (P6) / PGM (P5) supported")
    gray = data[:2] == b"P5"
    (w, h, maxval), pos = _pnm_tokens(data, 3, 2)
    if maxval > 65535:
        raise ValueError(f"PNM maxval {maxval} out of range")
    pos += 1  # exactly one whitespace byte after maxval per spec
    nch = 1 if gray else 3
    if maxval > 255:  # 16-bit samples, big-endian per the netpbm spec
        pix = np.frombuffer(data, ">u2", h * w * nch, pos).astype(np.uint16)
        if gray:
            return pix.reshape(h, w)
        return pix.reshape(h, w, 3).copy()
    pix = np.frombuffer(data, np.uint8, h * w * nch, pos)
    if gray:
        return np.repeat(pix.reshape(h, w, 1), 3, axis=2)
    return pix.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# GIF  (frmts/gif/gifdataset.cpp via giflib; LZW per GIF89a appendix F)
# ---------------------------------------------------------------------------


def _gif_lzw_encode(idx: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW: LSB-first packing, clear=2^min, eoi=clear+1,
    code width grows AFTER the table holds 2^bits entries (no early
    change), table freeze at 4096 until the next clear."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    bits = min_code + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += bits
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for byte in idx.tobytes():
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code > (1 << bits) and bits < 12:
                bits += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            bits = min_code + 1
        w = c
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code: int, expected: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    bits = min_code + 1
    acc = nbits = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, bits, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        bits = min_code + 1
        prev = None

    reset()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= bits:
            code = acc & ((1 << bits) - 1)
            acc >>= bits
            nbits -= bits
            if code == clear:
                reset()
                continue
            if code == eoi:
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << bits) and bits < 12:
                bits += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        palette, idx = colors, inverse.astype(np.uint8)
    else:  # lossy path: engine median-cut quantizer
        from gdal_spark.raster import quantize as Q

        palette = Q.median_cut_pct(arr, 256)
        idx = Q.nearest_index(arr, palette).reshape(-1).astype(np.uint8)
    ct_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    min_code = max(2, ct_bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1), 0, 0)
    out += ct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(min_code)
    out += _subblocks(_gif_lzw_encode(idx, min_code))
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_decode(data: bytes, expand_palette: bool = True) -> np.ndarray:
    """GIF -> RGB (h, w, 3); with expand_palette=False the raw palette
    INDEX band (h, w) — GDAL's frmts/gif exposes the index band, so the
    reference autotest checksums (gdrivers/gif.py) are on indices."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: skip sub-blocks
            pos += 1
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame without color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code, w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            if not expand_palette:
                return idx
            return np.ascontiguousarray(ct[idx])
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF stream contains no image frame")


# --------------------------------------------------------------------------
# TGA (frmts/tga/tgadataset.cpp — Truevision TARGA). The reference driver
# is read-only; decode here covers its surface (types 1/2/10, 24/32-bit,
# both row orders, id-field and colormap skip) and encode exists to
# produce fixtures (type 10 RLE, 24-bit, top-down).
# --------------------------------------------------------------------------


def tga_encode(arr: np.ndarray) -> bytes:
    """Type-10 (RLE truecolor) 24-bit, top-down (descriptor bit 5)."""
    a = np.ascontiguousarray(arr[:, :, :3].astype(np.uint8))
    h, w = a.shape[:2]
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, 24, 0x20
    )
    out = [head]
    bgr = a[:, :, ::-1]
    for row in bgr:
        x = 0
        while x < w:
            # measure the run of identical pixels starting at x
            run = 1
            while x + run < w and run < 128 and (row[x + run] == row[x]).all():
                run += 1
            if run >= 2:
                out.append(bytes([0x80 | (run - 1)]) + row[x].tobytes())
                x += run
            else:
                # collect raw literals until the next >=2 run (max 128)
                start = x
                x += 1
                while x < w and x - start < 128:
                    nxt = 1
                    while x + nxt < w and nxt < 2 and (row[x + nxt] == row[x]).all():
                        nxt += 1
                    if nxt >= 2:
                        break
                    x += 1
                out.append(bytes([x - start - 1]) + row[start:x].tobytes())
    return b"".join(out)


def tga_decode(data: bytes) -> np.ndarray:
    (id_len, cmap_type, img_type, cm_first, cm_len, cm_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    pos = 18 + id_len
    if cmap_type:
        pos += cm_len * ((cm_bits + 7) // 8)
        cmap_raw = data[18 + id_len : pos]
    def rle_bytes(nch: int) -> bytes:
        nonlocal pos
        buf = bytearray()
        need = h * w * nch
        while len(buf) < need:
            ctrl = data[pos]
            pos += 1
            n = (ctrl & 0x7F) + 1
            if ctrl & 0x80:
                buf += data[pos : pos + nch] * n
                pos += nch
            else:
                buf += data[pos : pos + n * nch]
                pos += n * nch
        return bytes(buf)

    def expand16(px: np.ndarray) -> np.ndarray:
        """ARRR RRGG GGGB BBBB little-endian -> RGB; 5-bit channels
        scale by << 3 exactly like tgadataset.cpp:374 (no bit
        replication)."""
        v = px.reshape(-1, 2)
        val = v[:, 0].astype(np.uint16) | (v[:, 1].astype(np.uint16) << 8)
        r = (((val >> 10) & 0x1F) << 3).astype(np.uint8)
        g = (((val >> 5) & 0x1F) << 3).astype(np.uint8)
        b = ((val & 0x1F) << 3).astype(np.uint8)
        return np.stack([r, g, b], axis=-1).reshape(h, w, 3)

    if img_type in (2, 10):  # truecolor
        if bpp not in (16, 24, 32):
            raise ValueError(f"unsupported TGA bpp {bpp}")
        nch = bpp // 8
        if img_type == 2:
            px = np.frombuffer(data, np.uint8, h * w * nch, pos)
        else:
            px = np.frombuffer(rle_bytes(nch), np.uint8)
        if bpp == 16:
            img = expand16(px)
        else:
            img = px.reshape(h, w, nch)
            if nch == 4:  # BGRA -> RGBA (alpha kept — band 4 in frmts/tga)
                img = img[:, :, [2, 1, 0, 3]]
            else:  # BGR -> RGB
                img = img[:, :, ::-1]
    elif img_type in (3, 11):  # grayscale (11 = RLE)
        if bpp != 8:
            raise ValueError(f"unsupported TGA gray bpp {bpp}")
        if img_type == 3:
            px = np.frombuffer(data, np.uint8, h * w, pos)
        else:
            px = np.frombuffer(rle_bytes(1), np.uint8)
        img = np.repeat(px.reshape(h, w, 1), 3, axis=2)
    elif img_type in (1, 9):  # colormapped, 8-bit indices (9 = RLE)
        step = (cm_bits + 7) // 8
        raw_ct = np.frombuffer(cmap_raw, np.uint8).reshape(cm_len, step)
        if step == 2:  # 15/16-bit entries: 5-5-5, << 3 scale
            # (tgadataset.cpp:261-270)
            val = raw_ct[:, 0].astype(np.uint16) | (
                raw_ct[:, 1].astype(np.uint16) << 8)
            ct = np.stack([(((val >> 10) & 0x1F) << 3),
                           (((val >> 5) & 0x1F) << 3),
                           ((val & 0x1F) << 3)], axis=-1).astype(np.uint8)
        else:  # BGR(A) byte entries
            ct = raw_ct[:, :3][:, ::-1]
        if img_type == 1:
            idx = np.frombuffer(data, np.uint8, h * w, pos).reshape(h, w)
        else:
            idx = np.frombuffer(rle_bytes(1), np.uint8).reshape(h, w)
        img = ct[idx - cm_first]
    else:
        raise ValueError(f"unsupported TGA image type {img_type}")
    if not (desc & 0x20):  # bottom-up unless top-down bit set
        img = img[::-1]
    return np.ascontiguousarray(img)
