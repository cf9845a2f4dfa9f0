"""Baseline TIFF / GeoTIFF codec in pure numpy.

The reference's flagship driver (frmts/gtiff/, backed by libtiff).  This
is a from-scratch TIFF 6.0 implementation of the baseline feature set
GDAL's own test fixtures exercise:

* both byte orders (II/MM), classic 32-bit offsets;
* strips and tiles, chunky planar config, 8-bit samples, gray + RGB;
* compression: none (1), LZW (5, with the TIFF early-change variant and
  horizontal-predictor 2 support), PackBits (32773);
* GeoTIFF georeferencing tags ModelPixelScale (33550) + ModelTiepoint
  (33922) exposed as a GDAL-style geotransform, and GeoKeyDirectory
  (34735) passed through for the CRS code.

Writer emits little-endian, strip-organized files with compression
none/packbits/lzw/deflate (optional horizontal predictor 2 for
lzw/deflate), and optional geotransform tags — every written file
round-trips bit-exactly through the reader (LOSSLESS set in codecs).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 + GeoTIFF)
T_WIDTH, T_LENGTH, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR, T_SAMPLEFORMAT = 284, 317, 339
T_TILE_W, T_TILE_L, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_JPEGTABLES = 347
T_PIXEL_SCALE, T_TIEPOINT, T_GEOKEYS = 33550, 33922, 34735
T_GDAL_NODATA = 42113  # ASCII nodata value (GDAL extension tag)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 11: 4, 12: 8,
              16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 7: "B", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


class TiffError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            # literal stretch up to the next >=3 run
            j = i + 1
            while j < n and j - i < 128:
                r = 1
                while j + r < n and r < 3 and data[j + r] == data[j]:
                    r += 1
                if r >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first codes, early change)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bits, acc, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == _CLEAR:
                reset()
                bits = 9
                prev = None
                continue
            if code == _EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # TIFF early change (libtiff: "if (nextcode == maxcode - 1)
            # maxcode <<= 1"): widen when the NEXT entry index hits
            # 2^bits - 1 — verified against a libtiff-written stream
            # (gcore/data/gtiff/float32_lzw_predictor_3_big_endian.tif)
            if len(table) >= (1 << bits) - 1 and bits < 12:
                bits += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc, nbits = 0, 0
    bits = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
        else:
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            # early change: widen when the code ABOUT to be emitted could
            # reach 2^bits (decoder widens at next-entry == 2^bits - 1)
            if next_code >= (1 << bits) and bits < 12:
                bits += 1
            if next_code > 4093:
                emit(_CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                bits = 9
            w = c
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _read_ifd(
    data: bytes, bo: str, off: int, big: bool = False
) -> dict[int, tuple[int, list]]:
    """One IFD -> {tag: (type, values)}. ``big`` = BigTIFF (version 43):
    8-byte entry counts, 20-byte entries, 8-byte inline value slots —
    the 64-bit offset variant libtiff/GDAL use past the 4 GiB classic
    limit (frmts/gtiff BIGTIFF=YES/IF_NEEDED)."""
    if big:
        (n,) = struct.unpack_from(bo + "Q", data, off)
        ebase, esz, inline = off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(bo + "H", data, off)
        ebase, esz, inline = off + 2, 12, 4
    tags: dict[int, tuple[int, list]] = {}
    for i in range(n):
        if big:
            tag, typ, cnt = struct.unpack_from(bo + "HHQ", data, ebase + esz * i)
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", data, ebase + esz * i)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        vo = ebase + esz * i + (12 if big else 8)
        if size > inline:
            (vo,) = struct.unpack_from(bo + ("Q" if big else "I"), data, vo)
        if typ == 5:  # RATIONAL
            vals = []
            for k in range(cnt):
                num, den = struct.unpack_from(bo + "II", data, vo + 8 * k)
                vals.append(num / den if den else 0.0)
        elif typ == 2:
            vals = [data[vo : vo + cnt].split(b"\0")[0].decode("ascii", "replace")]
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                continue
            vals = list(struct.unpack_from(bo + str(cnt) + fmt, data, vo))
        tags[tag] = (typ, vals)
    return tags


def _undo_predictor(arr: np.ndarray) -> np.ndarray:
    # horizontal differencing: modular cumulative sum along the row axis
    if arr.dtype == np.uint8:
        return np.cumsum(arr.astype(np.uint16), axis=1).astype(np.uint8)
    if np.issubdtype(arr.dtype, np.integer):
        u = arr.astype(
            np.dtype(f"u{arr.dtype.itemsize}"), copy=False
        )
        return np.cumsum(u.astype(np.uint64), axis=1).astype(u.dtype).view(
            arr.dtype
        )
    raise TiffError("predictor 2 on non-integer samples")


def _undo_fp_predictor(raw: bytes, rows: int, w: int, spp: int, isz: int,
                       dt: np.dtype) -> np.ndarray:
    """Predictor 3 (floating-point, TIFF Technote 3): per row, bytes are
    byte-plane split (big-endian significance order) and horizontally
    differenced; undo = cumsum bytes then reassemble."""
    b = np.frombuffer(raw, np.uint8).reshape(rows, isz, w * spp).astype(np.uint16)
    b = np.cumsum(b.reshape(rows, isz * w * spp), axis=1).astype(np.uint8)
    b = b.reshape(rows, isz, w * spp)
    # byte plane k holds big-endian byte k of each sample
    be = np.dtype(">" + dt.str[1:])
    out = np.empty((rows, w * spp), dtype=be)
    ob = out.view(np.uint8).reshape(rows, w * spp, isz)
    for k in range(isz):
        ob[:, :, k] = b[:, k, :]
    return out.astype(dt)


def ifd_offsets(data: bytes, bo: str | None = None) -> list[int]:
    """Walk the IFD chain (classic TIFF next-IFD pointers) -> byte offsets.
    Multi-IFD files are how GDAL stores overviews inside a GeoTIFF/COG
    (frmts/gtiff: overview IFDs chained after the full-resolution IFD)."""
    if bo is None:
        bo = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    big = magic == 43
    offs = []
    if big:
        (off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        (off,) = struct.unpack_from(bo + "I", data, 4)
    while off:
        if off in offs or len(offs) > 64:
            raise TiffError("IFD chain loop")
        offs.append(off)
        if big:
            (n,) = struct.unpack_from(bo + "Q", data, off)
            (off,) = struct.unpack_from(bo + "Q", data, off + 8 + 20 * n)
        else:
            (n,) = struct.unpack_from(bo + "H", data, off)
            (off,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)
    return offs


def tiff_parse(data: bytes, ifd_index: int = 0) -> tuple[np.ndarray, dict]:
    """-> (array HxW or HxWx3 uint8, metadata dict with geotransform
    when georeferencing tags are present). ``ifd_index`` selects an IFD
    from the chain (0 = full resolution, 1.. = overview levels in a
    GDAL-style multi-IFD file)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic not in (42, 43):
        raise TiffError(f"bad TIFF magic {magic}")
    big = magic == 43
    if ifd_index == 0:
        if big:
            (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
        else:
            (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    else:
        chain = ifd_offsets(data, bo)
        if ifd_index >= len(chain):
            raise TiffError(f"no IFD {ifd_index} (chain has {len(chain)})")
        ifd_off = chain[ifd_index]
    tags = _read_ifd(data, bo, ifd_off, big=big)

    def one(tag, default=None):
        if tag in tags:
            return tags[tag][1][0]
        return default

    w, h = one(T_WIDTH), one(T_LENGTH)
    spp = one(T_SAMPLES, 1)
    comp = one(T_COMPRESSION, 1)
    pred = one(T_PREDICTOR, 1)
    bits = tags.get(T_BITS, (3, [8]))[1]
    if bits[0] == 1 and spp == 1:
        # bi-level strips: uncompressed bit-packed rows or CCITT G4
        rows_per = one(T_ROWS_PER_STRIP, h)
        offs = tags.get(T_STRIP_OFFSETS, (4, []))[1]
        cnts = tags.get(T_STRIP_COUNTS, (4, [len(data)]))[1]
        out1 = np.zeros((h, w), np.uint8)
        rowbytes = (w + 7) // 8
        for si, off in enumerate(offs):
            y0 = si * rows_per
            rows = min(rows_per, h - y0)
            chunk = data[off:off + (cnts[si] if si < len(cnts)
                                    else len(data) - off)]
            if comp == 1:
                raw = np.frombuffer(chunk, np.uint8,
                                    min(len(chunk), rows * rowbytes))
                raw = np.frombuffer(
                    raw.tobytes().ljust(rows * rowbytes, b"\x00"),
                    np.uint8).reshape(rows, rowbytes)
                bits_arr = np.unpackbits(raw, axis=1)[:, :w]
                out1[y0:y0 + rows] = bits_arr
            elif comp == 4:
                from gdal_spark.functions.ccitt import g4_decode
                out1[y0:y0 + rows] = g4_decode(chunk, w, rows)
            elif comp == 32773:
                raw = packbits_decode(chunk, rows * rowbytes)
                bits_arr = np.unpackbits(
                    np.frombuffer(raw, np.uint8).reshape(rows, rowbytes),
                    axis=1)[:, :w]
                out1[y0:y0 + rows] = bits_arr
            else:
                raise TiffError(f"unsupported 1-bit compression {comp}")
        meta1: dict = {"nbits": 1,
                       "photometric": one(T_PHOTOMETRIC, 1)}
        if T_PIXEL_SCALE in tags and T_TIEPOINT in tags:
            sx, sy = tags[T_PIXEL_SCALE][1][0], tags[T_PIXEL_SCALE][1][1]
            i, j, _, x, y_, _ = tags[T_TIEPOINT][1][:6]
            meta1["gt"] = (x - i * sx, sx, 0.0, y_ + j * sy, 0.0, -sy)
        return out1, meta1
    if any(b != bits[0] for b in bits) or bits[0] not in (8, 16, 32, 64, 128):
        raise TiffError(f"unsupported BitsPerSample {bits}")
    # 1 uint, 2 int, 3 float, 5 complex int, 6 complex float (TIFF 6 + GDAL)
    sfmt = tags.get(T_SAMPLEFORMAT, (3, [1]))[1][0]
    _DT = {
        (8, 1): "u1", (8, 2): "i1", (16, 1): "u2", (16, 2): "i2",
        (32, 1): "u4", (32, 2): "i4", (32, 3): "f4",
        (64, 1): "u8", (64, 2): "i8", (64, 3): "f8",
        # CInt16/CInt32 as (real, imag) structs; CFloat32/64 native complex
        (32, 5): [("r", "i2"), ("i", "i2")],
        (64, 5): [("r", "i4"), ("i", "i4")],
        (64, 6): "c8", (128, 6): "c16",
    }
    key = (bits[0], sfmt)
    if key not in _DT:
        raise TiffError(f"unsupported sample format {sfmt}/{bits[0]} bits")
    _spec = _DT[key]
    if isinstance(_spec, list):
        dt = np.dtype([(n, bo + t) for n, t in _spec])
    else:
        dt = np.dtype(bo + _spec)
    isz = dt.itemsize
    planar = one(T_PLANAR, 1)
    if planar not in (1, 2):
        raise TiffError(f"unsupported planar config {planar}")

    photometric = one(T_PHOTOMETRIC, 1)
    jpeg_tables = None
    if T_JPEGTABLES in tags:
        jpeg_tables = bytes(tags[T_JPEGTABLES][1])

    def jpeg_chunk(chunk: bytes, nsmp: int) -> bytes:
        """COMPRESSION_JPEG (7): each strip/tile is a JPEG bitstream;
        abbreviated streams get the DQT/DHT from the JPEGTables tag
        spliced after their SOI (libtiff tif_jpeg.c semantics).
        Photometric RGB means the components are stored without the
        YCbCr transform (libtiff forces the jpeg color space from the
        photometric, not from stream markers)."""
        from gdal_spark.functions.jpeg import jpeg_decode

        if bits[0] != 8:
            raise TiffError("JPEG-in-TIFF supported for 8-bit only")
        stream = chunk
        if jpeg_tables and len(jpeg_tables) > 4:
            body = jpeg_tables[2:]
            if body[-2:] == b"\xff\xd9":
                body = body[:-2]
            stream = b"\xff\xd8" + body + chunk[2:]
        arr = jpeg_decode(stream,
                          force_color="rgb" if photometric == 2 else None)
        if nsmp == 1:
            return arr[:, :, 0].tobytes()
        if nsmp == 3:
            return arr.tobytes()
        raise TiffError(f"JPEG-in-TIFF with {nsmp} samples not supported")

    def decompress(chunk: bytes, nbytes: int) -> bytes:
        if comp == 1:
            return chunk[:nbytes]
        if comp == 5:
            return lzw_decode(chunk, nbytes)
        if comp == 32773:
            return packbits_decode(chunk, nbytes)
        if comp in (8, 32946):  # Deflate / Adobe Deflate
            import zlib

            return zlib.decompress(chunk)[:nbytes]
        if comp == 7:  # new-style JPEG
            nsmp = 1 if planar == 2 else spp
            return jpeg_chunk(chunk, nsmp)[:nbytes]
        if comp == 34925:  # LZMA2 (libtiff tif_lzma.c, xz stream)
            import lzma

            return lzma.decompress(chunk)[:nbytes]
        if comp == 50000:  # ZSTD (tif_zstd.c)
            from gdal_spark.functions.zstd import zstd_decompress

            res = zstd_decompress(chunk)
            if not res and nbytes:
                # a well-formed frame decoding to nothing for a
                # non-empty strip is corruption (byte_zstd_corrupted)
                raise TiffError("ZSTD strip decoded to 0 bytes")
            return res[:nbytes]
        if comp == 34887:  # ESRI LERC (tif_lerc.c; raw or zlib-wrapped)
            from gdal_spark.raster.lerc import lerc_strip_decode

            arr, _mask, _info = lerc_strip_decode(chunk)
            return np.ascontiguousarray(arr).tobytes()[:nbytes]
        raise TiffError(f"unsupported compression {comp}")

    def chunk_to_samples(raw: bytes, rows: int, width: int, nsmp: int):
        """Decompressed chunk bytes -> (rows, width, nsmp) in native dtype,
        predictors undone. Writers may truncate partial final strips/tiles
        (gcore #1179) — pad short chunks with zeros."""
        need = rows * width * nsmp * isz
        if len(raw) < need:
            raw = raw + b"\x00" * (need - len(raw))
        if pred == 3:
            arr = _undo_fp_predictor(raw, rows, width, nsmp, isz, dt)
            return arr.reshape(rows, width, nsmp)
        arr = np.frombuffer(raw, dt, rows * width * nsmp).reshape(
            rows, width, nsmp
        )
        if pred == 2:
            if nsmp == 1:
                arr = _undo_predictor(arr.reshape(rows, width)).reshape(
                    rows, width, 1
                )
            elif dt.itemsize == 1:
                arr = _undo_predictor_rgb(arr)
            else:
                flat = _undo_predictor(
                    arr.reshape(rows, width * nsmp)
                )  # per-sample diff interleaved: cumsum per channel
                arr = flat.reshape(rows, width, nsmp)
        return arr

    out = np.zeros(
        (h, w, spp),
        dtype=np.dtype([(n, t) for n, t in _spec])
        if isinstance(_spec, list)
        else np.dtype(_spec),
    )
    for req in ((T_TILE_COUNTS,) if T_TILE_OFFSETS in tags
                else (T_STRIP_OFFSETS, T_STRIP_COUNTS)):
        if req not in tags:
            raise TiffError(f"missing required tag {req}")
    if T_TILE_OFFSETS in tags:
        tw, tl = one(T_TILE_W), one(T_TILE_L)
        offs = tags[T_TILE_OFFSETS][1]
        cnts = tags[T_TILE_COUNTS][1]
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        per_band = planar == 2 and spp > 1
        tiles_per_band = tiles_across * tiles_down
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            raw = decompress(data[o : o + c], tw * tl * (1 if per_band else spp) * isz)
            nsmp = 1 if per_band else spp
            tile = chunk_to_samples(raw, tl, tw, nsmp)
            band = ti // tiles_per_band if per_band else None
            tpos = ti % tiles_per_band if per_band else ti
            ty, tx = divmod(tpos, tiles_across)
            y0, x0 = ty * tl, tx * tw
            ys, xs = min(tl, h - y0), min(tw, w - x0)
            if per_band:
                out[y0 : y0 + ys, x0 : x0 + xs, band] = tile[:ys, :xs, 0]
            else:
                out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    elif planar == 2 and spp > 1:
        # band-sequential strips: offsets ordered band-major
        # (TIFF 6.0 PlanarConfiguration=2), one sample per strip row
        rps = one(T_ROWS_PER_STRIP, h)
        offs = tags[T_STRIP_OFFSETS][1]
        cnts = tags[T_STRIP_COUNTS][1]
        spb = (h + rps - 1) // rps  # strips per band
        for b in range(spp):
            y = 0
            for sidx in range(spb):
                o, c = offs[b * spb + sidx], cnts[b * spb + sidx]
                rows = min(rps, h - y)
                raw = decompress(data[o : o + c], rows * w * isz)
                out[y : y + rows, :, b] = chunk_to_samples(raw, rows, w, 1)[
                    :, :, 0
                ]
                y += rows
    else:
        rps = one(T_ROWS_PER_STRIP, h)
        offs = tags[T_STRIP_OFFSETS][1]
        cnts = tags[T_STRIP_COUNTS][1]
        y = 0
        for o, c in zip(offs, cnts):
            rows = min(rps, h - y)
            raw = decompress(data[o : o + c], rows * w * spp * isz)
            out[y : y + rows] = chunk_to_samples(raw, rows, w, spp)
            y += rows

    meta: dict = {"width": w, "height": h, "samples": spp, "compression": comp}
    if T_PIXEL_SCALE in tags and T_TIEPOINT in tags:
        sx, sy = tags[T_PIXEL_SCALE][1][0], tags[T_PIXEL_SCALE][1][1]
        tp = tags[T_TIEPOINT][1]
        # tiepoint (i, j, k, x, y, z): raster (i, j) pins world (x, y)
        i, j, _, x, y_, _ = tp[:6]
        meta["geotransform"] = (x - i * sx, sx, 0.0, y_ + j * sy, 0.0, -sy)
    if T_GEOKEYS in tags:
        meta["geokeys"] = tags[T_GEOKEYS][1]
    if T_GDAL_NODATA in tags:
        try:
            meta["nodata"] = float(tags[T_GDAL_NODATA][1][0])
        except (TypeError, ValueError):
            pass
    if out.dtype.names:  # complex int -> numpy complex
        cplx = np.complex64 if out.dtype["r"].itemsize == 2 else np.complex128
        out = out["r"].astype(cplx) + 1j * out["i"].astype(cplx)
    arr = out[:, :, 0] if spp == 1 else out
    return arr, meta


def _undo_predictor_rgb(tile: np.ndarray) -> np.ndarray:
    # per-sample horizontal differencing (predictor 2 on chunky RGB)
    return np.cumsum(tile.astype(np.uint16), axis=1).astype(np.uint8)


# ---------------------------------------------------------------------------
# Writer (little-endian, strips)
# ---------------------------------------------------------------------------


def tiff_encode(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 64,
    geotransform: tuple | None = None,
    predictor: int = 1,
    zlevel: int = 6,
) -> bytes:
    """uint8 gray (h, w) or RGB (h, w, 3) -> TIFF bytes.

    compression: none | lzw | packbits | deflate (COMPRESS=DEFLATE,
    the most common GeoTIFF compression — frmts/gtiff COMPRESSION_
    ADOBE_DEFLATE); predictor=2 applies horizontal differencing per
    sample before lzw/deflate (frmts/gtiff PREDICTOR=2)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise TiffError("writer supports uint8 only")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    comp = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8}[compression]
    if predictor not in (1, 2):
        raise TiffError("writer supports predictor 1 or 2")
    if predictor == 2 and comp not in (5, 8):
        raise TiffError("predictor requires lzw or deflate")

    import zlib

    strips = []
    for y in range(0, h, rows_per_strip):
        block = a[y : y + rows_per_strip]
        if predictor == 2:
            # horizontal differencing per interleaved sample (uint8
            # wraparound); the reader's _undo_predictor cumsums it back
            block = block.copy()
            block[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
        raw = block.tobytes()
        if comp == 5:
            raw = lzw_encode(raw)
        elif comp == 32773:
            raw = packbits_encode(raw)
        elif comp == 8:
            raw = zlib.compress(raw, zlevel)
        strips.append(raw)

    # layout: header | strip data | overflow values | IFD
    header = struct.pack("<2sHI", b"II", 42, 0)  # IFD offset patched later
    pos = len(header)
    strip_offsets, strip_counts = [], []
    for s in strips:
        strip_offsets.append(pos)
        strip_counts.append(len(s))
        pos += len(s)
    body = b"".join(strips)

    entries: list[tuple[int, int, int, list]] = [
        (T_WIDTH, 4, 1, [w]),
        (T_LENGTH, 4, 1, [h]),
        (T_BITS, 3, spp, [8] * spp),
        (T_COMPRESSION, 3, 1, [comp]),
        (T_PHOTOMETRIC, 3, 1, [2 if spp == 3 else 1]),
        (T_STRIP_OFFSETS, 4, len(strips), strip_offsets),
        (T_SAMPLES, 3, 1, [spp]),
        (T_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (T_STRIP_COUNTS, 4, len(strips), strip_counts),
        (T_PLANAR, 3, 1, [1]),
    ]
    if predictor == 2:
        entries.append((T_PREDICTOR, 3, 1, [2]))
    if geotransform is not None:
        gt = geotransform
        if gt[2] or gt[4]:
            raise TiffError("rotated geotransforms not supported")
        entries.append((T_PIXEL_SCALE, 12, 3, [gt[1], -gt[5], 0.0]))
        entries.append((T_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0]))
    entries.sort()

    # compute overflow area
    overflow = bytearray()
    overflow_base = pos
    packed_entries = []
    for tag, typ, cnt, vals in entries:
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        payload = struct.pack("<" + str(cnt) + fmt, *vals)
        if len(payload) <= 4:
            packed_entries.append((tag, typ, cnt, payload.ljust(4, b"\0")))
        else:
            packed_entries.append(
                (tag, typ, cnt, struct.pack("<I", overflow_base + len(overflow)))
            )
            overflow += payload
    ifd_off = overflow_base + len(overflow)
    ifd = struct.pack("<H", len(packed_entries))
    for tag, typ, cnt, val4 in packed_entries:
        ifd += struct.pack("<HHI", tag, typ, cnt) + val4
    ifd += struct.pack("<I", 0)
    header = struct.pack("<2sHI", b"II", 42, ifd_off)
    return header + body + bytes(overflow) + ifd


def tiff_decode(data: bytes) -> np.ndarray:
    arr, _ = tiff_parse(bytes(data))
    return arr
