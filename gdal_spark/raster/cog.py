"""Cloud-Optimized GeoTIFF (COG) writer, reader, validator, tile scan.

Re-expresses the reference's COG driver (frmts/gtiff/cogdriver.cpp) and
its layout contract — the published COG/GDAL "ghost area" structure the
reference's own autotest validates with
autotest/gcore/validate_cloud_optimized_geotiff.py:

  * classic little-endian TIFF whose IFDs ALL precede any imagery bytes
    (``LAYOUT=IFDS_BEFORE_DATA``), so a reader learns the full tile map
    from one small head read;
  * full-resolution IFD first, then one overview IFD per level
    (NewSubfileType=1), each dimension halved until max(w, h) fits a
    single tile (cogdriver.cpp overview-count rule);
  * imagery laid out overview-first, SMALLEST level first, full
    resolution last, row-major within a level (``BLOCK_ORDER=ROW_MAJOR``)
    — the order a z0→zN tile consumer streams;
  * every tile preceded by a 4-byte little-endian size
    (``BLOCK_LEADER=SIZE_AS_UINT4``) and followed by a copy of its last 4
    bytes (``BLOCK_TRAILER=LAST_4_BYTES_REPEATED``) so a range reader can
    fetch leader+tile in one speculative request and detect concurrent
    rewrites;
  * the ghost-area text itself at byte 8, starting
    ``GDAL_STRUCTURAL_METADATA_SIZE=%06d bytes\\n`` (gt_private ghost
    header), with ``KNOWN_INCOMPATIBLE_EDITION=NO`` that an in-place
    editor would flip.

The distributed angle is the whole point of the format: `cog_tile_index`
is a driver-side metadata read (IFDs only — at object-store scale one
ranged GET), and `scan_cog_tiles` hands each Spark task only its tiles'
(offset, nbytes) slices, decoding LZW/PackBits per task with zero full-file
reads — the mapInPandas analog of GDAL's /vsicurl ranged tile fetches.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from gdal_spark.functions.tiff import (
    T_BITS,
    T_COMPRESSION,
    T_JPEGTABLES,
    T_LENGTH,
    T_PREDICTOR,
    T_PHOTOMETRIC,
    T_PIXEL_SCALE,
    T_PLANAR,
    T_SAMPLES,
    T_TIEPOINT,
    T_TILE_COUNTS,
    T_TILE_L,
    T_TILE_OFFSETS,
    T_TILE_W,
    T_WIDTH,
    TiffError,
    _read_ifd,
    ifd_offsets,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    tiff_parse,
)

T_SUBFILETYPE = 254  # NewSubfileType: 1 = reduced-resolution (overview)

_COMP = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8}

_GHOST_ITEMS = (
    "LAYOUT=IFDS_BEFORE_DATA\n"
    "BLOCK_ORDER=ROW_MAJOR\n"
    "BLOCK_LEADER=SIZE_AS_UINT4\n"
    "BLOCK_TRAILER=LAST_4_BYTES_REPEATED\n"
    "KNOWN_INCOMPATIBLE_EDITION=NO\n "
)


def _overview_shapes(h: int, w: int, blocksize: int) -> list[tuple[int, int]]:
    """Halve until the level fits one tile (cogdriver.cpp: overviews are
    generated while the largest dimension exceeds the block size)."""
    shapes = []
    while max(h, w) > blocksize:
        h = (h + 1) // 2
        w = (w + 1) // 2
        shapes.append((h, w))
    return shapes


def _tile_grid(arr: np.ndarray, ts: int) -> list[bytes]:
    """Row-major ts x ts tiles, edge tiles zero-padded (libtiff pads
    partial tiles to full tile size)."""
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    a = arr if arr.ndim == 3 else arr[:, :, None]
    tiles = []
    for ty in range(0, h, ts):
        for tx in range(0, w, ts):
            t = np.zeros((ts, ts, spp), dtype=a.dtype)
            sub = a[ty : ty + ts, tx : tx + ts]
            t[: sub.shape[0], : sub.shape[1]] = sub
            tiles.append(t.tobytes())
    return tiles


_VAL_FMT = {3: "H", 4: "I", 12: "d", 16: "Q"}


def _pack_ifd(
    entries: list[tuple[int, int, int, list]],
    ifd_off: int,
    next_off: int,
    big: bool = False,
) -> bytes:
    """Serialize one little-endian IFD at ``ifd_off``; values wider than
    the inline slot go to an overflow block immediately after the entry
    table. ``big`` = BigTIFF layout (8-byte counts/offsets, 20-byte
    entries)."""
    entries = sorted(entries)
    n = len(entries)
    inline = 8 if big else 4
    overflow_base = ifd_off + _ifd_size(n, 0, big)
    overflow = bytearray()
    body = struct.pack("<Q", n) if big else struct.pack("<H", n)
    head = "<HHQ" if big else "<HHI"
    ptr = "<Q" if big else "<I"
    for tag, typ, cnt, vals in entries:
        payload = struct.pack("<" + str(cnt) + _VAL_FMT[typ], *vals)
        if len(payload) <= inline:
            body += struct.pack(head, tag, typ, cnt) + payload.ljust(inline, b"\0")
        else:
            body += struct.pack(head, tag, typ, cnt) + struct.pack(
                ptr, overflow_base + len(overflow)
            )
            overflow += payload
    body += struct.pack(ptr, next_off)
    return bytes(body) + bytes(overflow)


def _ifd_size(n_entries: int, overflow: int, big: bool = False) -> int:
    if big:
        return 8 + 20 * n_entries + 8 + overflow
    return 2 + 12 * n_entries + 4 + overflow


def write_cog(
    arr: np.ndarray,
    geotransform: tuple | None = None,
    blocksize: int = 256,
    resampling: str = "average",
    compress: str = "lzw",
    bigtiff: bool | str = "auto",
    predictor: int = 1,
    zlevel: int = 6,
) -> bytes:
    """uint8 gray (h, w) or RGB (h, w, 3) -> COG bytes.

    Overviews are built with the engine's overview kernel set
    (`raster.kernels.block_reduce`, gcore/overview.cpp semantics) at the
    chosen resampling, one per halving until a level fits a single tile.

    ``bigtiff``: True = BigTIFF (version 43, 64-bit offsets), False =
    classic, "auto" = BigTIFF when the uncompressed payload could
    overflow classic 32-bit offsets — GDAL's BIGTIFF=IF_SAFER. At the
    100 TB corpus scale individual mosaicked COGs routinely exceed 4 GiB,
    so the auto path is the production default.
    """
    from gdal_spark.raster.kernels import block_reduce

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise TiffError("COG writer supports uint8 only")
    if blocksize % 16:
        raise TiffError("COG block size must be a multiple of 16")
    spp = 1 if a.ndim == 2 else a.shape[2]
    comp = _COMP[compress]
    if predictor not in (1, 2):
        raise TiffError("COG writer supports predictor 1 or 2")
    if predictor == 2 and comp not in (5, 8):
        raise TiffError("predictor requires lzw or deflate")

    # level 0 = full res; levels[i>0] halved i times
    levels = [a]
    for _ in _overview_shapes(a.shape[0], a.shape[1], blocksize):
        levels.append(block_reduce(levels[-1], 2, 2, resampling))

    def _compress(raw: bytes) -> bytes:
        if predictor == 2:
            # horizontal differencing per interleaved sample on the
            # fixed blocksize x blocksize tile (frmts/gtiff PREDICTOR=2)
            t = np.frombuffer(raw, np.uint8).reshape(
                blocksize, blocksize, spp).copy()
            t[:, 1:, :] -= t[:, :-1, :]
            raw = t.tobytes()
        if comp == 5:
            return lzw_encode(raw)
        if comp == 32773:
            return packbits_encode(raw)
        if comp == 8:
            import zlib

            return zlib.compress(raw, zlevel)
        return raw

    tiles_per_level = [
        [_compress(t) for t in _tile_grid(lv, blocksize)] for lv in levels
    ]

    if bigtiff == "auto":
        # IF_SAFER: uncompressed pyramid (≈4/3 of level 0) + headroom
        # must fit classic 32-bit offsets, else flip to BigTIFF
        big = a.nbytes + a.nbytes // 3 + (1 << 24) >= (1 << 32)
    else:
        big = bool(bigtiff)
    off_typ = 16 if big else 4  # TileOffsets as LONG8 in BigTIFF

    # ---- ghost area ----
    ghost_head = f"GDAL_STRUCTURAL_METADATA_SIZE={len(_GHOST_ITEMS):06d} bytes\n"
    ghost = (ghost_head + _GHOST_ITEMS).encode("ascii")
    first_ifd = (16 if big else 8) + len(ghost)

    # ---- IFD entry tables (values patched after layout) ----
    def _entries(li: int, lv: np.ndarray) -> list[tuple[int, int, int, list]]:
        h, w = lv.shape[:2]
        ntiles = len(tiles_per_level[li])
        e = [
            (T_WIDTH, 4, 1, [w]),
            (T_LENGTH, 4, 1, [h]),
            (T_BITS, 3, spp, [8] * spp),
            (T_COMPRESSION, 3, 1, [comp]),
            (T_PHOTOMETRIC, 3, 1, [2 if spp == 3 else 1]),
            (T_SAMPLES, 3, 1, [spp]),
            (T_PLANAR, 3, 1, [1]),
            (T_TILE_W, 3, 1, [blocksize]),
            (T_TILE_L, 3, 1, [blocksize]),
            (T_TILE_OFFSETS, off_typ, ntiles, [0] * ntiles),
            (T_TILE_COUNTS, 4, ntiles, [len(t) for t in tiles_per_level[li]]),
        ]
        if predictor == 2:
            e.append((T_PREDICTOR, 3, 1, [2]))
        if li > 0:
            e.append((T_SUBFILETYPE, 4, 1, [1]))
        elif geotransform is not None:
            gt = geotransform
            if gt[2] or gt[4]:
                raise TiffError("rotated geotransforms not supported")
            e.append((T_PIXEL_SCALE, 12, 3, [gt[1], -gt[5], 0.0]))
            e.append((T_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0]))
        return e

    entry_tables = [_entries(i, lv) for i, lv in enumerate(levels)]

    inline = 8 if big else 4

    def _overflow_bytes(entries) -> int:
        tot = 0
        for _, typ, cnt, _ in entries:
            sz = {3: 2, 4: 4, 12: 8, 16: 8}[typ] * cnt
            if sz > inline:
                tot += sz
        return tot

    ifd_offs = []
    pos = first_ifd
    for ents in entry_tables:
        ifd_offs.append(pos)
        pos += _ifd_size(len(ents), _overflow_bytes(ents), big)

    # ---- imagery layout: smallest overview first, full res last ----
    data_start = pos
    tile_offsets: list[list[int]] = [[] for _ in levels]
    blobs = []
    for li in range(len(levels) - 1, -1, -1):
        for t in tiles_per_level[li]:
            leader = struct.pack("<I", len(t))
            trailer = t[-4:] if len(t) >= 4 else t.ljust(4, b"\0")
            tile_offsets[li].append(pos + 4)
            blobs.append(leader + t + trailer)
            pos += 4 + len(t) + len(trailer)

    for li, ents in enumerate(entry_tables):
        for i, (tag, typ, cnt, vals) in enumerate(ents):
            if tag == T_TILE_OFFSETS:
                ents[i] = (tag, typ, cnt, tile_offsets[li])

    if big:
        out = bytearray(struct.pack("<2sHHHQ", b"II", 43, 8, 0, first_ifd))
    else:
        out = bytearray(struct.pack("<2sHI", b"II", 42, first_ifd))
    out += ghost
    for li, ents in enumerate(entry_tables):
        nxt = ifd_offs[li + 1] if li + 1 < len(levels) else 0
        out += _pack_ifd(ents, ifd_offs[li], nxt, big)
    assert len(out) == data_start, (len(out), data_start)
    for b in blobs:
        out += b
    return bytes(out)


# ---------------------------------------------------------------------------
# Reader / metadata
# ---------------------------------------------------------------------------


def cog_info(data: bytes) -> dict:
    """Driver-side metadata read: ghost items + per-level tile map.
    Touches only the head of the file (header + ghost + IFD chain) — the
    object-store access pattern COG exists for."""
    if data[:2] != b"II":
        raise TiffError("COG reader expects little-endian TIFF")
    (magic,) = struct.unpack_from("<H", data, 2)
    big = magic == 43
    ghost: dict[str, str] = {}
    gpos = 16 if big else 8  # ghost sits right after the header
    if data[gpos : gpos + 30].startswith(b"GDAL_STRUCTURAL_METADATA_SIZE="):
        head_end = data.index(b"\n", gpos) + 1
        size = int(data[gpos + 30 : head_end - 7].split()[0])
        for line in data[head_end : head_end + size].decode("ascii").splitlines():
            if "=" in line:
                k, v = line.split("=", 1)
                ghost[k.strip()] = v.strip()
    lvls = []
    for off in ifd_offsets(data, "<"):
        tags = _read_ifd(data, "<", off, big=big)

        def one(tag, default=None):
            return tags[tag][1][0] if tag in tags else default

        lvls.append(
            {
                "ifd_offset": off,
                "width": one(T_WIDTH),
                "height": one(T_LENGTH),
                "tile_w": one(T_TILE_W),
                "tile_h": one(T_TILE_L),
                "samples": one(T_SAMPLES, 1),
                "compression": one(T_COMPRESSION, 1),
                "predictor": one(T_PREDICTOR, 1),
                "photometric": one(T_PHOTOMETRIC, 1),
                "jpeg_tables": bytes(tags[T_JPEGTABLES][1])
                if T_JPEGTABLES in tags else None,
                "subfile_type": one(T_SUBFILETYPE, 0),
                "tile_offsets": tags.get(T_TILE_OFFSETS, (4, []))[1],
                "tile_counts": tags.get(T_TILE_COUNTS, (4, []))[1],
            }
        )
    return {"ghost": ghost, "levels": lvls}


def read_cog_level(data: bytes, level: int = 0) -> np.ndarray:
    """Decode one resolution level via the engine TIFF reader."""
    arr, _ = tiff_parse(bytes(data), ifd_index=level)
    return arr


def cog_tile_index(data: bytes) -> list[tuple[int, int, int, int, int]]:
    """-> [(level, ty, tx, offset, nbytes)] for every tile — the range-read
    work list a distributed scan partitions over."""
    out = []
    for li, lv in enumerate(cog_info(data)["levels"]):
        ta = (lv["width"] + lv["tile_w"] - 1) // lv["tile_w"]
        for i, (o, c) in enumerate(zip(lv["tile_offsets"], lv["tile_counts"])):
            out.append((li, i // ta, i % ta, o, c))
    return out


def decode_cog_tile(
    chunk: bytes, lv: dict
) -> np.ndarray:
    """Decode one tile from its ranged bytes alone (no other file access):
    (tile_h, tile_w, samples) uint8, padding included."""
    tw, tl, spp = lv["tile_w"], lv["tile_h"], lv["samples"]
    need = tw * tl * spp
    comp = lv["compression"]
    if comp == 5:
        raw = lzw_decode(chunk, need)
    elif comp == 32773:
        raw = packbits_decode(chunk, need)
    elif comp in (8, 32946):  # Deflate / Adobe Deflate
        import zlib

        raw = zlib.decompress(chunk)[:need]
    elif comp == 7:  # JPEG tile (tables spliced from the JPEGTables tag)
        from gdal_spark.functions.jpeg import jpeg_decode

        stream = chunk
        jt = lv.get("jpeg_tables")
        if jt and len(jt) > 4:
            body = jt[2:]
            if body[-2:] == b"\xff\xd9":
                body = body[:-2]
            stream = b"\xff\xd8" + body + chunk[2:]
        arr = jpeg_decode(
            stream,
            force_color="rgb" if lv.get("photometric") == 2 else None)
        raw = (arr[:, :, 0] if spp == 1 else arr).tobytes()
    elif comp == 34925:  # LZMA
        import lzma

        raw = lzma.decompress(chunk)[:need]
    elif comp == 1:
        raw = chunk[:need]
    else:
        raise TiffError(f"unsupported COG compression {comp}")
    if len(raw) < need:
        raw = raw + b"\0" * (need - len(raw))
    if lv.get("predictor", 1) == 2:
        t = np.frombuffer(raw, np.uint8).reshape(tl, tw, spp)
        t = np.cumsum(t.astype(np.int64), axis=1).astype(np.uint8)
        raw = t.tobytes()
    return np.frombuffer(raw, np.uint8, need).reshape(tl, tw, spp)


# ---------------------------------------------------------------------------
# Validator — the layout rules of the reference's own
# autotest/gcore/validate_cloud_optimized_geotiff.py, as errors list.
# ---------------------------------------------------------------------------


def validate_cog(data: bytes) -> list[str]:
    errors: list[str] = []
    try:
        info = cog_info(data)
    except (TiffError, struct.error, ValueError, IndexError) as exc:
        return [f"unreadable: {exc}"]
    lvls = info["levels"]
    if not lvls:
        return ["no IFD"]

    first_data = None
    for lv in lvls:
        for o in lv["tile_offsets"]:
            if o and (first_data is None or o < first_data):
                first_data = o
    for li, lv in enumerate(lvls):
        name = f"IFD {li}"
        if not lv["tile_offsets"]:
            errors.append(f"{name} is not tiled")
            continue
        if lv["tile_w"] % 16 or lv["tile_h"] % 16:
            errors.append(f"{name} block size not a multiple of 16")
        if li > 0 and lv["subfile_type"] != 1:
            errors.append(f"{name} overview lacks NewSubfileType=1")
        if li > 0 and not (
            lv["width"] < lvls[li - 1]["width"]
            or lv["height"] < lvls[li - 1]["height"]
        ):
            errors.append(f"{name} overview not smaller than previous level")
        if first_data is not None and lv["ifd_offset"] > first_data:
            errors.append(f"{name} offset is after the first imagery byte")
        prev = 0
        for o in lv["tile_offsets"]:
            if o and o < prev:
                errors.append(f"{name} tile offsets not row-major increasing")
                break
            if o:
                prev = o
    # overview-first, smallest-first data ordering
    firsts = [
        min((o for o in lv["tile_offsets"] if o), default=None) for lv in lvls
    ]
    known = [(li, f) for li, f in enumerate(firsts) if f is not None]
    for (la, fa), (lb, fb) in zip(known, known[1:]):
        if fa < fb:  # level la data before deeper level lb
            errors.append(
                f"data for IFD {la} starts before reduced IFD {lb} "
                "(overviews must precede full resolution, smallest first)"
            )
    ghost = info["ghost"]
    if ghost.get("LAYOUT") == "IFDS_BEFORE_DATA":
        if ghost.get("KNOWN_INCOMPATIBLE_EDITION", "NO").startswith("YES"):
            errors.append("KNOWN_INCOMPATIBLE_EDITION=YES (edited in place)")
        if ghost.get("BLOCK_LEADER") == "SIZE_AS_UINT4":
            for lv in lvls:
                for o, c in zip(lv["tile_offsets"], lv["tile_counts"]):
                    if o and struct.unpack_from("<I", data, o - 4)[0] != c:
                        errors.append("BLOCK_LEADER size mismatch")
                        break
        if ghost.get("BLOCK_TRAILER") == "LAST_4_BYTES_REPEATED":
            for lv in lvls:
                for o, c in zip(lv["tile_offsets"], lv["tile_counts"]):
                    if o and c >= 4 and data[o + c - 4 : o + c] != data[o + c : o + c + 4]:
                        errors.append("BLOCK_TRAILER mismatch")
                        break
    return errors


# ---------------------------------------------------------------------------
# Distributed tile scan (mapInPandas over the range-read work list)
# ---------------------------------------------------------------------------


def scan_cog_tiles(spark, cogs_df, schema=None):
    """images(image_id, bytes) of COGs -> one row per (image, level, tile)
    with per-tile aggregates, each tile decoded from its byte range only.

    The per-task unit is a tile range read — on a real cluster backed by
    object storage this is `GET Range: offset, offset+nbytes`, so task
    input bytes ∝ tile size regardless of COG size."""
    import pandas as pd
    from pyspark.sql import types as T

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("image_id", T.StringType()),
                T.StructField("level", T.IntegerType()),
                T.StructField("ty", T.IntegerType()),
                T.StructField("tx", T.IntegerType()),
                T.StructField("tsum", T.LongType()),
                T.StructField("tmin", T.IntegerType()),
                T.StructField("tmax", T.IntegerType()),
            ]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                blob = bytes(r.bytes)
                errs = validate_cog(blob)
                if errs:
                    raise TiffError(f"invalid COG {r.image_id}: {errs[0]}")
                info = cog_info(blob)
                for li, ty, tx, off, cnt in cog_tile_index(blob):
                    lv = info["levels"][li]
                    tile = decode_cog_tile(blob[off : off + cnt], lv)
                    # clip padding so edge tiles aggregate true pixels only
                    ys = min(lv["tile_h"], lv["height"] - ty * lv["tile_h"])
                    xs = min(lv["tile_w"], lv["width"] - tx * lv["tile_w"])
                    t = tile[:ys, :xs]
                    rows.append(
                        (
                            r.image_id,
                            li,
                            ty,
                            tx,
                            int(t.sum(dtype=np.int64)),
                            int(t.min()),
                            int(t.max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return cogs_df.mapInPandas(run, schema)
