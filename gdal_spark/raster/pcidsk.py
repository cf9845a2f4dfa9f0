"""PCIDSK (.pix) driver (frmts/pcidsk/sdk — core/cpcidskfile.cpp,
channel/*.cpp, blockdir/asciitiledir.cpp + binarytiledir.cpp).

File layout per the reference transcription:

  * 512-byte ASCII file header: "PCIDSK  " magic, file size in blocks
    at [16:32], image_start_block [304:320], ih_start_block [336:352],
    interleaving [360:368], channel_count [376:384], width [384:392],
    height [392:400], segment_pointers block [440:456], segment block
    count [456:464], per-type channel counts [464:506]
    (cpcidskfile.cpp InitializeFromHeader);
  * 1024-byte image headers per channel at (ih_start-1)*512; pixel
    type text at [160:168]; byte-order char at [201] ('S' = little
    endian, anything else big endian; 8U never swaps)
    (cpcidskchannel.cpp:58-70);
  * segment pointer table: 32-byte ASCII entries — status(1) type(3)
    name(8) start_block(11) size_blocks(9); segment data begins at
    (start-1)*512 + 1024 (after the segment header);
  * BAND interleaving: channels stored consecutively from
    (image_start_block-1)*512; PIXEL: scanlines padded to 512 with
    per-pixel groups (cbandinterleavedchannel.cpp:60-75);
  * FILE "/SIS=n" channels are tiled: a SysBMDir segment holds the
    block directory — ASCII v1 (asciitiledir.cpp: 512-byte dir header
    with counts at 10/18/26, 28-char block entries seg(4) start(8)
    layer(8) next(8) forming linked lists, 24-char layer entries
    type(4) start(8) size(12); each layer's first 128 bytes are the
    tile-layer header xsize/ysize/tilex/tiley/dtype/nodata/compress
    and the tile list at 128 is count*12 ASCII offsets then count*8
    sizes) or binary v2 (binarytiledir.cpp: uint32 layer_count +
    uint32 block_size at 10, packed 18-byte BlockLayerInfo +
    38-byte TileLayerInfo + free layer, 6-byte {uint16 seg, uint32
    block} block lists, and a 12-byte {uint64 offset, uint32 size}
    tile list at layer offset 0); layer bytes map through 8192-ish
    blocks into SysBData segments (blocklayer.cpp ReadFromLayer).

Scale shape: the tile directory is tiny and driver-side; tiles and
band scanline ranges are independent byte ranges for per-task reads.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {
    "8U": (np.uint8, 1), "16S": (np.dtype(">i2"), 2),
    "16U": (np.dtype(">u2"), 2), "32R": (np.dtype(">f4"), 4),
    "32S": (np.dtype(">i4"), 4), "32U": (np.dtype(">u4"), 4),
    "64R": (np.dtype(">f8"), 8), "64S": (np.dtype(">i8"), 8),
}


def _g(buf, off, n):
    return buf[off : off + n].decode("ascii", errors="replace")


def open_pcidsk(data: bytes) -> dict:
    fh = data[:512]
    if not fh.startswith(b"PCIDSK  "):
        raise ValueError("not a PCIDSK file")
    info = {
        "width": int(_g(fh, 384, 8)),
        "height": int(_g(fh, 392, 8)),
        "channels": int(_g(fh, 376, 8)),
        "interleaving": _g(fh, 360, 8).strip(),
        "image_start": int(_g(fh, 304, 16)),
        "ih_start": int(_g(fh, 336, 16)),
        "seg_ptr_block": int(_g(fh, 440, 16)),
        "seg_blocks": int(_g(fh, 456, 8)),
    }
    # segment pointer table
    spo = info["seg_ptr_block"] * 512 - 512
    segs = {}
    for i in range(info["seg_blocks"] * 512 // 32):
        e = data[spo + i * 32 : spo + (i + 1) * 32]
        if not e.strip() or e[0:1] not in (b"A", b"L"):
            continue
        segs[i + 1] = {
            "type": int(e[1:4]),
            "name": e[4:12].decode().strip(),
            "start": int(e[12:23]),
            "blocks": int(e[23:32]),
        }
    info["segments"] = segs

    # channels
    chans = []
    counts = fh[464:468].decode()
    legacy_all_8u = counts == "    "
    for c in range(info["channels"]):
        ih_off = (info["ih_start"] - 1) * 512 + c * 1024
        ih = data[ih_off : ih_off + 1024]
        ptype = _g(ih, 160, 8).strip()
        if not ptype:
            ptype = "8U" if legacy_all_8u else "8U"
        chans.append(
            {
                "type": ptype,
                "byte_order": chr(ih[201]),
                "filename": _g(ih, 64, 64).strip(),
            }
        )
    info["chan"] = chans
    return info


def _seg_read(data: bytes, seg: dict, offset: int, size: int) -> bytes:
    base = (seg["start"] - 1) * 512 + 1024
    return data[base + offset : base + offset + size]


def read_band(data: bytes, info: dict, band: int) -> np.ndarray:
    """One channel of a BAND or PIXEL interleaved file."""
    w, h = info["width"], info["height"]
    il = info["interleaving"]
    ch = info["chan"][band]
    dt, size = _DTYPES[ch["type"]]
    if ch["byte_order"] == "S":  # stored little-endian
        dt = np.dtype(dt).newbyteorder("<")
    if il == "BAND":
        off = (info["image_start"] - 1) * 512
        for b in range(band):
            pdt, psz = _DTYPES[info["chan"][b]["type"]]
            off += w * h * psz
        arr = np.frombuffer(data, dtype=dt, count=w * h, offset=off)
        return arr.reshape(h, w)
    if il == "PIXEL":
        group = sum(_DTYPES[c["type"]][1] for c in info["chan"])
        line = group * w
        if line % 512:
            line += 512 - line % 512
        start = (info["image_start"] - 1) * 512
        within = sum(_DTYPES[c["type"]][1] for c in info["chan"][:band])
        out = np.empty((h, w), dtype=np.dtype(dt).newbyteorder("="))
        for row in range(h):
            raw = data[start + row * line : start + row * line + group * w]
            out[row] = np.frombuffer(raw, dtype=np.uint8).reshape(w, group)[
                :, within : within + size
            ].copy().view(dt).ravel()
        return out
    if il == "FILE" and ch["filename"].startswith("/SIS="):
        layers = tile_layers(data, info)
        return layers[int(ch["filename"][5:])]["array"]
    raise ValueError(f"unsupported interleaving {il}")


# ---------------------------------------------------------------------------
# tiled channels (SysBMDir)
# ---------------------------------------------------------------------------


def _layer_reader(data, info, block_size, block_list):
    def read(offset: int, size: int) -> bytes:
        out = bytearray()
        while size > 0:
            i = offset // block_size
            within = offset % block_size
            seg_id, startblock = block_list[i]
            take = min(size, block_size - within)
            out += _seg_read(
                data, info["segments"][seg_id],
                startblock * block_size + within, take,
            )
            offset += take
            size -= take
        return bytes(out)

    return read


def tile_layers(data: bytes, info: dict) -> list[dict]:
    """All tile layers (full-res + overviews) of a tiled file."""
    # v1 names the directory segment SysBMDir; v2 names it TileDir
    bmdir = next(
        s
        for s in info["segments"].values()
        if s["name"] in ("SysBMDir", "TileDir")
    )
    hdr = _seg_read(data, bmdir, 0, 512)
    layers = []
    # the segment NAME picks the codec: SysBMDir = ASCII v1 dir,
    # TileDir = binary dir (both spell "VERSION  1" in their header)
    if bmdir["name"] == "SysBMDir":
        n_layers = int(hdr[10:18])
        n_blocks = int(hdr[18:26])
        block_size = 8192
        pos = 512
        blocks = []
        raw = _seg_read(data, bmdir, 512, n_blocks * 28 + n_layers * 24)
        p = 0
        for _ in range(n_blocks):
            blocks.append(
                (int(raw[p : p + 4]), int(raw[p + 4 : p + 12]),
                 int(raw[p + 20 : p + 28]))
            )  # (segment, start_block, next)
            p += 28
        linfos = []
        for _ in range(n_layers):
            linfos.append(
                (int(raw[p : p + 4]), int(raw[p + 4 : p + 12]),
                 int(raw[p + 12 : p + 24]))
            )  # (type, start_block_index, layer_size)
            p += 24
        for ltype, start, lsize in linfos:
            chain = []
            i = start
            while 0 <= i < len(blocks):
                chain.append((blocks[i][0], blocks[i][1]))
                i = blocks[i][2]
            read = _layer_reader(data, info, block_size, chain)
            lh = read(0, 128)
            xs, ys = int(lh[0:8]), int(lh[8:16])
            tx, ty = int(lh[16:24]), int(lh[24:32])
            dtype = lh[32:36].decode().strip()
            compress = lh[54:62].decode().strip()
            nx, ny = -(-xs // tx), -(-ys // ty)
            tl = read(128, nx * ny * 20)
            offs = [int(tl[i * 12 : (i + 1) * 12]) for i in range(nx * ny)]
            sizes = [
                int(tl[nx * ny * 12 + i * 8 : nx * ny * 12 + (i + 1) * 8])
                for i in range(nx * ny)
            ]
            layers.append(
                _assemble(read, xs, ys, tx, ty, dtype, compress, offs, sizes)
            )
    else:
        (n_layers,) = struct.unpack_from("<I", hdr, 10)
        (block_size,) = struct.unpack_from("<I", hdr, 14)
        p = 512
        linfos = []
        for _ in range(n_layers):
            raw = _seg_read(data, bmdir, p, 18)
            ltype, start, cnt, lsize = struct.unpack("<HIIQ", raw)
            linfos.append((ltype, start, cnt, lsize))
            p += 18
        tinfos = []
        for _ in range(n_layers):
            raw = _seg_read(data, bmdir, p, 38)
            xs, ys, tx, ty = struct.unpack_from("<4I", raw, 0)
            dtype = raw[16:20].decode().strip()
            compress = raw[20:28].decode().strip()
            tinfos.append((xs, ys, tx, ty, dtype, compress))
            p += 38
        p += 18  # free block layer info
        blocks_base = p
        for (ltype, start, cnt, lsize), (xs, ys, tx, ty, dtype, compress) in zip(
            linfos, tinfos
        ):
            raw = _seg_read(data, bmdir, blocks_base + start * 6, cnt * 6)
            chain = [
                struct.unpack_from("<HI", raw, i * 6) for i in range(cnt)
            ]
            read = _layer_reader(data, info, block_size, chain)
            nx, ny = -(-xs // tx), -(-ys // ty)
            tl = read(0, nx * ny * 12)
            offs, sizes = [], []
            for i in range(nx * ny):
                o, s = struct.unpack_from("<QI", tl, i * 12)
                offs.append(o)
                sizes.append(s)
            layers.append(
                _assemble(read, xs, ys, tx, ty, dtype, compress, offs, sizes)
            )
    return layers


def _assemble(read, xs, ys, tx, ty, dtype, compress, offs, sizes) -> dict:
    dt, size = _DTYPES[dtype]
    dt = np.dtype(dt).newbyteorder("<")  # tiled data is little endian
    nx = -(-xs // tx)
    arr = np.zeros((ys, xs), dtype=dt.newbyteorder("="))
    for t, (off, tsize) in enumerate(zip(offs, sizes)):
        if tsize == 0 or off == 0xFFFFFFFFFFFFFFFF:
            continue
        raw = read(off, tsize)
        if compress == "RLE":
            raw = _rle_decompress(raw, tx * ty * size)
        elif compress not in ("NONE", ""):
            raise ValueError(f"unsupported tile compression {compress}")
        tile = np.frombuffer(raw, dtype=dt, count=tx * ty).reshape(ty, tx)
        r, c = (t // nx) * ty, (t % nx) * tx
        arr[r : r + min(ty, ys - r), c : c + min(tx, xs - c)] = tile[
            : min(ty, ys - r), : min(tx, xs - c)
        ]
    return {
        "xsize": xs, "ysize": ys, "tile": (tx, ty), "dtype": dtype,
        "compress": compress, "array": arr,
    }


def _rle_decompress(raw: bytes, out_size: int) -> bytes:
    """PCIDSK RLE (sdk blocktilelayer.cpp UncompressTileRLE): 0x80+n =
    literal run of n bytes, < 0x80 = repeat next byte n times."""
    out = bytearray()
    pos = 0
    while pos < len(raw) and len(out) < out_size:
        c = raw[pos]
        pos += 1
        if c > 127:
            n = c - 128
            out += raw[pos : pos + n]
            pos += n
        else:
            out += raw[pos : pos + 1] * c
            pos += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal writer (BAND interleaved)
# ---------------------------------------------------------------------------

_TYPE_NAMES = {np.uint8: "8U", np.int16: "16S", np.uint16: "16U",
               np.float32: "32R"}


def write_pcidsk(bands: list[np.ndarray]) -> bytes:
    """BAND-interleaved .pix with the header fields the reader needs."""
    h, w = bands[0].shape
    nchan = len(bands)
    ih_start = 2
    image_start = ih_start + (nchan * 1024) // 512
    data = bytearray()
    for b in bands:
        tname = _TYPE_NAMES[b.dtype.type]
        data += np.ascontiguousarray(b, dtype=b.dtype.newbyteorder(">")).tobytes()
    total = image_start * 512 - 512 + len(data)
    seg_ptr_block = (total + 512) // 512 + 1
    nblocks = seg_ptr_block + 1

    fh = bytearray(b" " * 512)
    fh[0:8] = b"PCIDSK  "
    fh[8:16] = b"GSPARK  "

    def put(off, n, v):
        s = str(v).rjust(n).encode()
        fh[off : off + n] = s

    put(16, 16, nblocks)
    put(304, 16, image_start)
    put(336, 16, ih_start)
    fh[360:368] = b"BAND    "
    put(376, 8, nchan)
    put(384, 8, w)
    put(392, 8, h)
    put(440, 16, seg_ptr_block)
    put(456, 8, 1)
    # per-type counts
    c8 = sum(1 for b in bands if b.dtype == np.uint8)
    c16s = sum(1 for b in bands if b.dtype == np.int16)
    c16u = sum(1 for b in bands if b.dtype == np.uint16)
    c32r = sum(1 for b in bands if b.dtype == np.float32)
    for off, v in ((464, c8), (468, c16s), (472, c16u), (476, c32r)):
        fh[off : off + 4] = str(v).rjust(4).encode()
    fh[492:506] = b"  " * 7

    out = bytearray(fh)
    for b in bands:
        ih = bytearray(b" " * 1024)
        ih[160:168] = _TYPE_NAMES[b.dtype.type].ljust(8).encode()
        ih[201] = ord("N")  # big-endian payload
        out += ih
    out += data
    if len(out) % 512:
        out += b" " * (512 - len(out) % 512)
    # empty segment pointer block
    out += b" " * 512
    return bytes(out)
