"""DDS (DirectDraw Surface) reader (frmts/dds/ddsdataset.cpp uses
crunch; this re-derivation decodes the public container + the BC1-3
block formats directly).

Layout: "DDS " magic + 124-byte little-endian header (height at +12,
width at +16, pixel format struct at +76 with fourCC at +84 and the
RGBA bit masks) + payload. Supported payloads: uncompressed masked
RGB/RGBA rows and DXT1/DXT3/DXT5 (BC1/BC2/BC3) 4x4 block compression
— 565 color endpoints with the 1/3-2/3 interpolated palette, DXT1's
3-color + transparent mode on c0 <= c1, DXT3 explicit 4-bit alpha,
DXT5 interpolated 8-value alpha. All block math is vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["dds_decode", "dds_encode_uncompressed"]


def _expand565(c: np.ndarray) -> np.ndarray:
    r = ((c >> 11) & 0x1F).astype(np.uint16)
    g = ((c >> 5) & 0x3F).astype(np.uint16)
    b = (c & 0x1F).astype(np.uint16)
    return np.stack([(r * 255 + 15) // 31, (g * 255 + 31) // 63,
                     (b * 255 + 15) // 31], axis=-1).astype(np.uint8)


def _dxt_colors(c0: np.ndarray, c1: np.ndarray, dxt1: bool):
    """(N,) 565 endpoint pairs -> (N, 4, 4) RGBA palettes."""
    n = len(c0)
    p = np.zeros((n, 4, 4), np.uint16)
    e0 = _expand565(c0).astype(np.uint16)
    e1 = _expand565(c1).astype(np.uint16)
    p[:, 0, :3] = e0
    p[:, 1, :3] = e1
    p[:, :, 3] = 255
    four = ~(dxt1 & (c0 <= c1))
    # 4-color mode
    p[four, 2, :3] = (2 * e0[four] + e1[four] + 1) // 3
    p[four, 3, :3] = (e0[four] + 2 * e1[four] + 1) // 3
    # 3-color + transparent mode
    three = ~four
    p[three, 2, :3] = (e0[three] + e1[three]) // 2
    p[three, 3, :] = 0
    return p.astype(np.uint8)


def _decode_dxt_blocks(blocks: np.ndarray, w: int, h: int,
                       variant: str) -> np.ndarray:
    """blocks: (nby*nbx, block_bytes) uint8 -> (h, w, 4)."""
    nbx = (w + 3) // 4
    nby = (h + 3) // 4
    n = nby * nbx
    if variant == "DXT1":
        color = blocks
        alpha_pre = None
    else:
        alpha_pre = blocks[:, :8]
        color = blocks[:, 8:]
    c0 = color[:, 0].astype(np.uint16) | (color[:, 1].astype(np.uint16) << 8)
    c1 = color[:, 2].astype(np.uint16) | (color[:, 3].astype(np.uint16) << 8)
    bits = (color[:, 4].astype(np.uint32)
            | (color[:, 5].astype(np.uint32) << 8)
            | (color[:, 6].astype(np.uint32) << 16)
            | (color[:, 7].astype(np.uint32) << 24))
    sel = np.empty((n, 16), np.uint8)
    for i in range(16):
        sel[:, i] = (bits >> (2 * i)) & 3
    pal = _dxt_colors(c0, c1, variant == "DXT1")
    px = pal[np.arange(n)[:, None], sel]          # (n, 16, 4)

    if variant == "DXT3":
        a = np.empty((n, 16), np.uint8)
        for i in range(16):
            byte = alpha_pre[:, i // 2]
            nib = (byte >> 4) if (i % 2) else (byte & 0x0F)
            a[:, i] = nib * 17
        px[:, :, 3] = a
    elif variant == "DXT5":
        a0 = alpha_pre[:, 0].astype(np.int32)
        a1 = alpha_pre[:, 1].astype(np.int32)
        abits = np.zeros(n, np.uint64)
        for k in range(6):
            abits |= alpha_pre[:, 2 + k].astype(np.uint64) << (8 * k)
        apal = np.zeros((n, 8), np.int32)
        apal[:, 0] = a0
        apal[:, 1] = a1
        eight = a0 > a1
        for k in range(6):
            apal[eight, 2 + k] = ((6 - k) * a0[eight]
                                  + (k + 1) * a1[eight] + 3) // 7
        six = ~eight
        for k in range(4):
            apal[six, 2 + k] = ((4 - k) * a0[six]
                                + (k + 1) * a1[six] + 2) // 5
        apal[six, 6] = 0
        apal[six, 7] = 255
        asel = np.empty((n, 16), np.uint8)
        for i in range(16):
            asel[:, i] = ((abits >> np.uint64(3 * i))
                          & np.uint64(7)).astype(np.uint8)
        px[:, :, 3] = apal[np.arange(n)[:, None], asel].astype(np.uint8)

    out = np.zeros((nby * 4, nbx * 4, 4), np.uint8)
    px = px.reshape(nby, nbx, 4, 4, 4)            # by, bx, y, x, rgba
    out = px.transpose(0, 2, 1, 3, 4).reshape(nby * 4, nbx * 4, 4)
    return out[:h, :w]


def dds_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """-> ((H, W, 4) uint8 RGBA, {"compression": ...})."""
    if data[:4] != b"DDS " or len(data) < 128:
        raise ValueError("not a DDS file")
    (hdr_size, flags, h, w, pitch) = struct.unpack_from("<5I", data, 4)
    pf_flags, fourcc, bitcount = struct.unpack_from("<3I", data, 80)
    rmask, gmask, bmask, amask = struct.unpack_from("<4I", data, 92)
    payload = data[128:]
    cc = struct.pack("<I", fourcc)
    if cc in (b"DXT1", b"DXT3", b"DXT5"):
        variant = cc.decode()
        bpb = 8 if variant == "DXT1" else 16
        nbx, nby = (w + 3) // 4, (h + 3) // 4
        blocks = np.frombuffer(payload, np.uint8,
                               nbx * nby * bpb).reshape(-1, bpb)
        return _decode_dxt_blocks(blocks, w, h, variant), {
            "compression": variant}
    # uncompressed masked pixels
    nbytes = bitcount // 8
    raw = np.frombuffer(payload, np.uint8, w * h * nbytes).reshape(
        h, w, nbytes)
    vals = np.zeros((h, w), np.uint32)
    for k in range(nbytes):
        vals |= raw[:, :, k].astype(np.uint32) << (8 * k)

    def take(mask: int) -> np.ndarray:
        if mask == 0:
            return np.full((h, w), 255, np.uint8)
        shift = (mask & -mask).bit_length() - 1
        width_bits = bin(mask >> shift).count("1")
        v = (vals & mask) >> shift
        return ((v * 255) // ((1 << width_bits) - 1)).astype(np.uint8)

    out = np.stack([take(rmask), take(gmask), take(bmask), take(amask)],
                   axis=-1)
    return out, {"compression": "NONE"}


def dds_encode_uncompressed(arr: np.ndarray) -> bytes:
    """RGBA (H, W, 4) -> uncompressed 32-bit DDS."""
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.stack([arr] * 3 + [np.full_like(arr, 255)], axis=-1)
    if arr.shape[2] == 3:
        arr = np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<5I", hdr, 4, 124, 0x0000100F, h, w, w * 4)
    struct.pack_into("<I", hdr, 76, 32)           # pixel format size
    struct.pack_into("<I", hdr, 80, 0x41)          # DDPF_RGB | ALPHAPIXELS
    struct.pack_into("<I", hdr, 88, 32)            # bit count
    struct.pack_into("<4I", hdr, 92, 0x000000FF, 0x0000FF00,
                     0x00FF0000, 0xFF000000)
    return bytes(hdr) + arr.astype(np.uint8).tobytes()
