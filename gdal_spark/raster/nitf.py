"""NITF driver — frmts/nitf (nitffile.cpp NITFOpen/CollectSegmentInfo,
nitfimage.c NITFImageAccess) for uncompressed IC=NC/NM imagery.

File header: 9-byte version (NITF02.10/02.00/NSIF01.00), HL at offset
354 (394 for NITF01 / FSDWNG 999998), then the segment-count ladder
(IM 6+10, GR 4+6, LA 4+3, TX 4+5, DE 4+9, RE 4+7) with segment data
packed sequentially after the header (nitffile.cpp:325-356).

Image subheader (nitfimage.c:142-560): NROWS/NCOLS/PVTYPE/IREP/ICAT/
ABPP at base 333 (+40 for the NITF01/999998 variants), ICORDS + 60-byte
IGEOLO, NICOM comments, IC (+COMRAT when not N*), NBANDS with the
XBANDS=0 escape, per-band IREPBAND/ISUBCAT/IFC/IMFLT/NLUTS(+LUTs),
then ISYNC/IMODE/NBPR/NBPC/NPPBH/NPPBV/NBPP and IDLVL/IALVL/ILOC/IMAG.
The 5.4.2.2-d quirk (single block row/column with 0 dimension -> image
size) is kept. IMODE offsets follow :775-820 exactly (S/P/R/B pixel/
line/band/block strides); NM mask tables (:905-1010) read IMDATOFF/
BMRLNTH/TMRLNTH/TPXCDLNTH, the TPXCD nodata byte, and the 4-byte
block-offset table with UINT_MAX missing-block markers.

The writer emits a spec-width NITF02.10 header + one NC image segment
(IMODE B/P), enough for the engine's own reader and the gdal_translate
NITF createcopy shape (byte/int16/rgb roundtrips in tests).
"""

from __future__ import annotations

import struct

import numpy as np

_UINT_MAX = 0xFFFFFFFF


def _i(b, off, n) -> int:
    s = b[off:off + n].decode("ascii", "replace").strip()
    return int(s) if s else 0


def _s(b, off, n) -> str:
    return b[off:off + n].decode("ascii", "replace")


def parse_file_header(data: bytes) -> dict:
    ver = _s(data, 0, 9)
    if not (ver.startswith("NITF") or ver.startswith("NSIF")):
        raise ValueError("not a NITF file")
    if ver.startswith("NITF01"):
        raise ValueError("NITF 1.x unsupported")  # autotest: U_0002A -> None
    hl_off = 394 if _s(data, 280, 6) == "999998" else 354
    header_len = _i(data, hl_off, 6)
    segments = []
    off = hl_off + 6
    next_data = header_len
    for stype, hsz, dsz in (("IM", 6, 10), ("GR", 4, 6), ("LA", 4, 3),
                            ("TX", 4, 5), ("DE", 4, 9), ("RE", 4, 7)):
        n = _i(data, off, 3)
        off += 3
        for _ in range(n):
            shl = _i(data, off, hsz)
            sdl = _i(data, off + hsz, dsz)
            off += hsz + dsz
            segments.append(
                dict(type=stype, header_start=next_data,
                     header_size=shl, start=next_data + shl, size=sdl)
            )
            next_data += shl + sdl
    return {"version": ver, "header_len": header_len, "segments": segments}


def parse_image_subheader(data: bytes, seg: dict) -> dict:
    h = data[seg["header_start"]:seg["header_start"] + seg["header_size"]]
    off = 333
    if _s(h, 284, 6) == "999998":
        off += 40
    img = {
        "nrows": _i(h, off, 8), "ncols": _i(h, off + 8, 8),
        "pvtype": _s(h, off + 16, 3).strip(),
        "irep": _s(h, off + 19, 8).strip(),
        "icat": _s(h, off + 27, 8).strip(),
        "abpp": _i(h, off + 35, 2),
    }
    off += 38
    icords = _s(h, off, 1)
    off += 1
    img["icords"] = icords
    if icords not in (" ", "", "N"):
        img["igeolo"] = _s(h, off, 60)
        off += 60
    nicom = _i(h, off, 1)
    off += 1 + 80 * nicom
    ic = _s(h, off, 2)
    off += 2
    img["ic"] = ic
    if ic[0] != "N":
        img["comrat"] = _s(h, off, 4)
        off += 4
    nbands = _i(h, off, 1)
    off += 1
    if nbands == 0:
        nbands = _i(h, off, 5)
        off += 5
    img["nbands"] = nbands
    bands = []
    for _ in range(nbands):
        b = {"irepband": _s(h, off, 2), "isubcat": _s(h, off + 2, 6)}
        off += 8
        off += 4  # IFC + IMFLT
        nluts = _i(h, off, 1)
        off += 1
        if nluts:
            nelut = _i(h, off, 5)
            off += 5
            b["luts"] = [
                np.frombuffer(h, dtype=np.uint8, count=nelut,
                              offset=off + i * nelut)
                for i in range(nluts)
            ]
            off += nluts * nelut
        bands.append(b)
    img["bands"] = bands
    # ISYNC(1) + IMODE(1) + NBPR/NBPC/NPPBH/NPPBV(4 each) + NBPP(2)
    img["imode"] = _s(h, off + 1, 1)
    img["nbpr"] = _i(h, off + 2, 4)
    img["nbpc"] = _i(h, off + 6, 4)
    img["nppbh"] = _i(h, off + 10, 4)
    img["nppbv"] = _i(h, off + 14, 4)
    img["nbpp"] = _i(h, off + 18, 2)
    if img["abpp"] == 0:
        img["abpp"] = img["nbpp"]
    # MIL-STD-2500-C 5.4.2.2-d (#3263)
    if img["nbpr"] == 1 and img["nppbh"] == 0:
        img["nppbh"] = img["ncols"]
    if img["nbpc"] == 1 and img["nppbv"] == 0:
        img["nppbv"] = img["nrows"]
    return img


def _offsets(img: dict) -> dict:
    """IMODE stride family (nitfimage.c:775-820)."""
    bps, bw, bh = img["nbpp"], img["nppbh"], img["nppbv"]
    nb = img["nbands"]
    word = 1 if bps <= 8 else 2 if bps <= 16 else 4 if bps <= 32 else bps // 8
    m = img["imode"]
    if m == "S":
        line = bw * bps // 8
        block = line * bh
        return dict(word=word, line=line, block=block,
                    band=block * img["nbpr"] * img["nbpc"])
    if m == "P":
        line = bw * bps * nb // 8
        return dict(word=word, line=line, block=line * bh, band=word)
    if m == "R":
        band = bw * bps // 8
        line = band * nb
        return dict(word=word, line=line, block=line * bh, band=band)
    line = bw * bps // 8
    band = bh * line
    return dict(word=word, line=line, block=band * nb, band=band)


def block_starts(data: bytes, img: dict, seg: dict) -> np.ndarray:
    """panBlockStart (nitfimage.c:825-1010): (nbpr*nbpc*nbands) array of
    absolute byte offsets, -1 for NM missing blocks."""
    nbpr, nbpc, nb = img["nbpr"], img["nbpc"], img["nbands"]
    n_blocks = nbpr * nbpc
    offs = _offsets(img)
    out = np.zeros(n_blocks * nb, dtype=np.int64)
    ic = img["ic"]
    if "M" not in ic:
        for by in range(nbpc):
            for bx in range(nbpr):
                for ib in range(nb):
                    i = bx + by * nbpr + ib * n_blocks
                    out[i] = (seg["start"]
                              + (bx + by * nbpr) * offs["block"]
                              + ib * offs["band"])
        return out
    pos = seg["start"]
    imdatoff, bmrlnth, tmrlnth, tpxcdlnth = struct.unpack_from(
        ">IHHH", data, pos
    )
    pos += 10
    if tpxcdlnth == 8:
        img["nodata"] = data[pos]
        pos += 1
    else:
        pos += (tpxcdlnth + 7) // 8
    if bmrlnth == 4 and img["imode"] == "P":
        offs_tbl = np.frombuffer(data, ">u4", n_blocks, pos)
        for i in range(n_blocks):
            if offs_tbl[i] == _UINT_MAX:
                out[i::n_blocks] = -1
            else:
                base = seg["start"] + imdatoff + int(offs_tbl[i])
                for ib in range(nb):
                    out[i + ib * n_blocks] = base + ib * offs["band"]
    elif bmrlnth == 4:
        offs_tbl = np.frombuffer(data, ">u4", n_blocks * nb, pos)
        for i in range(n_blocks * nb):
            out[i] = (-1 if offs_tbl[i] == _UINT_MAX
                      else seg["start"] + imdatoff + int(offs_tbl[i]))
    else:  # "NM" with no table: tightly packed after the mask header
        for by in range(nbpc):
            for bx in range(nbpr):
                for ib in range(nb):
                    i = bx + by * nbpr + ib * n_blocks
                    out[i] = (seg["start"] + imdatoff
                              + (bx + by * nbpr) * offs["block"]
                              + ib * offs["band"])
    return out


def _dtype(img: dict):
    bps, pv = img["nbpp"], img["pvtype"]
    if bps <= 8:
        return np.uint8
    if bps <= 16:
        return np.int16 if pv == "SI" else np.uint16
    if pv == "R":
        return np.float32
    return np.int32 if pv == "SI" else np.uint32


def decode_image(data: bytes, img: dict, seg: dict) -> np.ndarray:
    """Assemble (nrows, ncols, nbands); NM missing blocks read as 0 (or
    the TPXCD nodata byte)."""
    nbpr, nbpc, nb = img["nbpr"], img["nbpc"], img["nbands"]
    bw, bh, bps = img["nppbh"], img["nppbv"], img["nbpp"]
    starts = block_starts(data, img, seg)
    offs = _offsets(img)
    dt = _dtype(img)
    full = np.zeros((nbpc * bh, nbpr * bw, nb), dtype=np.float64
                    if dt == np.float32 else np.int64)
    fill = img.get("nodata", 0)
    n_blocks = nbpr * nbpc

    def read_block(start: int) -> np.ndarray:
        """One band's (bh, bw) plane given its start + strides."""
        if bps == 1:
            # 1-bit NC/NM: the block is one CONTINUOUS bit stream of
            # (bw*bh+7)//8 bytes, no per-row padding (nitfimage.c:1291)
            nbytes = (bw * bh + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(data, np.uint8, nbytes, start)
            )[:bw * bh]
            return bits.reshape(bh, bw)
        rows = []
        base_dt = np.dtype(dt).newbyteorder(">")
        for r in range(bh):
            rows.append(
                np.frombuffer(data, base_dt, bw, start + r * offs["line"])
            )
        return np.vstack(rows)

    for by in range(nbpc):
        for bx in range(nbpr):
            y0, x0 = by * bh, bx * bw
            if img["imode"] == "P":
                start = starts[bx + by * nbpr]
                if start < 0:
                    full[y0:y0 + bh, x0:x0 + bw, :] = fill
                    continue
                base_dt = np.dtype(dt).newbyteorder(">")
                for r in range(bh):
                    ro = int(start) + r * offs["line"]
                    raw = np.frombuffer(data, base_dt, bw * nb, ro)
                    full[y0 + r, x0:x0 + bw, :] = raw.reshape(bw, nb)
            else:
                for ib in range(nb):
                    start = starts[bx + by * nbpr + ib * n_blocks]
                    if start < 0:
                        full[y0:y0 + bh, x0:x0 + bw, ib] = fill
                        continue
                    if bps == 1:
                        # band stride for packed bits (nitfimage.c:1301)
                        start = (starts[bx + by * nbpr]
                                 + ((bw * bh + 7) // 8) * ib)
                    full[y0:y0 + bh, x0:x0 + bw, ib] = read_block(int(start))
    out = full[:img["nrows"], :img["ncols"], :]
    return out.astype(dt)


def read_nitf(data: bytes) -> list[dict]:
    """All image segments -> [{**subheader, 'array': (h, w, bands)}]."""
    fh = parse_file_header(bytes(data))
    out = []
    for seg in fh["segments"]:
        if seg["type"] != "IM":
            continue
        img = parse_image_subheader(data, seg)
        if img["ic"] not in ("NC", "NM"):
            img["array"] = None  # compressed: unsupported, surfaced
        else:
            img["array"] = decode_image(bytes(data), img, seg)
        out.append(img)
    return out


# ---------------------------------------------------------------------------
# Write path (the gdal_translate -of NITF shape: NITF02.10, IC=NC)
# ---------------------------------------------------------------------------


def _pad(s: str, n: int) -> bytes:
    return s.encode("ascii")[:n].ljust(n)


def _num(v: int, n: int) -> bytes:
    return str(int(v)).rjust(n, "0").encode("ascii")


def nitf_encode(arr: np.ndarray, igeolo: str | None = None,
                icords: str = " ") -> bytes:
    """(h, w[, bands]) uint8/int16/uint16/int32/float32 -> NITF02.10
    with one NC image segment, IMODE B (P for 3-band RGB, matching the
    reference writer's pixel-interleave default for RGB)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    dt = arr.dtype
    if dt == np.uint8:
        pvtype, nbpp = "INT", 8
    elif dt == np.int16:
        pvtype, nbpp = "SI", 16
    elif dt == np.uint16:
        pvtype, nbpp = "INT", 16
    elif dt == np.int32:
        pvtype, nbpp = "SI", 32
    elif dt == np.float32:
        pvtype, nbpp = "R", 32
    else:
        raise ValueError(f"unsupported dtype {dt}")
    imode = "P" if nb == 3 else "B"
    irep = "RGB" if nb == 3 else ("MULTI" if nb > 1 else "MONO")

    sub = bytearray()
    sub += _pad("IM", 2) + _pad("img1", 10) + _pad("", 14) + _pad("", 17)
    sub += _pad("", 80)  # IID2
    sub += _pad("U", 1) + _pad("", 2 + 11 + 2 + 20 + 2 + 8 + 4 + 1 + 8
                               + 43 + 1 + 40 + 1 + 8 + 15)  # security block
    sub += b"0"  # ENCRYP
    sub += _pad("", 42)  # ISORCE
    assert len(sub) == 333, len(sub)
    sub += _num(h, 8) + _num(w, 8)
    sub += _pad(pvtype, 3) + _pad(irep, 8) + _pad("VIS", 8)
    sub += _num(nbpp, 2) + b"R"
    sub += _pad(icords, 1)
    if icords.strip():
        sub += _pad(igeolo or "", 60)
    sub += b"0"  # NICOM
    sub += b"NC"
    sub += _num(nb, 1)
    for i in range(nb):
        rep = ["R", "G", "B"][i] if nb == 3 else "M"
        sub += _pad(rep, 2) + _pad("", 6) + _pad("N", 1) + _pad("", 3) + b"0"
    sub += b"1"  # ISYNC
    sub += imode.encode()
    sub += _num(1, 4) + _num(1, 4)  # NBPR NBPC
    sub += _num(w, 4) + _num(h, 4)  # NPPBH NPPBV
    sub += _num(nbpp, 2)
    sub += _num(1, 3) + _num(0, 3) + _num(0, 5) + _num(0, 5)  # IDLVL..ILOC
    sub += _pad("1.0", 4)  # IMAG
    sub += _num(0, 5)  # UDIDL
    sub += _num(0, 5)  # IXSHDL

    be = arr.astype(np.dtype(dt).newbyteorder(">"))
    if imode == "P":
        body = be.tobytes()  # (h, w, band) C-order == pixel interleaved
    else:
        body = np.transpose(be, (2, 0, 1)).tobytes()

    # Build the 354-byte prefix strictly by field widths
    hdr = bytearray()
    hdr += _pad("NITF02.10", 9)           # FHDR+FVER  9
    hdr += _num(3, 2)                     # CLEVEL     2
    hdr += _pad("BF01", 4)                # STYPE      4
    hdr += _pad("gdal_spark", 10)         # OSTAID    10
    hdr += _pad("20200101000000", 14)     # FDT       14
    hdr += _pad("", 80)                   # FTITLE    80
    hdr += _pad("U", 1)                   # FSCLAS     1
    hdr += _pad("", 2)                    # FSCLSY     2
    hdr += _pad("", 11)                   # FSCODE    11
    hdr += _pad("", 2)                    # FSCTLH     2
    hdr += _pad("", 20)                   # FSREL     20
    hdr += _pad("", 2)                    # FSDCTP     2
    hdr += _pad("", 8)                    # FSDCDT     8
    hdr += _pad("", 4)                    # FSDCXM     4
    hdr += _pad("", 1)                    # FSDG       1
    hdr += _pad("", 8)                    # FSDGDT     8
    hdr += _pad("", 43)                   # FSCLTX    43
    hdr += _pad("", 1)                    # FSCATP     1
    hdr += _pad("", 40)                   # FSCAUT    40
    hdr += _pad("", 1)                    # FSCRSN     1
    hdr += _pad("", 8)                    # FSSRDT     8
    hdr += _pad("", 15)                   # FSCTLN    15
    hdr += _pad("00000", 5)               # FSCOP      5
    hdr += _pad("00000", 5)               # FSCPYS     5
    hdr += b"0"                           # ENCRYP     1
    hdr += bytes([0x00, 0x00, 0x00])      # FBKGC      3
    hdr += _pad("", 24)                   # ONAME     24
    hdr += _pad("", 18)                   # OPHONE    18
    assert len(hdr) == 342, len(hdr)
    # FL(12) HL(6) at 342/354
    subheader = bytes(sub)
    numi_block = _num(1, 3) + _num(len(subheader), 6) + _num(len(body), 10)
    tail = (numi_block + _num(0, 3) + _num(0, 3) + _num(0, 3)
            + _num(0, 3) + _num(0, 3) + _num(0, 5) + _num(0, 5))
    header_len = 342 + 12 + 6 + len(tail)
    total = header_len + len(subheader) + len(body)
    hdr += _num(total, 12) + _num(header_len, 6) + tail
    return bytes(hdr) + subheader + body
