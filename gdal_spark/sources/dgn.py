"""DGN v7 (MicroStation ISFF) driver — ogr/ogrsf_frmts/dgn
(dgnread.cpp, dgnhelp.cpp, dgnstroke.cpp, ogrdgnlayer.cpp) and
port/cpl_vax.cpp for the VAX-format doubles.

Element stream: 4-byte headers (level = b0 & 0x3f, complex = b0 & 0x80,
type = b1 & 0x7f, deleted = b1 & 0x80, word count b2/b3 LE), 0xFFFF EOF
marker. 32-bit ints use the DGN word-swapped layout
``p[2] + p[3]<<8 + p[1]<<24 + p[0]<<16`` (dgnlibp.h:70); doubles are
VAX D-floats converted via CPLVaxToIEEEDouble's word shuffle +
exponent rebias (cpl_vax.cpp:31-110).

TCB (type 9) supplies dimension, uor_per_subunit (1116),
subunits_per_master (1112), and the VAX-double global origin at 1240,
giving ``x_master = uor * scale - origin`` (DGNTransformPoint). The
color table rides GROUP_DATA (5) level 1: entry 255 at byte 38, entries
0-254 at 41 (DGNParseColorTable:1332). Display headers carry
graphic group (28), attribute index (30), properties (32),
style/weight/color (34-35) — DGNParseCore:1279.

Feature translation matches ogrdgnlayer.cpp: LINE/LINE_STRING/CURVE ->
LINESTRING, SHAPE -> POLYGON with the SHAPE_FILL (0x0041) attribute
linkage driving BRUSH(fc:#...), ELLIPSE/ARC stroked with
max(1, |sweep|/5)+1 points capped at 90 (DGNStrokeArc), TEXT -> POINT
with the LABEL(t:...,c:...,s:...g,f:FONT) style string.
"""

from __future__ import annotations

import math
import struct

import numpy as np

DGNT_CELL_HEADER = 2
DGNT_LINE = 3
DGNT_LINE_STRING = 4
DGNT_GROUP_DATA = 5
DGNT_SHAPE = 6
DGNT_TCB = 9
DGNT_CURVE = 11
DGNT_COMPLEX_CHAIN_HEADER = 12
DGNT_COMPLEX_SHAPE_HEADER = 14
DGNT_ELLIPSE = 15
DGNT_ARC = 16
DGNT_TEXT = 17

DGNPF_ATTRIBUTES = 0x0800  # properties flag (dgnlib.h:688)

_FONTS = {
    0: "STANDARD", 1: "WORKING", 2: "FANCY", 3: "ENGINEERING", 4: "NEWZERO",
    5: "STENCEL", 6: "USTN_FANCY", 7: "COMPRESSED", 8: "STENCEQ",
    10: "hand", 11: "ARCH", 12: "ARCHB",
}

# the reference default palette (dgnhelp.cpp abyDefaultPCT, all 256)
_DEFAULT_PCT = [
    (255, 255, 255),
    (0, 0, 255),
    (0, 255, 0),
    (255, 0, 0),
    (255, 255, 0),
    (255, 0, 255),
    (255, 127, 0),
    (0, 255, 255),
    (64, 64, 64),
    (192, 192, 192),
    (254, 0, 96),
    (160, 224, 0),
    (0, 254, 160),
    (128, 0, 160),
    (176, 176, 176),
    (0, 240, 240),
    (240, 240, 240),
    (0, 0, 240),
    (0, 240, 0),
    (240, 0, 0),
    (240, 240, 0),
    (240, 0, 240),
    (240, 122, 0),
    (0, 240, 240),
    (240, 240, 240),
    (0, 0, 240),
    (0, 240, 0),
    (240, 0, 0),
    (240, 240, 0),
    (240, 0, 240),
    (240, 122, 0),
    (0, 225, 225),
    (225, 225, 225),
    (0, 0, 225),
    (0, 225, 0),
    (225, 0, 0),
    (225, 225, 0),
    (225, 0, 225),
    (225, 117, 0),
    (0, 225, 225),
    (225, 225, 225),
    (0, 0, 225),
    (0, 225, 0),
    (225, 0, 0),
    (225, 225, 0),
    (225, 0, 225),
    (225, 117, 0),
    (0, 210, 210),
    (210, 210, 210),
    (0, 0, 210),
    (0, 210, 0),
    (210, 0, 0),
    (210, 210, 0),
    (210, 0, 210),
    (210, 112, 0),
    (0, 210, 210),
    (210, 210, 210),
    (0, 0, 210),
    (0, 210, 0),
    (210, 0, 0),
    (210, 210, 0),
    (210, 0, 210),
    (210, 112, 0),
    (0, 195, 195),
    (195, 195, 195),
    (0, 0, 195),
    (0, 195, 0),
    (195, 0, 0),
    (195, 195, 0),
    (195, 0, 195),
    (195, 107, 0),
    (0, 195, 195),
    (195, 195, 195),
    (0, 0, 195),
    (0, 195, 0),
    (195, 0, 0),
    (195, 195, 0),
    (195, 0, 195),
    (195, 107, 0),
    (0, 180, 180),
    (180, 180, 180),
    (0, 0, 180),
    (0, 180, 0),
    (180, 0, 0),
    (180, 180, 0),
    (180, 0, 180),
    (180, 102, 0),
    (0, 180, 180),
    (180, 180, 180),
    (0, 0, 180),
    (0, 180, 0),
    (180, 0, 0),
    (180, 180, 0),
    (180, 0, 180),
    (180, 102, 0),
    (0, 165, 165),
    (165, 165, 165),
    (0, 0, 165),
    (0, 165, 0),
    (165, 0, 0),
    (165, 165, 0),
    (165, 0, 165),
    (165, 97, 0),
    (0, 165, 165),
    (165, 165, 165),
    (0, 0, 165),
    (0, 165, 0),
    (165, 0, 0),
    (165, 165, 0),
    (165, 0, 165),
    (165, 97, 0),
    (0, 150, 150),
    (150, 150, 150),
    (0, 0, 150),
    (0, 150, 0),
    (150, 0, 0),
    (150, 150, 0),
    (150, 0, 150),
    (150, 92, 0),
    (0, 150, 150),
    (150, 150, 150),
    (0, 0, 150),
    (0, 150, 0),
    (150, 0, 0),
    (150, 150, 0),
    (150, 0, 150),
    (150, 92, 0),
    (0, 135, 135),
    (135, 135, 135),
    (0, 0, 135),
    (0, 135, 0),
    (135, 0, 0),
    (135, 135, 0),
    (135, 0, 135),
    (135, 87, 0),
    (0, 135, 135),
    (135, 135, 135),
    (0, 0, 135),
    (0, 135, 0),
    (135, 0, 0),
    (135, 135, 0),
    (135, 0, 135),
    (135, 87, 0),
    (0, 120, 120),
    (120, 120, 120),
    (0, 0, 120),
    (0, 120, 0),
    (120, 0, 0),
    (120, 120, 0),
    (120, 0, 120),
    (120, 82, 0),
    (0, 120, 120),
    (120, 120, 120),
    (0, 0, 120),
    (0, 120, 0),
    (120, 0, 0),
    (120, 120, 0),
    (120, 0, 120),
    (120, 82, 0),
    (0, 105, 105),
    (105, 105, 105),
    (0, 0, 105),
    (0, 105, 0),
    (105, 0, 0),
    (105, 105, 0),
    (105, 0, 105),
    (105, 77, 0),
    (0, 105, 105),
    (105, 105, 105),
    (0, 0, 105),
    (0, 105, 0),
    (105, 0, 0),
    (105, 105, 0),
    (105, 0, 105),
    (105, 77, 0),
    (0, 90, 90),
    (90, 90, 90),
    (0, 0, 90),
    (0, 90, 0),
    (90, 0, 0),
    (90, 90, 0),
    (90, 0, 90),
    (90, 72, 0),
    (0, 90, 90),
    (90, 90, 90),
    (0, 0, 90),
    (0, 90, 0),
    (90, 0, 0),
    (90, 90, 0),
    (90, 0, 90),
    (90, 72, 0),
    (0, 75, 75),
    (75, 75, 75),
    (0, 0, 75),
    (0, 75, 0),
    (75, 0, 0),
    (75, 75, 0),
    (75, 0, 75),
    (75, 67, 0),
    (0, 75, 75),
    (75, 75, 75),
    (0, 0, 75),
    (0, 75, 0),
    (75, 0, 0),
    (75, 75, 0),
    (75, 0, 75),
    (75, 67, 0),
    (0, 60, 60),
    (60, 60, 60),
    (0, 0, 60),
    (0, 60, 0),
    (60, 0, 0),
    (60, 60, 0),
    (60, 0, 60),
    (60, 62, 0),
    (0, 60, 60),
    (60, 60, 60),
    (0, 0, 60),
    (0, 60, 0),
    (60, 0, 0),
    (60, 60, 0),
    (60, 0, 60),
    (60, 62, 0),
    (0, 45, 45),
    (45, 45, 45),
    (0, 0, 45),
    (0, 45, 0),
    (45, 0, 0),
    (45, 45, 0),
    (45, 0, 45),
    (45, 57, 0),
    (0, 45, 45),
    (45, 45, 45),
    (0, 0, 45),
    (0, 45, 0),
    (45, 0, 0),
    (45, 45, 0),
    (45, 0, 45),
    (45, 57, 0),
    (0, 30, 30),
    (30, 30, 30),
    (0, 0, 30),
    (0, 30, 0),
    (30, 0, 0),
    (30, 30, 0),
    (30, 0, 30),
    (30, 52, 0),
    (0, 30, 30),
    (30, 30, 30),
    (0, 0, 30),
    (0, 30, 0),
    (30, 0, 0),
    (30, 30, 0),
    (30, 0, 30),
    (192, 192, 192),
    (28, 0, 100),
]


def _i32(b: bytes, off: int) -> int:
    v = b[off + 2] + (b[off + 3] << 8) + (b[off + 1] << 24) + (b[off] << 16)
    return v - (1 << 32) if v >= (1 << 31) else v


def _u16(b: bytes, off: int) -> int:
    return b[off] + b[off + 1] * 256


def vax_to_ieee(raw: bytes) -> float:
    """CPLVaxToIEEEDouble (cpl_vax.cpp:31-110). double64_t is {hi, lo},
    so on LSB machines hi is the FIRST uint32 of the shuffled bytes."""
    d = bytes(
        [raw[2], raw[3], raw[0], raw[1], raw[6], raw[7], raw[4], raw[5]]
    )
    hi = struct.unpack("<I", d[0:4])[0]
    lo = struct.unpack("<I", d[4:8])[0]
    sign = hi & 0x80000000
    exponent = (hi >> 23) & 0xFF
    if exponent:
        exponent = exponent - 129 + 1023
    rndbits = lo & 0x7
    lo = lo >> 3
    lo = (lo & 0x1FFFFFFF) | ((hi << 29) & 0xFFFFFFFF)
    if rndbits:
        lo |= 1
    hi = (hi >> 3) & 0x000FFFFF
    hi = hi | (exponent << 20) | sign
    return struct.unpack("<d", struct.pack("<II", lo, hi))[0]


def ieee_to_vax(v: float) -> bytes:
    """CPLIEEEToVaxDouble inverse (cpl_vax.cpp:118-210)."""
    raw = struct.pack("<d", float(v))
    hi = struct.unpack("<I", raw[4:8])[0]
    lo = struct.unpack("<I", raw[0:4])[0]
    sign = hi & 0x80000000
    exponent = (hi >> 20) & 0x7FF
    if exponent:
        exponent = exponent - 1023 + 129
    if exponent > 255:
        return bytes([0xFF, 0xFF if sign else 0x7F] + [0xFF] * 6)
    if exponent < 0 or (exponent == 0 and sign == 0):
        return b"\x00" * 8
    hi = ((hi << 3) | (lo >> 29)) & 0x007FFFFF
    hi = hi | (exponent << 23) | sign
    lo = (lo << 3) & 0xFFFFFFFF
    mem = struct.pack("<II", hi, lo)
    out = bytearray(8)
    out[2:4] = mem[0:2]
    out[0:2] = mem[2:4]
    out[6:8] = mem[4:6]
    out[4:6] = mem[6:8]
    return bytes(out)


def _attr_linkages(attr: bytes):
    """DGNGetAttrLinkSize/DGNGetLinkage walk: yields (linkage_type,
    payload bytes)."""
    off = 0
    while off + 4 <= len(attr):
        if attr[off] == 0 and attr[off + 1] in (0, 0x80):
            size = 8
            ltype = 0  # DMRS
        elif attr[off + 1] & 0x10:
            size = min(attr[off] * 2 + 2, 255 * 2 + 2)
            ltype = _u16(attr, off + 2)
        else:
            return
        if size <= 4 or off + size > len(attr):
            return
        yield ltype, attr[off:off + size]
        off += size


class _Ctx:
    scale = 1.0
    origin = (0.0, 0.0, 0.0)
    dimension = 2
    color_table: list | None = None

    def transform(self, x: float, y: float):
        return (x * self.scale - self.origin[0],
                y * self.scale - self.origin[1])

    def color(self, idx: int):
        if self.color_table and 0 <= idx < 256:
            return self.color_table[idx]
        if 0 <= idx < len(_DEFAULT_PCT):
            return _DEFAULT_PCT[idx]
        return None


def _fmt(v: float) -> str:
    return f"{v:.8f}".rstrip("0").rstrip(".") if v == v else "nan"


def read_dgn(data: bytes) -> list[dict]:
    """-> feature dicts: {Type, Level, GraphicGroup, ColorIndex, Weight,
    Style, Text, wkt, style} matching the OGR DGN layer translation."""
    data = bytes(data)
    ctx = _Ctx()
    out = []
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        b0, b1 = data[pos], data[pos + 1]
        if b0 == 0xFF and b1 == 0xFF:
            break
        nwords = data[pos + 2] + data[pos + 3] * 256
        elem = data[pos:pos + 4 + 2 * nwords]
        pos += 4 + 2 * nwords
        if len(elem) < 4 + 2 * nwords:
            break
        etype = b1 & 0x7F
        level = b0 & 0x3F
        deleted = bool(b1 & 0x80)
        if deleted:
            continue

        if etype == DGNT_TCB:
            if len(elem) > 1264 and ctx.scale == 1.0:
                ctx.dimension = 3 if (elem[1214] & 0x40) else 2
                spm = _i32(elem, 1112)
                ups = _i32(elem, 1116)
                ox = vax_to_ieee(elem[1240:1248])
                oy = vax_to_ieee(elem[1248:1256])
                oz = vax_to_ieee(elem[1256:1264])
                if ups and spm:
                    ctx.scale = 1.0 / (ups * spm)
                    ox, oy, oz = (v / (ups * spm) for v in (ox, oy, oz))
                ctx.origin = (ox, oy, oz)
            continue
        if etype == DGNT_GROUP_DATA and level == 1:
            if len(elem) >= 41 + 765:
                tbl = [None] * 256
                tbl[255] = tuple(elem[38:41])
                for i in range(255):
                    tbl[i] = tuple(elem[41 + 3 * i: 44 + 3 * i])
                ctx.color_table = tbl
            continue
        if etype not in (DGNT_LINE, DGNT_LINE_STRING, DGNT_SHAPE,
                         DGNT_CURVE, DGNT_ELLIPSE, DGNT_ARC, DGNT_TEXT):
            continue

        core = {
            "Type": etype, "Level": level,
            "GraphicGroup": _u16(elem, 28) if len(elem) >= 36 else 0,
            "ColorIndex": elem[35] if len(elem) >= 36 else 0,
            "Weight": (elem[34] & 0xF8) >> 3 if len(elem) >= 36 else 0,
            "Style": elem[34] & 0x7 if len(elem) >= 36 else 0,
            "Text": None, "wkt": None, "style": None,
        }
        props = _u16(elem, 32) if len(elem) >= 36 else 0
        attr = b""
        if props & DGNPF_ATTRIBUTES:
            att_idx = _u16(elem, 30)
            start = att_idx * 2 + 32
            if 0 < len(elem) - start:
                attr = elem[start:]

        rgb = ctx.color(core["ColorIndex"])
        fscolor = f"c:#{rgb[0]:02x}{rgb[1]:02x}{rgb[2]:02x}" if rgb else ""
        pen_ids = {0: "ogr-pen-0", 1: "ogr-pen-5", 3: "ogr-pen-2",
                   4: "ogr-pen-4", 5: "ogr-pen-6", 2: "ogr-pen-3",
                   6: "ogr-pen-7"}
        pen = f'PEN(id:"{pen_ids.get(core["Style"], "ogr-pen-0")}"'
        if fscolor:
            pen += "," + fscolor
        if core["Weight"] > 1:
            pen += f',w:{core["Weight"]}px'
        pen += ")"

        dim = ctx.dimension
        psz = dim * 4

        if etype == DGNT_LINE:
            pts = []
            for i in range(2):
                x = _i32(elem, 36 + i * psz)
                y = _i32(elem, 40 + i * psz)
                pts.append(ctx.transform(x, y))
            core["wkt"] = "LINESTRING (" + ",".join(
                f"{_fmt(p[0])} {_fmt(p[1])}" for p in pts) + ")"
            core["style"] = pen
        elif etype in (DGNT_LINE_STRING, DGNT_SHAPE, DGNT_CURVE):
            count = _u16(elem, 36)
            avail = (len(elem) - 38) // psz
            count = min(count, avail)
            pts = []
            for i in range(count):
                x = _i32(elem, 38 + i * psz)
                y = _i32(elem, 42 + i * psz)
                pts.append(ctx.transform(x, y))
            body = ",".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in pts)
            if etype == DGNT_SHAPE:
                core["wkt"] = f"POLYGON (({body}))"
                fill = None
                for ltype, payload in _attr_linkages(attr):
                    if ltype == 0x0041 and len(payload) >= 9:
                        fill = payload[8]
                        break
                if fill is not None:
                    frgb = ctx.color(fill)
                    if frgb:
                        brush = (f'BRUSH(fc:#{frgb[0]:02x}{frgb[1]:02x}'
                                 f'{frgb[2]:02x},id:"ogr-brush-0")')
                        if fill != core["ColorIndex"]:
                            brush += ";" + pen
                        core["style"] = brush
                else:
                    core["style"] = pen
            else:
                core["wkt"] = f"LINESTRING ({body})"
                core["style"] = pen
        elif etype in (DGNT_ELLIPSE, DGNT_ARC):
            if etype == DGNT_ELLIPSE:
                a = vax_to_ieee(elem[36:44]) * ctx.scale
                b = vax_to_ieee(elem[44:52]) * ctx.scale
                if dim == 2:
                    rot = _i32(elem, 52) / 360000.0
                    ox = vax_to_ieee(elem[56:64])
                    oy = vax_to_ieee(elem[64:72])
                else:
                    rot = 0.0
                    ox = vax_to_ieee(elem[68:76])
                    oy = vax_to_ieee(elem[76:84])
                start, sweep = 0.0, 360.0
            else:
                start = _i32(elem, 36) / 360000.0
                raw40 = bytearray(elem[40:44])
                neg = bool(elem[41] & 0x80)
                if neg:
                    raw40[1] &= 0x7F
                sv = _i32(bytes(raw40), 0)
                sweep = 360.0 if sv == 0 else (-sv if neg else sv) / 360000.0
                a = vax_to_ieee(elem[44:52]) * ctx.scale
                b = vax_to_ieee(elem[52:60]) * ctx.scale
                if dim == 2:
                    rot = _i32(elem, 60) / 360000.0
                    ox = vax_to_ieee(elem[64:72])
                    oy = vax_to_ieee(elem[72:80])
                else:
                    rot = 0.0
                    ox = vax_to_ieee(elem[76:84])
                    oy = vax_to_ieee(elem[84:92])
            cx, cy = ctx.transform(ox, oy)
            npts = int(max(1.0, abs(sweep) / 5.0) + 1.0)
            npts = min(npts, 90)
            step = sweep / (npts - 1)
            rr = math.radians(rot)
            pts = []
            for i in range(npts):
                ang = math.radians(start + step * i)
                px = (a * math.cos(rr) * math.cos(ang)
                      - b * math.sin(rr) * math.sin(ang)) + cx
                py = (a * math.sin(rr) * math.cos(ang)
                      + b * math.cos(rr) * math.sin(ang)) + cy
                pts.append((px, py))
            core["wkt"] = "LINESTRING (" + ",".join(
                f"{_fmt(p[0])} {_fmt(p[1])}" for p in pts) + ")"
            core["style"] = pen
        elif etype == DGNT_TEXT:
            if dim == 2:
                nchars = elem[58]
                height = _i32(elem, 42) * ctx.scale * 6.0 / 1000.0
                ox = _i32(elem, 50)
                oy = _i32(elem, 54)
                toff = 60
                font = elem[36]
            else:
                nchars = elem[74]
                height = _i32(elem, 42) * ctx.scale * 6.0 / 1000.0
                ox = _i32(elem, 62)
                oy = _i32(elem, 66)
                toff = 76
                font = elem[36]
            x, y = ctx.transform(ox, oy)
            text = elem[toff:toff + nchars].decode("ascii", "replace")
            core["Text"] = text
            core["wkt"] = f"POINT ({_fmt(x)} {_fmt(y)})"
            label = f'LABEL(t:"{text}"'
            if fscolor:
                label += "," + fscolor
            if abs(height) >= 6.0:
                label += f",s:{int(height)}g"
            elif abs(height) > 0.1:
                label += f",s:{height:.3f}g"
            else:
                label += f",s:{height:.12f}g"
            fname = _FONTS.get(font, f"MstnFont{font}")
            label += f",f:{fname})"
            core["style"] = label
        out.append(core)
    return out


def _w_i32(v: int) -> bytes:
    """Inverse of the DGN word-swapped int32 layout."""
    v &= 0xFFFFFFFF
    return bytes([(v >> 16) & 0xFF, (v >> 24) & 0xFF,
                  v & 0xFF, (v >> 8) & 0xFF])


def write_dgn(
    elements: list[dict],
    uor_per_subunit: int = 100,
    subunits_per_master: int = 100,
    origin=(0.0, 0.0, 0.0),
) -> bytes:
    """Minimal 2D DGN writer (the dgnwrite.cpp CreateDataSource shape
    with UOR_PER_SUB_UNIT/SUB_UNITS_PER_MASTER_UNIT/ORIGIN options):
    one TCB + LINE/SHAPE/LINE_STRING/TEXT elements + the 0xFFFF EOF.
    elements: {type: 'line'|'shape'|'linestring'|'text', points or
    (origin, text, height), level, color}."""
    upm = uor_per_subunit * subunits_per_master

    def uor(v: float, axis: int) -> int:
        return int(round((v + origin[axis]) * upm))

    def elem_header(body_len: int, level: int, etype: int) -> bytes:
        return bytes([level & 0x3F, etype & 0x7F]) + struct.pack(
            "<H", body_len // 2
        )

    out = bytearray()
    tcb = bytearray(1536 - 4)
    tcb[1112 - 4:1116 - 4] = _w_i32(subunits_per_master)
    tcb[1116 - 4:1120 - 4] = _w_i32(uor_per_subunit)
    for ax in range(3):
        tcb[1240 - 4 + 8 * ax:1248 - 4 + 8 * ax] = ieee_to_vax(
            origin[ax] * upm
        )
    out += elem_header(len(tcb), 8, DGNT_TCB) + tcb

    for el in elements:
        level = el.get("level", 1)
        color = el.get("color", 0)
        kind = el["type"]
        disp = bytearray(32)  # bytes 4..35 of the element
        disp[31] = color & 0xFF  # byte 35
        if kind == "line":
            (x0, y0), (x1, y1) = el["points"]
            body = bytes(disp) + b"".join(
                _w_i32(v) for v in (uor(x0, 0), uor(y0, 1),
                                    uor(x1, 0), uor(y1, 1))
            )
            out += elem_header(len(body), level, DGNT_LINE) + body
        elif kind in ("shape", "linestring"):
            pts = el["points"]
            body = bytearray(disp)
            body += struct.pack("<H", len(pts))
            for x, y in pts:
                body += _w_i32(uor(x, 0)) + _w_i32(uor(y, 1))
            etype = DGNT_SHAPE if kind == "shape" else DGNT_LINE_STRING
            out += elem_header(len(body), level, etype) + bytes(body)
        elif kind == "text":
            x, y = el["origin"]
            text = el["text"].encode("ascii")
            body = bytearray(disp)
            body += bytes([el.get("font", 3), 0])  # font, justification
            h_uor = int(round(el.get("height", 1.0) * upm * 1000.0 / 6.0))
            body += _w_i32(h_uor)  # length mult
            body += _w_i32(h_uor)  # height mult
            body += _w_i32(0)      # rotation
            body += _w_i32(uor(x, 0)) + _w_i32(uor(y, 1))
            body += bytes([len(text), 0])
            body += text
            if len(body) % 2:
                body += b"\x00"
            out += elem_header(len(body), level, DGNT_TEXT) + bytes(body)
        else:
            raise ValueError(f"unsupported element kind {kind!r}")
    out += b"\xff\xff"
    return bytes(out)
