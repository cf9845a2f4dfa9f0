"""SXF (Panorama / Russian military topographic exchange) reader.

Re-expresses ogr/ogrsf_frmts/sxf/: the SXF passport (v3 256-byte and
v4 400-byte headers — version byte, creation date, map sheet, scale,
information flags with the real-coordinates bit, projected/geodetic
corner coordinates, device resolution and frame corners, the
scale/resolution coefficient and the frame-derived dfXOr/dfYOr
origin), the record table walk of FillLayers (record count at
288/440, records at 300/452), the 32-byte record header with the
v3/v4 geometry-type code extraction from the reference bytes, the
SHORT/FLOAT/INT/DOUBLE + 2D/3D coordinate certificate decoding of
TranslateXYH (Y stored before X; H always float32), sub-object
blocks, text certificates (length byte + CP1251 chars), the SC_<code>
semantic attributes with the reference's unsigned-length guard for
0xFF length bytes, and the RSC classificator (layers with
KOI8-R/CP1251 short/full names, object records mapping classify codes
to layers, the trailing Not_Classified layer, empty layers dropped).
"""

from __future__ import annotations

import os
import struct

__all__ = ["sxf_open", "SXFDataSource"]

_IDSXFOBJ = 0x7FFF7FFF


def _dec(raw: bytes, enc: str) -> str:
    return raw.split(b"\x00")[0].decode(enc, "replace").strip()


class _Passport:
    pass


def _read_passport(data: bytes) -> _Passport:
    if data[:3] != b"SXF":
        raise ValueError("not an SXF file")
    p = _Passport()
    header_len = struct.unpack("<I", data[4:8])[0]
    fmt_ver = data[8:12]
    p.version = fmt_ver[2] if header_len > 256 else fmt_ver[1]
    if p.version < 3:
        raise ValueError("SXF File version not supported")
    if p.version == 4:
        buff = data[16 : 16 + 80]
        p.create_date = buff[0:8].decode("ascii", "replace")
        p.sheet = _dec(buff[12:44], "cp1251")
        p.scale = struct.unpack("<I", buff[44:48])[0]
        p.sheet_name = _dec(buff[48:80], "cp1251")
        flags = data[96:100]
        p.real_coordinates = bool(flags[0] & (1 << 4))
        # map description
        p.epsg = struct.unpack("<i", data[100:104])[0]
        p.proj_coords = list(struct.unpack("<8d", data[104:168]))
        geo = struct.unpack("<8d", data[168:232])
        p.geo_coords = [v * 180.0 / 3.14159265358979323846 for v in geo]
        p.ellips = data[232]
        p.proj_sys = data[234] if len(data) > 234 else 0
        buff10 = struct.unpack("<10I", data[312:352])
        p.resolution = buff10[0]
        p.frame_coords = [struct.unpack("<i", struct.pack("<I", v))[0]
                          for v in buff10[1:9]]
        p.record_count = struct.unpack("<I", data[440:444])[0]
        p.records_offset = 452
    else:  # version 3
        buff = data[16 : 16 + 62]
        p.create_date = buff[0:6].decode("ascii", "replace")
        p.sheet = _dec(buff[8:32], "cp1251")
        p.scale = struct.unpack("<I", buff[32:36])[0]
        p.sheet_name = _dec(buff[36:62], "cp866")
        flags = data[78:82]
        p.real_coordinates = bool(flags[0] & (1 << 4))
        p.epsg = 0
        base = 82 + 2 + 2 + 8
        corners = struct.unpack("<8i", data[base : base + 32])
        p.proj_coords = [v / 10.0 for v in corners]
        geo = struct.unpack("<8i", data[base + 32 : base + 64])
        p.geo_coords = [v * 0.00000057295779513082 for v in geo]
        p.ellips = 0
        p.proj_sys = 0
        b = struct.unpack("<I16hI", data[212 : 212 + 40])  # res + frame
        p.resolution = b[0]
        p.frame_coords = list(b[1:9])
        p.record_count = struct.unpack("<I", data[288:292])[0]
        p.records_offset = 300

    if p.resolution == 0:
        raise ValueError("SXF invalid resolution")
    p.coeff = float(p.scale) / p.resolution
    p.is_real = p.real_coordinates
    p.x_or = p.y_or = 0.0
    if not p.is_real:
        if all(v == 0 for v in p.frame_coords):
            p.is_real = True
        else:
            p.x_or = p.proj_coords[1] - p.frame_coords[1] * p.coeff
            p.y_or = p.proj_coords[0] - p.frame_coords[0] * p.coeff
    return p


# ---------------------------------------------------------------------------
# RSC classificator
# ---------------------------------------------------------------------------

def read_rsc(data: bytes):
    """-> (layers, code_to_layer) where layers is
    [{"no", "name", "short_name"}] in file order."""
    if len(data) < 328 or data[:3] != b"RSC":
        return [], {}
    font_enc = struct.unpack("<I", data[320:324])[0]
    enc = {125: "koi8_r", 126: "cp1251"}.get(font_enc, "cp1251")

    def section(off):
        return struct.unpack("<3I", data[off : off + 12])

    layers_off, _ll, layers_n = section(120 + 5 * 12)
    objects_off, _ol, objects_n = section(120)
    layers = []
    pos = layers_off
    for _ in range(layers_n):
        if pos + 56 > len(data):
            break
        n_len = struct.unpack("<I", data[pos : pos + 4])[0]
        name = _dec(data[pos + 4 : pos + 36], enc)
        short = _dec(data[pos + 36 : pos + 52], enc)
        no = data[pos + 52]
        layers.append({"no": no, "name": name or "Unnamed",
                       "short_name": short or "Unnamed"})
        if n_len == 0:
            break
        pos += n_len
    code_to_layer = {}
    pos = objects_off
    for _ in range(objects_n):
        if pos + 96 > len(data):
            break
        n_len, ccode = struct.unpack("<II", data[pos : pos + 8])
        layer_no = data[pos + 81]
        code_to_layer[ccode] = layer_no
        if n_len == 0:
            break
        pos += n_len
    return layers, code_to_layer


# ---------------------------------------------------------------------------
# feature records
# ---------------------------------------------------------------------------

_VT_SIZES = {0: 2, 1: 4, 2: 4, 3: 8}  # SHORT/FLOAT/INT/DOUBLE


class SXFFeature:
    __slots__ = ("fid", "classify_code", "geom_type", "geometry",
                 "attributes", "text", "subobjects")


class SXFLayer:
    def __init__(self, no, name):
        self.no = no
        self.name = name
        self.codes: set[int] = set()
        self.features: list[SXFFeature] = []

    @property
    def feature_count(self):
        return len(self.features)


def _translate_xyh(p: _Passport, buf: bytes, off: int, val_type: int,
                   has_z: bool):
    """TranslateXYH: Y first, X second, optional float32 H.
    Returns (x, y, z, consumed) or None on underrun."""
    size = _VT_SIZES[val_type]
    need = 2 * size + (4 if has_z else 0)
    if off + need > len(buf):
        return None
    if val_type == 0:
        y, x = struct.unpack_from("<hh", buf, off)
    elif val_type == 1:
        y, x = struct.unpack_from("<ff", buf, off)
    elif val_type == 2:
        y, x = struct.unpack_from("<ii", buf, off)
    else:
        y, x = struct.unpack_from("<dd", buf, off)
    if p.is_real:
        dx, dy = float(x), float(y)
    else:
        dx = p.x_or + float(x) * p.coeff
        dy = p.y_or + float(y) * p.coeff
    z = 0.0
    if has_z:
        z = struct.unpack_from("<f", buf, off + 2 * size)[0]
    return dx, dy, z, need


def _parse_semantics(buf: bytes):
    """SC_<code> attribute dict with the reference bounds guards."""
    out = {}
    n = len(buf)
    offset = 0
    while offset + 4 < n:
        code, ntype, nscale = struct.unpack_from("<HBb", buf, offset)
        offset += 4
        name = f"SC_{code}"
        if ntype == 0 or ntype == 126:  # ASCIIZ_DOS / ANSI_WIN
            nlen = (nscale & 0xFF) + 1
            if nlen > n or n - nlen < offset:
                break
            enc = "cp866" if ntype == 0 else "cp1251"
            out[name] = buf[offset : offset + nlen - 1].split(b"\x00")[0] \
                .decode(enc, "replace")
            offset += nlen
        elif ntype == 1:
            if offset + 1 > n:
                break
            out[name] = struct.unpack_from("<B", buf, offset)[0] \
                * 10.0 ** nscale
            offset += 1
        elif ntype == 2:
            if offset + 2 > n:
                break
            out[name] = struct.unpack_from("<h", buf, offset)[0] \
                * 10.0 ** nscale
            offset += 2
        elif ntype == 4:
            if offset + 4 > n:
                break
            out[name] = struct.unpack_from("<i", buf, offset)[0] \
                * 10.0 ** nscale
            offset += 4
        elif ntype == 8:
            if offset + 8 > n:
                break
            out[name] = struct.unpack_from("<d", buf, offset)[0] \
                * 10.0 ** nscale
            offset += 8
        elif ntype == 127:  # UNICODE
            nlen = ((nscale & 0xFF) + 1) * 2
            if nlen > n or n - nlen < offset:
                break
            out[name] = buf[offset : offset + nlen - 2].decode(
                "utf-16-le", "replace"
            ).rstrip("\x00")
            offset += nlen
        elif ntype == 128:  # BIGTEXT
            if offset + 4 > n:
                break
            nlen = struct.unpack_from("<I", buf, offset)[0]
            if nlen > n or n - nlen < offset + 4:
                break
            out[name] = buf[offset + 4 : offset + 4 + nlen].decode(
                "utf-16-le", "replace"
            ).rstrip("\x00")
            offset += 4 + nlen
        else:
            break
    return out


def _parse_record(p: _Passport, data: bytes, off: int):
    """One 32-byte record header + certificate + semantics."""
    hdr = data[off : off + 32]
    if len(hdr) < 32:
        return None
    (nid, full_len, geom_len, ccode, _g0, _g1) = struct.unpack_from(
        "<IIIIHH", hdr, 0
    )
    if nid != _IDSXFOBJ:
        return None
    ref = hdr[20:23]
    point_count = struct.unpack_from("<I", hdr, 24)[0]
    sub_count = struct.unpack_from("<H", hdr, 28)[0]
    point_small = struct.unpack_from("<H", hdr, 30)[0]

    f = SXFFeature()
    f.fid = None
    f.classify_code = ccode
    if p.version == 3:
        if ref[2] & (1 << 3):
            code = 0x22 if ref[2] & (1 << 4) else 0x21
            sub_count = 0
        else:
            code = ref[0] & 3
    else:
        if ref[2] & (1 << 5):
            sub_count = 0
        code = ref[0] & 15
        if code == 0x04:
            code = 0x21
            sub_count = 0
    f.geom_type = {0: "line", 1: "polygon", 2: "point", 3: "text",
                   5: "texttemplate", 0x21: "vectorangle",
                   0x22: "vectorscaled"}.get(code, "unknown")
    has_attrs = bool(ref[1] & (1 << 1))
    n_points = point_count if point_small == 65535 else point_small
    has_z = bool(ref[2] & (1 << 1))
    float_type = bool(ref[2] & (1 << 2))
    big_type = bool(ref[1] & (1 << 2))
    val_type = (3 if big_type else 1) if float_type else (2 if big_type else 0)

    if full_len < 32 or geom_len > full_len - 32:
        return None
    cert = data[off + 32 : off + 32 + geom_len]

    pts = []
    pos = 0
    for _ in range(n_points):
        r = _translate_xyh(p, cert, pos, val_type, has_z)
        if r is None:
            break
        pts.append((r[0], r[1], r[2]))
        pos += r[3]
    f.text = None
    if f.geom_type in ("text", "texttemplate") and pos < len(cert):
        n_text = cert[pos]
        if pos + 1 + n_text <= len(cert):
            f.text = cert[pos + 1 : pos + 1 + n_text].split(b"\x00")[0] \
                .decode("cp1251", "replace")
            pos += n_text + 2
    subs = []
    for _ in range(sub_count):
        if pos + 4 > len(cert):
            break
        _sub_no, n_coords = struct.unpack_from("<HH", cert, pos)
        pos += 4
        sub_pts = []
        for _ in range(n_coords):
            r = _translate_xyh(p, cert, pos, val_type, has_z)
            if r is None:
                break
            sub_pts.append((r[0], r[1], r[2]))
            pos += r[3]
        subs.append(sub_pts)
    f.geometry = pts
    f.subobjects = subs

    f.attributes = {}
    if has_attrs:
        sem_size = full_len - 32 - geom_len
        sem = data[off + 32 + geom_len : off + 32 + geom_len + sem_size]
        f.attributes = _parse_semantics(sem)
    return f, full_len


class SXFDataSource:
    def __init__(self, path: str, rsc_path: str | None = None,
                 layer_fullname: bool = False):
        data = open(path, "rb").read()
        self.passport = _read_passport(data)
        p = self.passport
        self.metadata = {
            "SHEET": p.sheet, "SHEET_NAME": p.sheet_name,
            "SXF_VERSION": str(p.version), "SCALE": f"1 : {p.scale}",
        }

        # classificator: explicit path, then sibling .rsc
        rsc_layers, code_to_layer = [], {}
        if rsc_path is None:
            cand = os.path.splitext(path)[0] + ".rsc"
            if os.path.exists(cand):
                rsc_path = cand
        if rsc_path is not None and os.path.exists(rsc_path):
            try:
                rsc_layers, code_to_layer = read_rsc(
                    open(rsc_path, "rb").read()
                )
            except (OSError, struct.error):
                rsc_layers, code_to_layer = [], {}

        layers: list[SXFLayer] = []
        by_no: dict[int, SXFLayer] = {}
        if rsc_layers:
            for rl in rsc_layers:
                name = rl["name"] if layer_fullname else rl["short_name"]
                lyr = SXFLayer(rl["no"], name)
                layers.append(lyr)
                by_no[rl["no"]] = lyr
            for ccode, no in code_to_layer.items():
                if no in by_no:
                    by_no[no].codes.add(ccode)
        else:
            system = SXFLayer(0, "SYSTEM")
            system.codes = set(range(1000000001, 1000000015)) | {91000000}
            layers.append(system)
        not_classified = SXFLayer(255, "Not_Classified")
        layers.append(not_classified)

        # record walk (FillLayers)
        off = p.records_offset
        fid = 0
        for _ in range(p.record_count):
            rec = _parse_record(p, data, off)
            if rec is None:
                break
            f, full_len = rec
            f.fid = fid
            target = not_classified
            for lyr in layers:
                if f.classify_code in lyr.codes:
                    target = lyr
                    break
            target.features.append(f)
            fid += 1
            off += full_len
        self.layers = [lyr for lyr in layers if lyr.feature_count > 0]

    @property
    def layer_count(self):
        return len(self.layers)

    def layer_names(self):
        return [lyr.name for lyr in self.layers]


def sxf_open(path: str, rsc_path: str | None = None,
             layer_fullname: bool = False) -> SXFDataSource:
    return SXFDataSource(path, rsc_path, layer_fullname)
