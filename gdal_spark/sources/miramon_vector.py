"""MiraMon vector (.pnt / .arc / .pol) reader.

Re-expresses ogr/ogrsf_frmts/miramon/: the 48/64-byte top header
(MMReadHeader: file type + " V.S" version + flag byte + bbox +
element count), point coordinate tables, the 56/72-byte arc header
records (MMReadAHArcSection: bbox, vertex count, coordinate offset,
node ids, length), polygon PS/PH sections and PAL arc lists
(MMReadPHPolygonSection / MMGetMultiPolygonCoordinates: VFG byte +
arc index per ring arc, END_RING / REVERSE_ARC / EXTERIOR_ARC_SIDE
flags, shared-vertex dropping between chained arcs), the Z section
(16 reserved bytes + z bbox, per-element ZD records, constant vs
per-vertex heights with the highest/lowest/first selection of
MM_AdoptHeight), the MiraMon extended DBF (0x90 version marker,
32-bit record sizes split across reserved header fields, long field
names through the reserved_2 extended-name offset, L logical fields
-> boolean subtype) and the T.rel metadata (field descriptors,
HorizontalSystemIdentifier -> EPSG via the MM_m_idofic table).

Spark shape: arcs and polygons resolve through flat offset tables,
so a layer splits into per-feature-range tasks that each seek
directly to their PAL/coordinate windows — no serial scan.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["miramon_vector_open", "MiraMonVectorLayer"]

_NODATA_Z = -1.0e300

# VFG flags (mm_constants.h / mm_gdal_driver_structs.h)
_POL_END_RING = 0x02
_POL_REVERSE_ARC = 0x04
_EXTERIOR_ARC_SIDE = 0x01


def _fmt(v: float) -> str:
    """OGR WKT %.15g coordinate formatting."""
    s = "%.15g" % v
    return s


class _Rel:
    def __init__(self, path: str):
        self.sections: dict[str, dict[str, str]] = {}
        cur = None
        try:
            text = open(path, "rb").read().decode("latin-1", "replace")
        except OSError:
            return
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("[") and line.endswith("]"):
                cur = self.sections.setdefault(line[1:-1].lower(), {})
            elif "=" in line and cur is not None:
                k, v = line.split("=", 1)
                cur[k.strip().lower()] = v.strip()

    def get(self, section: str, key: str) -> str | None:
        return self.sections.get(section.lower(), {}).get(key.lower())


def read_extended_dbf(path: str, raw_logical: bool = False
                      ) -> tuple[list[dict], list[dict]]:
    """MM_ReadExtendedDBFHeaderFromFile + record scan.

    Returns (fields, records); field dicts carry name/type/len/decimals,
    records map field name -> python value (str / int / float / bool).
    """
    data = open(path, "rb").read()
    version = data[0]
    extended = version == 0x90
    nrec = struct.unpack("<I", data[4:8])[0]
    first_rec_low = struct.unpack("<H", data[8:10])[0]
    bytes_per_rec_low = struct.unpack("<H", data[10:12])[0]
    reserved_1 = struct.unpack("<H", data[12:14])[0]
    reserved_2 = struct.unpack("<H", data[30:32])[0]
    if extended:
        first_rec = (reserved_2 << 16) | first_rec_low
        bytes_per_rec = (reserved_1 << 16) | bytes_per_rec_low
        nrec_high = struct.unpack("<I", data[16:20])[0]
        nrec = (nrec_high << 32) | nrec
    else:
        first_rec = first_rec_low
        bytes_per_rec = bytes_per_rec_low

    # walk descriptors until the accumulated record width is covered
    fields = []
    acc = 1
    pos = 32
    while acc < bytes_per_rec and pos + 32 <= len(data):
        d = data[pos : pos + 32]
        name = d[0:11].split(b"\x00")[0].decode("latin-1", "replace")
        ftype = chr(d[11])
        if ftype == "F":
            ftype = "N"
        flen = d[16]
        dec = d[17]
        reserved2 = d[18:31]
        if flen == 0 and extended:
            flen = struct.unpack("<I", reserved2[3:7])[0]
        # long field names (extended): offset into the file + size
        ext_off = struct.unpack("<I", reserved2[7:11])[0]
        ext_len = reserved2[11]
        if extended and ext_off and ext_len:
            name = data[ext_off : ext_off + ext_len].decode(
                "latin-1", "replace"
            )
        fields.append({"name": name, "type": ftype, "len": flen,
                       "decimals": dec, "offset": acc})
        acc += flen
        pos += 32

    records = []
    for i in range(nrec):
        rec = data[first_rec + i * bytes_per_rec :
                   first_rec + (i + 1) * bytes_per_rec]
        if len(rec) < bytes_per_rec:
            break
        row = {}
        for f in fields:
            raw = rec[f["offset"] : f["offset"] + f["len"]]
            s = raw.decode("latin-1", "replace").strip()
            if f["type"] == "L":
                row[f["name"]] = (s if raw_logical
                                  else 1 if s in ("T", "t", "Y", "y")
                                  else 0)
            elif f["type"] == "N":
                if s == "":
                    row[f["name"]] = None
                elif f["decimals"] or "." in s:
                    try:
                        row[f["name"]] = float(s)
                    except ValueError:
                        row[f["name"]] = None
                else:
                    try:
                        row[f["name"]] = int(s)
                    except ValueError:
                        row[f["name"]] = None
            else:
                row[f["name"]] = s
        records.append(row)
    return fields, records


def _read_header(data: bytes) -> dict:
    if len(data) < 48:
        raise ValueError("not a MiraMon vector file")
    ftype = data[0:3].decode("ascii", "replace")
    if ftype not in ("PNT", "ARC", "POL", "NOD"):
        raise ValueError("not a MiraMon vector file")
    version = data[3:5].decode("ascii", "replace")
    subversion = chr(data[6])
    flag = data[7]
    minx, maxx, miny, maxy = struct.unpack("<4d", data[8:40])
    if version == " 1":
        n_elem = struct.unpack("<I", data[40:44])[0]
        header_size = 48
        wide = False
    else:
        n_elem = struct.unpack("<Q", data[40:48])[0]
        header_size = 64
        wide = True
    return {
        "file_type": ftype, "version": version.strip(),
        "subversion": subversion, "flag": flag,
        "bbox": (minx, maxx, miny, maxy), "n_elem": n_elem,
        "header_size": header_size, "wide": wide,
    }


# header flag bits (mm_constants.h): bit1 created-with-miramon,
# bit3 multipolygon, bit4 3D, bit5 explicital polygons
_FLAG_3D = 0x10
_FLAG_MULTIPOLYGON = 0x08


def _read_uint(data: bytes, pos: int, wide: bool) -> tuple[int, int]:
    if wide:
        return struct.unpack("<Q", data[pos : pos + 8])[0], pos + 8
    return struct.unpack("<I", data[pos : pos + 4])[0], pos + 4


def _read_arc_headers(data: bytes, off: int, n: int, wide: bool) -> list[dict]:
    """MM_SIZE_OF_AH: bbox + nElemCount + nOffset + first/last node +
    length (56 bytes narrow, 72 wide)."""
    out = []
    pos = off
    for _ in range(n):
        bbox = struct.unpack("<4d", data[pos : pos + 32])
        pos += 32
        n_vert, pos = _read_uint(data, pos, wide)
        offset, pos = _read_uint(data, pos, wide)
        first_node, pos = _read_uint(data, pos, wide)
        last_node, pos = _read_uint(data, pos, wide)
        length = struct.unpack("<d", data[pos : pos + 8])[0]
        pos += 8
        out.append({"bbox": bbox, "n_vert": n_vert, "offset": offset,
                    "first_node": first_node, "last_node": last_node,
                    "length": length})
    return out


def _read_z_section(data: bytes, offset: int, n_elem: int, wide: bool):
    """ZH (16 reserved + z bbox) then per-element ZD records."""
    pos = offset + 16 + 16  # reserved + dfBBminz/dfBBmaxz
    out = []
    for _ in range(n_elem):
        pos += 16  # per-element z bbox
        n_z = struct.unpack("<i", data[pos : pos + 4])[0]
        pos += 4
        if wide:
            pos += 4  # reserved
            z_off = struct.unpack("<Q", data[pos : pos + 8])[0]
            pos += 8
        else:
            z_off = struct.unpack("<I", data[pos : pos + 4])[0]
            pos += 4
        out.append({"n_z": n_z, "offset": z_off})
    return out


def _arc_heights(data: bytes, zd: dict, n_vert: int) -> np.ndarray:
    """MM_GetArcHeights with the default (first value) selection."""
    z = np.full(n_vert, _NODATA_Z)
    n_z = zd["n_z"]
    if n_z == -(2 ** 31):
        return z
    per_vertex = n_z >= 0
    n_heights = abs(n_z)
    if n_vert == 0 or n_heights == 0:
        return z
    total = n_heights * n_vert if per_vertex else n_heights
    vals = np.frombuffer(data, "<f8", total, zd["offset"])
    if per_vertex:
        z[:] = vals[:n_vert]  # first block wins under the default flag
    else:
        z[:] = vals[0]
    return z


class MiraMonVectorLayer:
    def __init__(self, path: str):
        self.path = path
        data = open(path, "rb").read()
        self.data = data
        h = _read_header(data)
        h["is_3d"] = bool(h["flag"] & _FLAG_3D)
        h["is_multipolygon"] = bool(h["flag"] & _FLAG_MULTIPOLYGON)
        self.header = h
        base = os.path.splitext(path)[0]
        self.base = base
        ext = {"PNT": "T", "ARC": "A", "POL": "P"}.get(h["file_type"], "T")
        self.rel_path = f"{base}{ext}.rel"
        self.rel = _Rel(self.rel_path)
        self.dbf_path = f"{base}{ext}.dbf"
        self._parse_geometry()
        self._parse_attributes()

    # -- geometry -----------------------------------------------------
    def _parse_geometry(self):
        h = self.header
        data = self.data
        wide = h["wide"]
        if h["file_type"] == "PNT":
            n = h["n_elem"]
            coords = np.frombuffer(data, "<f8", 2 * n, h["header_size"])
            xy = coords.reshape(n, 2)
            zs = None
            if h["is_3d"]:
                z_off = h["header_size"] + 16 * n
                zds = _read_z_section(data, z_off, n, wide)
                zs = np.empty(n)
                for i, zd in enumerate(zds):
                    if abs(zd["n_z"]) == 0 or zd["n_z"] == -(2 ** 31):
                        zs[i] = _NODATA_Z
                    else:
                        zs[i] = struct.unpack(
                            "<d", data[zd["offset"] : zd["offset"] + 8]
                        )[0]
            self.geom_type = "POINT25D" if h["is_3d"] else "POINT"
            self.geometries = [
                ("point", xy[i], None if zs is None else zs[i])
                for i in range(n)
            ]
        elif h["file_type"] == "ARC":
            n = h["n_elem"]
            self.arc_headers = _read_arc_headers(
                data, h["header_size"], n, wide
            )
            self.zds = None
            if h["is_3d"] and n:
                last = self.arc_headers[-1]
                z_off = last["offset"] + 16 * last["n_vert"]
                self.zds = _read_z_section(data, z_off, n, wide)
            self.geom_type = "LINESTRING25D" if h["is_3d"] else "LINESTRING"
            self.geometries = [
                ("arc", i, None) for i in range(n)
            ]
        elif h["file_type"] == "POL":
            # arc file: ArcSource from the rel, else same stem + .arc
            arc_name = self.rel and None
            rel = _Rel(f"{os.path.splitext(self.path)[0]}P.rel")
            src = rel.get("OVERVIEW:ASPECTES_TECNICS", "ArcSource")
            if src:
                if "." not in os.path.basename(src):
                    src += ".arc"
                arc_path = os.path.join(os.path.dirname(self.path), src)
            else:
                arc_path = os.path.splitext(self.path)[0] + ".arc"
            self.arc_data = open(arc_path, "rb").read()
            arc_h = _read_header(self.arc_data)
            arc_h["is_3d"] = bool(arc_h["flag"] & _FLAG_3D)
            self.arc_header_top = arc_h
            # for polygons the 3D information lives in the arc file
            h["is_3d"] = arc_h["is_3d"]
            self.arc_headers = _read_arc_headers(
                self.arc_data, arc_h["header_size"], arc_h["n_elem"],
                arc_h["wide"]
            )
            self.zds = None
            if h["is_3d"] and arc_h["n_elem"]:
                last = self.arc_headers[-1]
                z_off = last["offset"] + 16 * last["n_vert"]
                self.zds = _read_z_section(
                    self.arc_data, z_off, arc_h["n_elem"], arc_h["wide"]
                )
            # PS section (skipped) then PH section
            ps_size = 16 if wide else 8
            ph_off = h["header_size"] + arc_h["n_elem"] * ps_size
            self.pol_headers = []
            pos = ph_off
            for _ in range(h["n_elem"]):
                bbox = struct.unpack("<4d", data[pos : pos + 32])
                pos += 32
                n_arcs, pos = _read_uint(data, pos, wide)
                n_ext, pos = _read_uint(data, pos, wide)
                n_rings, pos = _read_uint(data, pos, wide)
                offset, pos = _read_uint(data, pos, wide)
                perimeter, area = struct.unpack("<2d", data[pos : pos + 16])
                pos += 16
                self.pol_headers.append({
                    "bbox": bbox, "n_arcs": n_arcs, "n_ext": n_ext,
                    "n_rings": n_rings, "offset": offset,
                    "perimeter": perimeter, "area": area,
                })
            if h["is_multipolygon"]:
                self.geom_type = ("MULTIPOLYGON25D" if h["is_3d"]
                                  else "MULTIPOLYGON")
            else:
                self.geom_type = "POLYGON25D" if h["is_3d"] else "POLYGON"
            # feature 0 is the universal polygon: skipped
            self.geometries = [("pol", i, None)
                               for i in range(1, h["n_elem"])]
        else:
            raise ValueError(f"unsupported MiraMon file type {h['file_type']}")

    def _arc_coords(self, idx: int, reverse: bool = False):
        """One arc's (x, y[, z]) vertices from the arc file."""
        src = self.arc_data if self.header["file_type"] == "POL" else self.data
        ah = self.arc_headers[idx]
        xy = np.frombuffer(src, "<f8", 2 * ah["n_vert"], ah["offset"]).reshape(
            ah["n_vert"], 2
        )
        z = None
        if self.zds is not None:
            z = _arc_heights(src, self.zds[idx], ah["n_vert"])
        if reverse:
            xy = xy[::-1]
            z = None if z is None else z[::-1]
        return xy, z

    def _pol_rings(self, i_pol: int):
        """PAL walk -> list of (ring_xy, ring_z, exterior_flag)."""
        h = self.header
        ph = self.pol_headers[i_pol]
        if ph["n_arcs"] == 0:
            return []
        pal_size = 9 if h["wide"] else 5
        rings = []
        cur_xy, cur_z, cur_vfg = [], [], None
        pos = ph["offset"]
        for _ in range(ph["n_arcs"]):
            vfg = self.data[pos]
            if h["wide"]:
                i_arc = struct.unpack("<Q", self.data[pos + 1 : pos + 9])[0]
            else:
                i_arc = struct.unpack("<I", self.data[pos + 1 : pos + 5])[0]
            pos += pal_size
            xy, z = self._arc_coords(i_arc, reverse=bool(vfg &
                                                         _POL_REVERSE_ARC))
            if cur_xy:
                xy = xy[1:]  # drop the shared joint vertex
                z = None if z is None else z[1:]
            cur_xy.append(xy)
            if z is not None:
                cur_z.append(z)
            if vfg & _POL_END_RING:
                ring_xy = np.concatenate(cur_xy) if cur_xy else \
                    np.zeros((0, 2))
                ring_z = np.concatenate(cur_z) if cur_z else None
                rings.append((ring_xy, ring_z,
                              bool(vfg & _EXTERIOR_ARC_SIDE)))
                cur_xy, cur_z = [], []
        return rings

    # -- attributes ---------------------------------------------------
    def _parse_attributes(self):
        self.fields = []
        self.records = []
        if os.path.exists(self.dbf_path):
            self.fields, self.records = read_extended_dbf(self.dbf_path)

    @property
    def feature_count(self) -> int:
        return len(self.geometries)

    @property
    def epsg(self) -> int | None:
        ident = self.rel.get("SPATIAL_REFERENCE_SYSTEM:HORIZONTAL",
                             "HorizontalSystemIdentifier")
        if ident is None and self.header["file_type"] == "POL":
            arel = _Rel(os.path.splitext(self.path)[0] + "A.rel")
            ident = arel.get("SPATIAL_REFERENCE_SYSTEM:HORIZONTAL",
                             "HorizontalSystemIdentifier")
        if not ident:
            return None
        return _MM_SRS_EPSG.get(ident)

    def field_record(self, fid: int) -> dict:
        """Attribute record(s) of a feature: matched by position for
        1:1 relations, by ID_GRAFIC when the table is 1:N."""
        if not self.records:
            return {}
        id_field = None
        for f in self.fields:
            if f["name"].upper() == "ID_GRAFIC":
                id_field = f["name"]
        internal_id = fid + (1 if self.header["file_type"] == "POL" else 0)
        if id_field is not None:
            matches = [r for r in self.records
                       if r.get(id_field) == internal_id]
            if len(matches) == 1:
                return matches[0]
            if matches:
                # multirecord: keep scalars that agree, else lists
                out = dict(matches[0])
                for k in out:
                    vals = [m.get(k) for m in matches]
                    if any(v != vals[0] for v in vals):
                        out[k] = vals
                return out
        if fid < len(self.records):
            return self.records[fid]
        return {}

    # -- WKT ----------------------------------------------------------
    def wkt(self, fid: int) -> str:
        kind, a, b = self.geometries[fid]
        is_3d = self.header["is_3d"]

        def pt(xy, z=None):
            if is_3d and z is not None:
                return f"{_fmt(xy[0])} {_fmt(xy[1])} {_fmt(z)}"
            return f"{_fmt(xy[0])} {_fmt(xy[1])}"

        if kind == "point":
            return f"POINT ({pt(a, b)})"
        if kind == "arc":
            xy, z = self._arc_coords(a)
            pts = ",".join(
                pt(xy[i], None if z is None else z[i])
                for i in range(len(xy))
            )
            return f"LINESTRING ({pts})"
        # polygon: `a` is already the internal index (universal polygon
        # 0 excluded when geometries was built)
        rings = self._pol_rings(a)

        def ring_str(ring):
            xy, z, _ = ring
            return "(" + ",".join(
                pt(xy[i], None if z is None else z[i])
                for i in range(len(xy))
            ) + ")"

        if self.header["is_multipolygon"]:
            polys = []
            cur = []
            for ring in rings:
                if ring[2] and cur:
                    polys.append(cur)
                    cur = []
                cur.append(ring)
            if cur:
                polys.append(cur)
            body = ",".join(
                "(" + ",".join(ring_str(r) for r in poly) + ")"
                for poly in polys
            )
            return f"MULTIPOLYGON ({body})"
        return "POLYGON (" + ",".join(ring_str(r) for r in rings) + ")"


def miramon_vector_open(path: str) -> MiraMonVectorLayer:
    return MiraMonVectorLayer(path)


# HorizontalSystemIdentifier -> EPSG (first EPSG row per identifier
# in the reference MM_m_idofic correspondence table)
_MM_SRS_EPSG = {
    "Albers_Equal_Area-N_America-NAD83": 5070,
    "Cilindrical_Equidistant-WGS84": 4088,
    "Gauss-Kruger_Faja1-PosGAR98": 22171,
    "Gauss-Kruger_Faja2-PosGAR98": 22172,
    "Gauss-Kruger_Faja3-PosGAR98": 22173,
    "Gauss-Kruger_Faja4-PosGAR98": 22174,
    "Gauss-Kruger_Faja5-PosGAR98": 22175,
    "Gauss-Kruger_Faja6-PosGAR98": 22176,
    "Gauss-Kruger_Faja7-PosGAR98": 22177,
    "Gauss-Kruger_Portugal-ETRS89": 3763,
    "Gauss-Kruger_Portugal-Lisboa1937": 20791,
    "Gauss-Kruger_Qatar-QND": 2932,
    "Gauss-Kruger_Zona2-MAGNA": 3116,
    "LambertAzimEqualA-0-90-WGS84-Esfera": 9821,
    "Lambert_Azimuthal_Equal_Area-1052-ETRS89": 3035,
    "Lambert_Conformal_Conic-Europa-ETRS89": 3034,
    "Lambert_Conformal_Conic-França-ETRS89": 2154,
    "Lambert_Conformal_Conic-Madrid1870": 2062,
    "Lambert_Conformal_Conic-Maroc_N-Merchich": 26191,
    "Lambert_Conformal_Conic-ZoneI-NTF": 27561,
    "Lambert_Conformal_Conic-ZoneII-NTF": 27562,
    "Lambert_Conformal_Conic-ZoneIII-NTF": 27563,
    "Lambert_Conformal_Conic-ZoneIII_ext-NTF": 27573,
    "Lambert_Conformal_Conic-ZoneII_ext-NTF": 27572,
    "Mercator-Equator-WGS84": 3395,
    "Mercator-Popular-Visualisation-Sphere": 3785,
    "ObliqueMercator-Rosenmund1903": 21782,
    "TransverseMercator-BalkansMGI1901": 3909,
    "TransverseMercator-Finland-KKJ": 2393,
    "TransverseMercator-Ireland1965": 29903,
    "TransverseMercator-Israel1989": 2039,
    "TransverseMercator-Monte_Mario-Italy_Z1": 3003,
    "TransverseMercator-Sweden-RT90": 3021,
    "UTM-10N-NAD27-CW": 26710,
    "UTM-10N-WGS84": 32610,
    "UTM-11N-WGS84": 32611,
    "UTM-12N-WGS84": 32612,
    "UTM-13N-WGS84": 32613,
    "UTM-14N-WGS84": 32614,
    "UTM-15N-WGS84": 32615,
    "UTM-16N-WGS84": 32616,
    "UTM-17N-WGS84": 32617,
    "UTM-10S-WGS84": 32710,
    "UTM-11S-WGS84": 32711,
    "UTM-12S-WGS84": 32712,
    "UTM-13S-WGS84": 32713,
    "UTM-14S-WGS84": 32714,
    "UTM-15S-WGS84": 32715,
    "UTM-16S-WGS84": 32716,
    "UTM-1N-NAD83": 26901,
    "UTM-2N-NAD83": 26902,
    "UTM-3N-NAD83": 26903,
    "UTM-4N-NAD83": 26904,
    "UTM-5N-NAD83": 26905,
    "UTM-6N-NAD83": 26906,
    "UTM-7N-NAD83": 26906,
    "UTM-8N-NAD83": 26908,
    "UTM-9N-NAD83": 26909,
    "UTM-10N-NAD83": 26910,
    "UTM-11N-NAD83": 26911,
    "UTM-12N-NAD83": 26912,
    "UTM-13N-NAD83": 26913,
    "UTM-14N-NAD83": 26914,
    "UTM-15N-NAD83": 26915,
    "UTM-16N-NAD83": 26916,
    "UTM-17N-NAD83": 26917,
    "UTM-18N-NAD83": 26918,
    "UTM-19N-NAD83": 26919,
    "UTM-20N-NAD83": 26920,
    "UTM-21N-NAD83": 26921,
    "UTM-22N-NAD83": 26922,
    "UTM-23N-NAD83": 26923,
    "UTM-11N-NAD27-CW": 26711,
    "UTM-13N-ITRF92": 4486,
    "UTM-13N-NAD27-MX": 26713,
    "UTM-14N-ITRF92": 4487,
    "UTM-14N-NAD27-MX": 26714,
    "UTM-15N-ITRF92": 4488,
    "UTM-15N-NAD27-MX": 26715,
    "UTM-16N-NAD27-BC": 26716,
    "UTM-17S-PSA56-P": 24877,
    "UTM-17S-SAD69-PE": 29187,
    "UTM-17S-WGS84": 32717,
    "UTM-18N-WGS84": 32618,
    "UTM-18S-SAD69-CH": 29188,
    "UTM-18S-WGS84": 32718,
    "UTM-19N-SAD69-BR": 29169,
    "UTM-19N-WGS84": 32619,
    "UTM-19S-PSAD56-BC": 24879,
    "UTM-19S-PSAD56-CN": 24879-1203,
    "UTM-19S-PSAD56-V": 24879-1209,
    "UTM-19S-SAD69-CH": 29189,
    "UTM-19S-WGS84": 32719,
    "UTM-20N-SAD69-BR": 29170,
    "UTM-20N-WGS84": 32620,
    "UTM-20S-SAD69-BR": 29190,
    "UTM-20S-WGS84": 32720,
    "UTM-21N-SAD69-BR": 29171,
    "UTM-21N-WGS84": 32621,
    "UTM-21S-SAD69-BR": 29191,
    "UTM-21S-WGS84": 32721,
    "UTM-22N-SAD69-BR": 29172,
    "UTM-22N-WGS84": 32622,
    "UTM-23N-WGS84": 32623,
    "UTM-24N-WGS84": 32624,
    "UTM-25N-WGS84": 32625,
    "UTM-26N-WGS84": 32626,
    "UTM-27S-SAD69-BR": 29192,
    "UTM-22S-WGS84": 32722,
    "UTM-23S-WGS84": 32723,
    "UTM-24S-WGS84": 32724,
    "UTM-25S-WGS84": 32725,
    "UTM-26S-WGS84": 32726,
    "UTM-27S-WGS84": 32727,
    "UTM-28S-WGS84": 32728,
    "UTM-29S-WGS84": 32729,
    "UTM-23S-SAD69-BR": 29193,
    "UTM-24S-SAD69-BR": 29194,
    "UTM-25S-SAD69-BR": 29195,
    "UTM-26N-ETRS89": 3038,
    "UTM-27N-ETRS89": 3039,
    "UTM-27N-WGS84": 32627,
    "UTM-28N-ETRS89": 3040,
    "UTM-28N-REGCAN95": 4083,
    "UTM-28N-WGS84": 32628,
    "UTM-29N-S/IGN": 23029,
    "UTM-29N-ED50-ABDF": 23029-0000,
    "UTM-29N-ED50-PS": 23029-1145,
    "UTM-29N-ETRS89": 25829,
    "UTM-29N-WGS84": 32629,
    "UTM-30N-ETRS89": 25830,
    "UTM-30N-S/IGN": 23030,
    "UTM-30N-ABDF": 23030-0000,
    "UTM-30N-IP": 23030-15933,
    "UTM-30N-Balearic": 23030-1631,
    "UTM-30N-NW_IP": 23030-1635,
    "UTM-30N-PS": 23030-1145,
    "UTM-30N-WGS84": 32630,
    "UTM-31N-ETRS89": 25831,
    "UTM-31N-UB/ICC": 23031,
    "UTM-31N-ABDF": 23031-0000,
    "UTM-31N-WGS84": 32631,
    "UTM-32N-ETRS89": 25832,
    "UTM-32N-WGS84": 32632,
    "UTM-33N-ETRS89": 25833,
    "UTM-33N-WGS84": 32633,
    "UTM-33S-Camacupa1980": 22033,
    "UTM-30S-WGS84": 32730,
    "UTM-31S-WGS84": 32731,
    "UTM-32S-WGS84": 32732,
    "UTM-33S-WGS84": 32733,
    "UTM-34S-WGS84": 32734,
    "UTM-35S-WGS84": 32735,
    "UTM-34N-ETRS89": 25834,
    "UTM-34N-GGRS87": 2100,
    "UTM-34N-WGS84": 32634,
    "UTM-35N-ETRS89": 25835,
    "UTM-35N-WGS84": 32635,
    "UTM-36N-ETRS89": 25836,
    "UTM-36N-WGS84": 32636,
    "UTM-36S-Tete-MZ": 2736,
    "UTM-36S-WGS84": 32736,
    "UTM-37S-WGS84": 32737,
    "UTM-38S-WGS84": 32738,
    "UTM-39S-WGS84": 32739,
    "UTM-40S-WGS84": 32740,
    "UTM-41S-WGS84": 32741,
    "UTM-42S-WGS84": 32742,
    "UTM-43S-WGS84": 32743,
    "UTM-44S-WGS84": 32744,
    "UTM-45S-WGS84": 32745,
    "UTM-46S-WGS84": 32746,
    "UTM-47S-WGS84": 32747,
    "UTM-48S-WGS84": 32748,
    "UTM-49S-WGS84": 32749,
    "UTM-50S-WGS84": 32750,
    "UTM-51S-WGS84": 32751,
    "UTM-52S-WGS84": 32752,
    "UTM-53S-WGS84": 32753,
    "UTM-54S-WGS84": 32754,
    "UTM-55S-WGS84": 32755,
    "UTM-56S-WGS84": 32756,
    "UTM-57S-WGS84": 32757,
    "UTM-58S-WGS84": 32758,
    "UTM-59S-WGS84": 32759,
    "UTM-60S-WGS84": 32760,
    "UTM-37N-ETRS89": 25837,
    "UTM-37N-WGS84": 32637,
    "UTM-38N-WGS84": 32638,
    "UTM-39N-WGS84": 32639,
    "UTM-38N-ETRS89": 25838,
    "UTM-40N-WGS84": 32640,
    "UTM-41N-WGS84": 32641,
    "UTM-42N-WGS84": 32642,
    "UTM-43N-WGS84": 32643,
    "UTM-44N-WGS84": 32644,
    "UTM-45N-WGS84": 32645,
    "UTM-46N-WGS84": 32646,
    "UTM-47N-WGS84": 32647,
    "UTM-48N-WGS84": 32648,
    "UTM-49N-WGS84": 32649,
    "UTM-50N-WGS84": 32650,
    "UTM-51N-WGS84": 32651,
    "UTM-52N-WGS84": 32652,
    "UTM-53N-WGS84": 32653,
    "UTM-54N-WGS84": 32654,
    "UTM-55N-WGS84": 32655,
    "UTM-56N-WGS84": 32656,
    "UTM-57N-WGS84": 32657,
    "UTM-58N-WGS84": 32658,
    "UTM-59N-WGS84": 32659,
    "UTM-60N-WGS84": 32660,
    "UTM-1N-WGS84": 32601,
    "UTM-2N-WGS84": 32602,
    "UTM-3N-WGS84": 32603,
    "UTM-4N-WGS84": 32604,
    "UTM-5N-WGS84": 32605,
    "UTM-6N-WGS84": 32606,
    "UTM-7N-WGS84": 32607,
    "UTM-8N-WGS84": 32608,
    "UTM-9N-WGS84": 32609,
    "UTM-1S-WGS84": 32701,
    "UTM-2S-WGS84": 32702,
    "UTM-3S-WGS84": 32703,
    "UTM-4S-WGS84": 32704,
    "UTM-5S-WGS84": 32705,
    "UTM-6S-WGS84": 32706,
    "UTM-7S-WGS84": 32707,
    "UTM-8S-WGS84": 32708,
    "UTM-9S-WGS84": 32709,
    "lat/long-Bogota": 4218,
    "lat/long-CH1903": 4149,
    "lat/long-ED50-PS": 4230-1145,
    "lat/long-ED50-S/IGN": 4230-1633,
    "lat/long-ED50-ABDF": 4230-0000,
    "lat/long-ED50-UB/ICC": 4230,
    "lat/long-ETRS89": 4258,
    "lat/long-MAGNA": 4686,
    "lat/long-Madrid1870": 4903,
    "lat/long-Merchich": 4261,
    "lat/long-NAD27-BC": 4267,
    "lat/long-NAD83-AA": 4269,
    "lat/long-NTF": 4275,
    "lat/long-PosGAR98": 4190,
    "lat/long-REGCAN95": 4081,
    "lat/long-SAD69-CH": 5527,
    "lat/long-Sweden-RT90": 4124,
    "lat/long-Tete-MZ": 4127,
    "lat/long-WGS84": 4326,
    "Transverse-Mercator_Colombia_ONacional": 9377,
}
