"""WKT1 spatial-reference import/export (OGRSpatialReference subset).

Re-expresses the reference's importFromWkt / exportToWkt / AutoIdentify
loop (ogr/ogrspatialreference.cpp) for the engine's supported CRS set:
a recursive-descent parser for the WKT1 bracket grammar (both OGC and
ESRI flavors — ESRI's `D_North_American_1983` datum spellings and
`Latitude_Of_Origin`-style parameter names normalize to the OGC ones),
an emitter for canonical OGC WKT1 with AUTHORITY nodes, and EPSG
auto-identification that recognizes:

  * GEOGCS WGS 84                      -> EPSG:4326
  * Mercator_1SP / Pseudo-Mercator     -> EPSG:3857
  * Transverse_Mercator UTM parameter
    signature (k0 0.9996, FE 500000,
    lat0 0, CM = 6*zone - 183,
    FN 0 / 10000000)                   -> EPSG:326xx / 327xx
  * the registered LCC-2SP / Albers /
    Polar Stereographic parameter sets -> EPSG:2154/3347/5070/3413/3031

so a dataset carrying only a .prj/WKT (the reference's own fixtures do)
resolves to a transform this engine can execute. NAD83-based WKTs map to
the WGS84 zone twin — the GRS80/WGS84 flattening difference is
sub-millimeter, the same equivalence the reference applies in practice.
"""

from __future__ import annotations

import re

from gdal_spark.functions import crs as C


class WktNode:
    __slots__ = ("name", "values")

    def __init__(self, name: str, values: list):
        self.name = name
        self.values = values

    def children(self, name: str) -> list["WktNode"]:
        return [
            v for v in self.values
            if isinstance(v, WktNode) and v.name.upper() == name.upper()
        ]

    def child(self, name: str) -> "WktNode | None":
        c = self.children(name)
        return c[0] if c else None

    def str0(self) -> str:
        return next(v for v in self.values if isinstance(v, str))


_TOKEN = re.compile(r'"([^"]*)"|([A-Za-z_][A-Za-z0-9_]*)\s*\[|([-+0-9.eE]+)|([\],])')


def parse_wkt(text: str) -> WktNode:
    """WKT1 bracket grammar -> node tree. Accepts ( ) as [ ] like the
    reference tokenizer."""
    text = text.strip().replace("(", "[").replace(")", "]")
    pos = 0
    stack: list[WktNode] = []
    root: WktNode | None = None
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos].isspace() or text[pos] == ",":
                pos += 1
                continue
            raise ValueError(f"bad WKT at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        qstr, kw, num, punct = m.groups()
        if kw is not None:
            node = WktNode(kw, [])
            if stack:
                stack[-1].values.append(node)
            stack.append(node)
            if root is None:
                root = node
        elif qstr is not None:
            stack[-1].values.append(qstr)
        elif num is not None:
            stack[-1].values.append(float(num))
        elif punct == "]":
            stack.pop()
    if root is None:
        raise ValueError("empty WKT")
    return root


_PARAM_ALIASES = {
    "latitude_of_origin": "latitude_of_origin",
    "latitude_of_center": "latitude_of_origin",
    "central_meridian": "central_meridian",
    "longitude_of_center": "central_meridian",
    "scale_factor": "scale_factor",
    "false_easting": "false_easting",
    "false_northing": "false_northing",
    "standard_parallel_1": "standard_parallel_1",
    "standard_parallel_2": "standard_parallel_2",
}


def srs_params(root: WktNode) -> dict:
    """Flatten a PROJCS/GEOGCS tree to canonical fields."""
    out: dict = {"kind": "geographic" if root.name.upper() == "GEOGCS" else
                 "projected", "name": root.str0(), "params": {}}
    if root.name.upper() == "PROJCS":
        proj = root.child("PROJECTION")
        out["projection"] = proj.str0() if proj else None
        for p in root.children("PARAMETER"):
            key = _PARAM_ALIASES.get(p.values[0].lower().replace(" ", "_"))
            if key:
                out["params"][key] = float(
                    next(v for v in p.values if isinstance(v, float))
                )
        gcs = root.child("GEOGCS")
    else:
        gcs = root
    if gcs is not None:
        datum = gcs.child("DATUM")
        out["datum"] = datum.str0() if datum else None
        sph = datum.child("SPHEROID") if datum else None
        if sph:
            nums = [v for v in sph.values if isinstance(v, float)]
            out["spheroid"] = (nums[0], nums[1])
    return out


def epsg_from_wkt(text: str) -> str | None:
    """AutoIdentifyEPSG for the supported set; None when unrecognized."""
    info = srs_params(parse_wkt(text))
    if info["kind"] == "geographic":
        a, invf = info.get("spheroid", (0, 0))
        if abs(a - 6378137.0) < 0.5:
            return "EPSG:4326"
        return None
    proj = (info.get("projection") or "").lower()
    p = info["params"]

    def near(key, val, tol=1e-6):
        return abs(p.get(key, float("nan")) - val) < tol

    if proj == "transverse_mercator":
        cm = p.get("central_meridian")
        if (
            near("scale_factor", 0.9996)
            and near("false_easting", 500000.0)
            and near("latitude_of_origin", 0.0)
            and cm is not None
        ):
            zone = (cm + 183.0) / 6.0
            if abs(zone - round(zone)) < 1e-9 and 1 <= round(zone) <= 60:
                if near("false_northing", 0.0):
                    return f"EPSG:326{int(round(zone)):02d}"
                if near("false_northing", 10000000.0):
                    return f"EPSG:327{int(round(zone)):02d}"
        return None
    if proj in ("mercator_1sp", "mercator_auxiliary_sphere",
                "popular_visualisation_pseudo_mercator"):
        return "EPSG:3857"
    if proj == "lambert_conformal_conic_2sp" or (
        proj == "lambert_conformal_conic" and "standard_parallel_2" in p
    ):
        for code, want in (
            ("EPSG:2154", (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)),
            ("EPSG:3347",
             (49.0, 77.0, 63.390675, -91.86666666666667, 6200000.0, 3000000.0)),
        ):
            sp1, sp2, lat0, cm, fe, fn = want
            if (near("standard_parallel_1", sp1) and near("standard_parallel_2", sp2)
                    and near("latitude_of_origin", lat0)
                    and near("central_meridian", cm)
                    and near("false_easting", fe) and near("false_northing", fn)):
                return code
        return None
    if proj == "albers_conic_equal_area" or proj == "albers":
        if (near("standard_parallel_1", 29.5) and near("standard_parallel_2", 45.5)
                and near("central_meridian", -96.0)):
            return "EPSG:5070"
        return None
    if proj == "polar_stereographic":
        if near("standard_parallel_1", 70.0) or near("latitude_of_origin", 70.0):
            return "EPSG:3413"
        if near("standard_parallel_1", -71.0) or near("latitude_of_origin", -71.0):
            return "EPSG:3031"
        return None
    return None


_WGS84_GEOGCS = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]'
)


def _projcs(name: str, projection: str, params: list[tuple[str, float]],
            code: str) -> str:
    ps = ",".join(
        f'PARAMETER["{k}",{v:.10g}]' for k, v in params
    )
    return (
        f'PROJCS["{name}",{_WGS84_GEOGCS},PROJECTION["{projection}"],{ps},'
        f'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
        f'AUTHORITY["EPSG","{code.split(":")[1]}"]]'
    )


def wkt_from_epsg(code: str) -> str:
    """exportToWkt for the supported CRS set (canonical OGC WKT1)."""
    if code == "EPSG:4326":
        return _WGS84_GEOGCS
    if code == "EPSG:3857":
        return _projcs(
            "WGS 84 / Pseudo-Mercator", "Mercator_1SP",
            [("central_meridian", 0), ("scale_factor", 1),
             ("false_easting", 0), ("false_northing", 0)], code,
        )
    utm = C._parse_utm(code)
    if utm:
        lon0, fn = utm
        zone = int(round((lon0 + 183.0) / 6.0))
        hemi = "N" if fn == 0.0 else "S"
        return _projcs(
            f"WGS 84 / UTM zone {zone}{hemi}", "Transverse_Mercator",
            [("latitude_of_origin", 0), ("central_meridian", lon0),
             ("scale_factor", 0.9996), ("false_easting", 500000),
             ("false_northing", fn)], code,
        )
    _LCC = {
        "EPSG:2154": ("RGF93 / Lambert-93",
                      (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)),
        "EPSG:3347": ("NAD83 / Statistics Canada Lambert",
                      (49.0, 77.0, 63.390675, -91.86666666666667,
                       6200000.0, 3000000.0)),
    }
    if code in _LCC:
        name, (sp1, sp2, lat0, cm, fe, fn) = _LCC[code]
        return _projcs(
            name, "Lambert_Conformal_Conic_2SP",
            [("standard_parallel_1", sp1), ("standard_parallel_2", sp2),
             ("latitude_of_origin", lat0), ("central_meridian", cm),
             ("false_easting", fe), ("false_northing", fn)], code,
        )
    if code == "EPSG:5070":
        return _projcs(
            "NAD83 / Conus Albers", "Albers_Conic_Equal_Area",
            [("standard_parallel_1", 29.5), ("standard_parallel_2", 45.5),
             ("latitude_of_center", 23.0), ("longitude_of_center", -96.0),
             ("false_easting", 0), ("false_northing", 0)], code,
        )
    if code in ("EPSG:3413", "EPSG:3031"):
        sp = 70.0 if code == "EPSG:3413" else -71.0
        cm = -45.0 if code == "EPSG:3413" else 0.0
        name = ("WGS 84 / NSIDC Sea Ice Polar Stereographic North"
                if code == "EPSG:3413"
                else "WGS 84 / Antarctic Polar Stereographic")
        return _projcs(
            name, "Polar_Stereographic",
            [("standard_parallel_1", sp), ("central_meridian", cm),
             ("false_easting", 0), ("false_northing", 0)], code,
        )
    raise ValueError(f"unsupported CRS {code}")


def transform_wkt(src_wkt: str, dst_wkt: str, x, y):
    """Array transform between two WKT-described CRS via EPSG
    auto-identification + the 4326 hub."""
    src, dst = epsg_from_wkt(src_wkt), epsg_from_wkt(dst_wkt)
    if src is None or dst is None:
        raise ValueError("unrecognized WKT CRS")
    return C.transform(src, dst, x, y)


def epsg_from_geokeys(geokeys: list) -> str | None:
    """GeoTIFF GeoKeyDirectory -> EPSG code (the gt_wkt_srs.cpp lookup
    for the two CS-type keys): ProjectedCSTypeGeoKey (3072) wins, else
    GeographicTypeGeoKey (2048). Returns the code even when the engine
    has no transform for it — identification and support are separate
    questions, exactly as in the reference."""
    if not geokeys or len(geokeys) < 4:
        return None
    nkeys = int(geokeys[3])
    found: dict[int, int] = {}
    for i in range(nkeys):
        kid, loc, cnt, val = (int(v) for v in geokeys[4 + 4 * i : 8 + 4 * i])
        if loc == 0 and cnt == 1:
            found[kid] = val
    if found.get(3072) not in (None, 0, 32767):
        return f"EPSG:{found[3072]}"
    if found.get(2048) not in (None, 0, 32767):
        return f"EPSG:{found[2048]}"
    return None
