"""S-101 Electronic Navigational Chart reader
(ogr/ogrsf_frmts/s101 — re-derived, no code copied).

S-101 datasets are ISO8211 (S-100 Part 10a profile) files parsed with
the engine's iso8211 module (extended with the S-100 b44/b48 floats
and '\\*' mixed descriptors). The record model:

  RCNM 10  DSID  dataset identification -> dataset metadata; the
           attribute/information/association code tables (ATCS/ITCS/
           FTCS/IACS/FACS/ARCS) map numeric codes to names; DSSI
           carries the XY/Z coordinate multiplication factors.
  RCNM 15  CSID/CRSH coordinate reference systems (first CRS's CRSI
           is the EPSG code).
  RCNM 110 PRID points (C2IT/C3IT integer tuples / CMF).
  RCNM 115 MRID multipoints (C2IL rows or C3IL parallel lists).
  RCNM 120 CRID curves (SEGH + C2IL vertex list).
  RCNM 125 CCID composite curves (CUCO components, recursive,
           ORNT 2 = reversed).
  RCNM 130 SRID surfaces (RIAS rings: USAG 1 exterior / 2 interior).
  RCNM 150 IRID information types (ATTR attributes).
  RCNM 100 FRID feature types: NFTC feature-type code, FOID object
           id, ATTR attributes, SPAS spatial associations resolved
           through the spatial records above.

STATUS metadata is CANCELLED when DATASET_EDITION == "0"
(ogrs101readerdatasetgeneralinformationrecord.cpp:195-199), else
VALID.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.sources.iso8211 import parse_ddf

__all__ = ["S101Dataset", "s101_open"]

_DSID_META = [
    ("ENSP", "ENCODING_SPECIFICATION"),
    ("ENED", "ENCODING_SPECIFICATION_EDITION"),
    ("PRSP", "PRODUCT_IDENTIFIER"),
    ("PRED", "PRODUCT_EDITION"),
    ("PROF", "APPLICATION_PROFILE"),
    ("DSNM", "DATASET_IDENTIFIER"),
    ("DSTL", "DATASET_TITLE"),
    ("DSRD", "DATASET_REFERENCE_DATE"),
    ("DSLG", "DATASET_LANGUAGE"),
    ("DSAB", "DATASET_ABSTRACT"),
    ("DSED", "DATASET_EDITION"),
]


def _rows(v) -> list:
    if v is None:
        return []
    if isinstance(v, dict):
        return [v]
    out = []
    for item in v:
        if isinstance(item, list):
            out.extend(item)
        else:
            out.append(item)
    return out


class S101Dataset:
    """Parsed S-101 dataset. ``updates`` are the sequential .001/.002…
    update files; their records apply with RUIN 1=insert, 2=delete,
    3=modify, and their DSID overrides the dataset metadata (a
    DATASET_EDITION of "0" cancels the dataset)."""

    def __init__(self, data: bytes, updates: list[bytes] = ()):
        self.metadata: dict[str, str] = {}
        self.attr_names: dict[int, str] = {}
        self.info_type_names: dict[int, str] = {}
        self.feature_type_names: dict[int, str] = {}
        self.epsg: int | None = None
        self.comf = 1.0  # coordinate multiplication factor (XY)
        self.somf = 1.0  # Z factor
        self.points: dict[int, tuple] = {}
        self.multipoints: dict[int, list[tuple]] = {}
        self.curves: dict[int, np.ndarray] = {}
        self.composite_curves: dict[int, list[dict]] = {}
        self.surfaces: dict[int, list[dict]] = {}
        self.information_types: dict[int, dict] = {}
        self._features: dict[int, dict] = {}

        for rec in parse_ddf(data).records:
            self._apply(rec, in_update=False)
        for upd in updates:
            for rec in parse_ddf(upd).records:
                self._apply(rec, in_update=True)

    @property
    def features(self) -> list[dict]:
        return [self._features[k] for k in sorted(self._features)]

    def _apply(self, rec: dict, in_update: bool) -> None:
        if "DSID" in rec:
            self._read_dsid(rec, in_update)
        elif "CSID" in rec:
            for crs in _rows(rec.get("CRSH")):
                if self.epsg is None and str(crs.get("CRSI", "")).strip():
                    try:
                        self.epsg = int(str(crs["CRSI"]).strip())
                    except ValueError:
                        pass
        elif "IRID" in rec:
            if self._ruin(rec["IRID"], self.information_types):
                self.information_types[rec["IRID"]["RCID"]] = {
                    "code": rec["IRID"].get("NITC"),
                    "attributes": self._attrs(rec),
                }
        elif "PRID" in rec:
            if self._ruin(rec["PRID"], self.points):
                self._read_point(rec)
        elif "MRID" in rec:
            if self._ruin(rec["MRID"], self.multipoints):
                self._read_multipoint(rec)
        elif "CRID" in rec:
            if self._ruin(rec["CRID"], self.curves):
                self.curves[rec["CRID"]["RCID"]] = self._coord_list(rec)
        elif "CCID" in rec:
            if self._ruin(rec["CCID"], self.composite_curves):
                self.composite_curves[rec["CCID"]["RCID"]] = \
                    _rows(rec.get("CUCO"))
        elif "SRID" in rec:
            if self._ruin(rec["SRID"], self.surfaces):
                self.surfaces[rec["SRID"]["RCID"]] = _rows(rec.get("RIAS"))
        elif "FRID" in rec:
            if self._ruin(rec["FRID"], self._features):
                self._read_feature(rec)

    @staticmethod
    def _ruin(ident: dict, store: dict) -> bool:
        """Apply the record update instruction; True -> (re)read record."""
        if ident.get("RUIN", 1) == 2:  # delete
            store.pop(ident["RCID"], None)
            return False
        return True  # insert (1) or modify (3) both (re)store

    # -- readers -----------------------------------------------------------
    def _read_dsid(self, rec: dict, in_update: bool = False) -> None:
        dsid = rec["DSID"]
        for sub, name in _DSID_META:
            v = str(dsid.get(sub, "") or "")
            if v:
                self.metadata[name] = v
        prsp = self.metadata.get("PRODUCT_IDENTIFIER", "")
        if "S-101" not in prsp:
            raise ValueError(
                f"ISO8211 file, but not a S-101 product: {prsp!r}")
        prof = str(dsid.get("PROF", "") or "")
        if not in_update and prof == "2":
            raise ValueError(
                "Direct opening of files with APPLICATION_PROFILE=2 "
                "(Update) is not supported. Open the main .000 file")
        self.metadata["STATUS"] = (
            "CANCELLED" if self.metadata.get("DATASET_EDITION") == "0"
            else "VALID")
        dssi = rec.get("DSSI") or {}
        if dssi.get("CMFX"):
            self.comf = float(dssi["CMFX"])
        if dssi.get("CMFZ"):
            self.somf = float(dssi["CMFZ"])
        for row in _rows(rec.get("ATCS")):
            self.attr_names[row["ANCD"]] = row["ATCD"]
        for row in _rows(rec.get("ITCS")):
            self.info_type_names[row["ITNC"]] = row["ITCD"]
        for row in _rows(rec.get("FTCS")):
            self.feature_type_names[row["FTNC"]] = row["FTCD"]

    def _attrs(self, rec: dict) -> list[dict]:
        """ATTR rows -> [{name, value, index, parent_index}]."""
        out = []
        for row in _rows(rec.get("ATTR")):
            out.append({
                "name": self.attr_names.get(row.get("NATC"),
                                            str(row.get("NATC"))),
                "value": row.get("ATVL"),
                "index": row.get("ATIX"),
                "parent_index": row.get("PAIX"),
            })
        return out

    def _read_point(self, rec: dict) -> None:
        rid = rec["PRID"]["RCID"]
        if "C2IT" in rec:
            c = rec["C2IT"]
            self.points[rid] = (c["XCOO"] / self.comf, c["YCOO"] / self.comf)
        elif "C3IT" in rec:
            c = rec["C3IT"]
            self.points[rid] = (c["XCOO"] / self.comf, c["YCOO"] / self.comf,
                                c["ZCOO"] / self.somf)

    def _read_multipoint(self, rec: dict) -> None:
        rid = rec["MRID"]["RCID"]
        pts: list[tuple] = []
        for row in _rows(rec.get("C2IL")):
            pts.append((row["XCOO"] / self.comf, row["YCOO"] / self.comf))
        c3 = rec.get("C3IL")
        for c in _rows(c3):
            for x, y, z in zip(c["XCOO"], c["YCOO"], c["ZCOO"]):
                pts.append((x / self.comf, y / self.comf, z / self.somf))
        self.multipoints[rid] = pts

    def _coord_list(self, rec: dict) -> np.ndarray:
        pts = [(row["XCOO"] / self.comf, row["YCOO"] / self.comf)
               for row in _rows(rec.get("C2IL"))]
        return np.array(pts, np.float64) if pts else np.empty((0, 2))

    def _read_feature(self, rec: dict) -> None:
        frid = rec["FRID"]
        foid = rec.get("FOID") or {}
        feat = {
            "rcid": frid["RCID"],
            "type_code": frid.get("NFTC"),
            "type_name": self.feature_type_names.get(
                frid.get("NFTC"), str(frid.get("NFTC"))),
            "foid": (foid.get("AGEN"), foid.get("FIDN"), foid.get("FIDS")),
            "attributes": self._attrs(rec),
            "spatial": _rows(rec.get("SPAS")),
        }
        self._features[frid["RCID"]] = feat

    # -- geometry resolution -------------------------------------------------
    def resolve_curve(self, rcnm: int, rrid: int,
                      orient: int = 1) -> np.ndarray:
        """Curve (120) or composite curve (125) -> (N,2) coords."""
        if rcnm == 120:
            coords = self.curves.get(rrid, np.empty((0, 2)))
        elif rcnm == 125:
            parts = []
            for comp in self.composite_curves.get(rrid, []):
                c = self.resolve_curve(comp["RRNM"], comp["RRID"],
                                       comp.get("ORNT", 1))
                if parts and len(c) and len(parts[-1]) and \
                        tuple(parts[-1][-1]) == tuple(c[0]):
                    c = c[1:]
                parts.append(c)
            coords = (np.vstack([p for p in parts if len(p)])
                      if parts else np.empty((0, 2)))
        else:
            raise ValueError(f"not a curve record: RCNM {rcnm}")
        if orient == 2:
            coords = coords[::-1]
        return coords

    def surface_rings(self, rrid: int) -> list[np.ndarray]:
        """Surface (130) -> [exterior ring, interior rings...]."""
        ext: list[np.ndarray] = []
        holes: list[np.ndarray] = []
        for ring in self.surfaces.get(rrid, []):
            coords = self.resolve_curve(ring["RRNM"], ring["RRID"],
                                        ring.get("ORNT", 1))
            (ext if ring.get("USAG", 1) == 1 else holes).append(coords)
        return ext + holes

    def feature_geometry(self, feat: dict) -> str | None:
        """Resolve a feature's SPAS associations to a WKT string."""
        spas = feat["spatial"]
        if not spas:
            return None
        kinds = {s["RRNM"] for s in spas}
        if kinds <= {110}:
            pts = [self.points[s["RRID"]] for s in spas
                   if s["RRID"] in self.points]
            if len(pts) == 1:
                return "POINT (" + _pt(pts[0]) + ")"
            return ("MULTIPOINT (" + ", ".join(f"({_pt(p)})" for p in pts)
                    + ")")
        if kinds <= {115}:
            pts = []
            for s in spas:
                pts.extend(self.multipoints.get(s["RRID"], []))
            return ("MULTIPOINT (" + ", ".join(f"({_pt(p)})" for p in pts)
                    + ")")
        if kinds <= {120, 125}:
            lines = [self.resolve_curve(s["RRNM"], s["RRID"],
                                        s.get("ORNT", 1)) for s in spas]
            lines = [ln for ln in lines if len(ln)]
            if len(lines) == 1:
                return "LINESTRING (" + _coords(lines[0]) + ")"
            return ("MULTILINESTRING ("
                    + ", ".join("(" + _coords(ln) + ")" for ln in lines)
                    + ")")
        if kinds <= {130}:
            polys = []
            for s in spas:
                rings = self.surface_rings(s["RRID"])
                if rings:
                    polys.append(
                        "(" + ", ".join("(" + _coords(r) + ")"
                                        for r in rings) + ")")
            if len(polys) == 1:
                return "POLYGON " + polys[0]
            return "MULTIPOLYGON (" + ", ".join(polys) + ")"
        raise ValueError(f"mixed spatial association kinds: {kinds}")


def _pt(p) -> str:
    return " ".join(f"{v:.10g}" for v in p)


def _coords(arr) -> str:
    return ", ".join(f"{x:.10g} {y:.10g}" for x, y in np.asarray(arr))


def s101_open(data: bytes, updates: list[bytes] = ()) -> S101Dataset:
    return S101Dataset(data, updates)
