"""Idrisi vector (.vct + .vdc) reader.

Re-expresses ogr/ogrsf_frmts/idrisi/: the one-byte geometry-type
header (1 point / 2 line / 3 polygon), the u32 feature count at
offset 1 with feature records starting at 0x105, the per-type binary
layouts (point: id,x,y doubles; line: id + shape bbox + node count +
xy pairs; polygon: id + bbox + part count + total nodes + per-part
node counts when parts > 1 + xy pairs), the .vdc INI metadata
(``key : value`` with extent and ref. system) and the optional
.avl/.adc attribute join (tab-separated values typed by the ADC
field list, one line per feature in file order).
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["idrisi_vector_open", "IdrisiVectorLayer"]

_DATA_START = 0x105


def _read_vdc(path: str) -> dict:
    out = {}
    try:
        text = open(path, "rb").read().decode("latin-1", "replace")
    except OSError:
        return out
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            out[k.strip().lower()] = v.strip()
    return out


def _fmt(v: float) -> str:
    return "%.15g" % v


class IdrisiVectorLayer:
    def __init__(self, path: str):
        data = open(path, "rb").read()
        if len(data) < _DATA_START:
            raise ValueError("not an Idrisi vector file")
        self.geom_type = {1: "POINT", 2: "LINESTRING", 3: "POLYGON"}.get(
            data[0]
        )
        if self.geom_type is None:
            raise ValueError(f"Unsupported geometry type : {data[0]}")
        self.n_features = struct.unpack("<I", data[1:5])[0]
        base = os.path.splitext(path)[0]
        vdc = _read_vdc(base + ".vdc")
        self.ref_system = vdc.get("ref. system", "")
        self.extent = None
        if all(k in vdc for k in ("min. x", "max. x", "min. y", "max. y")):
            self.extent = (float(vdc["min. x"]), float(vdc["max. x"]),
                           float(vdc["min. y"]), float(vdc["max. y"]))

        # attribute join (Detect_AVL_ADC)
        self.fields = [("id", "real")]
        self._avl_rows: list[list] = []
        adc = _read_vdc(base + ".adc")
        avl_path = base + ".avl"
        if adc.get("file format", "").startswith("IDRISI Values") and \
                os.path.exists(avl_path):
            names, types = [], []
            i = 0
            # the ADC lists "field N"/"data type" pairs in order
            lines = open(base + ".adc", "rb").read().decode(
                "latin-1", "replace"
            ).splitlines()
            cur = None
            for line in lines:
                if ":" not in line:
                    continue
                k, v = [s.strip() for s in line.split(":", 1)]
                if k.lower().startswith("field "):
                    cur = v
                elif k.lower() == "data type" and cur is not None:
                    names.append(cur)
                    types.append(v.lower())
                    cur = None
            # field 0 is the feature id, replaced by the geometry id
            self._avl_fields = list(zip(names, types))
            if len(names) > 1:
                self.fields = [("id", "real")] + [
                    (n, t) for n, t in zip(names[1:], types[1:])
                ]
            for line in open(avl_path, "rb").read().decode(
                "latin-1", "replace"
            ).splitlines():
                if not line.strip():
                    continue
                vals = line.split("\t")
                row = []
                for (name, t), v in zip(self._avl_fields, vals):
                    v = v.strip()
                    if t == "integer":
                        row.append(int(v) if v else None)
                    elif t == "real":
                        row.append(float(v) if v else None)
                    else:
                        row.append(v)
                self._avl_rows.append(row)

        # parse features
        self.features = []
        pos = _DATA_START
        for fid in range(self.n_features):
            if self.geom_type == "POINT":
                if pos + 24 > len(data):
                    break
                fid_val, x, y = struct.unpack("<3d", data[pos : pos + 24])
                pos += 24
                self.features.append({"id": fid_val, "xy": [(x, y)]})
            elif self.geom_type == "LINESTRING":
                if pos + 44 > len(data):
                    break
                fid_val, x0, x1, y0, y1 = struct.unpack(
                    "<5d", data[pos : pos + 40]
                )
                n_nodes = struct.unpack("<I", data[pos + 40 : pos + 44])[0]
                pos += 44
                pts = np.frombuffer(data, "<f8", 2 * n_nodes, pos).reshape(
                    n_nodes, 2
                )
                pos += 16 * n_nodes
                self.features.append({
                    "id": fid_val, "bbox": (x0, x1, y0, y1),
                    "xy": [tuple(p) for p in pts],
                })
            else:  # POLYGON
                if pos + 48 > len(data):
                    break
                fid_val, x0, x1, y0, y1 = struct.unpack(
                    "<5d", data[pos : pos + 40]
                )
                n_parts, n_total = struct.unpack(
                    "<II", data[pos + 40 : pos + 48]
                )
                pos += 48
                # the per-part node-count array is present even for
                # single-part polygons (validated == nTotalNodes)
                counts = list(struct.unpack(
                    f"<{n_parts}I", data[pos : pos + 4 * n_parts]
                ))
                pos += 4 * n_parts
                if n_parts == 1 and counts[0] != n_total:
                    raise ValueError("corrupt Idrisi polygon record")
                pts = np.frombuffer(data, "<f8", 2 * n_total, pos).reshape(
                    n_total, 2
                )
                pos += 16 * n_total
                rings = []
                k = 0
                for c in counts:
                    rings.append([tuple(p) for p in pts[k : k + c]])
                    k += c
                self.features.append({
                    "id": fid_val, "bbox": (x0, x1, y0, y1), "rings": rings,
                })

    def wkt(self, i: int) -> str:
        f = self.features[i]
        if self.geom_type == "POINT":
            x, y = f["xy"][0]
            return f"POINT ({_fmt(x)} {_fmt(y)})"
        if self.geom_type == "LINESTRING":
            pts = ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in f["xy"])
            return f"LINESTRING ({pts})"
        rings = ",".join(
            "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"
            for ring in f["rings"]
        )
        return f"POLYGON ({rings})"

    def field_record(self, i: int) -> dict:
        """id + joined AVL values (one AVL line per feature in order)."""
        f = self.features[i]
        out = {"id": f["id"]}
        if i < len(self._avl_rows):
            row = self._avl_rows[i]
            for (name, _), v in list(zip(self._avl_fields, row))[1:]:
                out[name] = v
        return out

    def spatial_filter(self, minx, miny, maxx, maxy) -> list[int]:
        """Envelope filter over the per-feature bbox (points: the
        coordinate itself) — the reference's SetSpatialFilterRect."""
        out = []
        for i, f in enumerate(self.features):
            if self.geom_type == "POINT":
                x, y = f["xy"][0]
                if minx <= x <= maxx and miny <= y <= maxy:
                    out.append(i)
            else:
                x0, x1, y0, y1 = f["bbox"]
                if not (x1 < minx or x0 > maxx or y1 < miny or y0 > maxy):
                    out.append(i)
        return out


def idrisi_vector_open(path: str) -> IdrisiVectorLayer:
    return IdrisiVectorLayer(path)
