"""OGR GMT ASCII vector driver (ogr/ogrsf_frmts/gmt/).

Reference semantics (re-derived):
  - header comments: "# @VGMT1.0 @G<GEOMTYPE>", "# @R<xmin/xmax/ymin/ymax>"
    region, "# @N" |-separated field names, "# @T" |-separated types
    (string/integer/double/datetime), "# FEATURE_DATA"
  - ">" lines separate geometry segments; "# @D" carries the feature's
    field values (a ">" followed by "@D" starts a NEW feature, a bare
    ">" continues the current multi-geometry)
  - "# @P" / "# @H" mark polygon outer rings and holes
  - a file of bare coordinate lines (no header) is a point-per-line
    layer; a third column is Z
  - coordinates are space or tab separated (GMT_USE_TAB)
"""

from __future__ import annotations

__all__ = ["gmt_features", "gmt_write", "read_gmt"]


def _fmt(v: float) -> str:
    return "%.12g" % v


def _coords(pts) -> str:
    return ",".join(" ".join(_fmt(c) for c in p) for p in pts)


def _split_d(line: str) -> list[str | None]:
    out: list[str | None] = []
    cur: list[str] = []
    in_q = False
    for ch in line:
        if ch == '"':
            in_q = not in_q
        elif ch == "|" and not in_q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [v if v != "" else None for v in out]


def _geom_wkt(gtype: str, parts: list[dict]) -> str | None:
    segs = [p["pts"] for p in parts if p["pts"]]
    if not segs:
        return None
    if gtype in ("POINT", ""):
        p = segs[0][0]
        tag = "POINT Z " if len(p) > 2 else "POINT "
        return tag + "(%s)" % " ".join(_fmt(c) for c in p)
    if gtype == "MULTIPOINT":
        pts = [p for s in segs for p in s]
        return "MULTIPOINT (%s)" % _coords(pts)
    if gtype == "LINESTRING":
        return "LINESTRING (%s)" % _coords(segs[0])
    if gtype == "MULTILINESTRING":
        return "MULTILINESTRING (%s)" % ",".join(
            "(%s)" % _coords(s) for s in segs)
    if gtype == "POLYGON":
        return "POLYGON (%s)" % ",".join("(%s)" % _coords(s) for s in segs)
    if gtype == "MULTIPOLYGON":
        polys: list[list] = []
        for p in parts:
            if not p["pts"]:
                continue
            if p["marker"] == "H" and polys:
                polys[-1].append(p["pts"])
            else:
                polys.append([p["pts"]])
        return "MULTIPOLYGON (%s)" % ",".join(
            "(%s)" % ",".join("(%s)" % _coords(r) for r in rings)
            for rings in polys)
    return None


def _cast(v: str | None, t: str):
    if v is None:
        return None
    v = v.strip()
    if t == "integer":
        try:
            return int(v)
        except ValueError:
            return None
    if t == "double":
        try:
            return float(v)
        except ValueError:
            return None
    return v


def gmt_features(data: bytes | str) -> tuple[list[dict], dict]:
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) \
        else data
    gtype = ""
    names: list[str] = []
    types: list[str] = []
    region = None

    feats: list[dict] = []
    cur_fields: list | None = None
    cur_parts: list[dict] = []
    pending_marker = ""
    saw_segments = False

    def flush():
        nonlocal cur_parts, cur_fields
        wkt = _geom_wkt(gtype, cur_parts)
        if wkt is not None or cur_fields is not None:
            feat = {"wkt": wkt}
            for i, n in enumerate(names):
                v = cur_fields[i] if cur_fields and i < len(cur_fields) \
                    else None
                feat[n] = _cast(v, types[i] if i < len(types) else "string")
            feats.append(feat)
        cur_parts = []
        cur_fields = None

    for raw in text.splitlines():
        line = raw.rstrip()
        if not line.strip():
            continue
        if line.startswith("#"):
            body = line[1:].strip()
            if body.startswith("@V"):
                for tok in body.split():
                    if tok.startswith("@G"):
                        gtype = tok[2:].strip()
            elif body.startswith("@G"):
                gtype = body[2:].strip()
            elif body.startswith("@R"):
                region = [float(x) for x in body[2:].split("/")]
            elif body.startswith("@N"):
                names = body[2:].split("|")
            elif body.startswith("@T"):
                types = [t.strip() for t in body[2:].split("|")]
            elif body.startswith("@D"):
                if cur_fields is not None or \
                        any(p["pts"] for p in cur_parts):
                    flush()
                    cur_parts = [{"marker": pending_marker, "pts": []}]
                cur_fields = _split_d(body[2:])
            elif body.startswith("@P"):
                pending_marker = "P"
                if cur_parts:
                    cur_parts[-1]["marker"] = "P"
            elif body.startswith("@H"):
                pending_marker = "H"
                if cur_parts:
                    cur_parts[-1]["marker"] = "H"
            continue
        if line.startswith(">"):
            saw_segments = True
            cur_parts.append({"marker": "", "pts": []})
            pending_marker = ""
            continue
        vals = [float(t) for t in line.replace("\t", " ").split()]
        if len(vals) < 2:
            continue
        if not saw_segments and not gtype:
            # headerless coordinate-per-line file: one point per line
            feats.append({"wkt": ("POINT Z (%s)" if len(vals) > 2
                                  else "POINT (%s)")
                          % " ".join(_fmt(c) for c in vals[:3])})
            continue
        if not cur_parts:
            cur_parts.append({"marker": pending_marker, "pts": []})
        cur_parts[-1]["pts"].append(tuple(vals))
    if cur_parts or cur_fields is not None:
        flush()
    info = {"geom_type": gtype or "POINT", "fields": names,
            "types": types, "region": region}
    return feats, info


def gmt_write(feats: list[dict], geom_type: str, names: list[str],
              types: list[str], use_tab: bool = False) -> str:
    """Writer mirroring ogrgmtlayer.cpp's layout: header, FEATURE_DATA,
    then per feature '>' + '# @D' + '@P'/'@H'-marked coordinate runs."""
    sep = "\t" if use_tab else " "
    xs: list[float] = []
    ys: list[float] = []

    def rings_of(wkt: str) -> list[list[tuple]]:
        depth = 0
        rings = []
        cur: list[str] = []
        for ch in wkt[wkt.index("("):]:
            if ch == "(":
                depth += 1
                cur = []
            elif ch == ")":
                if cur:
                    pts = []
                    for pair in "".join(cur).split(","):
                        vals = [float(t) for t in pair.split()]
                        if len(vals) >= 2:
                            pts.append(tuple(vals))
                            xs.append(vals[0])
                            ys.append(vals[1])
                    rings.append(pts)
                cur = []
                depth -= 1
            elif depth >= 1:
                cur.append(ch)
        return rings

    body_lines: list[str] = []
    for f in feats:
        wkt = f.get("wkt") or ""
        body_lines.append(">")
        vals = []
        for i, n in enumerate(names):
            v = f.get(n)
            t = types[i] if i < len(types) else "string"
            if v is None:
                vals.append("")
            elif t in ("integer", "double"):
                vals.append(str(v))
            else:
                vals.append('"%s"' % v)
        if names:
            body_lines.append("# @D" + "|".join(vals))
        is_poly = "POLYGON" in wkt
        # group multipolygon rings per polygon to emit @P/@H correctly
        if wkt.startswith("MULTIPOLYGON"):
            poly_rings: list[list[list[tuple]]] = []
            inner = wkt[wkt.index("(") + 1:wkt.rindex(")")]
            for chunk in inner.split(")),(("):
                poly_rings.append(rings_of("((" + chunk.strip("()") + "))"))
            first = True
            for rings in poly_rings:
                for ri, ring in enumerate(rings):
                    if not first:
                        body_lines.append(">")
                    first = False
                    body_lines.append("# @P" if ri == 0 else "# @H")
                    for p in ring:
                        body_lines.append(sep.join(_fmt(c) for c in p))
        else:
            for ri, ring in enumerate(rings_of(wkt)):
                if ri > 0:
                    body_lines.append(">")
                if is_poly:
                    body_lines.append("# @P" if ri == 0 else "# @H")
                for p in ring:
                    body_lines.append(sep.join(_fmt(c) for c in p))
    region = ""
    if xs:
        region = "# @R%s/%s/%s/%s\n" % (_fmt(min(xs)), _fmt(max(xs)),
                                        _fmt(min(ys)), _fmt(max(ys)))
    head = "# @VGMT1.0 @G%s\n%s" % (geom_type, region)
    if names:
        head += "# @N" + "|".join(names) + "\n"
        head += "# @T" + "|".join(types[i] if i < len(types) else "string"
                                  for i in range(len(names))) + "\n"
    head += "# FEATURE_DATA\n"
    return head + "\n".join(body_lines) + "\n"


def read_gmt(spark, path: str):
    with open(path, "rb") as fh:
        feats, info = gmt_features(fh.read())
    rows = [(f.get("wkt"),
             {k: str(v) for k, v in f.items()
              if k != "wkt" and v is not None}) for f in feats]
    return spark.createDataFrame(
        rows, "wkt string, fields map<string,string>")
