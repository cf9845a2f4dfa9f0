"""DXF entity reader — ogr/ogrsf_frmts/dxf (ogrdxflayer.cpp), the
ENTITIES-section subset over this engine's geometry model:

  * group-code/value pair stream; one `entities` layer (the reference's
    layer model);
  * POINT, LINE (2.5D kept when any z != 0), LWPOLYLINE (90-count,
    70 bit-1 closed, bulge arcs via the tan(theta/4) construction),
    POLYLINE/VERTEX/SEQEND, SOLID (the reference's 1-2-4-3-1 corner
    join, :2681), TEXT/MTEXT as the anchor POINT with the Text field;
  * CIRCLE / ARC / ELLIPSE tessellated with the EXACT
    OGRGeometryFactory::approximateArcAngles math (:4800-4910):
    4-degree default step (OGR_ARC_STEPSIZE), direction switch
    (angles * -1), ceil(span/step)+1 vertices, rotation =
    -atan2(axisY, axisX), ratio * primary = secondary radius;
  * entity fields: Layer (8), SubClasses (100s joined ':'),
    Linetype (6), EntityHandle (5), Text (1), PaperSpace (67);
  * SPLINE via an exact transcription of the intronurbs.cpp rational
    B-spline kernel (knot/basis/rbasis/rbspline2, p1 = nctrl*8 points,
    the 5e-6 final-knot guard, the #1969 negative-knot snap);
  * unsupported entities (HATCH/DIMENSION/...) still emit a feature
    with their fields and a None geometry so feature counts match the
    reference (documented deviation: no spline/ATTRIB tessellation).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _fmt(v: float) -> str:
    return repr(int(v)) if float(v).is_integer() else repr(float(v))


def _wkt(kind: str, pts, closed=False, want_z=False) -> str:
    def p(pt):
        s = f"{_fmt(pt[0])} {_fmt(pt[1])}"
        if want_z:
            s += f" {_fmt(pt[2] if len(pt) > 2 else 0.0)}"
        return s

    if kind == "POINT":
        return f"POINT ({p(pts[0])})"
    if kind == "LINESTRING":
        return "LINESTRING (" + ",".join(p(q) for q in pts) + ")"
    if kind == "POLYGON":
        ring = list(pts)
        if ring[0][:2] != ring[-1][:2]:
            ring.append(ring[0])
        return "POLYGON ((" + ",".join(p(q) for q in ring) + "))"
    raise ValueError(kind)


def approximate_arc_angles(
    cx, cy, z, primary_r, secondary_r, rotation_deg,
    start_deg, end_deg, step_deg=4.0,
):
    """Exact transcription of approximateArcAngles (2D + constant z)."""
    rot = rotation_deg * math.pi / 180.0
    full_circle = abs(end_deg - start_deg) == 360.0
    start, end = -start_deg, -end_deg
    n = max(2, int(math.ceil(abs(end - start) / step_deg) + 1))
    dslice = (end - start) / (n - 1)
    if full_circle:
        n -= 1
    pts = []
    for i in range(n):
        a = (start + i * dslice) * math.pi / 180.0
        ex = math.cos(a) * primary_r
        ey = math.sin(a) * secondary_r
        x = cx + ex * math.cos(rot) + ey * math.sin(rot)
        y = cy - ex * math.sin(rot) + ey * math.cos(rot)
        pts.append((x, y, z))
    if full_circle:
        pts.append(pts[0])
    return pts


def _pairs(text: str):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        try:
            yield int(lines[i].strip()), lines[i + 1].strip()
        except ValueError:
            continue


def _bulge_arc(p1, p2, bulge):
    """Insert the bulge arc between p1 and p2 (bulge = tan(theta/4))."""
    theta = 4.0 * math.atan(bulge)
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    chord = math.hypot(dx, dy)
    if chord == 0 or theta == 0:
        return []
    r = chord / (2.0 * math.sin(abs(theta) / 2.0))
    # center: perpendicular from the chord midpoint
    mx, my = (p1[0] + p2[0]) / 2.0, (p1[1] + p2[1]) / 2.0
    h = math.sqrt(max(r * r - (chord / 2.0) ** 2, 0.0))
    sign = 1.0 if theta > 0 else -1.0
    cx = mx - sign * h * dy / chord
    cy = my + sign * h * dx / chord
    a1 = math.atan2(p1[1] - cy, p1[0] - cx)
    a2 = a1 + theta
    n = max(2, int(math.ceil(abs(math.degrees(theta)) / 4.0) + 1))
    return [
        (
            cx + r * math.cos(a1 + (a2 - a1) * i / (n - 1)),
            cy + r * math.sin(a1 + (a2 - a1) * i / (n - 1)),
        )
        for i in range(1, n - 1)
    ]


def _knot_open(n: int, c: int) -> list[float]:
    """Open uniform knot vector with end multiplicity = order
    (intronurbs.cpp knot(), 1-indexed like the reference)."""
    x = [0.0] * (n + c + 1)
    for i in range(2, n + c + 1):
        x[i] = x[i - 1] + (1.0 if c < i < n + 2 else 0.0)
    return x


def _basis(c: int, t: float, npts: int, x: list[float]) -> list[float]:
    """Cox-de-Boor nonrational basis (intronurbs.cpp basis(), including
    the t==x[nplusc] last-point pickup)."""
    nplusc = npts + c
    N = [0.0] * (nplusc + 1)
    for i in range(1, nplusc):
        N[i] = 1.0 if x[i] <= t < x[i + 1] else 0.0
    for k in range(2, c + 1):
        for i in range(1, nplusc - k + 1):
            d = e = 0.0
            if N[i] != 0.0:
                den = x[i + k - 1] - x[i]
                if den != 0.0:
                    d = (t - x[i]) * N[i] / den
            if N[i + 1] != 0.0:
                den = x[i + k] - x[i + 1]
                if den != 0.0:
                    e = (x[i + k] - t) * N[i + 1] / den
            N[i] = d + e
    if t == x[nplusc]:
        N[npts] = 1.0
    return N


def rbspline2(npts, k, p1, b, h, calc_knots, knots):
    """Rational B-spline curve points — exact transcription of
    intronurbs.cpp rbspline2 (Rogers' NURBS code as adapted by the
    reference): 1-indexed b (x,y,z triplets), h weights, knots; p1
    output points with the 5e-6 final-knot undershoot guard."""
    nplusc = npts + k
    if calc_knots:
        knots[:] = _knot_open(npts, k)
    t = knots[1]
    step = (knots[nplusc] - knots[1]) / (p1 - 1)
    eps = 5e-6 * (knots[nplusc] - knots[1])
    out = []
    for _ in range(p1):
        if knots[nplusc] - t < eps:
            t = knots[nplusc]
        nb = _basis(k, t, npts, knots)
        s = sum(nb[i] * h[i] for i in range(1, npts + 1))
        r = [0.0] * (npts + 1)
        if s != 0.0:
            for i in range(1, npts + 1):
                r[i] = nb[i] * h[i] / s
        pt = [0.0, 0.0, 0.0]
        for j in range(3):
            pt[j] = sum(r[i] * b[(i - 1) * 3 + j + 1] for i in range(1, npts + 1))
        out.append(tuple(pt))
        t += step
    return out


def _spline_points(codes: dict[int, list[str]]):
    """TranslateSPLINE + InsertSplineWithChecks (:2156-2292): group-code
    collection, the -1e-10 knot snap (#1969), count validation, default
    knots/weights, p1 = nctrl * 8 interpolation."""
    xs = [float(v) for v in codes.get(10, [])]
    ys = [float(v) for v in codes.get(20, [])]
    zs = [float(v) for v in codes.get(30, [])]
    has_z = 30 in codes and any(z != 0.0 for z in zs)
    nctrl_read = len(xs)
    if nctrl_read == 0 or len(ys) != nctrl_read:
        return None, False
    if len(zs) != nctrl_read:
        zs = [0.0] * nctrl_read
    degree = int(codes.get(71, ["-1"])[0])
    order = degree + 1
    if order < 2:
        return None, False
    nctrl = int(codes.get(73, [str(nctrl_read)])[0])
    if nctrl == -1:
        nctrl = nctrl_read
    if nctrl < order or nctrl != nctrl_read:
        return None, False
    knots = [0.0 if -1e-10 < float(v) < 0 else float(v)
             for v in codes.get(40, [])]
    calc_knots = len(knots) == 0
    if calc_knots:
        knots = [0.0] * (nctrl + order)
    nknots = int(codes.get(72, [str(len(knots))])[0])
    if nknots == -1:
        nknots = len(knots)
    if nknots != nctrl + order or nknots != len(knots):
        return None, False
    weights = [float(v) for v in codes.get(41, [])]
    if not weights:
        weights = [1.0] * nctrl
    if len(weights) != nctrl:
        return None, False
    b = [0.0] + [c for xyz in zip(xs, ys, zs) for c in xyz]
    h = [0.0] + weights
    kn = [0.0] + knots
    return rbspline2(nctrl, order, nctrl * 8, b, h, calc_knots, kn), has_z


_FIELD_CODES = {8: "Layer", 6: "Linetype", 5: "EntityHandle", 1: "Text",
                67: "PaperSpace"}


def parse_dxf(text: str) -> list[dict]:
    """-> [{wkt, Layer, SubClasses, ...}] from the ENTITIES section."""
    stream = list(_pairs(text))
    # locate ENTITIES section
    feats: list[dict] = []
    i = 0
    in_entities = False
    cur: dict | None = None
    codes: dict[int, list[str]] = {}

    def flush():
        nonlocal cur, codes
        if cur is None:
            return
        ent = cur["_entity"]
        g = lambda c, d=None: codes.get(c, [d])[0]  # noqa: E731
        gf = lambda c, d=0.0: float(g(c, d) or d)  # noqa: E731
        fields = {
            name: g(code)
            for code, name in _FIELD_CODES.items()
            if code in codes
        }
        if 100 in codes:
            fields["SubClasses"] = ":".join(codes[100])
        wkt = None
        try:
            if ent == "POINT":
                wkt = _wkt("POINT", [(gf(10), gf(20), gf(30))],
                           want_z=gf(30) != 0.0)
            elif ent == "LINE":
                want_z = gf(30) != 0.0 or gf(31) != 0.0
                wkt = _wkt(
                    "LINESTRING",
                    [(gf(10), gf(20), gf(30)), (gf(11), gf(21), gf(31))],
                    want_z=want_z,
                )
            elif ent in ("TEXT", "MTEXT"):
                wkt = _wkt("POINT", [(gf(10), gf(20), gf(30))],
                           want_z=gf(30) != 0.0)
            elif ent == "SOLID":
                c = [
                    (gf(10), gf(20)), (gf(11), gf(21)),
                    (gf(12), gf(22)), (gf(13), gf(23)),
                ]
                wkt = _wkt("POLYGON", [c[0], c[1], c[3], c[2]])
            elif ent == "LWPOLYLINE":
                xs, ys = codes.get(10, []), codes.get(20, [])
                bulges = codes.get(42, [])
                closed = int(g(70, "0") or 0) & 1
                pts = [(float(x), float(y)) for x, y in zip(xs, ys)]
                out = []
                for j, pt in enumerate(pts):
                    out.append(pt)
                    nxt = pts[(j + 1) % len(pts)]
                    last = j == len(pts) - 1 and not closed
                    if j < len(bulges) and not last:
                        b = float(bulges[j])
                        if b:
                            out.extend(_bulge_arc(pt, nxt, b))
                if closed:
                    out.append(pts[0])
                wkt = _wkt("LINESTRING", out)
            elif ent == "CIRCLE":
                pts = approximate_arc_angles(
                    gf(10), gf(20), gf(30), gf(40), gf(40), 0.0, 0.0, 360.0
                )
                wkt = _wkt("LINESTRING", pts, want_z=gf(30) != 0.0)
            elif ent == "ARC":
                s, e = -gf(51), -gf(50)  # :2087-2092 sign switch
                if s > e:
                    e += 360.0
                pts = approximate_arc_angles(
                    gf(10), gf(20), gf(30), gf(40), gf(40), 0.0, s, e
                )
                wkt = _wkt("LINESTRING", pts, want_z=gf(30) != 0.0)
            elif ent == "ELLIPSE":
                ax, ay, az = gf(11), gf(21), gf(31)
                prim = math.sqrt(ax * ax + ay * ay + az * az)
                sec = gf(40) * prim
                rot = -math.atan2(ay, ax) * 180.0 / math.pi
                e = -gf(41) * 180.0 / math.pi
                s = -gf(42) * 180.0 / math.pi
                if 41 not in codes:
                    s, e = 0.0, 360.0
                if s > e:
                    e += 360.0
                pts = approximate_arc_angles(
                    gf(10), gf(20), gf(30), prim, sec, rot, s, e
                )
                wkt = _wkt("LINESTRING", pts, want_z=gf(30) != 0.0)
            elif ent == "SPLINE":
                pts, has_z = _spline_points(codes)
                if pts is not None:
                    wkt = _wkt("LINESTRING", pts, want_z=has_z)
            elif ent == "POLYLINE":
                vs = cur.get("_vertices", [])
                closed = int(g(70, "0") or 0) & 1
                pts = list(vs)
                if closed and pts:
                    pts.append(pts[0])
                if len(pts) >= 2:
                    wkt = _wkt(
                        "LINESTRING", pts,
                        want_z=any(len(p) > 2 and p[2] != 0 for p in pts),
                    )
        except (ValueError, IndexError, ZeroDivisionError):
            wkt = None
        fields.setdefault("Layer", "0")
        fields.setdefault("Linetype", "ByLayer")
        if ent == "INSERT":
            # inlined-blocks mode: emit the block's features transformed
            # by the insertion point / scales / rotation
            name = g(2)
            ix, iy = gf(10), gf(20)
            sx, sy = gf(41, 1.0) or 1.0, gf(42, 1.0) or 1.0
            rot = math.radians(gf(50))
            cr, sr = math.cos(rot), math.sin(rot)

            def tfm(x, y):
                x, y = x * sx, y * sy
                return (x * cr - y * sr + ix, x * sr + y * cr + iy)

            for bf in blocks.get(name, []):
                out = dict(bf)
                if bf["wkt"] is not None:
                    out["wkt"] = _transform_wkt(bf["wkt"], tfm)
                target.append(out)
        else:
            target.append({"wkt": wkt, "Entity": ent, **fields})
        cur, codes = None, {}

    blocks: dict[str, list[dict]] = {}
    section = None
    block_name = None
    target = feats
    while i < len(stream):
        code, val = stream[i]
        i += 1
        if code == 0 and val == "SECTION":
            if i < len(stream) and stream[i][0] == 2:
                section = stream[i][1]
            continue
        if section == "BLOCKS":
            if code == 0 and val == "BLOCK":
                flush()
                block_name = None
                cur = None
                codes = {}
                target = []
                continue
            if code == 2 and block_name is None and cur is None:
                block_name = val
                blocks[val] = target
                continue
            if code == 0 and val == "ENDBLK":
                flush()
                target = feats
                block_name = None
                continue
            if code == 0 and val == "ENDSEC":
                flush()
                target = feats
                section = None
                continue
        elif section != "ENTITIES":
            continue
        if code == 0:
            if val == "ENDSEC":
                flush()
                section = None
            elif val == "VERTEX" and cur and cur["_entity"] == "POLYLINE":
                cur.setdefault("_vertices", []).append(None)  # placeholder
            elif val == "SEQEND" and cur and cur["_entity"] == "POLYLINE":
                pass  # flushed on next entity/endsec
            else:
                flush()
                cur = {"_entity": val}
                codes = {}
        elif cur is not None:
            if cur["_entity"] == "POLYLINE" and "_vertices" in cur and code in (10, 20, 30):
                vs = cur["_vertices"]
                if vs and vs[-1] is None:
                    vs[-1] = [0.0, 0.0, 0.0]
                if vs and isinstance(vs[-1], list):
                    vs[-1][{10: 0, 20: 1, 30: 2}[code]] = float(val)
                    if code == 30:
                        vs[-1] = tuple(vs[-1])
                continue
            codes.setdefault(code, []).append(val)
    flush()
    return feats


def _transform_wkt(wkt: str, fn) -> str:
    """Apply (x, y) -> (x', y') to every coordinate pair in a WKT
    string (z passes through)."""
    import re as _re

    def rep(m):
        parts = m.group(0).split()
        x, y = fn(float(parts[0]), float(parts[1]))
        out = f"{_fmt(x)} {_fmt(y)}"
        if len(parts) > 2:
            out += " " + parts[2]
        return out

    return _re.sub(
        r"-?[\d.]+(?:[eE][-+]?\d+)? -?[\d.]+(?:[eE][-+]?\d+)?"
        r"(?: -?[\d.]+(?:[eE][-+]?\d+)?)?",
        rep,
        wkt,
    )


def read_dxf(spark, files: list[str]):
    """DXF files -> (path, fid, entity, wkt, fields) DataFrame."""
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("fid", T.LongType()),
            T.StructField("entity", T.StringType()),
            T.StructField("wkt", T.StringType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path: string")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                with open(r.path, encoding="latin-1") as fh:
                    feats = parse_dxf(fh.read())
                for i, f in enumerate(feats):
                    rows.append(
                        (
                            r.path, i, f["Entity"], f["wkt"],
                            {
                                k: str(v)
                                for k, v in f.items()
                                if k not in ("Entity", "wkt") and v is not None
                            },
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return fdf.mapInPandas(run, sch)
