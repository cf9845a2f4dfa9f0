"""Curved-geometry WKB (ISO types 8-12) + linearization.

Re-derivation of the reference's curve stroking semantics
(ogr/ogrgeometryfactory.cpp: GetCurveParameters ~:4980,
curveToLineString :6071, OGRGeometryFactoryStrokeArc :5985;
ogr/ogr_geometry.h CircularString/CompoundCurve/CurvePolygon types):

* CircularString arcs are defined by consecutive point triples; each
  arc is stroked alpha0 -> alpha2 through the circumcircle with a
  constant angular step.
* Step count: ``int(|sweep| / step + 0.5)``, then raised to at least 7
  and rounded up to an odd count (the reference reserves low bits of
  >=7 intermediate vertices to "hide" the intermediate-point angle;
  the VERTEX COUNT rule is reproduced so point positions match, the
  low-bit steganography is not).
* Start/end points are emitted exactly; arcs whose start sorts after
  their end (x, then y) are stroked reversed and flipped back so both
  directions produce symmetrical points.
* p0 == p2 defines a full circle, stroked counter-clockwise from p0
  through the point opposite p0 (PostGIS convention).
* Collinear triples degrade to the straight polyline p0-p1-p2.
* Z is interpolated linearly in angle.

Default max angle step: 4 degrees (OGR_ARC_STEPSIZE default).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from gdal_spark.functions import wkb as W

WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12

_CURVED = {WKB_CIRCULARSTRING, WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON,
           WKB_MULTICURVE, WKB_MULTISURFACE}

DEFAULT_STEP_DEG = 4.0


# --------------------------------------------------------------------------
# arc math
# --------------------------------------------------------------------------


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """(ok, R, cx, cy, alpha0, alpha1, alpha2) with alphas monotonic in
    the arc's winding direction; ok=False for degenerate/collinear."""
    if x0 == x2 and y0 == y2:
        if x0 == x1 and y0 == y1:
            return (False, 0, 0, 0, 0, 0, 0)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        r = math.hypot(x0 - cx, y0 - cy)
        a0 = math.atan2(y0 - cy, x0 - cx)
        return (True, r, cx, cy, a0, a0 + math.pi, a0 + 2 * math.pi)
    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    if scale == 0 or not math.isfinite(scale):
        return (False, 0, 0, 0, 0, 0, 0)
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1e-8 or not math.isfinite(det):
        return (False, 0, 0, 0, 0, 0, 0)
    c01 = dx01 * (x0 + x1) * inv + dy01 * (y0 + y1) * inv
    c12 = dx12 * (x1 + x2) * inv + dy12 * (y1 + y2) * inv
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    r = math.hypot(x0 - cx, y0 - cy)
    if det < 0:  # clockwise
        if a1 > a0:
            a1 -= 2 * math.pi
        if a2 > a1:
            a2 -= 2 * math.pi
    else:
        if a1 < a0:
            a1 += 2 * math.pi
        if a2 < a1:
            a2 += 2 * math.pi
    return (True, r, cx, cy, a0, a1, a2)


def stroke_step_count(sweep_rad: float, step_deg: float) -> int:
    """The reference's stealth-constrained segment count."""
    step = max(abs(step_deg), 0.01) * math.pi / 180.0
    n = int(abs(sweep_rad) / step + 0.5)
    if n < 7:
        return 7
    return 7 + 2 * ((n - 7 + 1) // 2)


def curve_to_points(p0, p1, p2, step_deg: float = DEFAULT_STEP_DEG):
    """One arc triple -> (N, 2|3) vertex array (endpoints exact)."""
    p0 = tuple(map(float, p0))
    p1 = tuple(map(float, p1))
    p2 = tuple(map(float, p2))
    has_z = len(p0) >= 3
    if p0[0] < p2[0] or (p0[0] == p2[0] and p0[1] < p2[1]):
        return curve_to_points(p2, p1, p0, step_deg)[::-1]
    ok, r, cx, cy, a0, a1, a2 = get_curve_parameters(
        p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
    if not ok:
        pts = [p0, p1, p2]
        return np.array(pts, np.float64)
    nsteps = stroke_step_count(a2 - a0, step_deg)
    dstep = (a2 - a0) / nsteps
    alphas = a0 + dstep * np.arange(1, nsteps)
    xs = cx + r * np.cos(alphas)
    ys = cy + r * np.sin(alphas)
    if has_z:
        z0, z2 = p0[2], p2[2]
        zs = z0 + (z2 - z0) * (alphas - a0) / (a2 - a0)
        mid = np.column_stack([xs, ys, zs])
        return np.vstack([[p0], mid, [p2]])
    mid = np.column_stack([xs, ys])
    return np.vstack([[p0[:2]], mid, [p2[:2]]])


def circularstring_points(coords, step_deg: float = DEFAULT_STEP_DEG):
    """Full CircularString (2k+1 control points) -> linear vertices."""
    coords = np.asarray(coords, np.float64)
    if len(coords) == 0:
        return coords
    if len(coords) == 1 or (len(coords) - 1) % 2 != 0:
        raise ValueError("CircularString needs an odd point count >= 3")
    out = [coords[:1]]
    for i in range(0, len(coords) - 1, 2):
        seg = curve_to_points(coords[i], coords[i + 1], coords[i + 2],
                              step_deg)
        out.append(seg[1:])
    return np.vstack(out)


# --------------------------------------------------------------------------
# WKB reading / linearization
# --------------------------------------------------------------------------


def _hdr(buf: bytes, pos: int):
    order, gtype = struct.unpack_from("<BI", buf, pos)
    if order != 1:
        raise ValueError("big-endian WKB not supported")
    if gtype >= 3000:
        raise ValueError(f"unsupported WKB dimensionality {gtype}")
    base = gtype % 1000 if gtype >= 1000 else gtype & 0xFF
    ndim = 3 if 1000 <= gtype < 2000 else 2
    return base, ndim, pos + 5


def _read_pointseq(buf, pos, ndim):
    (npts,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    arr = np.frombuffer(buf, "<f8", npts * ndim, pos).reshape(npts, ndim)
    return np.asarray(arr, np.float64), pos + npts * ndim * 8


def has_curve_geometry(buf: bytes) -> bool:
    """True if any component is a curved ISO type (8-12)."""
    buf = bytes(buf)

    def scan(pos) -> tuple[bool, int]:
        base, ndim, pos = _hdr(buf, pos)
        if base in _CURVED:
            return True, pos
        if base == W.WKB_POINT:
            return False, pos + ndim * 8
        if base == W.WKB_LINESTRING:
            _, pos = _read_pointseq(buf, pos, ndim)
            return False, pos
        if base == W.WKB_POLYGON:
            (nrings,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            for _ in range(nrings):
                _, pos = _read_pointseq(buf, pos, ndim)
            return False, pos
        if base in (W.WKB_MULTIPOINT, W.WKB_MULTILINESTRING,
                    W.WKB_MULTIPOLYGON, W.WKB_GEOMETRYCOLLECTION):
            (n,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            for _ in range(n):
                curved, pos = scan(pos)
                if curved:
                    return True, pos
            return False, pos
        raise ValueError(f"unsupported WKB geometry type {base}")

    return scan(0)[0]


def _curve_ring_points(buf, pos, step_deg):
    """One CurvePolygon ring component (LineString / CircularString /
    CompoundCurve) -> (vertices, new_pos)."""
    base, ndim, p2 = _hdr(buf, pos)
    if base == W.WKB_LINESTRING:
        pts, p2 = _read_pointseq(buf, p2, ndim)
        return pts, p2
    if base == WKB_CIRCULARSTRING:
        pts, p2 = _read_pointseq(buf, p2, ndim)
        return circularstring_points(pts, step_deg), p2
    if base == WKB_COMPOUNDCURVE:
        (nseg,) = struct.unpack_from("<I", buf, p2)
        p2 += 4
        parts = []
        for i in range(nseg):
            seg, p2 = _curve_ring_points(buf, p2, step_deg)
            parts.append(seg if i == 0 else seg[1:])
        return np.vstack(parts), p2
    raise ValueError(f"invalid curve component type {base}")


def linearize_wkb(buf: bytes, step_deg: float = DEFAULT_STEP_DEG) -> bytes:
    """Curved WKB -> linear WKB (reference: OGRGeometry::getLinear
    Geometry / OGRGeometryFactory::forceTo).  Linear inputs pass
    through unchanged."""
    buf = bytes(buf)
    if not has_curve_geometry(buf):
        return buf

    def one(pos) -> tuple[bytes, int]:
        base, ndim, p2 = _hdr(buf, pos)
        if base == WKB_CIRCULARSTRING:
            pts, p2 = _read_pointseq(buf, p2, ndim)
            lin = circularstring_points(pts, step_deg)
            return (W.write_linestring_z(lin) if ndim == 3
                    else W.write_linestring(lin)), p2
        if base == WKB_COMPOUNDCURVE:
            pts, p2 = _curve_ring_points(buf, pos, step_deg)
            return (W.write_linestring_z(pts) if pts.shape[1] == 3
                    else W.write_linestring(pts)), p2
        if base == WKB_CURVEPOLYGON:
            (nrings,) = struct.unpack_from("<I", buf, p2)
            p2 += 4
            rings = []
            for _ in range(nrings):
                ring, p2 = _curve_ring_points(buf, p2, step_deg)
                rings.append(np.asarray(ring[:, :2], np.float64))
            return W.write_polygon(rings), p2
        if base == WKB_MULTICURVE:
            (n,) = struct.unpack_from("<I", buf, p2)
            p2 += 4
            lines = []
            for _ in range(n):
                child, p2 = one(p2)
                gt, payload = W.parse(child)
                lines.append(np.asarray(payload)[:, :2])
            return W.write_multilinestring(lines), p2
        if base == WKB_MULTISURFACE:
            (n,) = struct.unpack_from("<I", buf, p2)
            p2 += 4
            polys = []
            for _ in range(n):
                child, p2 = one(p2)
                gt, payload = W.parse(child)
                polys.append(payload)
            return W.write_multipolygon(polys), p2
        if base == W.WKB_GEOMETRYCOLLECTION:
            (n,) = struct.unpack_from("<I", buf, p2)
            p2 += 4
            children = []
            for _ in range(n):
                child, p2 = one(p2)
                children.append(child)
            return W.write_collection(children), p2
        # linear child: measure and copy through
        if base == W.WKB_POINT:
            end = p2 + ndim * 8
            return buf[pos:end], end
        if base == W.WKB_LINESTRING:
            _, end = _read_pointseq(buf, p2, ndim)
            return buf[pos:end], end
        if base == W.WKB_POLYGON:
            (nrings,) = struct.unpack_from("<I", buf, p2)
            end = p2 + 4
            for _ in range(nrings):
                _, end = _read_pointseq(buf, end, ndim)
            return buf[pos:end], end
        if base in (W.WKB_MULTIPOINT, W.WKB_MULTILINESTRING,
                    W.WKB_MULTIPOLYGON):
            (n,) = struct.unpack_from("<I", buf, p2)
            end = p2 + 4
            for _ in range(n):
                end += W._geom_length(buf, end)
            return buf[pos:end], end
        raise ValueError(f"unsupported WKB geometry type {base}")

    out, _ = one(0)
    return out


# --------------------------------------------------------------------------
# curved-WKB writers (tests / fixtures)
# --------------------------------------------------------------------------


def write_circularstring(coords) -> bytes:
    coords = np.asarray(coords, np.float64)
    ndim = coords.shape[1]
    gtype = WKB_CIRCULARSTRING + (1000 if ndim == 3 else 0)
    return (struct.pack("<BII", 1, gtype, len(coords))
            + coords.astype("<f8").tobytes())


def write_compoundcurve(segments: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_COMPOUNDCURVE, len(segments))
            + b"".join(segments))


def write_curvepolygon(rings: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_CURVEPOLYGON, len(rings))
            + b"".join(rings))


def write_multicurve(curves: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_MULTICURVE, len(curves))
            + b"".join(curves))


def write_multisurface(surfaces: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_MULTISURFACE, len(surfaces))
            + b"".join(surfaces))
