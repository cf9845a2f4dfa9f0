"""WAsP .map driver vs the reference autotest scenarios
(autotest/ogr/ogr_wasp.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.sources.wasp import (
    WaspWriter,
    shared_boundary,
    wasp_read,
)

LCC = ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 "
       "+x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356514.999978254 "
       "+pm=2.337229167 +units=m +no_defs")


def _body_pairs(text: str):
    """(header_values, n) per feature from rendered .map text — the
    autotest's read-back loop."""
    lines = text.splitlines()[4:]
    out = []
    i = 0
    while i < len(lines):
        head = lines[i].split()
        vals, n = [float(v) for v in head[:-1]], int(head[-1])
        npts, pts = 0, []
        i += 1
        while npts < n:
            toks = lines[i].split()
            pts.extend(float(t) for t in toks)
            npts += len(toks) // 2
            i += 1
        out.append((vals, n, pts))
    return out


def test_elevation_from_linestring_z():
    """test_ogr_wasp_elevation_from_linestring_z: z carried from the
    geometry, 10 features of 3 points."""
    w = WaspWriter(srs_proj4=LCC)
    for i in range(10):
        w.add_line([(i, 0, i), (i, 0.5, i), (i, 1, i)])
    text = w.render()
    assert text.splitlines()[0] == LCC
    feats = _body_pairs(text)
    assert len(feats) == 10
    for j, (vals, n, _) in enumerate(feats):
        assert n == 3
        assert vals == [float(j)]


def test_elevation_tolerance_simplifies():
    """WASP_TOLERANCE=.1 drops the collinear midpoint."""
    w = WaspWriter(tolerance=0.1)
    for i in range(10):
        w.add_line([(i, 0, i), (i, 0.5, i), (i, 1, i)])
    feats = _body_pairs(w.render())
    assert all(n == 2 for _, n, _ in feats)
    assert [vals[0] for vals, _, _ in feats] == [float(j) for j in range(10)]


def test_elevation_from_field():
    w = WaspWriter(fields=["elevation"])
    for i in range(10):
        w.add_line([(i, 0), (i, 0.5), (i, 1)], float(i))
    feats = _body_pairs(w.render())
    assert [(vals[0], n) for vals, n, _ in feats] == [
        (float(j), 3) for j in range(10)
    ]


def test_roughness_from_linestring_fields():
    w = WaspWriter(fields=["z_left", "z_right"])
    for i in range(10):
        w.add_line([(i, 0), (i, 0.5), (i, 1)], float(i) - 1, float(i))
    feats = _body_pairs(w.render())
    assert len(feats) == 10
    got = sorted((vals[0], vals[1]) for vals, n, _ in feats)
    assert got == [(float(j) - 1, float(j)) for j in range(10)]
    assert all(n == 3 for _, n, _ in feats)


def _hex_triangles(zs):
    tris = []
    for i in range(6):
        ring = [
            (0.0, 0.0, zs[i]),
            (round(math.cos(i * math.pi / 3), 6),
             round(math.sin(i * math.pi / 3), 6), zs[i]),
            (round(math.cos((i + 1) * math.pi / 3), 6),
             round(math.sin((i + 1) * math.pi / 3), 6), zs[i]),
            (0.0, 0.0, zs[i]),
        ]
        tris.append(ring)
    return tris


def test_roughness_from_polygon_z():
    """test_ogr_wasp_roughness_from_polygon_z: 6 hexagon triangles ->
    exactly the 6 shared radial boundaries."""
    w = WaspWriter()
    for ring in _hex_triangles(list(range(6))):
        w.add_polygon([ring])
    feats = _body_pairs(w.render())
    assert len(feats) == 6
    res = set()
    for vals, n, _ in feats:
        assert n == 2
        l, r = vals
        res.add((min(l, r), max(l, r)))
    assert res == {(0, 1), (0, 5), (1, 2), (2, 3), (3, 4), (4, 5)}


def test_roughness_from_polygon_field():
    w = WaspWriter(fields=["roughness"])
    for i, ring in enumerate(_hex_triangles([0] * 6)):
        w.add_polygon([[(x, y) for x, y, _ in ring]], float(i))
    feats = _body_pairs(w.render())
    res = {(min(v), max(v)) for v, n, _ in feats}
    assert res == {(0, 1), (0, 5), (1, 2), (2, 3), (3, 4), (4, 5)}


def test_merge_no_corner_chaining():
    """test_ogr_wasp_merge: alternating 0/1 heights -> 6 two-point
    boundaries; the 6-way center junction must not be merged through."""
    w = WaspWriter()
    for ring in _hex_triangles([i % 2 for i in range(6)]):
        w.add_polygon([ring])
    feats = _body_pairs(w.render())
    assert len(feats) == 6
    for vals, n, _ in feats:
        assert n == 2, "unwanted merge"
        assert {min(vals), max(vals)} == {0.0, 1.0}


def test_merge_equal_z_suppressed_and_chained():
    """Two squares of equal z touching -> no boundary at all (merge on)."""
    w = WaspWriter()
    w.add_polygon([[(0, 0, 5), (1, 0, 5), (1, 1, 5), (0, 1, 5), (0, 0, 5)]])
    w.add_polygon([[(1, 0, 5), (2, 0, 5), (2, 1, 5), (1, 1, 5), (1, 0, 5)]])
    assert _body_pairs(w.render()) == []
    # merge off: the shared edge is written
    w2 = WaspWriter(merge=False)
    w2.add_polygon([[(0, 0, 5), (1, 0, 5), (1, 1, 5), (0, 1, 5), (0, 0, 5)]])
    w2.add_polygon([[(1, 0, 5), (2, 0, 5), (2, 1, 5), (1, 1, 5), (1, 0, 5)]])
    feats = _body_pairs(w2.render())
    assert len(feats) == 1 and feats[0][1] == 2


def test_boundary_chain_merging():
    """Collinear split boundaries with equal left/right chain into one."""
    w = WaspWriter()
    # three stacked rows: bottom z=0 | middle z=1 | top z=0; middle split
    # into two half-squares so its boundary with bottom comes in 2 pieces
    w.add_polygon([[(0, 0, 0), (2, 0, 0), (2, 1, 0), (0, 1, 0), (0, 0, 0)]])
    w.add_polygon([[(0, 1, 1), (1, 1, 1), (1, 2, 1), (0, 2, 1), (0, 1, 1)]])
    w.add_polygon([[(1, 1, 1), (2, 1, 1), (2, 2, 1), (1, 2, 1), (1, 1, 1)]])
    feats = _body_pairs(w.render())
    # boundaries: bottom/left-middle + bottom/right-middle (chained into
    # one 3-point line); the middle halves share an edge but equal z ->
    # suppressed
    assert len(feats) == 1
    vals, n, pts = feats[0]
    assert n == 3
    assert {min(vals), max(vals)} == {0.0, 1.0}
    ys = pts[1::2]
    assert all(y == 1.0 for y in ys)


def test_adj_tolerance_and_circle():
    w = WaspWriter(adj_tolerance=0.2)
    w.add_line([(0, 0), (0.1, 0.1), (1, 0), (2, 0)], 3.0)
    feats = _body_pairs(w.render())
    assert feats[0][1] == 3  # (0,0),(1,0),(2,0)

    w2 = WaspWriter(point_to_circle_radius=2.0)
    w2.add_line([(5, 5)], 1.0)
    feats2 = _body_pairs(w2.render())
    assert feats2[0][1] == 9
    xs, ys = feats2[0][2][0::2], feats2[0][2][1::2]
    assert xs[0] == pytest.approx(7.0) and ys[0] == pytest.approx(5.0)
    assert xs[0] == xs[-1] and ys[0] == ys[-1]  # exactly closed


def test_shared_boundary_partial_overlap():
    a = [np.array([(0.0, 0), (4, 0), (4, 1), (0, 1), (0, 0)])]
    b = [np.array([(1.0, -1), (3, -1), (3, 0), (1, 0), (1, -1)])]
    segs = shared_boundary(a, b)
    assert len(segs) == 1
    seg = segs[0]
    assert seg[0].tolist() == [1.0, 0.0] and seg[-1].tolist() == [3.0, 0.0]


def test_read_roundtrip():
    w = WaspWriter(srs_proj4=LCC, fields=["z_left", "z_right"])
    for i in range(4):
        w.add_line([(i, 0), (i, 0.5), (i, 1)], float(i), float(i + 1))
    feats, meta = wasp_read(w.render())
    assert meta["srs_proj4"] == LCC
    assert meta["fields"] == ["z_left", "z_right"]
    assert len(feats) == 4
    assert feats[2]["z_left"] == 2.0 and feats[2]["z_right"] == 3.0
    np.testing.assert_allclose(
        feats[2]["coords"], [(2, 0), (2, 0.5), (2, 1)]
    )


def test_read_elevation_schema():
    w = WaspWriter()
    w.add_line([(0, 0, 7), (1, 1, 7)])
    feats, meta = wasp_read(w.render())
    assert meta["srs_proj4"] is None
    assert meta["fields"] == ["elevation"]
    assert feats[0]["elevation"] == 7.0
