"""Property-based tests (hypothesis) over the pure-numpy kernel layer —
the reference's own autotest strategy mixes goldens with randomized
sweeps (e.g. alg/warp.py random rasters); this file adds the randomized
side for the engine's foundation kernels:

  * WKB write/parse round trips (polygon, multipolygon, point, line)
  * Hilbert code injectivity + locality bound
  * Sutherland-Hodgman box clip area monotonicity / identity
  * reclassify interval semantics vs a naive per-pixel evaluator
  * WAV PCM round trip (arbitrary lengths/channels, word alignment)
  * multi-page TIFF frame-sequence round trip
  * web-mercator tile math inverses
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.functions import wkb as W
from gdal_spark.functions.geom import polygon_area
from gdal_spark.functions.hilbert import hilbert_code_py
from gdal_spark.functions.mercator import (
    lonlat_to_meters_py,
    lonlat_to_tile_py,
    meters_to_lonlat_py,
    tile_bounds_meters_py,
)
from gdal_spark.multimodal import (
    tiff_encode_seq,
    wav_decode,
    wav_encode,
)
from gdal_spark.functions.tiff import ifd_offsets, tiff_parse
from gdal_spark.raster.reclassify import reclassify_array

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def rings(draw, min_pts=3, max_pts=12):
    n = draw(st.integers(min_pts, max_pts))
    pts = draw(
        st.lists(st.tuples(finite, finite), min_size=n, max_size=n, unique=True)
    )
    return np.array(pts, dtype=np.float64)


@given(rings())
@settings(max_examples=60, deadline=None)
def test_wkb_polygon_roundtrip(ring):
    buf = W.write_polygon([ring])
    got = W.polygon_rings(buf)
    assert len(got) == 1 and len(got[0]) == 1
    back = got[0][0]
    # writer closes the ring; ignore the closing vertex
    assert np.allclose(back[: len(ring)], ring)
    x0, y0, x1, y1 = W.bbox(buf)
    assert x0 == ring[:, 0].min() and x1 == ring[:, 0].max()
    assert y0 == ring[:, 1].min() and y1 == ring[:, 1].max()


@given(st.lists(st.tuples(finite, finite), min_size=2, max_size=20))
@settings(max_examples=60, deadline=None)
def test_wkb_linestring_point_roundtrip(pts):
    coords = np.array(pts, dtype=np.float64)
    t, body = W.parse(W.write_linestring(coords))
    assert np.allclose(body, coords)
    t, xy = W.parse(W.write_point(coords[0, 0], coords[0, 1]))
    assert tuple(np.ravel(xy)[:2]) == (coords[0, 0], coords[0, 1])


@given(
    st.lists(
        st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)),
        min_size=2,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=40, deadline=None)
def test_hilbert_injective(cells):
    codes = [hilbert_code_py(x, y) for x, y in cells]
    assert len(set(codes)) == len(cells)
    for (x, y), c in zip(cells, codes):
        assert 0 <= c < 1 << 32


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFE))
@settings(max_examples=60, deadline=None)
def test_hilbert_locality_step(x, y):
    # adjacent cells differ by a bounded code distance on average; the
    # hard invariant: a unit step changes the code (injectivity) and the
    # code stays in range
    a = hilbert_code_py(x, y)
    b = hilbert_code_py(x, y + 1)
    assert a != b


@st.composite
def simple_rings(draw, min_pts=3, max_pts=8):
    """Star-shaped (hence simple) ring: random points angularly sorted
    around their centroid — signed area == coverage, so clip-area
    monotonicity is well-defined."""
    ring = draw(rings(min_pts, max_pts))
    c = ring.mean(axis=0)
    ang = np.arctan2(ring[:, 1] - c[1], ring[:, 0] - c[0])
    order = np.argsort(ang)
    ring = ring[order]
    # angular sort can leave duplicate angles -> still fine (collinear)
    return ring


@given(simple_rings())
@settings(max_examples=60, deadline=None)
def test_clip_area_monotone(ring):
    from gdal_spark.functions.geom import clip_wkb_to_box

    buf = W.write_polygon([ring])
    area = polygon_area([ring])
    x0, y0, x1, y1 = W.bbox(buf)
    # clip to the full bbox: area preserved
    full = clip_wkb_to_box(buf, x0 - 1, y0 - 1, x1 + 1, y1 + 1)
    if area > 1e-9:
        assert full is not None
        a_full = polygon_area(W.polygon_rings(full)[0])
        assert math.isclose(a_full, area, rel_tol=1e-9, abs_tol=1e-9)
    # clip to the left half: area never exceeds the original
    half = clip_wkb_to_box(buf, x0, y0, (x0 + x1) / 2, y1)
    if half is not None:
        a_half = sum(polygon_area(p) for p in W.polygon_rings(half))
        assert a_half <= area + 1e-6


@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=6, unique=True),
    st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_reclassify_matches_naive(breaks, width):
    breaks = sorted(breaks)
    ivals = [(b, b + width - 0.5, i) for i, b in enumerate(breaks)]
    # drop overlapping intervals
    kept = []
    for lo, hi, v in ivals:
        if not kept or lo > kept[-1][1]:
            kept.append((lo, hi, v))
    mapping = (
        "; ".join(f"[{lo}, {hi}] = {v}" for lo, hi, v in kept)
        + "; DEFAULT = -999"
    )
    arr = np.linspace(breaks[0] - 2, breaks[-1] + 2, 64).reshape(8, 8)
    got = reclassify_array(arr, mapping)

    def naive(v):
        for lo, hi, dst in kept:
            if lo <= v <= hi:
                return dst
        return -999

    want = np.vectorize(naive)(arr)
    assert np.array_equal(got, want)


@given(
    st.integers(1, 400),
    st.integers(1, 3),
    st.sampled_from([np.int16, np.uint8]),
    st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, ch, dtype, seed):
    rng = np.random.RandomState(seed % (2**32 - 1))
    if dtype == np.int16:
        s = rng.randint(-32768, 32767, size=(n, ch)).astype(np.int16)
        want = s
    else:
        s = rng.randint(0, 255, size=(n, ch)).astype(np.uint8)
        want = s.astype(np.int16) - 128
    out, rate = wav_decode(wav_encode(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(out, want)


@given(
    st.integers(1, 6),
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_tiff_seq_roundtrip_property(nframes, h, w, seed):
    rng = np.random.RandomState(seed % (2**32 - 1))
    frames = [rng.randint(0, 255, (h, w), dtype=np.uint8) for _ in range(nframes)]
    blob = tiff_encode_seq(frames, rows_per_strip=7)
    assert len(ifd_offsets(blob)) == nframes
    for i, want in enumerate(frames):
        got, _ = tiff_parse(blob, ifd_index=i)
        got2 = got[:, :, 0] if got.ndim == 3 else got
        assert np.array_equal(got2, want)


@given(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
    st.integers(1, 18),
)
@settings(max_examples=80, deadline=None)
def test_mercator_inverses(lon, lat, zoom):
    mx, my = lonlat_to_meters_py(lon, lat)
    lon2, lat2 = meters_to_lonlat_py(mx, my)
    assert math.isclose(lon, lon2, abs_tol=1e-9)
    assert math.isclose(lat, lat2, abs_tol=1e-9)
    tx, ty = lonlat_to_tile_py(lon, lat, zoom)  # TMS row
    x0, y0, x1, y1 = tile_bounds_meters_py(tx, ty, zoom)
    assert x0 - 1e-6 <= mx <= x1 + 1e-6
    assert y0 - 1e-6 <= my <= y1 + 1e-6


@given(
    st.floats(min_value=-50, max_value=50, allow_nan=False),
    st.floats(min_value=-50, max_value=50, allow_nan=False),
    st.floats(min_value=0.2, max_value=5, allow_nan=False),
    st.floats(min_value=-0.3, max_value=0.3, allow_nan=False),
)
@settings(max_examples=40, deadline=None)
def test_homography_roundtrip_property(tx, ty, scale, shear):
    from gdal_spark.raster.homography import (
        apply_homography,
        gcps_to_homography,
        inv_homography,
    )

    # GCPs from an exact affine (well-conditioned): fit + invert round trip
    def fwd(x, y):
        return tx + scale * x + shear * y, ty - scale * y + shear * x

    pts = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0), (3.0, 7.0)]
    gcps = [(x, y, *fwd(x, y)) for x, y in pts]
    h = gcps_to_homography(gcps)
    hi = inv_homography(h)
    xs = np.linspace(1, 9, 5)
    ys = np.linspace(2, 8, 5)
    X, Y = apply_homography(h, xs, ys)
    fx, fy = fwd(xs, ys)
    assert np.allclose(X, fx, atol=1e-6) and np.allclose(Y, fy, atol=1e-6)
    x2, y2 = apply_homography(hi, X, Y)
    assert np.allclose(x2, xs, atol=1e-6) and np.allclose(y2, ys, atol=1e-6)


@given(
    st.floats(min_value=-170, max_value=170, allow_nan=False),
    st.floats(min_value=-80, max_value=80, allow_nan=False),
    st.integers(2, 30),
)
@settings(max_examples=40, deadline=None)
def test_wrapdateline_preserves_vertices(lon0, lat0, n):
    from gdal_spark.functions.geomops import parse_wkt_any, wrapdateline

    # a polyline wandering east: wrapped output keeps lon in [-180, 180]
    lons = lon0 + np.linspace(0, 250, n)
    lats = np.full(n, lat0)
    lons_wrapped = ((lons + 180) % 360) - 180
    wkt = "LINESTRING(" + ",".join(
        f"{x} {y}" for x, y in zip(lons_wrapped, lats)
    ) + ")"
    out = wrapdateline(wkt)
    kind, payload = parse_wkt_any(out)
    parts = [payload] if kind == "LINESTRING" else payload
    for p in parts:
        assert p[:, 0].min() >= -180.0 - 1e-9
        assert p[:, 0].max() <= 180.0 + 1e-9
        assert np.allclose(p[:, 1], lat0)


@given(
    st.floats(min_value=0.6, max_value=15.4, allow_nan=False),
    st.floats(min_value=0.6, max_value=15.4, allow_nan=False),
    st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_geoloc_roundtrip_property(p, l_, seed):
    from gdal_spark.raster.geoloc import GeoLocTransformer

    rng = np.random.RandomState(seed % (2**32 - 1))
    yy, xx = np.mgrid[0:17, 0:17].astype(float)
    # strictly monotone warped grid: base plane + small bounded noise
    lon = 10.0 + xx + 0.2 * yy + rng.rand(17, 17) * 0.3
    lat = 50.0 - yy + 0.1 * xx + rng.rand(17, 17) * 0.3
    tr = GeoLocTransformer(lon, lat)
    X, Y = tr.pixel_to_geo(p, l_)
    p2, l2 = tr.geo_to_pixel(X, Y)
    assert not np.isnan(p2)
    assert abs(p2 - p) < 1e-7 and abs(l2 - l_) < 1e-7
