"""Property-based (hypothesis) round trips for the round-2 driver
writers: DDS, HDF4, Selafin, WAsP, KML SuperOverlay."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.dds import dds_decode, dds_encode_uncompressed
from gdal_spark.raster.hdf4 import hdf4_open, hdf4_write_sds
from gdal_spark.sources.selafin import (
    SelafinHeader,
    point_features,
    selafin_read,
    selafin_write,
)
from gdal_spark.sources.wasp import WaspWriter, wasp_read

dims = st.tuples(st.integers(1, 23), st.integers(1, 19))


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2 ** 32 - 1))
def test_dds_uncompressed_roundtrip(shape, seed):
    h, w = shape
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    got, meta = dds_decode(dds_encode_uncompressed(arr))
    assert meta["compression"] == "NONE"
    np.testing.assert_array_equal(got, arr)


@settings(max_examples=20, deadline=None)
@given(dims, st.sampled_from(["uint8", "int16", "int32", "float32",
                              "float64"]),
       st.integers(0, 2 ** 32 - 1))
def test_hdf4_sds_roundtrip(shape, dtype, seed):
    h, w = shape
    rng = np.random.default_rng(seed)
    if dtype.startswith("float"):
        arr = rng.normal(size=(h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (h, w)).astype(dtype)
    f = hdf4_open(hdf4_write_sds([("d", arr)], {"k": "v"}))
    got = np.ascontiguousarray(f.datasets[0]["data"]).astype(dtype)
    np.testing.assert_array_equal(got, arr)
    assert f.attributes == {"k": "v"}


@settings(max_examples=20, deadline=None)
@given(st.integers(2, 12), st.integers(1, 3), st.integers(0, 2 ** 31 - 1))
def test_selafin_roundtrip(npts, nvars, seed):
    rng = np.random.default_rng(seed)
    h = SelafinHeader()
    h.title = "prop"
    h.variables = [f"v{i}" for i in range(nvars)]
    h.n_points = npts
    h.x = rng.normal(size=npts).round(3).astype(np.float32).astype(float)
    h.y = rng.normal(size=npts).round(3).astype(np.float32).astype(float)
    h.border = np.zeros(npts, np.int64)
    vals = rng.integers(-1000, 1000, (nvars, npts)).astype(float)
    h.steps = [(0.0, vals)]
    h2 = selafin_read(selafin_write(h))
    assert h2.variables == h.variables
    np.testing.assert_allclose(h2.x, h.x, rtol=1e-6)
    feats = point_features(h2)
    assert len(feats) == npts
    for i in range(npts):
        for k, v in enumerate(h.variables):
            assert feats[i][2][v] == vals[k][i]


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 6), st.integers(0, 2 ** 31 - 1))
def test_wasp_roundtrip(nfeat, seed):
    rng = np.random.default_rng(seed)
    w = WaspWriter(fields=["z_left", "z_right"])
    want = []
    for i in range(nfeat):
        npts = int(rng.integers(2, 6))
        # one decimal place: the writer formats %11.1f
        pts = (rng.integers(-10000, 10000, (npts, 2)) / 10.0)
        zl, zr = float(i), float(i + 1)
        w.add_line(pts, zl, zr)
        want.append((zl, zr, pts))
    feats, meta = wasp_read(w.render())
    assert meta["fields"] == ["z_left", "z_right"]
    assert len(feats) == nfeat
    for f, (zl, zr, pts) in zip(feats, want):
        assert f["z_left"] == zl and f["z_right"] == zr
        np.testing.assert_allclose(f["coords"], pts, atol=1e-9)


@settings(max_examples=8, deadline=None)
@given(st.sampled_from([64, 128, 256, 512]), st.integers(0, 2 ** 31 - 1))
def test_kmlso_pow2_roundtrip(size, seed):
    from gdal_spark.raster.kmlso import kmlso_open, kmlso_write

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
    gt = (0.0, 1.0 / size, 0.0, 1.0, 0.0, -1.0 / size)
    ds = kmlso_open("doc.kml", kmlso_write(arr, gt, fmt="PNG"))
    assert (ds.width, ds.height) == (size, size)
    np.testing.assert_array_equal(ds.read()[:, :, :3], arr)
