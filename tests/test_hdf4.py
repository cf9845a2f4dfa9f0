"""HDF4 reader/writer (raster/hdf4.py) vs the reference autotest
fixture hdifftst2.hdf and write->read round trips."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.raster.hdf4 import Hdf4File, hdf4_open, hdf4_write_sds

FIX = "/root/reference/autotest/gdrivers/data/hdf4/hdifftst2.hdf"


@pytest.fixture(scope="module")
def fx() -> Hdf4File:
    if not os.path.exists(FIX):
        pytest.skip("reference autotest data missing")
    with open(FIX, "rb") as fh:
        return hdf4_open(fh.read())


def test_fixture_datasets(fx):
    names = [ds["name"] for ds in fx.datasets]
    assert names == ["dset1", "dset2", "dset3"]
    for ds in fx.datasets:
        assert ds["dims"] == [3, 2]
        assert ds["data"].dtype == np.dtype(">i4")
    np.testing.assert_array_equal(
        fx.datasets[0]["data"], [[1, 2], [3, 4], [5, 6]])
    np.testing.assert_array_equal(
        fx.datasets[2]["data"], [[120, 80], [0, 100], [0, 50]])


def test_fixture_attributes(fx):
    # SDS attribute attached through its Var0.0 vgroup
    assert fx.datasets[0]["attributes"] == {"Valid_range": [1.0, 2.0]}
    # global attribute (inside the file-level vgroup, still global)
    assert fx.attributes == {"File_contents": "Storm_track_data2"}


def test_fixture_dimensions(fx):
    assert fx.dim_names == [f"fakeDim{i}" for i in range(6)]


def test_fixture_vdatas(fx):
    vd = {v["name"]: v for v in fx.vdatas.values()}
    assert vd["vdata1"]["fields"]["Single-component Field"] == \
        ["X", "D", "A", "T", "A"]
    assert vd["vdata2"]["fields"]["Multi-component Field"] == \
        [[1, 1, 1, 1], [5, 6, 7, 8]]
    p = vd["vdata3"]["fields"]
    assert p["Position"] == [[1.0, 1.0, 1.0], [7.0, 8.0, 9.0]]
    assert p["Mass"] == [1.0, 10.0]
    assert p["Temperature"] == [[1.0, 1.0], [11.0, 12.0]]


def test_fixture_version(fx):
    assert fx.version.startswith("4.2.1 NCSA HDF")


def test_roundtrip_types():
    rng = np.random.default_rng(3)
    arrays = [
        ("u8", rng.integers(0, 255, (4, 5)).astype(np.uint8)),
        ("i16", rng.integers(-1000, 1000, (3, 7)).astype(np.int16)),
        ("i32", rng.integers(-1 << 30, 1 << 30, (2, 2)).astype(np.int32)),
        ("f32", rng.normal(size=(5, 3)).astype(np.float32)),
        ("f64", rng.normal(size=(1, 6))),
        ("cube", rng.integers(0, 99, (2, 3, 4)).astype(np.int32)),
    ]
    blob = hdf4_write_sds(arrays, {"title": "round", "source": "test"})
    f = hdf4_open(blob)
    assert [ds["name"] for ds in f.datasets] == [n for n, _ in arrays]
    for ds, (_, want) in zip(f.datasets, arrays):
        np.testing.assert_array_equal(
            np.ascontiguousarray(ds["data"]).astype(want.dtype), want)
    assert f.attributes == {"title": "round", "source": "test"}


def test_rejects_non_hdf4():
    with pytest.raises(ValueError):
        hdf4_open(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
