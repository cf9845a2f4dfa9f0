"""Zarr V2 driver parity vs autotest/gdrivers/zarr_driver.py on the
reference's own fixtures."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.sources import zarr as Z

DATA = "/root/reference/autotest/gdrivers/data/zarr"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent"
)


@pytest.mark.parametrize(
    "fixture", ["gzip.zarr", "zlib.zarr", "lzma.zarr", "lzma_with_filters.zarr"]
)
def test_compression_methods(fixture):
    """test_zarr_read_compression_methods: stdlib-decodable codecs
    (gzip/zlib/lzma incl. an XZ filter pipeline) -> [1, 2]."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, fixture))
    assert list(arr) == [1, 2]


def test_unavailable_compressor_gated():
    with pytest.raises(Z.ZarrError, match="not available"):
        Z.read_zarr_array(os.path.join(DATA, "blosc.zarr"))


def test_delta_filter():
    """test_zarr_read_filters: delta + gzip -> range(10)."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, "delta_filter_i4.zarr"))
    assert arr.dtype == np.int32
    assert list(arr) == list(range(10))


def test_shuffle_filter():
    """test_zarr_read_shuffle_filter: elementsize-2 byte transpose."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, "shuffle.zarr"))
    assert list(arr) == [1, 2]


@pytest.mark.parametrize(
    "fixture,astype",
    [("fixedscaleoffset_dtype_f8_astype_u1.zarr", "u1"),
     ("fixedscaleoffset_dtype_f8_astype_u2.zarr", "u2"),
     ("fixedscaleoffset_dtype_f8_astype_u4.zarr", "u4")],
)
def test_fixedscaleoffset_filter(fixture, astype):
    """numcodecs FixedScaleOffset decode (offset + enc/scale); raw chunk
    stores [0,1,2,3,4,6,7,8,9,10] at scale 10 / offset 1000."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, fixture))
    exp = 1000.0 + np.array([0, 1, 2, 3, 4, 6, 7, 8, 9, 10]) / 10.0
    assert np.allclose(arr, exp)


@pytest.mark.parametrize("name", ["u1", "u2", "u4", "u8"])
def test_fortran_order(name):
    """test_zarr_read_fortran_order: F-order chunks -> range(16)."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, f"order_f_{name}.zarr"))
    assert list(arr.astype(np.uint64).ravel()) == list(range(16))


def test_fortran_order_string():
    arr, _ = Z.read_zarr_array(os.path.join(DATA, "order_f_s3.zarr"))
    got = [v.decode() for v in arr.ravel()]
    assert got == ["000", "111", "222", "333", "444", "555", "666", "777",
                   "888", "999", "AAA", "BBB", "CCC", "DDD", "EEE", "FFF"]


def test_fortran_order_3d():
    arr, _ = Z.read_zarr_array(os.path.join(DATA, "order_f_u1_3d.zarr"))
    assert list(arr.ravel()) == list(range(24))


def test_byte_cf1_raster_bridge():
    """test_zarr_read_cf1 companion: byte.tif-as-zarr reads with the
    byte.tif geotransform and checksum 4672 through the CF bridge."""
    arr, gt, meta = Z.zarr_to_raster(os.path.join(DATA, "byte_cf1.zarr"))
    assert arr.shape == (1, 20, 20)
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert checksum(arr[0]) == 4672
    assert meta["attrs"]["grid_mapping"] == "transverse_mercator"


def test_group_discovery():
    arrays = Z.open_zarr_group(os.path.join(DATA, "byte_cf1.zarr"))
    assert {"Band1", "x", "y", "transverse_mercator"} <= set(arrays)


def test_consolidated_zmetadata():
    arrays = Z.open_zarr_group(
        os.path.join(DATA, "group_with_zmetadata.zarr")
    )
    assert arrays  # consolidated index lists at least one array


@pytest.mark.parametrize("compressor", [None, "zlib", "gzip", "lzma"])
@pytest.mark.parametrize("order", ["C", "F"])
def test_write_read_roundtrip(tmp_path, compressor, order):
    rng = np.random.RandomState(5)
    a = rng.randint(0, 1 << 30, (7, 11, 5)).astype("<i4")
    p = str(tmp_path / "rt.zarr")
    Z.write_zarr_array(p, a, chunks=(3, 4, 5), compressor=compressor,
                       order=order, attrs={"k": "v"})
    b, info = Z.read_zarr_array(p)
    assert np.array_equal(a, b)
    assert info["attrs"] == {"k": "v"}


def test_missing_chunks_fill_value(tmp_path):
    p = str(tmp_path / "fill.zarr")
    a = np.arange(20, dtype="<f8").reshape(4, 5)
    Z.write_zarr_array(p, a, chunks=(2, 3))
    os.unlink(os.path.join(p, "1.1"))  # drop a chunk
    b, _ = Z.read_zarr_array(p)
    assert np.array_equal(b[:2, :3], a[:2, :3])
    assert (b[2:4, 3:5] == 0).all()  # fill_value


def test_distributed_chunk_scan(spark, tmp_path):
    """Chunk-per-task scan reconstructs the array and synthesizes missing
    chunks from fill_value."""
    p = str(tmp_path / "dist.zarr")
    a = (np.arange(48, dtype="<f8") ** 2).reshape(6, 8)
    Z.write_zarr_array(p, a, chunks=(4, 3), compressor="zlib")
    rows = Z.read_zarr_chunks(spark, p).collect()
    recon = np.zeros_like(a)
    for r in rows:
        sub = np.frombuffer(bytes(r.data), "<f8").reshape(r.sizes)
        recon[r.offsets[0]:r.offsets[0] + r.sizes[0],
              r.offsets[1]:r.offsets[1] + r.sizes[1]] = sub
    assert np.array_equal(recon, a)


# ---------------------------------------------------------------------------
# Zarr V3 (zarr.json layout)
# ---------------------------------------------------------------------------


def test_v3_gzip():
    """test_zarr_v3_read_compression_methods: v3 gzip -> [1, 2]."""
    arr, _ = Z.read_zarr_array(os.path.join(DATA, "v3", "gzip.zarr", "gzip"))
    assert list(arr.ravel()) == [1, 2]


def test_v3_byte_cf1_raster_bridge():
    """byte_cf1.zr3: V3 group with dimension_names-driven CF bridge —
    byte.tif geotransform and checksum 4672."""
    arr, gt, meta = Z.zarr_to_raster(os.path.join(DATA, "byte_cf1.zr3"))
    assert arr.shape == (1, 20, 20)
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert checksum(arr[0]) == 4672


def test_v3_transpose_codec():
    """v3 order_f_u2: transpose codec in the pipeline."""
    grp = Z.open_zarr_group(os.path.join(DATA, "v3", "order_f_u2.zarr"))
    name = [k for k in grp if k][0] if "" not in grp or len(grp) > 1 else ""
    arr, _ = Z.read_zarr_array(grp[name] if name else grp[""])
    assert sorted(arr.astype(int).ravel().tolist()) == list(range(arr.size))
