"""netCDF classic codec parity vs the reference's own autotest suite.

Every expectation below is the reference's own published value from
autotest/gdrivers/netcdf.py, run on the reference's own data files through
THIS engine's pure-numpy CDF parser (gdal_spark/functions/netcdf.py).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions import netcdf as NC
from gdal_spark.functions.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/netcdf"
GCORE = "/root/reference/autotest/gcore/data"

_have_ref = os.path.isdir(DATA)
pytestmark = pytest.mark.skipif(not _have_ref, reason="reference data absent")


def _read(name: str) -> bytes:
    return open(os.path.join(DATA, name), "rb").read()


# ---------------------------------------------------------------------------
# Read checksum parity (autotest/gdrivers/netcdf.py expectations)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fname,var,expected",
    [
        # test_netcdf_2 golden copy of byte.tif (and byte.nc itself)
        ("byte.nc", None, 4672),
        # test_netcdf_1: NETCDF:bug636.nc:tas band 1 -> 31621
        ("bug636.nc", "tas", 31621),
        # test_netcdf_30 (bug #4705): NaN pixels -> _FillValue on read
        ("trmm-nan.nc", None, 62519),
        # test_netcdf_39: NETCDF:two_vars_scale_offset.nc:z -> 65463
        # (scale/offset exposed as metadata, NOT applied to pixel values)
        ("two_vars_scale_offset.nc", "z", 65463),
        # test_netcdf_open_vsimem: trmm.nc -> 14 (record variable over time)
        ("trmm.nc", None, 14),
    ],
)
def test_checksum_parity(fname, var, expected):
    arr, _, _, _ = NC.nc_to_raster(_read(fname), var)
    assert checksum(arr[0]) == expected


def test_cdf2_64bit_offset_opens():
    """test_netcdf_15: NC2 (64-bit offset) support — same data as trmm.nc."""
    info = NC.nc_parse(_read("trmm-nc2.nc"))
    assert info["version"] == 2
    arr, _, _, meta = NC.nc_to_raster(_read("trmm-nc2.nc"))
    assert meta["var"] == "pcp"
    assert checksum(arr[0]) == 14


def test_unit_type():
    """test_netcdf_59: GetUnitType on unittype.nc == m/s."""
    _, _, _, meta = NC.nc_to_raster(_read("unittype.nc"))
    assert meta["atts"]["units"] == "m/s"


def test_byte_nc_georef():
    """byte.nc carries the byte.tif geotransform via the GeoTransform att."""
    _, gt, nodata, meta = NC.nc_to_raster(_read("byte.nc"))
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert nodata is None  # test_netcdf_2: no nodata for Byte
    assert meta["var"] == "Band1"


def test_scale_offset_metadata():
    """test_netcdf_39 companion: scale_factor/add_offset exposed, unapplied."""
    _, _, _, meta = NC.nc_to_raster(_read("two_vars_scale_offset.nc"), "z")
    assert meta["scale_factor"] is not None
    assert meta["add_offset"] is not None


def test_fillvalue_nodata():
    _, _, nodata, _ = NC.nc_to_raster(_read("trmm-nan.nc"))
    assert nodata == pytest.approx(-9999.9, abs=1e-3)


# ---------------------------------------------------------------------------
# Writer: byte-identical to the reference's own golden file
# ---------------------------------------------------------------------------


def test_write_golden_byte_identical():
    """test_netcdf_write_check_golden_file: CreateCopy(byte.tif, FORMAT=NC,
    WRITE_GDAL_VERSION=NO, WRITE_GDAL_HISTORY=NO) must equal
    byte_nc3_golden.nc byte for byte — through THIS engine's TIFF reader
    and netCDF writer."""
    from gdal_spark.functions.tiff import tiff_parse

    arr, md = tiff_parse(open(os.path.join(GCORE, "byte.tif"), "rb").read())
    out = NC.gdal_create_copy_nc(arr, md["geotransform"], 26711)
    golden = _read("byte_nc3_golden.nc")
    assert out == golden


def test_write_read_roundtrip_uint8():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
    data = NC.gdal_create_copy_nc(a, gt, 26711)
    arr, gt2, nodata, meta = NC.nc_to_raster(data)
    assert np.array_equal(arr[0], a)
    assert gt2 == gt
    assert nodata is None


# ---------------------------------------------------------------------------
# Generic classic writer/reader properties
# ---------------------------------------------------------------------------


def test_grid_roundtrip_float():
    r, c = np.meshgrid(np.arange(9), np.arange(11), indexing="ij")
    dem = ((r * 37 + c * 101) % 97) * 0.25
    gt = (500.0, 2.0, 0.0, 800.0, 0.0, -2.0)
    data = NC.nc_encode_grid(dem, gt, nodata=-9999.0)
    a, gt2, nod = NC.nc_decode_grid(data)
    assert np.array_equal(a, dem)
    assert all(abs(x - y) < 1e-9 for x, y in zip(gt2, gt))
    assert nod == -9999.0


def test_record_variable_roundtrip():
    """Record (unlimited) dim: per-record slabs, gathered on read."""
    t = np.arange(5, dtype=np.float64)
    cube = np.arange(5 * 3 * 4, dtype=np.float32).reshape(5, 3, 4)
    dims = [("time", 0), ("y", 3), ("x", 4)]
    variables = [
        {"name": "time", "dims": [0], "type": NC.NC_DOUBLE, "data": t,
         "atts": []},
        {"name": "v", "dims": [0, 1, 2], "type": NC.NC_FLOAT, "data": cube,
         "atts": []},
    ]
    data = NC.nc3_encode(dims, [], variables)
    info = NC.nc_parse(data)
    assert info["numrecs"] == 5
    assert np.array_equal(NC.nc_read_var(data, info, "time"), t)
    assert np.array_equal(NC.nc_read_var(data, info, "v"), cube)


def test_two_record_vars_padding():
    """>1 record var: each per-record chunk pads to 4 bytes (spec rule)."""
    dims = [("time", 0), ("x", 3)]
    a = np.arange(6, dtype=np.int16).reshape(2, 3)
    b = np.arange(2, dtype=np.int8).reshape(2, 1)[:, 0]
    variables = [
        {"name": "a", "dims": [0, 1], "type": NC.NC_SHORT, "data": a,
         "atts": []},
        {"name": "b", "dims": [0], "type": NC.NC_BYTE, "data": b, "atts": []},
    ]
    data = NC.nc3_encode(dims, [], variables)
    info = NC.nc_parse(data)
    assert np.array_equal(NC.nc_read_var(data, info, "a"), a)
    assert np.array_equal(NC.nc_read_var(data, info, "b"), b)


def test_cdf2_writer_roundtrip():
    a = np.arange(12, dtype=np.int32).reshape(3, 4)
    variables = [
        {"name": "z", "dims": [0, 1], "type": NC.NC_INT, "data": a, "atts": []}
    ]
    data = NC.nc3_encode([("y", 3), ("x", 4)], [], variables, version=2)
    info = NC.nc_parse(data)
    assert info["version"] == 2
    assert np.array_equal(NC.nc_read_var(data, info, "z"), a)


def test_classic_fixture_sweep():
    """Every classic-magic fixture in the reference suite must parse; 2-D+
    data variables must read without error (coverage sweep, not goldens)."""
    n_parsed = n_raster = 0
    for fn in sorted(os.listdir(DATA)):
        if not fn.endswith(".nc"):
            continue
        raw = open(os.path.join(DATA, fn), "rb").read()
        if raw[:3] != b"CDF" or raw[3] not in (1, 2, 5):
            continue
        if fn == "byte_truncated.nc":
            continue  # deliberately corrupt fixture
        info = NC.nc_parse(raw)
        n_parsed += 1
        name = NC.pick_raster_var(info)
        if name is not None:
            arr = NC.nc_read_var(raw, info, name)
            assert arr.size == int(np.prod(arr.shape))
            n_raster += 1
    assert n_parsed >= 70  # 81 classic fixtures ship with the reference
    assert n_raster >= 50


def test_netcdf4_hdf5_backed():
    """netCDF-4 (HDF5) files dispatch through the HDF5 reader and
    produce the same raster bridge output: byte_chunked_multiple.nc is
    byte.tif (checksum 4672) with the canonical geotransform."""
    import numpy as np

    from gdal_spark.functions.checksum import checksum
    from gdal_spark.functions.netcdf import nc_parse, nc_to_raster

    p = ("/root/reference/autotest/gdrivers/data/netcdf/"
         "byte_chunked_multiple.nc")
    if not os.path.exists(p):
        pytest.skip("fixture missing")
    data = open(p, "rb").read()
    arr, gt, nodata, meta = nc_to_raster(data)
    assert arr.shape == (1, 20, 20)
    assert checksum(arr[0]) == 4672
    assert gt == pytest.approx((440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))
    info = nc_parse(data)
    assert [d[0] for d in info["dims"]] == ["x", "y"]
    assert info["vars"]["Band1"]["dims"] == [1, 0]  # (y, x)


def test_netcdf4_sweep():
    """Every HDF5-backed .nc fixture either rasters or is legitimately
    non-raster (no 2-D variable)."""
    import glob

    from gdal_spark.functions.netcdf import NcError, nc_to_raster

    d = "/root/reference/autotest/gdrivers/data/netcdf"
    n_ok = 0
    for p in sorted(glob.glob(os.path.join(d, "*.nc"))):
        raw = open(p, "rb").read()
        if not raw.startswith(b"\x89HDF"):
            continue
        if "truncated" in p:
            continue
        try:
            nc_to_raster(raw)
            n_ok += 1
        except NcError as e:
            assert "no 2-D raster variable" in str(e), p
    assert n_ok >= 20
