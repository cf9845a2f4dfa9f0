"""Pure-numpy HDF5 reader vs the reference autotest
(autotest/gdrivers/hdf5.py checksums and metadata)."""

import glob
import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.hdf5lib import hdf5_open

D = "/root/reference/autotest/gdrivers/data/hdf5"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _open(name):
    return hdf5_open(open(os.path.join(D, name), "rb").read())


def test_u8be():
    """test_hdf5_3/4: big-endian uint8 dataset, checksum 135."""
    f = _open("u8be.h5")
    a = f.get("/TestArray").read()
    assert a.shape == (6, 5)
    assert checksum(a) == 135


def test_groups():
    """test_hdf5_2/5: nested old-style groups; dset1 checksum 18."""
    f = _open("groups.h5")
    objs = f.visit()
    assert "/MyGroup/Group_A/dset2" in objs
    assert "/MyGroup/dset1" in objs
    assert checksum(f.get("/MyGroup/dset1").read()) == 18


def test_complex_compound():
    """test_hdf5_15/16/17: compound r/i members -> complex checksums."""
    f = _open("complex.h5")
    for name, dt, want in (("f32", "<f4", 523), ("f64", "<f8", 511),
                           ("f16", "<f2", 412)):
        ds = f.get("/" + name)
        a = ds.read()
        r = np.frombuffer(a.tobytes(), np.dtype(dt))[0::2].reshape(a.shape)
        i = np.frombuffer(a.tobytes(), np.dtype(dt))[1::2].reshape(a.shape)
        c = (r.astype(np.float64) + 1j * i.astype(np.float64)).astype(
            np.complex128 if dt == "<f8" else np.complex64
        )
        assert checksum(c) == want, name


def test_attr_all_datatypes():
    """test_hdf5_attr_all_datatypes: every numeric attribute reads 125."""
    f = _open("attr_all_datatypes.h5")
    attrs = f.root.attrs
    for k in ("attr_int8", "attr_uint8", "attr_int16", "attr_uint16",
              "attr_int32", "attr_uint32", "attr_float16", "attr_float32",
              "attr_float64"):
        assert float(attrs[k]) == 125.0, k


def test_deflate_shuffle():
    """deflate.h5 carries byte.tif through deflate+shuffle; the south-up
    rows flip back to GDAL's canonical 4672 checksum."""
    f = _open("deflate.h5")
    a = f.get("/Band1").read()
    assert a.shape == (20, 20) and a.dtype == np.uint8
    assert checksum(a[::-1]) == 4672


def test_netcdf4_chunked():
    """test_hdf5_single_dim: netCDF-4 (HDF5) chunked variable."""
    p = "/root/reference/autotest/gdrivers/data/netcdf/byte_chunked_multiple.nc"
    if not os.path.exists(p):
        pytest.skip("fixture missing")
    f = hdf5_open(open(p, "rb").read())
    a = f.get("/x").read()
    assert a.shape == (20,)
    assert checksum(a) == 231


def test_superblock_v2_v3():
    """v2/v3 superblocks with v2 object headers and compact links."""
    f = _open("single_char_varname.h5")
    assert f.get("/e").read().shape == (1, 1)
    f = _open("hdfeos_sample_swath.h5")
    objs = f.visit()
    sp = f.get("/HDFEOS/SWATHS/Swath1/Data Fields/Spectra").read()
    assert sp.shape == (15, 40, 20)  # shuffle-filtered v4 single chunk
    cnt = f.get("/HDFEOS/SWATHS/Swath1/Data Fields/Count").read()
    assert cnt.shape == (32,)  # extensible-array chunk index
    strings = f.get("/HDFEOS/SWATHS/Swath1/Data Fields/Test_string").read()
    assert strings.shape == (10,)  # vlen strings through the global heap


def test_family_concatenation():
    """The family driver's logical address space is the member
    concatenation; chunked float32 1000x1000 reads whole."""
    fam = b"".join(
        open(os.path.join(D, f"test_family_{i}.h5"), "rb").read()
        for i in range(3)
    )
    f = hdf5_open(fam)
    a = f.get("/chunked").read()
    assert a.shape == (1000, 1000) and a.dtype == np.float32


def test_vlen_string_metadata():
    f = _open("vlstr_metadata.h5")
    objs = f.visit()
    assert objs  # variable-length string attributes parse without error


def test_all_fixtures_read():
    """Every dataset in every single-file fixture decodes."""
    for p in sorted(glob.glob(os.path.join(D, "*.h5"))):
        if "test_family_1" in p or "test_family_2" in p \
                or "test_family_0" in p:
            continue
        f = hdf5_open(open(p, "rb").read())
        for k, v in f.visit().items():
            if hasattr(v, "read"):
                v.read()


def test_writer_roundtrip():
    """The minimal writer's output parses with the full reader."""
    from gdal_spark.functions.hdf5lib import (
        hdf5_subdatasets,
        hdf5_write_simple,
    )

    a = (np.arange(12).reshape(3, 4) * 3 % 17).astype(np.int32)
    b = np.linspace(0, 1, 6).reshape(2, 3).astype(np.float32)
    c = np.arange(6, dtype=np.uint8).reshape(2, 3)
    data = hdf5_write_simple({"ints": a, "floats": b, "bytes": c})
    f = hdf5_open(data)
    assert np.array_equal(f.get("/ints").read(), a)
    assert np.allclose(f.get("/floats").read(), b)
    assert np.array_equal(f.get("/bytes").read(), c)
    md = hdf5_subdatasets(data, "x.h5")
    assert md["SUBDATASET_1_NAME"] == 'HDF5:"x.h5"://bytes'
    assert len(md) == 6


def test_subdatasets_groups():
    """test_hdf5_2 subdataset naming over nested groups."""
    from gdal_spark.functions.hdf5lib import hdf5_subdatasets

    data = open(os.path.join(D, "groups.h5"), "rb").read()
    md = hdf5_subdatasets(data, "data/hdf5/groups.h5")
    names = [v for k, v in md.items() if k.endswith("_NAME")]
    assert 'HDF5:"data/hdf5/groups.h5"://MyGroup/Group_A/dset2' in names
    assert 'HDF5:"data/hdf5/groups.h5"://MyGroup/dset1' in names
