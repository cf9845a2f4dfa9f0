"""VSI virtual filesystem: /vsizip /vsitar /vsigzip /vsimem /vsisubfile
+ brace chaining + the localize bridge into path-based readers.

Semantics per the reference's VSI handlers (port/cpl_vsil_gzip.cpp,
cpl_vsil_tar.cpp, cpl_vsi_mem.cpp, cpl_vsil_subfile.cpp): archive/member
split by existence probe, single-member convenience open, read-only
archives, per-process memory FS.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile
import zipfile

import numpy as np
import pytest

from gdal_spark.sources import vsi


@pytest.fixture()
def arch(tmp_path):
    files = {"a.txt": b"alpha", "sub/b.bin": bytes(range(256)), "sub/c.txt": b"gamma"}
    zp = tmp_path / "data.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for n, b in files.items():
            z.writestr(n, b)
    tp = tmp_path / "data.tar.gz"
    with tarfile.open(tp, "w:gz") as t:
        for n, b in files.items():
            ti = tarfile.TarInfo(n)
            ti.size = len(b)
            t.addfile(ti, io.BytesIO(b))
    return tmp_path, files


def test_vsizip_read_and_probe_split(arch):
    root, files = arch
    for n, b in files.items():
        assert vsi.vsi_read(f"/vsizip/{root}/data.zip/{n}") == b
    # brace form pins the archive explicitly
    assert vsi.vsi_read(f"/vsizip/{{{root}/data.zip}}/a.txt") == b"alpha"


def test_vsitar_read(arch):
    root, files = arch
    for n, b in files.items():
        assert vsi.vsi_read(f"/vsitar/{root}/data.tar.gz/{n}") == b


def test_vsizip_readdir(arch):
    root, _ = arch
    assert vsi.vsi_readdir(f"/vsizip/{{{root}/data.zip}}") == [
        "a.txt", "sub/b.bin", "sub/c.txt",
    ]
    assert vsi.vsi_readdir(f"/vsizip/{root}/data.zip/sub") == ["b.bin", "c.txt"]


def test_single_member_convenience(tmp_path):
    zp = tmp_path / "one.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("only.csv", b"x,y\n1,2\n")
    assert vsi.vsi_read(f"/vsizip/{zp}") == b"x,y\n1,2\n"
    with pytest.raises(FileNotFoundError):
        vsi.vsi_read(f"/vsizip/{tmp_path}/../{tmp_path.name}/one.zip.missing")


def test_vsigzip(tmp_path):
    p = tmp_path / "t.gz"
    p.write_bytes(gzip.compress(b"zzz"))
    assert vsi.vsi_read(f"/vsigzip/{p}") == b"zzz"
    assert vsi.vsi_read(f"/vsigzip//{str(p).lstrip('/')}") == b"zzz"


def test_vsimem_roundtrip_and_unlink():
    vsi.vsi_write("/vsimem/t/x.bin", b"\x01\x02")
    assert vsi.vsi_exists("/vsimem/t/x.bin")
    assert vsi.vsi_read("/vsimem/t/x.bin") == b"\x01\x02"
    assert "t/x.bin" in vsi.vsi_readdir("/vsimem")
    vsi.vsi_unlink("/vsimem/t/x.bin")
    assert not vsi.vsi_exists("/vsimem/t/x.bin")


def test_vsisubfile(tmp_path):
    p = tmp_path / "raw.bin"
    p.write_bytes(bytes(range(100)))
    assert vsi.vsi_read(f"/vsisubfile/10_5,{p}") == bytes(range(10, 15))
    assert vsi.vsi_read(f"/vsisubfile/95,{p}") == bytes(range(95, 100))


def test_chained_tar_inside_zip_with_braces(tmp_path):
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w") as t:
        ti = tarfile.TarInfo("deep.txt")
        ti.size = 4
        t.addfile(ti, io.BytesIO(b"deep"))
    zp = tmp_path / "outer.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("inner.tar", inner.getvalue())
    path = f"/vsitar/{{/vsizip/{zp}/inner.tar}}/deep.txt"
    assert vsi.vsi_read(path) == b"deep"


def test_chained_gzip_of_vsimem():
    vsi.vsi_write("/vsimem/g.gz", gzip.compress(b"mem-gz"))
    assert vsi.vsi_read("/vsigzip//vsimem/g.gz") == b"mem-gz"
    vsi.vsi_unlink("/vsimem/g.gz")


def test_archives_read_only(arch):
    root, _ = arch
    with pytest.raises(OSError):
        vsi.vsi_write(f"/vsizip/{root}/data.zip/new.txt", b"nope")


def test_localize_set_shapefile_in_zip(tmp_path, spark):
    from gdal_spark.functions.wkb import write_polygon
    from gdal_spark.sources.vector_formats import read_shapefile, write_shapefile

    def box(x0, y0, x1, y1):
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )
        return write_polygon([ring])

    rows = [
        (i, f"n{i}", 1.5 * i, bytearray(box(i, i, i + 2.0, i + 3.0)))
        for i in range(7)
    ]
    feat = spark.createDataFrame(
        rows, "fid int, name string, score double, wkb binary"
    )
    base = str(tmp_path / "polys")
    write_shapefile(feat, base + ".shp")
    zp = tmp_path / "vec.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for ext in (".shp", ".shx", ".dbf"):
            z.write(base + ext, "polys" + ext)

    local = vsi.vsi_localize_set(f"/vsizip/{zp}/polys.shp")
    got = read_shapefile(spark, local).orderBy("fid").toPandas()
    want = read_shapefile(spark, base + ".shp").orderBy("fid").toPandas()
    assert got.equals(want)
    assert len(got) == 7
