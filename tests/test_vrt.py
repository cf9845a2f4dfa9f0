"""VRT (virtual dataset) parity vs the reference's own autotest suites.

All checksums below are the reference's published expectations
(autotest/gcore/vrt_read.py init_list, test_vrt_dstsize_larger_than_source,
autotest/gcore/gdal_stats.py test_stats_nan_4/5) evaluated on the
reference's own .vrt/.tif files through this engine's VRT reader
(gdal_spark/raster/vrt.py) and codec stack.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import vrt as V

DATA = "/root/reference/autotest/gcore/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent"
)


def _render(name: str) -> np.ndarray:
    return V.render_vrt(open(os.path.join(DATA, name)).read(), DATA)


# vrt_read.py init_list — the reference's own open-checksum matrix
INIT_LIST = [
    ("byte.vrt", 4672),
    ("int16.vrt", 4672),
    ("uint16.vrt", 4672),
    ("int32.vrt", 4672),
    ("uint32.vrt", 4672),
    ("float32.vrt", 4672),
    ("float64.vrt", 4672),
    ("cint16.vrt", 5028),
    ("cint32.vrt", 5028),
    ("cfloat32.vrt", 5028),
    ("cfloat64.vrt", 5028),
    ("msubwinbyte.vrt", 2699),
    ("utmsmall.vrt", 50054),
    ("byte_nearest_50pct.vrt", 1192),
    ("byte_averaged_50pct.vrt", 1152),
    ("byte_nearest_200pct.vrt", 18784),
    ("byte_averaged_200pct.vrt", 18784),
]


@pytest.mark.parametrize(
    "fname,expected", INIT_LIST, ids=[f.split(".")[0] for f, _ in INIT_LIST]
)
def test_vrt_open_checksums(fname, expected):
    assert checksum(_render(fname)[0]) == expected


def test_dstsize_larger_than_source():
    """Fractional DstRect offsets/sizes (gdal-dev 2018-December/049415):
    exercises the GetSrcDstWindow float-window transcription."""
    assert checksum(_render("dstsize_larger_than_source.vrt")[0]) == 33273


def test_nan_nodata_sources():
    """gdal_stats.py test_stats_nan_4/5 (#3576): NODATA=nan ComplexSource
    masking + band-nodata buffer initialization."""
    assert checksum(_render("nan32_nodata.vrt")[0]) == 874
    assert checksum(_render("nan32_nodata_nan_to_zero.vrt")[0]) == 978


def test_complex_scale_offset():
    """vrt_read.py test 4: (1+3j) through ScaleRatio=2 ScaleOffset=3 ->
    5+9j (both components scaled)."""
    data = np.array([[1.0 + 3.0j]], dtype=np.complex64)
    xml = """<VRTDataset rasterXSize="1" rasterYSize="1">
  <VRTRasterBand dataType="CFloat32" band="1">
    <ComplexSource>
      <SourceFilename>mem</SourceFilename><SourceBand>1</SourceBand>
      <ScaleOffset>3</ScaleOffset><ScaleRatio>2</ScaleRatio>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>"""
    arr = V.render_vrt(xml, "", open_file=lambda p: data)
    assert arr[0][0, 0] == 5.0 + 9.0j


def test_lut_source():
    data = np.array([[0.0, 5.0, 10.0, 20.0]], dtype=np.float32)
    xml = """<VRTDataset rasterXSize="4" rasterYSize="1">
  <VRTRasterBand dataType="Float64" band="1">
    <ComplexSource>
      <SourceFilename>mem</SourceFilename><SourceBand>1</SourceBand>
      <LUT>0:0,10:100,20:40</LUT>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>"""
    arr = V.render_vrt(xml, "", open_file=lambda p: data)
    assert list(arr[0][0]) == [0.0, 50.0, 100.0, 40.0]


def test_derived_band_pixel_function(tmp_path):
    """VRTDerivedRasterBand dispatches into the engine pixel-function
    registry (frmts/vrt/vrtderivedrasterband.cpp)."""
    from gdal_spark.functions.tiff import tiff_encode

    a = np.arange(100, dtype=np.uint8).reshape(10, 10)
    (tmp_path / "a.tif").write_bytes(tiff_encode(a))
    xml = """<VRTDataset rasterXSize="10" rasterYSize="10">
  <VRTRasterBand dataType="Float64" band="1" subClass="VRTDerivedRasterBand">
    <PixelFunctionType>sum</PixelFunctionType>
    <PixelFunctionArguments k="100" />
    <SimpleSource><SourceFilename relativeToVRT="1">a.tif</SourceFilename>
      <SourceBand>1</SourceBand></SimpleSource>
    <SimpleSource><SourceFilename relativeToVRT="1">a.tif</SourceFilename>
      <SourceBand>1</SourceBand></SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
    arr = V.render_vrt(xml, str(tmp_path))
    assert np.array_equal(arr[0], a.astype(np.float64) * 2 + 100)


def test_parse_georef():
    spec = V.parse_vrt(open(os.path.join(DATA, "byte.vrt")).read())
    assert (spec["w"], spec["h"]) == (20, 20)
    assert spec["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert spec["bands"][0]["nodata"] == 107.0
    assert spec["metadata"]["test"] == "testvalue"


def test_window_render_matches_full():
    """Windowed rendering (the tile-task path) == slices of full render."""
    full = _render("msubwinbyte.vrt")
    xml = open(os.path.join(DATA, "msubwinbyte.vrt")).read()
    for win in [(0, 0, 25, 25), (20, 20, 30, 30), (13, 7, 17, 29)]:
        part = V.render_vrt(xml, DATA, window=win)
        x0, y0, ww, wh = win
        assert np.array_equal(part, full[:, y0:y0 + wh, x0:x0 + ww])


def test_read_vrt_tiles_distributed(spark, tmp_path):
    """Distributed tile materialization reconstructs the full mosaic."""
    for f in ("utmsmall.vrt", "utmsmall.tif"):
        shutil.copy(os.path.join(DATA, f), tmp_path)
    tdf = V.read_vrt_tiles(
        spark, str(tmp_path / "utmsmall.vrt"), tile=33
    ).toPandas()
    full = _render("utmsmall.vrt").astype(np.float64)
    recon = np.zeros_like(full)
    for r in tdf.itertuples(index=False):
        a = np.frombuffer(r.data, "<f8").reshape(r.bands, r.h, r.w)
        recon[:, r.ty * 33:r.ty * 33 + r.h, r.tx * 33:r.tx * 33 + r.w] = a
    assert np.array_equal(recon, full)
    assert len(tdf) == 16  # 100/33 -> 4x4 tiles
