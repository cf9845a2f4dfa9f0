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


# ---------------------------------------------------------------------------
# gdalbuildvrt (apps/gdalbuildvrt_lib.cpp) parity
# ---------------------------------------------------------------------------


def _sample_tifs(tmp_path):
    """The test_gdalbuildvrt.py sample_tifs fixture: four 10x10 quadrant
    tiles filled 0/63/127/255 on a 0.1-degree grid."""
    from gdal_spark.functions.tiff import tiff_encode

    fills = [(0, (2, 49)), (63, (3, 49)), (127, (2, 48)), (255, (3, 48))]
    paths = []
    for i, (v, (x, y)) in enumerate(fills):
        a = np.full((10, 10), v, np.uint8)
        p = str(tmp_path / f"s{i}.tif")
        open(p, "wb").write(tiff_encode(a, geotransform=(x, 0.1, 0, y, 0, -0.1)))
        paths.append(p)
    return paths


def test_buildvrt_mosaic(tmp_path):
    """test_gdalbuildvrt_1 / gdalbuildvrt_check: 20x20 union, gt
    (2,.1,0,49,0,-.1), checksum 3508."""
    paths = _sample_tifs(tmp_path)
    xml = V.build_vrt(paths, base_dir=str(tmp_path))
    spec = V.parse_vrt(xml)
    assert (spec["w"], spec["h"]) == (20, 20)
    assert spec["gt"] == (2.0, 0.1, 0.0, 49.0, 0.0, -0.1)
    assert len(spec["bands"]) == 1
    assert checksum(V.render_vrt(xml, str(tmp_path))[0]) == 3508


def test_buildvrt_te_partial_overlap():
    """test_gdalbuildvrt_lib_te_partial_overlap: exact rect serialization
    AND checksum 8454 through the fractional-window compositing."""
    xml = V.build_vrt(
        [os.path.join(DATA, "byte.tif")],
        output_bounds=[440600, 3750060, 441860, 3751260],
        x_res=30, y_res=60,
    )
    assert '<SrcRect xOff="0" yOff="1" xSize="19" ySize="19" />' in xml
    assert '<DstRect xOff="4" yOff="0" xSize="38" ySize="19" />' in xml
    assert checksum(V.render_vrt(xml, DATA)[0]) == 8454


def test_buildvrt_separate(tmp_path):
    """-separate: one VRT band per source, stacked in order."""
    paths = _sample_tifs(tmp_path)
    xml = V.build_vrt(paths, separate=True, base_dir=str(tmp_path))
    arr = V.render_vrt(xml, str(tmp_path))
    assert arr.shape[0] == 4
    for i, v in enumerate([0, 63, 127, 255]):
        band = arr[i]
        assert set(np.unique(band)) <= {0, v}  # fill where covered, 0 bg


def test_buildvrt_resolution_modes(tmp_path):
    from gdal_spark.functions.tiff import tiff_encode

    a = np.zeros((10, 10), np.uint8)
    p1 = str(tmp_path / "r1.tif")
    p2 = str(tmp_path / "r2.tif")
    open(p1, "wb").write(tiff_encode(a, geotransform=(0, 1.0, 0, 10, 0, -1.0)))
    open(p2, "wb").write(tiff_encode(a, geotransform=(10, 2.0, 0, 10, 0, -2.0)))
    hi = V.parse_vrt(V.build_vrt([p1, p2], resolution="highest"))
    lo = V.parse_vrt(V.build_vrt([p1, p2], resolution="lowest"))
    av = V.parse_vrt(V.build_vrt([p1, p2], resolution="average"))
    assert hi["gt"][1] == 1.0 and lo["gt"][1] == 2.0 and av["gt"][1] == 1.5


def test_warped_vrt_nodata_mapping():
    """gdal_stats.py test_stats_nan_6/7/8: VRTWarpedDataset read path with
    GenImgProjTransformer + BandMapping src/dst nodata translation +
    INIT_DEST=NO_DATA."""
    assert checksum(_render("nan32_nodata_warp.vrt")[0]) == 874
    assert checksum(_render("nan32_nodata_warp_nan_to_zero.vrt")[0]) == 978
    assert checksum(_render("nan32_nodata_warp_zero_to_nan.vrt")[0]) == 874
