"""Raw-family drivers (LAN/GSC/JDEM/CTG/PAux/DOQ/MFF/MFF2/BT/ZMap/HF2/RST)
vs the reference's own autotest checksums
(autotest/gdrivers/{lan,gsc,jdem,ctg,paux,doq1,doq2,mff,mff2,bt,zmap,hf2,idrisi}.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import rawfmts as RF

GD = "/root/reference/autotest/gdrivers/data"
GCORE = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def _cs(arr):
    return checksum(np.asarray(arr).astype(np.int32))


# -- LAN ----------------------------------------------------------------------

def test_lan_8bit():
    arr, meta = RF.lan_decode(_read(f"{GD}/lan/fakelan.lan"))
    assert _cs(arr if arr.ndim == 2 else arr[:, :, 0]) == 10  # test_lan_1


def test_lan_4bit():
    arr, meta = RF.lan_decode(_read(f"{GD}/lan/fakelan4bit.lan"))
    assert _cs(arr if arr.ndim == 2 else arr[:, :, 0]) == 10  # test_lan_2


# -- GSC ----------------------------------------------------------------------

def test_gsc():
    arr, meta = RF.gsc_decode(_read(f"{GD}/gsc/fakegsc.gsc"))
    assert _cs(arr) == 0  # test_gsc_1


# -- JDEM ---------------------------------------------------------------------

def test_jdem():
    arr, meta = RF.jdem_decode(_read(f"{GD}/jdem/fakejdem.mem"))
    # float32 band: Checksum() goes through the rounding Int32 conversion
    assert checksum(np.floor(arr.astype(np.float64) + 0.5).astype(np.int32)) == 15


# -- CTG ----------------------------------------------------------------------

def test_ctg():
    arr, meta = RF.ctg_decode(_read(f"{GD}/ctg/fake_grid_cell"))
    assert _cs(arr[:, :, 0]) == 21  # test_ctg_1
    assert meta["epsg"] == 32600 + meta["utm_zone"]


# -- PAux ---------------------------------------------------------------------

def test_paux_small16():
    aux = open(f"{GD}/paux/small16.aux").read()
    raw = _read(f"{GD}/paux/small16.raw")
    bands, meta = RF.paux_decode(aux, raw)
    assert len(bands) == 2
    assert _cs(bands[1]) == 12816  # test_paux_1 (band 2)


# -- DOQ1 / DOQ2 --------------------------------------------------------------

def test_doq1_fake_raises():
    with pytest.raises(ValueError):  # test_doq1_1 expects open failure
        RF.doq1_decode(_read(f"{GD}/doq1/fakedoq1.doq"))


def test_doq2():
    arr, meta = RF.doq2_decode(_read(f"{GD}/doq2/C3607614_truncated.NWS"))
    # test_doq2_1: first row of each band in a 500x1 buffer
    assert _cs(arr[:1, :500, 0]) == 4201
    assert _cs(arr[:1, :500, 1]) == 4010
    assert _cs(arr[:1, :500, 2]) == 5820
    gt = meta["gt"]
    assert gt == (377054, 1, 0, 4082205, 0, -1)
    assert meta["QUADRANGLE_NAME"].startswith("NORFOLK SOUTH")


# -- MFF / MFF2 ---------------------------------------------------------------

def test_mff_fake():
    bands, meta = RF.mff_read(
        open(f"{GD}/mff/fakemff.hdr").read(),
        {"b0": _read(f"{GD}/mff/fakemff.b0")},
    )
    assert _cs(bands[0]) == 1  # test_mff_1


def test_mff_fake_tiled():
    bands, meta = RF.mff_read(
        open(f"{GD}/mff/fakemfftiled.hdr").read(),
        {"b0": _read(f"{GD}/mff/fakemfftiled.b0")},
    )
    assert _cs(bands[0]) == 1  # test_mff_2


def test_mff_byte():
    bands, meta = RF.mff_read(
        open(f"{GD}/mff/bytemff.hdr").read(),
        {"b00": _read(f"{GD}/mff/bytemff.b00")},
    )
    assert _cs(bands[0]) == 4672  # test_mff_3


def test_mff2_byte():
    base = f"{GD}/mff2/bytemff2"
    arr, kv = RF.hkv_read(
        open(f"{base}/attrib").read(), _read(f"{base}/image_data")
    )
    assert _cs(arr) == 4672  # test_mff2_1


# -- BT roundtrip -------------------------------------------------------------

def _byte_tif():
    from gdal_spark.functions import tiff
    arr, meta = tiff.tiff_parse(_read(f"{GCORE}/byte.tif"))
    return arr, meta


def test_bt_roundtrip_byte():
    arr, _ = _byte_tif()
    data = RF.bt_encode(arr, (440720, 60, 0, 3751320, 0, -60))
    back, meta = RF.bt_decode(data)
    assert back.dtype == np.int16
    assert _cs(back) == 4672  # test_bt_2 semantics (byte -> int16 copy)
    assert meta["gt"][0] == 440720


def test_bt_roundtrip_float32():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/float32.tif"))
    data = RF.bt_encode(arr.astype(np.float32))
    back, _ = RF.bt_decode(data)
    assert _cs(back) == 4672  # test_bt_3


# -- ZMap roundtrip -----------------------------------------------------------

def test_zmap_roundtrip_byte():
    arr, _ = _byte_tif()
    txt = RF.zmap_encode(arr.astype(np.float64),
                         (440720, 60, 0, 3751320, 0, -60))
    back, meta = RF.zmap_decode(txt)
    assert back.shape == arr.shape
    assert _cs(back) == 4672  # test_zmap_1
    assert meta["nodata"] == pytest.approx(1.0e30)
    assert meta["gt"][0] == pytest.approx(440720)


# -- HF2 ----------------------------------------------------------------------

def test_hf2_roundtrip_byte():
    arr, _ = _byte_tif()
    data = RF.hf2_encode(arr, (440720, 60, 0, 3751320, 0, -60))
    back, meta = RF.hf2_decode(data)
    assert _cs(back) == 4672  # test_hf2_1
    assert meta["gt"][0] == pytest.approx(440720)


def _cs_round(arr):
    """GDAL RasterIO float->Int32 conversion rounds (GDALCopyWord adds
    0.5 before the cast), unlike astype's truncation."""
    a = np.asarray(arr, np.float64)
    return checksum(np.floor(a + 0.5).astype(np.int32))


def test_hf2_roundtrip_float_img():
    # test_hf2_3: hfa/float.img (checksum 23529) through the float path
    from gdal_spark.raster import hfa
    f = hfa.open_hfa(_read(f"{GD}/hfa/float.img"))
    arr = np.asarray(f.read_band(f.layers()[0]), np.float32)
    assert _cs_round(arr) == 23529
    data = RF.hf2_encode(arr)
    back, _ = RF.hf2_decode(data)
    assert _cs_round(back) == 23529


def test_hf2_roundtrip_n43_dted():
    # test_hf2_4: n43.dt0 (checksum 49187) through the int16 path
    from gdal_spark.raster import dted
    res = dted.read_dted(_read(f"{GD}/n43.dt0"))
    arr = np.asarray(res["array"])
    assert _cs(arr) == 49187
    data = RF.hf2_encode(arr.astype(np.int16))
    back, _ = RF.hf2_decode(data)
    assert _cs_round(back) == 49187


def test_hf2_multi_tile():
    rng = np.random.RandomState(7)
    arr = (rng.rand(37, 53) * 1000).astype(np.float32)
    data = RF.hf2_encode(arr, tile=16)
    back, _ = RF.hf2_decode(data)
    assert np.allclose(back, arr, atol=0.011)


# -- Idrisi RST ---------------------------------------------------------------

def test_rst_byte():
    arr, meta = RF.rst_decode(
        open(f"{GD}/rst/byte.rdc").read(), _read(f"{GD}/rst/byte.rst")
    )
    assert _cs(arr) == 5044  # test_idrisi_1


def test_rst_real():
    arr, meta = RF.rst_decode(
        open(f"{GD}/rst/real.rdc").read(), _read(f"{GD}/rst/real.rst")
    )
    assert _cs(arr) == 5275  # test_idrisi_2


def test_rst_roundtrip():
    arr, _ = _byte_tif()
    rdc, body = RF.rst_encode(arr)
    back, meta = RF.rst_decode(rdc, body)
    assert _cs(back) == 4672


# -- EHdr ---------------------------------------------------------------------

def test_ehdr_float32():
    arr, meta = RF.ehdr_decode(
        open(f"{GD}/ehdr/float32.hdr").read(), _read(f"{GD}/ehdr/float32.bil")
    )
    assert arr.dtype == np.float32
    assert _cs_round(arr) == 27  # test_ehdr_4
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_ehdr_10_size_inferred_float():
    arr, meta = RF.ehdr_decode(
        open(f"{GD}/ehdr/ehdr10.hdr").read(), _read(f"{GD}/ehdr/ehdr10.bil")
    )
    assert arr.dtype == np.float32
    assert _cs_round(arr) == 8202  # test_ehdr_10


def test_ehdr_11_flt_ext():
    arr, meta = RF.ehdr_decode(
        open(f"{GD}/ehdr/ehdr11.hdr").read(), _read(f"{GD}/ehdr/ehdr11.flt"),
        ext="flt",
    )
    assert _cs_round(arr) == 8202  # test_ehdr_11


def test_ehdr_roundtrip():
    arr, _ = _byte_tif()
    hdr, body = RF.ehdr_encode(arr, (440720, 60, 0, 3751320, 0, -60))
    back, meta = RF.ehdr_decode(hdr, body)
    assert _cs(back) == 4672
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


# -- FAST ---------------------------------------------------------------------

FD = f"{GD}/fast"


def _fast(hdr_name):
    files = {n: _read(os.path.join(FD, n)) for n in os.listdir(FD)}
    return RF.fast_read(files[hdr_name].decode("ascii", "replace"),
                        files, hdr_name)


def test_fast_hpn_landsat7():
    bands, meta = _fast("L71118038_03820020111_HPN.FST")
    assert len(bands) == 1
    # test_fast_2: band 1 window (0,0,5000,1)
    assert _cs(bands[0][:1, :5000]) == 60323
    # test_fast_3/4 metadata
    assert meta["ACQUISITION_DATE"] == "20020111"
    assert meta["SATELLITE"] == "LANDSAT7"


def test_fast_htm_two_bands():
    bands, meta = _fast("L71230079_07920021111_HTM.FST")
    assert len(bands) == 2
    # test_fast_5: band 2 window (0,0,7000,1) + southern-TM geotransform
    assert _cs(bands[1][:1, :7000]) == 19110
    want = (528417.25, 30.0, 0.0, 7071187.0, 0.0, -30.0)
    assert np.allclose(meta["gt"], want, atol=1e-6)


def test_fast_euromap_liss3():
    bands, meta = _fast("n0o0y867.0fl")
    assert len(bands) == 4
    assert _cs(bands[0][:1, :2741]) == 0  # test_fast_6
    want = (14640936.89174916, 1.008817518246492, 24.9876841746236,
            664274.3912497687, 24.98828832116786, -0.9907878581173808)
    assert np.allclose(meta["gt"], want, atol=1e-6)


def test_fast_euromap_pan():
    bands, meta = _fast("h0o0y867.1ah")
    assert len(bands) == 1
    assert _cs(bands[0][:1, :5815]) == 0  # test_fast_7
    assert np.allclose(meta["gt"], (676565.09, 5, 0, 5348341.5, 0, -5),
                       atol=1e-6)


def test_fast_euromap_wifs():
    bands, meta = _fast("w0y13a4t.010")
    assert len(bands) == 2
    assert _cs(bands[0][:1, :4748]) == 0  # test_fast_8
    want = (-336965.0150603952, 176.0817495260164, -37.35662873563219,
            484122.7765089957, -37.35622603749736, -176.081791954023)
    assert np.allclose(meta["gt"], want, atol=1e-6)
