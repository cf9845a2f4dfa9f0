"""ERS / ROI_PAC / GenBin / RRASTER / SIGDEM vs the reference autotest
(autotest/gdrivers/{ers,roipac,genbin,rraster,sigdem}.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import moreraw as MR

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


def _cs_round(arr):
    a = np.asarray(arr, np.float64)
    return checksum(np.floor(a + 0.5).astype(np.int32))


# -- ERS ----------------------------------------------------------------------

def test_ers_srtm():
    arr, meta = MR.ers_decode(
        open(f"{GD}/ers/srtm.ers").read(), _read(f"{GD}/ers/srtm")
    )
    assert arr.dtype == np.int16
    assert _cs(arr) == 64074  # test_ers_1
    assert meta["nodata"] == 9999.0
    assert meta["datum"] == "WGS84"


def test_ers_dem():
    arr, meta = MR.ers_decode(
        open(f"{GD}/ers/ers_dem.ers").read(), _read(f"{GD}/ers/ers_dem")
    )
    assert arr.dtype == np.float32
    assert _cs_round(arr) == 56588  # test_ers_recode (srs handling test data)
    assert meta["nodata"] == -9999.0


def test_ers_case_insensitive_keys():
    arr, meta = MR.ers_decode(
        open(f"{GD}/ers/caseinsensitive.ers").read(),
        _read(f"{GD}/ers/caseinsensitive"),
    )
    assert arr.size > 0


# -- ROI_PAC ------------------------------------------------------------------

def test_roipac_srtm_dem():
    arr, meta = MR.roipac_decode(
        open(f"{GD}/roipac/srtm.dem.rsc").read(),
        _read(f"{GD}/roipac/srtm.dem"), "dem",
    )
    assert arr.dtype == np.int16
    assert _cs(arr) == 64074  # test_roipac_1
    want = (-180.0083333, 0.0083333333, 0.0, -59.9916667, 0.0, -0.0083333333)
    assert np.allclose(meta["gt"], want, atol=1e-9)
    assert meta["z_scale"] == "2"  # test_roipac_1 metadata


# -- GenBin -------------------------------------------------------------------

def test_genbin():
    arr, meta = MR.genbin_decode(
        open(f"{GD}/genbin/tm4628_96.hdr").read(),
        _read(f"{GD}/genbin/tm4628_96.bil"),
    )
    assert arr.shape[2] == 7
    assert _cs(arr[:1, :500, 0]) == 5738  # test_genbin_1


# -- RRASTER ------------------------------------------------------------------

def test_rraster_byte():
    arr, meta = MR.rraster_decode(
        open(f"{GD}/rraster/byte_rraster.grd").read(),
        _read(f"{GD}/rraster/byte_rraster.gri"),
    )
    assert _cs(arr) == 4672  # test_rraster_1
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_rraster_rgba():
    arr, meta = MR.rraster_decode(
        open(f"{GD}/rraster/rgba_rraster.grd").read(),
        _read(f"{GD}/rraster/rgba_rraster.gri"),
    )
    assert arr.ndim == 3 and arr.shape[2] == 4


def test_rraster_roundtrip():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/byte.tif"))
    grd, gri = MR.rraster_encode(arr, (440720, 60, 0, 3751320, 0, -60))
    back, meta = MR.rraster_decode(grd, gri)
    assert _cs(back) == 4672  # test_rraster_2 CreateCopy semantics
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


# -- SIGDEM -------------------------------------------------------------------

def test_sigdem_roundtrip_byte():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/byte.tif"))
    data = MR.sigdem_encode(arr.astype(np.float64),
                            (440720, 60, 0, 3751320, 0, -60))
    back, meta = MR.sigdem_decode(data)
    assert _cs_round(back) == 4672  # test_sigdem_open / CreateCopy
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_sigdem_nodata():
    a = np.array([[1.5, np.nan], [2.25, 3.0]])
    back, meta = MR.sigdem_decode(MR.sigdem_encode(a))
    assert np.isnan(back[0, 1])
    assert back[0, 0] == pytest.approx(1.5)
    assert back[1, 0] == pytest.approx(2.25)


# -- GTX / BYN / ISG (vertical & geoid grids) ----------------------------------

def test_gtx():
    arr, meta = MR.gtx_decode(_read(f"{GD}/gtx/hydroc1.gtx"))
    assert checksum(arr) == 64183  # test_gtx_1
    assert meta["nodata"] == pytest.approx(-88.8888)


@pytest.mark.parametrize("name", [
    "cgg2013ai08_reduced.byn", "test_invalid_header_bytes.byn",
])
def test_byn(name):
    arr, meta = MR.byn_decode(_read(f"{GD}/byn/{name}"))
    assert _cs(arr) == 64764  # test_byn_1 / test_byn_invalid_header


def test_isg():
    arr, meta = MR.isg_decode(open(f"{GD}/isg/test.isg").read())
    assert checksum(arr) == 159  # test_isg_1
    assert arr.shape == (4, 6)
    assert meta["nodata"] == -9999.0


# -- KRO roundtrips -------------------------------------------------------------

def test_kro_uint16_roundtrip():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/uint16.tif"))
    back, meta = MR.kro_decode(MR.kro_encode(arr.astype(np.uint16)))
    assert _cs(back) == 4672  # test_kro_2


def test_kro_float32_roundtrip():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/float32.tif"))
    back, meta = MR.kro_decode(MR.kro_encode(arr.astype(np.float32)))
    assert checksum(back) == 4672  # test_kro_3


def test_kro_rgb():
    from gdal_spark.functions import tiff
    arr, _ = tiff.tiff_parse(_read(f"{GCORE}/rgbsmall.tif"))
    back, meta = MR.kro_decode(MR.kro_encode(arr.astype(np.uint8)))
    assert _cs(back[:, :, 1]) == 21053  # test_kro_1 band 2


# -- ACE2 / SNODAS / NDF --------------------------------------------------------

def test_ace2_synthetic():
    # test_ace2: /vsimem zero-filled 45N015E_5M.ACE2
    arr, meta = MR.ace2_decode(b"\x00" * (180 * 180 * 4), "45N015E_5M.ACE2")
    assert checksum(arr) == 0
    want = (15.0, 0.08333333333333333, 0.0, 60.0, 0.0, -0.08333333333333333)
    assert np.allclose(meta["gt"], want)


def test_snodas():
    arr, meta = MR.snodas_decode(
        open(f"{GD}/snodas/fake_snodas.hdr").read(),
        _read(f"{GD}/snodas/fake_snodas.dat"),
    )
    assert arr.shape == (3351, 6935)
    assert _cs(arr[:1, :]) == 0  # test_snodas_1 (placeholder .dat)
    assert meta["nodata"] == -9999.0
    assert meta["datafile"] == "fake_snodas.dat"


def test_ndf():
    files = {"LE7134052000500350.I8": _read(f"{GD}/ndf/LE7134052000500350.I8")}
    bands, kv = MR.ndf_read(
        open(f"{GD}/ndf/LE7134052000500350.H3").read(), files
    )
    assert _cs(bands[0][:1, :15620]) == 6510  # test_ndf_1 window


# -- NWT_GRD --------------------------------------------------------------------

def test_nwt_grd():
    arr, meta = MR.nwt_grd_decode(_read(f"{GD}/nwt_grd/nwt_grd.grd"))
    # test_nwt_grd_1: bands 1-3 are the color-ramp planes, band 4 is Z
    assert _cs(arr[:, :, 0]) == 28093
    assert _cs(arr[:, :, 1]) == 33690
    assert _cs(arr[:, :, 2]) == 20365
    assert checksum(meta["z"]) == 25856


# -- LCP (FARSITE) --------------------------------------------------------------

def test_lcp_utm12():
    arr, meta = MR.lcp_decode(_read(f"{GD}/lcp/test_FARSITE_UTM12.LCP"))
    assert arr.shape[2] == 8  # crown fuels, no ground fuels
    want_cs = [18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]
    for i, cs in enumerate(want_cs):
        assert _cs(arr[:, :, i]) == cs, f"band {i + 1}"
    assert meta["LATITUDE"] == "49"
    assert meta["LINEAR_UNIT"] == "Meters"
    want_gt = (285807.932887174887583, 30, 0, 5379230.386217921040952, 0, -30)
    assert np.allclose(meta["gt"], want_gt, atol=1e-5)
    b = meta["bands"]
    assert b[0]["ELEVATION_MIN"] == "1064"
    assert b[0]["ELEVATION_MAX"] == "1492"
    assert b[1]["SLOPE_UNIT_NAME"] == "Degrees"
    assert b[2]["ASPECT_UNIT_NAME"] == "Azimuth degrees"
    assert b[3]["FUEL_MODEL_VALUES"] == "1,2,5,8,10,99"
    assert b[4]["CANOPY_COV_UNIT_NAME"] == "Categories (0-4)"
    assert b[6]["CBH_UNIT_NAME"] == "Meters x 10"
    assert b[7]["CBD_UNIT_NAME"] == "kg/m^3 x 100"
    assert b[7]["CBD_FILE"] == "cbd.asc"


def test_lcp_alb83():
    arr, meta = MR.lcp_decode(_read(f"{GD}/lcp/test_USGS_LFNM_Alb83.lcp"))
    assert arr.shape[2] == 8
    want_cs = [28381, 25824, 28413, 19052, 30164, 22316, 30575, 23304]
    for i, cs in enumerate(want_cs):
        assert _cs(arr[:, :, i]) == cs, f"band {i + 1}"
    assert meta["LATITUDE"] == "48"
    assert np.allclose(meta["gt"], (-1328145, 30, 0, 2961735, 0, -30))


# -- NWT_GRC (Northwood classified) ----------------------------------------------

def test_nwt_grc():
    data = _read(f"{GD}/nwt_grc/nwt_grc.grc")
    idx, meta = MR.nwt_grc_decode(data)
    # autotest/gdrivers/nwt_grc.py test_nwt_grc_1: band 1 checksum 46760
    assert idx.dtype == np.uint8
    assert _cs(idx) == 46760
    assert meta["categories"][:4] == ["No Data", "one", "two", "thre"]
    assert meta["color_table"][0] == (255, 255, 255, 0)
    assert meta["color_table"][1][3] == 255
    assert meta["nodata"] == 0.0
    assert meta["mi_coordsys"].startswith("CoordSys Earth Projection 1")


def test_identify_nwt():
    from gdal_spark.sources.identify import identify_driver

    grc = _read(f"{GD}/nwt_grc/nwt_grc.grc")[:1024]
    assert identify_driver(grc, "nwt_grc.grc") == "NWT_GRC"
    grd = _read(f"{GD}/nwt_grd/nwt_grd.grd")[:1024]
    assert identify_driver(grd, "nwt_grd.grd") == "NWT_GRD"
