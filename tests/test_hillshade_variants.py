"""gdaldem hillshade variants (combined / multidirectional / igor) and the
ZevenbergenThorne gradient, against analytic flat-plane values and a
literal scalar transcription of the reference per-pixel loops
(apps/gdaldem_lib.cpp GDALHillshade*Alg)."""

import math

import numpy as np
import pytest

from gdal_spark.raster import kernels as K


def _pad_win(dem, yy, xx):
    """afWin[0..8] with edge replication, reference window order."""
    h, w = dem.shape
    win = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win.append(dem[min(max(yy + dy, 0), h - 1), min(max(xx + dx, 0), w - 1)])
    return win


def _scalar_standard(dem, xres, yres, az_deg, alt_deg, alg):
    """Line-by-line transcription of GDALHillshadeAlg + Gradient::calc."""
    out = np.zeros(dem.shape)
    az, alt = math.radians(az_deg), math.radians(alt_deg)
    for yy in range(dem.shape[0]):
        for xx in range(dem.shape[1]):
            w = _pad_win(dem, yy, xx)
            nsres = -yres  # north-up geotransform: adfGeoTransform[5] < 0
            if alg == "horn":
                x = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) / (8 * xres)
                y = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])) / (8 * nsres)
            else:
                x = (w[3] - w[5]) / (2 * xres)
                y = (w[7] - w[1]) / (2 * nsres)
            num = math.sin(alt) - (
                y * math.cos(az) * math.cos(alt) - x * math.sin(az) * math.cos(alt)
            )
            cang = num / math.sqrt(1 + x * x + y * y)
            out[yy, xx] = 1.0 if cang <= 0 else 1.0 + 254.0 * cang
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def dem():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:20, 0:24].astype(np.float64)
    return 10.0 * np.sin(xx / 3.0) * np.cos(yy / 4.0) + rng.uniform(0, 0.5, (20, 24))


class TestFlatPlane:
    def test_flat_values(self):
        flat = np.full((8, 8), 100.0)
        assert (K.hillshade_ex(flat, variant="standard") == 181).all()  # 1+254*sin45
        assert (K.hillshade_ex(flat, variant="combined") == 255).all()  # no slope
        assert (K.hillshade_ex(flat, variant="multidirectional") == 181).all()
        assert (K.hillshade_ex(flat, variant="igor") == 255).all()

    def test_plane_equal_horn_zt(self):
        yy, xx = np.mgrid[0:10, 0:12].astype(np.float64)
        plane = 0.3 * xx - 0.2 * yy
        for v in ("standard", "combined", "multidirectional", "igor"):
            a = K.hillshade_ex(plane, variant=v, alg="horn")[1:-1, 1:-1]
            b = K.hillshade_ex(plane, variant=v, alg="zevenbergen-thorne")[1:-1, 1:-1]
            np.testing.assert_array_equal(a, b)


class TestLightDirection:
    def test_nw_facing_brighter_at_315(self):
        yy, xx = np.mgrid[0:16, 0:16].astype(np.float64)
        to_nw = 0.5 * (xx + yy)  # downslope toward NW -> faces the light
        to_se = -to_nw
        for v in ("standard", "combined", "multidirectional", "igor"):
            bright = K.hillshade_ex(to_nw, variant=v).astype(float)[4:-4, 4:-4].mean()
            dark = K.hillshade_ex(to_se, variant=v).astype(float)[4:-4, 4:-4].mean()
            assert bright > dark + 20, v


class TestScalarTranscription:
    @pytest.mark.parametrize("alg", ["horn", "zevenbergen-thorne"])
    @pytest.mark.parametrize("xres,yres", [(1.0, 1.0), (2.5, 1.5)])
    def test_standard_matches(self, dem, alg, xres, yres):
        got = K.hillshade_ex(dem, xres, yres, variant="standard", alg=alg)
        want = _scalar_standard(dem, xres, yres, 315.0, 45.0, alg)
        np.testing.assert_array_equal(got, want)

    def test_zfactor_equals_premultiplied_dem(self, dem):
        a = K.hillshade_ex(dem, zfactor=3.0, variant="combined")
        b = K.hillshade_ex(dem * 3.0, variant="combined")
        np.testing.assert_array_equal(a, b)


class TestRanges:
    def test_output_ranges(self, dem):
        for v in ("standard", "combined", "multidirectional"):
            out = K.hillshade_ex(dem, variant=v)
            assert out.min() >= 1 and out.max() <= 255, v
        igor = K.hillshade_ex(dem, variant="igor")
        assert igor.min() >= 0 and igor.max() <= 255

    def test_unknown_variant_raises(self, dem):
        with pytest.raises(ValueError):
            K.hillshade_ex(dem, variant="bogus")
        with pytest.raises(ValueError):
            K.hillshade_ex(dem, alg="bogus")
