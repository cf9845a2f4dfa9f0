"""RCM driver vs the reference autotest (autotest/gdrivers/rcm.py)."""

import os

import numpy as np
import pytest

from gdal_spark.raster.rcm import interpolate_lut, rcm_open

ROOT = "/root/reference/autotest/gdrivers/data/rcm/fake_VV_VH_GRD"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="reference autotest data missing"
)


def test_rcm_open_three_entry_points():
    """test_rcm_open_from_root_dir / _metadata_dir / _product_xml."""
    for p in (ROOT, os.path.join(ROOT, "metadata"),
              os.path.join(ROOT, "metadata", "product.xml")):
        ds = rcm_open(p)
        assert ds.nbands == 2
    ds = rcm_open(os.path.join(ROOT, "metadata", "product.xml"))
    assert (ds.width, ds.height) == (17915, 3297)
    assert ds.dtype_name == "UInt16"
    assert ds.poles == ["VH", "VV"]  # band 1 POLARIMETRIC_INTERP == VH


def test_rcm_metadata():
    ds = rcm_open(ROOT)
    md = ds.metadata()
    expect = {
        "ACQUISITION_START_TIME": "rawDataStartTime",
        "ACQUISITION_TYPE": "Medium Resolution 50m",
        "BEAMS": "beams",
        "BEAM_MODE": "Medium Resolution 50m",
        "BEAM_MODE_DEFINITION_ID": "beamModeDefinitionId",
        "BEAM_MODE_MNEMONIC": "beamModeMnemonic",
        "BITS_PER_SAMPLE": "16",
        "DATA_TYPE": "Integer",
        "FACILITY_IDENTIFIER": "inputDatasetFacilityId",
        "FAR_RANGE_INCIDENCE_ANGLE": "incAngFarRng",
        "FIRST_LINE_TIME": "zeroDopplerTimeFirstLine",
        "GEODETIC_TERRAIN_HEIGHT": "200",
        "LAST_LINE_TIME": "zeroDopplerTimeLastLine",
        "LINE_SPACING": "sampledLineSpacing",
        "LINE_TIME_ORDERING": "Increasing",
        "LUT_APPLIED": "Mixed",
        "NEAR_RANGE_INCIDENCE_ANGLE": "incAngNearRng",
        "ORBIT_DATA_FILE": "orbitDataFileName",
        "ORBIT_DATA_SOURCE": "Downlinked",
        "ORBIT_DIRECTION": "Descending",
        "PER_POLARIZATION_SCALING": "true",
        "PIXEL_SPACING": "sampledPixelSpacing",
        "PIXEL_TIME_ORDERING": "Decreasing",
        "POLARIZATIONS": "VH VV",
        "POLARIZATION_DATA_MODE": "Dual Co/Cross",
        "PROCESSING_FACILITY": "processingFacility",
        "PROCESSING_TIME": "processingTime",
        "PRODUCT_ID": "productId",
        "PRODUCT_TYPE": "GRD",
        "SAMPLED_LINE_SPACING_TIME": "sampledLineSpacingTime",
        "SAMPLED_PIXEL_SPACING_TIME": "sampledPixelSpacingTime",
        "SAMPLE_TYPE": "Magnitude Detected",
        "SATELLITE_HEIGHT": "600000",
        "SATELLITE_IDENTIFIER": "RCM-1",
        "SECURITY_CLASSIFICATION": "Non classifié / Unclassified",
        "SENSOR_IDENTIFIER": "SAR",
        "SLANT_RANGE_FAR_EDGE": "slantRangeFarEdge",
        "SLANT_RANGE_NEAR_EDGE": "slantRangeNearEdge",
    }
    for k, v in expect.items():
        assert md.get(k) == v, (k, md.get(k), v)
    # LUT lists in band (pole VH, VV) order
    assert [os.path.basename(p) for p in md["BETA_NOUGHT_LUT"].split(",")] \
        == ["lutBeta_VH.xml", "lutBeta_VV.xml"]
    assert [os.path.basename(p) for p in md["SIGMA_NOUGHT_LUT"].split(",")] \
        == ["lutSigma_VH.xml", "lutSigma_VV.xml"]
    assert [os.path.basename(p) for p in md["GAMMA_LUT"].split(",")] \
        == ["lutGamma_VH.xml", "lutGamma_VV.xml"]


def test_rcm_rpc_and_gcps():
    ds = rcm_open(ROOT)
    rpc = ds.rpc()
    assert rpc["ERR_BIAS"] == "0"
    assert rpc["LINE_NUM_COEFF"] == "0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0"
    assert len(rpc) == 16
    gcps = ds.gcps()
    assert len(gcps) == 1
    px, ln, lon, lat, hgt = gcps[0]
    assert (px, ln, lon, lat, hgt) == (2.0, 1.0, 2.5, 1.5, 3.5)


def test_rcm_band_and_calibration():
    """Band decode (sparse fake TIFF -> zeros, checksum 0) and the
    detected-product calibration (DN^2 + B) / A with the fixture's
    constant gains=10 LUT."""
    ds = rcm_open(ROOT)
    band = ds.read_band(1)
    assert band.shape == (3297, 17915) and band.dtype == np.uint16
    assert int(band.sum()) == 0  # reference Checksum() == 0

    for calib in ("BETA0", "SIGMA0", "GAMMA", "UNCALIB"):
        dsc = rcm_open(f"RCM_CALIB:{calib}:{ROOT}/metadata/product.xml")
        assert dsc.calibration == calib
    with pytest.raises(ValueError, match="Unsupported calibration type"):
        rcm_open(f"RCM_CALIB:unhandled:{ROOT}/metadata/product.xml")
    with pytest.raises(Exception):
        rcm_open("RCM_CALIB:UNCALIB:i_do_not_exist/product.xml")

    dsc = rcm_open(f"RCM_CALIB:SIGMA0:{ROOT}/metadata/product.xml")
    cal = dsc.read_band(2)  # VV
    assert cal.dtype == np.float32
    # all-zero DN with offset 0 and gains 10 -> all zeros
    assert float(np.abs(cal).max()) == 0.0
    gains, offset = dsc.lut("VV")
    assert offset == 0.0 and gains.shape == (17915,)
    assert np.all(gains == 10.0)


def test_rcm_lut_interpolation():
    """InterpolateValues stepping: positive step interpolates forward,
    negative step walks the gains array backwards."""
    t = interpolate_lut([1.0, 3.0], 8, 4, 2, 0)
    assert np.allclose(t, [1.0, 1.5, 2.0, 2.5, 3.0, 3.0, 3.0, 3.0])
    t = interpolate_lut([1.0, 3.0], 8, -4, 2, 0)
    assert np.allclose(t, [3.0, 2.5, 2.0, 1.5, 1.0, 1.0, 1.0, 1.0])
    t = interpolate_lut([5.0, 6.0, 7.0], 3, 1, 3, 0)
    assert np.allclose(t, [5.0, 6.0, 7.0])
    t = interpolate_lut([5.0, 6.0, 7.0], 3, -1, 3, 2)
    assert np.allclose(t, [7.0, 6.0, 5.0])
