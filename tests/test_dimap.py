"""DIMAP / DIMAP2 driver vs the reference autotest
(autotest/gdrivers/dimap.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.dimap import dimap1_open, read_dimap

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D + "/dimap"), reason="reference autotest data missing"
)


def test_dimap_1():
    base = D + "/dimap/"

    def read(name):
        p = os.path.join(base, name)
        if not os.path.exists(p):
            p = os.path.join(D, name)  # rgbsmall.tif lives one level up
        with open(p, "rb") as fh:
            return fh.read()

    arr, meta = dimap1_open(read("METADATA.DIM").decode(), read)
    assert arr.shape[:2] == (6000, 6000)
    assert checksum(arr[:100, :100, 0]) == 21586
    md = meta["metadata"]
    assert md["PROCESSING_LEVEL"] == "1A"
    assert md["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
    gcps = meta["gcps"]
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert gcps[0]["x"] == pytest.approx(4.3641728, abs=2e-7)
    assert gcps[0]["y"] == pytest.approx(44.2082255, abs=2e-7)
    assert gcps[0]["z"] == pytest.approx(0, abs=2e-7)


EXPECTED_MD = {
    "GEOMETRIC_ATTITUDES_USED": "ACCURATE",
    "FACILITY_PROCESSING_CENTER": "PROCESSING_CENTER",
    "GEOMETRIC_VERTICAL_DESC": "REFERENCE3D",
    "EPHEMERIS_ACQUISITION_ORBIT_DIRECTION": "DESCENDING",
    "BAND_MODE": "PX",
    "EPHEMERIS_NADIR_LON": "NADIR_LON",
    "EPHEMERIS_ACQUISITION_ORBIT_NUMBER": "ACQUISITION_ORBIT_NUMBER",
    "SPECTRAL_PROCESSING": "PMS",
    "DATASET_JOB_ID": "JOB_ID",
    "MISSION": "PHR",
    "GEOMETRIC_GROUND_SETTING": "true",
    "GEOMETRIC_VERTICAL_SETTING": "true",
    "DATASET_PRODUCTION_DATE": "PRODUCTION_DATE",
    "DATASET_PRODUCER_CONTACT": "PRODUCER_CONTACT",
    "IMAGING_DATE": "2016-06-17",
    "DATASET_PRODUCER_NAME": "PRODUCER_NAME",
    "GEOMETRIC_GEOMETRIC_PROCESSING": "SENSOR",
    "GEOMETRIC_EPHEMERIS_USED": "CORRECTED",
    "GEOMETRIC_GROUND_DESC": "R3D_ORTHO",
    "DATASET_DELIVERY_TYPE": "DELIVERY_TYPE",
    "PROCESSING_LEVEL": "SENSOR",
    "DATASET_PRODUCER_ADDRESS": "PRODUCER_ADDRESS",
    "DATASET_PRODUCT_CODE": "PRODUCT_CODE",
    "INSTRUMENT_INDEX": "1A",
    "EPHEMERIS_NADIR_LAT": "NADIR_LAT",
    "INSTRUMENT": "PHR",
    "FACILITY_SOFTWARE": "SOFTWARE",
    "IMAGING_TIME": "12:34:56",
    "MISSION_INDEX": "1A",
    "SUN_AZIMUTH": "CENTER_SUN_AZIMUTH",
    "SUN_ELEVATION": "CENTER_SUN_ELEVATION",
    "VIEWING_ANGLE": "CENTER_VIEWING_ANGLE",
    "VIEWING_ANGLE_ACROSS_TRACK": "CENTER_VIEWING_ANGLE_ACROSS_TRACK",
    "VIEWING_ANGLE_ALONG_TRACK": "CENTER_VIEWING_ANGLE_ALONG_TRACK",
    "SATELLITE_ALTITUDE": "CENTER_SATELLITE_ALTITUDE",
    "INCIDENCE_ANGLE": "CENTER_INCIDENCE_ANGLE",
    "INCIDENCE_ANGLE_ACROSS_TRACK": "CENTER_INCIDENCE_ANGLE_ACROSS_TRACK",
    "INCIDENCE_ANGLE_ALONG_TRACK": "CENTER_INCIDENCE_ANGLE_ALONG_TRACK",
    "GSD_ACROSS_TRACK": "CENTER_GSD_ACROSS_TRACK",
    "GSD_ALONG_TRACK": "CENTER_GSD_ALONG_TRACK",
    "IMAGE_ORIENTATION": "CENTER_IMAGE_ORIENTATION",
    "AZIMUTH_ANGLE": "CENTER_AZIMUTH_ANGLE",
    "RADIOMETRIC_RADIOMETRIC_PROCESSING": "BASIC",
    "RADIOMETRIC_INTER_DETECTOR_NORMALIZATION": "false",
    "RADIOMETRIC_DETECTORS_INTERPOLATION": "true",
    "RADIOMETRIC_STRAYLIGHT_CORRECTION": "false",
    "RADIOMETRIC_VCTI_CORRECTION": "false",
    "RADIOMETRIC_INTER_ARRAY_RECONSTRUCTION": "true",
    "RADIOMETRIC_RADIOMETRIC_STRETCH": "false",
    "RADIOMETRIC_OUT_OF_ORDER_THRESHOLD": "0.5",
    "CLOUD_COVERAGE": "2",
    "CLOUD_COVERAGE_UNIT": "percent",
    "SNOW_COVERAGE": "3",
    "SNOW_COVERAGE_UNIT": "percent",
}


@pytest.mark.parametrize("name", [
    "single_component",
    "single_component/VOL_PHR.XML",
    "single_component/DIM_foo.XML",
])
def test_dimap_2_single_component(name):
    arr, meta = read_dimap(os.path.join(D, "dimap2", name))
    assert arr.shape == (30, 20, 4)
    assert checksum(arr[:, :, 0]) == 7024
    assert meta["metadata"] == EXPECTED_MD
    assert meta["imagery"] == {"CLOUDCOVER": "2"}
    rpc = meta["rpc"]
    assert rpc["LINE_OFF"] == "9"
    assert rpc["SAMP_OFF"] == "4"
    assert rpc["LAT_OFF"] == "LAT_OFF"
    assert rpc["HEIGHT_SCALE"] == "HEIGHT_SCALE"
    assert rpc["LINE_NUM_COEFF"] == "".join(
        " LINE_NUM_COEFF_%d" % i for i in range(1, 21))
    assert rpc["SAMP_DEN_COEFF"] == "".join(
        " SAMP_DEN_COEFF_%d" % i for i in range(1, 21))


def test_dimap_2_bundle():
    arr, meta = read_dimap(os.path.join(D, "dimap2", "bundle"))
    assert arr.shape == (30, 20, 4)
    assert checksum(arr[:, :, 0]) == 7024
    assert meta["metadata"]
    assert "rpc" in meta
