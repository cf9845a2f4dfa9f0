"""VICAR driver vs the reference autotest (autotest/gdrivers/vicar.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.vicar import (
    vicar_decode, vicar_encode, vicar_label, vicar_prefix_rows,
)

VD = "/root/reference/autotest/gdrivers/data/vicar"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VD), reason="reference autotest data not present"
)


def _read(name):
    with open(os.path.join(VD, name), "rb") as fh:
        return fh.read()


def _cs(arr):
    b1 = arr[:, :, 0] if arr.ndim == 3 else arr
    if np.iscomplexobj(b1):
        # GDALChecksumImage walks complex bands component-interleaved
        inter = np.empty((b1.shape[0], b1.shape[1] * 2))
        inter[:, 0::2] = b1.real
        inter[:, 1::2] = b1.imag
        return checksum(inter)
    return checksum(b1)


@pytest.mark.parametrize(
    "name,dtype,cs",
    [("vicar_byte", np.uint8, 129),
     ("vicar_int16", np.int16, 129),
     ("vicar_bigendian_int16", np.int16, 129),
     ("vicar_int32", np.int32, 129),
     ("vicar_float32_bsq", np.float32, 123),
     ("vicar_float32_bil", np.float32, 123),
     ("vicar_float32_bip", np.float32, 123),
     ("vicar_bigendian_float32", np.float32, 129),
     ("vicar_float64", np.float64, 129),
     ("vicar_cfloat32", np.complex64, 148),
     ("vicar_vax_float32", np.float32, 129),
     ("vicar_vax_float64", np.float64, 129),
     ("vicar_vax_cfloat32", np.complex64, 226)],
)
def test_vicar_read_datatypes(name, dtype, cs):
    arr, _ = vicar_decode(_read(name + ".vic"))
    assert arr.dtype == dtype
    assert _cs(arr) == cs


def test_vicar_1_truncated():
    raw = _read("test_vicar_truncated.bin")
    arr, meta = vicar_decode(raw)
    assert arr.shape == (1000, 400)
    assert meta["gt"] == pytest.approx(
        (-53985.0, 25.0, 0.0, -200805.0, 0.0, -25.0), abs=1e-8)
    assert meta["nodata"] == 0
    assert meta["scale"] == pytest.approx(2.34, abs=1e-5)
    assert meta["offset"] == pytest.approx(4.56, abs=1e-5)
    assert meta["projection"] == "SINUSOIDAL"
    assert meta["target"] == "MARS"

    expected_md = {
        "DLRTO8.REFLECTANCE_OFFSET": "4.56",
        "PRODUCT_TYPE": "IMAGE",
        "M94_ORBIT.STOP_TIME": "stop_time",
        "FILE.EVENT_TYPE": "EVENT_TYPE",
        "M94_CAMERAS.MACROPIXEL_SIZE": "1",
        "M94_INSTRUMENT.DETECTOR_ID": "MEX_HRSC_NADIR",
        "HRORTHO.SPICE_FILE_NAME": "SPICE_FILE_NAME",
        "DLRTO8.RADIANCE_SCALING_FACTOR": "1.23",
        "HRORTHO.GEOMETRIC_CALIB_FILE_NAME": "calib_file_name",
        "HRORTHO.EXTORI_FILE_NAME": "extori'_file_name",
        "M94_INSTRUMENT.MISSION_PHASE_NAME": "MISSION_PHASE_NAME",
        "HRCONVER.MISSING_FRAMES": "0",
        "DLRTO8.RADIANCE_OFFSET": "1.23",
        "HRCONVER.OVERFLOW_FRAMES": "0",
        "SPACECRAFT_NAME": "MARS EXPRESS",
        "HRFOOT.BEST_GROUND_SAMPLING_DISTANCE": "1.23",
        "M94_ORBIT.START_TIME": "start_time",
        "HRORTHO.DTM_NAME": "dtm_name",
        "DLRTO8.REFLECTANCE_SCALING_FACTOR": "2.34",
        "HRCONVER.ERROR_FRAMES": "1",
    }
    assert meta["metadata"] == expected_md

    lbl = meta["label"]
    assert lbl["LBLSIZE"] == 9680
    assert lbl["FORMAT"] == "BYTE"
    assert lbl["PROPERTY"]["M94_ORBIT"]["ASCENDING_NODE_LONGITUDE"] == 118.46
    assert lbl["PROPERTY"]["M94_ORBIT"]["SPACECRAFT_ORIENTATION"] == \
        [0.0, -1.0, 0.0]
    assert lbl["TASK"]["HRORTHO"]["EXTORI_FILE_NAME"] == "extori'_file_name"


def test_vicar_label_eol():
    # vicar_byte has EOL=1: the TASK block lives after the pixels
    lbl = vicar_label(_read("vicar_byte.vic"))
    assert lbl["LBLSIZE"] == 364
    assert "GEN" in lbl.get("TASK", {})


def test_vicar_read_binary_prefix():
    rows = vicar_prefix_rows(_read("vicar_binary_prefix.vic"))
    assert rows == [{
        "short": -32768,
        "int": -2147483648,
        "unsigned_char": 255,
        "float": 1.25,
        "double": 3.25,
        "unsigned_int": 4294967295,
        "unsigned_short": 65535,
    }]


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32,
                                   np.float32, np.float64])
def test_vicar_encode_roundtrip(dtype):
    rng = np.random.RandomState(3)
    arr = (rng.rand(5, 7) * 100).astype(dtype)
    back, meta = vicar_decode(vicar_encode(arr))
    assert np.array_equal(back, arr)
    assert back.dtype == arr.dtype


def test_vicar_encode_multiband_roundtrip():
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    back, _ = vicar_decode(vicar_encode(arr))
    assert np.array_equal(back, arr)
