"""ENVISAT reader (raster/envisat.py) over synthetic PDS fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster.envisat import MPH_SIZE, envisat_open


def _build(product: str, sph_fields: dict, datasets, dsd_size=280) -> bytes:
    """datasets: [(name, dstype, num_dsr, dsr_size, payload bytes)]."""
    num_dsd = len(datasets)
    sph_lines = "".join(f"{k}={v}\n" for k, v in sph_fields.items())
    sph_text = sph_lines.ljust(800)
    sph_size = len(sph_text) + num_dsd * dsd_size

    mph_lines = (
        f'PRODUCT="{product}"\n'
        f"SPH_SIZE=+{sph_size:010d}<bytes>\n"
        f"NUM_DSD=+{num_dsd:010d}\n"
        f"DSD_SIZE=+{dsd_size:010d}<bytes>\n"
        'SOFTWARE_VER="TEST/1.0"\n'
    )
    mph = mph_lines.ljust(MPH_SIZE).encode()

    body = bytearray()
    dsd_texts = []
    base = MPH_SIZE + len(sph_text) + num_dsd * dsd_size
    for name, dstype, num_dsr, dsr_size, payload in datasets:
        off = base + len(body)
        dsd = (f'DS_NAME="{name}"\n'
               f"DS_TYPE={dstype}\n"
               'FILENAME=""\n'
               f"DS_OFFSET=+{off:020d}<bytes>\n"
               f"DS_SIZE=+{len(payload):020d}<bytes>\n"
               f"NUM_DSR=+{num_dsr:010d}\n"
               f"DSR_SIZE=+{dsr_size:010d}<bytes>\n")
        dsd_texts.append(dsd.ljust(dsd_size)[:dsd_size])
        body.extend(payload)
    return (mph + sph_text.encode()
            + "".join(dsd_texts).encode() + bytes(body))


def _records(arr: np.ndarray, dt: str, prefix: int) -> bytes:
    out = bytearray()
    for row in arr:
        out.extend(b"\x00" * prefix)
        out.extend(np.asarray(row).astype(dt).tobytes())
    return bytes(out)


def test_uword_band_with_prefix():
    rng = np.random.default_rng(1)
    want = rng.integers(0, 60000, (5, 8)).astype(np.uint16)
    prefix = 17
    dsr = prefix + 8 * 2
    payload = _records(want, ">u2", prefix)
    blob = _build("MER_RR__1PTEST", {
        "LINE_LENGTH": "+00008<10*p>",
        "DATA_TYPE": "UWORD",
        "SAMPLE_TYPE": "DETECTED",
    }, [("Radiance MDS(1)", "M", 5, dsr, payload)])
    f = envisat_open(blob)
    assert (f.width, f.height) == (8, 5)
    assert f.prefix_bytes == prefix
    np.testing.assert_array_equal(f.read_band(0), want)
    assert f.bands[0]["name"] == "Radiance MDS(1)"
    assert f.metadata()["MPH_PRODUCT"] == "MER_RR__1PTEST"
    assert f.metadata()["SPH_DATA_TYPE"] == "UWORD"


def test_multiple_measurement_bands():
    a = np.arange(12, dtype=np.uint16).reshape(3, 4)
    b = (np.arange(12, dtype=np.uint16) * 3).reshape(3, 4)
    dsr = 10 + 8
    blob = _build("MER_RR__1PTEST", {
        "LINE_LENGTH": "+00004",
        "DATA_TYPE": "UWORD",
        "SAMPLE_TYPE": "DETECTED",
    }, [
        ("MDS1", "M", 3, dsr, _records(a, ">u2", 10)),
        ("ANNOT", "A", 3, dsr, b"\x00" * (3 * dsr)),  # not a band
        ("MDS2", "M", 3, dsr, _records(b, ">u2", 10)),
    ])
    f = envisat_open(blob)
    assert [bd["name"] for bd in f.bands] == ["MDS1", "MDS2"]
    np.testing.assert_array_equal(f.read_band(1), b)


def test_complex_sword():
    want = (np.array([[1, -2], [3, 4]]) + 1j * np.array([[5, 6], [-7, 8]])
            ).astype(np.complex64)
    iq = np.empty((2, 2, 2), ">i2")
    iq[..., 0], iq[..., 1] = want.real, want.imag
    dsr = 12 + 2 * 4
    payload = b"".join(b"\x00" * 12 + iq[y].tobytes() for y in range(2))
    blob = _build("ASA_IMS_1PTEST", {
        "LINE_LENGTH": "+00002",
        "DATA_TYPE": "SWORD",
        "SAMPLE_TYPE": "COMPLEX",
    }, [("SAR MDS", "M", 2, dsr, payload)])
    f = envisat_open(blob)
    np.testing.assert_array_equal(f.read_band(0), want)


def test_ats_toa_width_rule():
    """ATS_TOA_1 products derive width from (dsr_size - 20) / 2."""
    want = np.arange(14, dtype=np.int16).reshape(2, 7) - 5
    dsr = 20 + 7 * 2
    blob = _build("ATS_TOA_1PTEST", {},
                  [("BT MDS", "M", 2, dsr, _records(want, ">i2", 20))])
    f = envisat_open(blob)
    assert f.width == 7
    np.testing.assert_array_equal(f.read_band(0), want)


def test_fallback_8bit():
    want = np.arange(20, dtype=np.uint8).reshape(4, 5)
    blob = _build("XXX_YYY_1PTEST", {},
                  [("RAW", "M", 4, 5, _records(want, "u1", 0))])
    f = envisat_open(blob)
    assert f.width == 5 and f.dtype == "u1"
    np.testing.assert_array_equal(f.read_band(0), want)


def test_rejects_non_envisat():
    with pytest.raises(ValueError):
        envisat_open(b"NOT A PRODUCT" * 100)
