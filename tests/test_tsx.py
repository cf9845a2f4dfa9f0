"""TSX/COSAR drivers (raster/tsx.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.raster.tsx import (
    cosar_decode,
    tsx_georef_gcps,
    tsx_identify,
    tsx_open,
)


def _cosar_bytes(arr: np.ndarray, version: int = 1,
                 rsfv: int | None = None, rslv: int | None = None) -> bytes:
    """Annotated binary matrix: 4 annotation rows then one record per
    line, each RTNB bytes with RSFV/RSLV leading and sample k (1-based)
    at byte (k+1)*4."""
    h, w = arr.shape
    rtnb = (w + 2) * 4
    buf = bytearray(rtnb * (4 + h))
    struct.pack_into(">i", buf, 8, w)
    struct.pack_into(">i", buf, 12, h)
    struct.pack_into(">I", buf, 20, rtnb)
    buf[28:32] = b"CSAR"
    struct.pack_into(">I", buf, 32, version)
    f = rsfv or 1
    l = rslv or w
    for y in range(h):
        base = rtnb * (y + 4)
        struct.pack_into(">I", buf, base, f)
        struct.pack_into(">I", buf, base + 4, l)
        vals = arr[y, f - 1:l]
        if version == 1:
            iq = np.empty((len(vals), 2), ">i2")
        else:
            iq = np.empty((len(vals), 2), ">f2")
        iq[:, 0], iq[:, 1] = vals.real, vals.imag
        off = base + (f + 1) * 4
        buf[off:off + iq.nbytes] = iq.tobytes()
    return bytes(buf)


def test_cosar_cint16():
    rng = np.random.default_rng(2)
    want = (rng.integers(-3000, 3000, (4, 5))
            + 1j * rng.integers(-3000, 3000, (4, 5))).astype(np.complex64)
    got, meta = cosar_decode(_cosar_bytes(want))
    np.testing.assert_array_equal(got, want)
    assert meta["DATA_TYPE"] == "CInt16"


def test_cosar_validity_mask():
    want = (np.arange(20).reshape(4, 5) + 1j).astype(np.complex64)
    got, _ = cosar_decode(_cosar_bytes(want, rsfv=2, rslv=4))
    # outside [RSFV, RSLV] -> zero fill
    assert np.all(got[:, 0] == 0) and np.all(got[:, 4] == 0)
    np.testing.assert_array_equal(got[:, 1:4], want[:, 1:4])


def test_cosar_half_float_v2():
    want = ((np.arange(6).reshape(2, 3) / 4.0)
            + 1j * (np.arange(6).reshape(2, 3) / 8.0)).astype(np.complex64)
    got, meta = cosar_decode(_cosar_bytes(want, version=2))
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert meta["DATA_TYPE"] == "CFloat32"


def test_cosar_rejects():
    with pytest.raises(ValueError):
        cosar_decode(b"\x00" * 64)


def test_tsx_identify():
    assert tsx_identify("TSX1_SAR__SSC_x.xml", b"<level1Product>")
    assert tsx_identify("TDX1_SAR__MGD.xml", b"<level1Product xmlns='x'>")
    assert tsx_identify("PAZ1_SAR__SSC.xml", b"<level1Product>")
    assert not tsx_identify("RS2_product.xml", b"<level1Product>")
    assert not tsx_identify("TSX1_SAR__SSC.xml", b"<product>")


def _product(variant: str, image_files: dict[str, str],
             with_georef: bool) -> str:
    comps = []
    if with_georef:
        comps.append(
            "<component componentClass='auxiliary'><type>GEOREF</type>"
            "<file><location><path>ANNOTATION</path>"
            "<filename>GEOREF.xml</filename></location></file></component>")
    comps.append(
        "<component><type>MAPPING_GRID</type><file><location>"
        "<path>AUXRASTER</path><filename>MAPPING_GRID.bin</filename>"
        "</location></file></component>")
    for pol, fname in image_files.items():
        comps.append(
            f"<imageData layerIndex='1'><polLayer>{pol}</polLayer>"
            f"<file><location><path>IMAGEDATA</path>"
            f"<filename>{fname}</filename></location></file></imageData>")
    return f"""<level1Product>
<productComponents>{''.join(comps)}</productComponents>
<productInfo>
  <missionInfo><orbitCycle>12</orbitCycle><absOrbit>3401</absOrbit>
    <orbitDirection>ASCENDING</orbitDirection></missionInfo>
  <generationInfo><groundOperationsType>PREDEFINED</groundOperationsType>
  </generationInfo>
  <acquisitionInfo><imagingMode>SM</imagingMode></acquisitionInfo>
  <productVariantInfo><productVariant>{variant}</productVariant>
  </productVariantInfo>
  <imageDataInfo><imageDataType>COMPLEX</imageDataType>
    <imageRaster><numberOfRows>3</numberOfRows>
      <numberOfColumns>4</numberOfColumns>
      <rowSpacing>1.9</rowSpacing><columnSpacing>0.9</columnSpacing>
      <azimuthLooks>1</azimuthLooks><rangeLooks>1</rangeLooks>
    </imageRaster></imageDataInfo>
  <sceneInfo>
    <sceneAverageHeight>101.5</sceneAverageHeight>
    <sceneCenterCoord><refRow>2</refRow><refColumn>2</refColumn>
      <lat>45.0</lat><lon>8.0</lon>
      <azimuthTimeUTC>2008-01-01T12:00:00Z</azimuthTimeUTC>
    </sceneCenterCoord>
    <sceneCornerCoord><refRow>1</refRow><refColumn>1</refColumn>
      <lat>44.9</lat><lon>7.9</lon></sceneCornerCoord>
    <sceneCornerCoord><refRow>1</refRow><refColumn>4</refColumn>
      <lat>44.9</lat><lon>8.1</lon></sceneCornerCoord>
  </sceneInfo>
</productInfo>
</level1Product>"""


GEOREF = """<geoReference>
<referenceFrames><sphere><ellipsoidID>WGS84</ellipsoidID>
<semiMajorAxis>6378137.0</semiMajorAxis>
<semiMinorAxis>6356752.3142</semiMinorAxis></sphere></referenceFrames>
<geolocationGrid>
<numberOfGridPoints><total>2</total></numberOfGridPoints>
<gridPoint><col>1</col><row>1</row><lon>7.9</lon><lat>44.9</lat></gridPoint>
<gridPoint><col>4</col><row>3</row><lon>8.1</lon><lat>45.1</lat></gridPoint>
</geolocationGrid></geoReference>"""


def test_tsx_ssc_cosar_bands_and_corner_gcps():
    rng = np.random.default_rng(4)
    pols = {}
    files = {}
    for pol in ("HH", "VV"):
        arr = (rng.integers(-100, 100, (3, 4))
               + 1j * rng.integers(-100, 100, (3, 4))).astype(np.complex64)
        pols[pol] = arr
        files[f"IMAGEDATA/IMAGE_{pol}.cos"] = _cosar_bytes(arr)
    xml = _product("SSC", {p: f"IMAGE_{p}.cos" for p in pols},
                   with_georef=False)
    bands, meta, gcps = tsx_open(
        "TSX1_SAR__SSC_test.xml", xml, lambda p: files.get(p))
    assert [p for p, _ in bands] == ["HH", "VV"]
    for p, a in bands:
        np.testing.assert_array_equal(a, pols[p])
    assert meta["PRODUCT_VARIANT"] == "SSC"
    assert meta["IMAGING_MODE"] == "SM"
    assert meta["MAPPING_GRID"] == "AUXRASTER/MAPPING_GRID.bin"
    # no GEOREF -> corner/centre GCPs with scene average height
    assert len(gcps) == 3
    assert gcps[0]["x"] == 8.0 and gcps[0]["y"] == 45.0
    assert all(g["z"] == 101.5 for g in gcps)


def test_tsx_georef_gcps_priority():
    files = {
        "ANNOTATION/GEOREF.xml": GEOREF.encode(),
        "IMAGEDATA/IMAGE_HH.cos": _cosar_bytes(
            np.zeros((3, 4), np.complex64)),
    }
    xml = _product("SSC", {"HH": "IMAGE_HH.cos"}, with_georef=True)
    bands, meta, gcps = tsx_open(
        "TDX1_SAR__SSC_test.xml", xml, lambda p: files.get(p))
    assert len(gcps) == 2  # georef grid wins over corner coords
    assert gcps[1] == {"id": "1", "pixel": 4.0, "line": 3.0,
                       "x": 8.1, "y": 45.1, "z": 0.0}
    assert meta["ELLIPSOID_ID"] == "WGS84"
    assert meta["SEMI_MAJOR_AXIS"] == 6378137.0


def test_tsx_georef_parse_standalone():
    gcps, meta = tsx_georef_gcps(GEOREF)
    assert len(gcps) == 2
    assert meta["SEMI_MINOR_AXIS"] == pytest.approx(6356752.3142)


def test_tsx_path_traversal_rejected():
    xml = _product("SSC", {"HH": "../../etc/passwd"}, with_georef=False)
    with pytest.raises(ValueError, match="traversal"):
        tsx_open("TSX1_SAR__SSC_t.xml", xml, lambda p: None)
