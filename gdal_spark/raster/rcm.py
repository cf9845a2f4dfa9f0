"""RCM (RADARSAT Constellation Mission) driver.

Re-expresses frmts/rcm/rcmdataset.cpp: product.xml discovery from the
product root / metadata dir / product.xml path, band order following
radarParameters/polarizations with one GeoTIFF per pole (ipdf
elements), the RCM_* metadata field mapping, rationalFunctions ->
GDAL RPC keys, geolocationGrid tie points -> GCPs (EPSG:4326), the
calibration LUT interpolation of rcmdataset.cpp InterpolateValues
(positive/negative stepSize, per-column gains across the full range
width), and the detected/complex calibration formulas
(RCM-SP-53-0419: calibrated = (DN^2 + B) / A, complex =
(I^2+Q^2)/A^2).

Spark shape: each pole's GeoTIFF decodes independently (binary column
per scene, Arrow-batched), so a constellation archive parallelises per
scene x pole with no shared state.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["rcm_identify_path", "rcm_open", "RCMProduct"]

_CALIB_TYPES = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
                "GAMMA": "Gamma", "UNCALIB": None}


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_text(root, name: str, default: str = "") -> str:
    for el in root.iter():
        if _strip(el.tag) == name:
            return (el.text or "").strip()
    return default


def rcm_identify_path(path: str) -> str | None:
    """RCMDatasetIdentify: product root dir, metadata dir, or product.xml."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "metadata", "product.xml")):
            return os.path.join(path, "metadata", "product.xml")
        if os.path.exists(os.path.join(path, "product.xml")):
            return os.path.join(path, "product.xml")
        return None
    if os.path.basename(path).lower() == "product.xml":
        try:
            head = open(path, "rb").read(1024)
        except OSError:
            return None
        if b"rcmGsProductSchema" in head:
            return path
    return None


def interpolate_lut(values: list[float], table_size: int, step_size: int,
                    number_of_values: int, pixel_first_lut_value: int
                    ) -> np.ndarray:
    """rcmdataset.cpp InterpolateValues — exact port of the stepping."""
    table = np.zeros(table_size, np.float64)
    k = 0
    if step_size <= 0:
        step = abs(step_size)
        if step == 1:
            for i in range(pixel_first_lut_value, -1, -1):
                if k >= table_size:
                    break
                table[k] = values[i]
                k += 1
        else:
            for i in range(number_of_values - 1, -1, -1):
                value_from = values[i]
                value_to = values[i - 1] if i > 0 else value_from
                interp = (value_to - value_from) / step
                if k < table_size:
                    table[k] = value_from
                    k += 1
                for _ in range(step - 1):
                    value_from += interp
                    if k < table_size:
                        table[k] = value_from
                        k += 1
    else:
        if step_size == 1:
            n = min(number_of_values, table_size)
            table[:n] = values[:n]
        else:
            for i in range(number_of_values):
                value_from = values[i]
                value_to = values[i + 1] if i < number_of_values - 1 \
                    else value_from
                interp = (value_to - value_from) / step_size
                if k < table_size:
                    table[k] = value_from
                    k += 1
                for _ in range(step_size - 1):
                    value_from += interp
                    if k < table_size:
                        table[k] = value_from
                        k += 1
    return table


def read_lut(lut_xml: bytes | str) -> tuple[np.ndarray, float]:
    """RCMCalibRasterBand::ReadLUT — returns (per-column gains, offset)."""
    root = ET.fromstring(lut_xml)
    offset = float(_find_text(root, "offset", "0") or 0)
    first = int(_find_text(root, "pixelFirstLutValue", "0") or 0)
    step = int(_find_text(root, "stepSize", "0") or 0)
    nvals = int(_find_text(root, "numberOfValues", "0") or 0)
    gains = [float(v) for v in _find_text(root, "gains", "").split()]
    if step == 0 or nvals == 0:
        raise ValueError("bad values of stepSize / numberOfValues")
    table_size = abs(step) * abs(nvals)
    return interpolate_lut(gains, table_size, step, nvals, first), offset


# metadata key -> product.xml element name (rcmdataset.cpp Open)
_MD_FIELDS = {
    "ACQUISITION_START_TIME": "rawDataStartTime",
    "ACQUISITION_TYPE": "acquisitionType",
    "BEAMS": "beams",
    "BEAM_MODE": "beamMode",
    "BEAM_MODE_DEFINITION_ID": "beamModeDefinitionId",
    "BEAM_MODE_MNEMONIC": "beamModeMnemonic",
    "BITS_PER_SAMPLE": "bitsPerSample",
    "DATA_TYPE": "dataType",
    "FACILITY_IDENTIFIER": "inputDatasetFacilityId",
    "FAR_RANGE_INCIDENCE_ANGLE": "incAngFarRng",
    "FIRST_LINE_TIME": "zeroDopplerTimeFirstLine",
    "GEODETIC_TERRAIN_HEIGHT": "geodeticTerrainHeight",
    "LAST_LINE_TIME": "zeroDopplerTimeLastLine",
    "LINE_SPACING": "sampledLineSpacing",
    "LINE_TIME_ORDERING": "lineTimeOrdering",
    "LUT_APPLIED": "lutApplied",
    "NEAR_RANGE_INCIDENCE_ANGLE": "incAngNearRng",
    "ORBIT_DATA_FILE": "orbitDataFileName",
    "ORBIT_DATA_SOURCE": "orbitDataSource",
    "ORBIT_DIRECTION": "passDirection",
    "PER_POLARIZATION_SCALING": "perPolarizationScaling",
    "PIXEL_SPACING": "sampledPixelSpacing",
    "PIXEL_TIME_ORDERING": "pixelTimeOrdering",
    "POLARIZATIONS": "polarizations",
    "POLARIZATION_DATA_MODE": "polarizationDataMode",
    "PROCESSING_FACILITY": "processingFacility",
    "PROCESSING_TIME": "processingTime",
    "PRODUCT_ID": "productId",
    "PRODUCT_TYPE": "productType",
    "SAMPLED_LINE_SPACING_TIME": "sampledLineSpacingTime",
    "SAMPLED_PIXEL_SPACING_TIME": "sampledPixelSpacingTime",
    "SAMPLE_TYPE": "sampleType",
    "SATELLITE_HEIGHT": "satelliteHeight",
    "SATELLITE_IDENTIFIER": "satellite",
    "SECURITY_CLASSIFICATION": "securityClassification",
    "SENSOR_IDENTIFIER": "sensor",
    "SLANT_RANGE_FAR_EDGE": "slantRangeFarEdge",
    "SLANT_RANGE_NEAR_EDGE": "slantRangeNearEdge",
}

# rationalFunctions child -> RPC key
_RPC_MAP = [
    ("biasError", "ERR_BIAS"),
    ("randomError", "ERR_RAND"),
    ("lineOffset", "LINE_OFF"),
    ("pixelOffset", "SAMP_OFF"),
    ("latitudeOffset", "LAT_OFF"),
    ("longitudeOffset", "LONG_OFF"),
    ("heightOffset", "HEIGHT_OFF"),
    ("lineScale", "LINE_SCALE"),
    ("pixelScale", "SAMP_SCALE"),
    ("latitudeScale", "LAT_SCALE"),
    ("longitudeScale", "LONG_SCALE"),
    ("heightScale", "HEIGHT_SCALE"),
    ("lineNumeratorCoefficients", "LINE_NUM_COEFF"),
    ("lineDenominatorCoefficients", "LINE_DEN_COEFF"),
    ("pixelNumeratorCoefficients", "SAMP_NUM_COEFF"),
    ("pixelDenominatorCoefficients", "SAMP_DEN_COEFF"),
]


class RCMProduct:
    """Parsed RCM product: size, band poles, metadata, GCPs, RPC, and
    per-pole decode with optional calibration."""

    def __init__(self, product_xml_path: str, calibration: str | None = None):
        if calibration is not None and calibration not in _CALIB_TYPES:
            raise ValueError(f"Unsupported calibration type: {calibration}")
        self.path = product_xml_path
        self.calibration = calibration
        self.metadata_dir = os.path.dirname(product_xml_path)
        root = ET.fromstring(open(product_xml_path, "rb").read())
        self._root = root
        self.width = int(_find_text(root, "samplesPerLine", "0") or 0)
        self.height = int(_find_text(root, "numLines", "0") or 0)
        self.poles = _find_text(root, "polarizations").split()
        bits = int(_find_text(root, "bitsPerSample", "16") or 16)
        dtype = _find_text(root, "dataType", "Integer")
        if dtype.startswith("Complex"):
            self.dtype_name = "CInt16" if bits <= 16 else "CFloat32"
        elif dtype.startswith("Float") or bits == 32:
            self.dtype_name = "Float32"
        else:
            self.dtype_name = "UInt16" if bits > 8 else "Byte"
        if calibration in ("BETA0", "SIGMA0", "GAMMA"):
            self.dtype_name = "Float32"
        # per-pole imagery hrefs (ipdf, relative to the metadata dir)
        self._ipdf = {}
        for el in root.iter():
            if _strip(el.tag) == "ipdf":
                self._ipdf[el.get("pole", "")] = (el.text or "").strip()
        # per-pole per-type calibration LUT files
        self._luts: dict[tuple[str, str], str] = {}
        for el in root.iter():
            if _strip(el.tag) == "lookupTableFileName":
                key = (el.get("sarCalibrationType", ""), el.get("pole", ""))
                self._luts[key] = (el.text or "").strip()

    @property
    def nbands(self) -> int:
        return len(self.poles)

    def metadata(self) -> dict:
        md = {}
        for key, tag in _MD_FIELDS.items():
            v = _find_text(self._root, tag)
            if v:
                md[key] = v
        # LUT path lists in band (pole) order, comma-joined
        for kind, key in (("Beta Nought", "BETA_NOUGHT_LUT"),
                          ("Sigma Nought", "SIGMA_NOUGHT_LUT"),
                          ("Gamma", "GAMMA_LUT")):
            paths = [
                os.path.join(self.metadata_dir, "calibration",
                             self._luts[(kind, pole)])
                for pole in self.poles if (kind, pole) in self._luts
            ]
            if paths:
                md[key] = ",".join(paths)
        return md

    def rpc(self) -> dict:
        rf = None
        for el in self._root.iter():
            if _strip(el.tag) == "rationalFunctions":
                rf = el
                break
        if rf is None:
            return {}
        child = {_strip(c.tag): (c.text or "").strip() for c in rf}
        return {key: child[tag] for tag, key in _RPC_MAP if tag in child}

    def gcps(self) -> list[tuple[float, float, float, float, float]]:
        """(pixel, line, lon, lat, height) per geolocationGrid tie point."""
        out = []
        for el in self._root.iter():
            if _strip(el.tag) != "imageTiePoint":
                continue
            vals = {_strip(c.tag): (c.text or "").strip()
                    for sub in el for c in sub}
            out.append((
                float(vals.get("pixel", 0)), float(vals.get("line", 0)),
                float(vals.get("longitude", 0)), float(vals.get("latitude", 0)),
                float(vals.get("height", 0)),
            ))
        return out

    def lut(self, pole: str) -> tuple[np.ndarray, float]:
        kind = _CALIB_TYPES[self.calibration]
        rel = self._luts[(kind, pole)]
        p = os.path.join(self.metadata_dir, "calibration", rel)
        return read_lut(open(p, "rb").read())

    def read_band(self, band: int) -> np.ndarray:
        """1-based band; decodes the pole's GeoTIFF and applies the
        calibration formula when a calibration type was requested."""
        from gdal_spark.functions.tiff import tiff_parse

        pole = self.poles[band - 1]
        href = self._ipdf[pole]
        p = os.path.normpath(os.path.join(self.metadata_dir, href))
        arr, _ = tiff_parse(open(p, "rb").read())
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        if self.calibration in (None, "UNCALIB"):
            return arr
        gains, offset = self.lut(pole)
        a = gains[: arr.shape[1]].astype(np.float32)
        if np.iscomplexobj(arr):
            dn = (arr.real.astype(np.float32) ** 2
                  + arr.imag.astype(np.float32) ** 2)
            return dn / (a[None, :] ** 2)
        dn = arr.astype(np.float32)
        return (dn * dn + np.float32(offset)) / a[None, :]


def rcm_open(path: str, calibration: str | None = None) -> RCMProduct:
    """Open from product root dir, metadata dir, product.xml, or the
    RCM_CALIB:<TYPE>:<path> subdataset syntax."""
    if path.startswith("RCM_CALIB:"):
        _, calib, rest = path.split(":", 2)
        calib = calib.upper()
        if calib not in _CALIB_TYPES:
            raise ValueError(f"Unsupported calibration type: {calib}")
        return rcm_open(rest, calibration=calib)
    if os.path.isdir(path):
        xml = rcm_identify_path(path)
        if xml is None and os.path.basename(path) == "metadata":
            cand = os.path.join(path, "product.xml")
            xml = cand if os.path.exists(cand) else None
        if xml is None:
            raise ValueError(f"not an RCM product: {path}")
        return RCMProduct(xml, calibration)
    xml = rcm_identify_path(path)
    if xml is None:
        raise ValueError(f"not an RCM product: {path}")
    return RCMProduct(xml, calibration)
