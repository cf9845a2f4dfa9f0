"""RADARSAT-2 (RS2) and Sentinel-1 SAFE wrapper drivers
(frmts/rs2/rs2dataset.cpp, frmts/safe/safedataset.cpp — re-derived).

RS2 facts: product.xml imageAttributes lists one
fullResolutionImageData TIFF per polarisation (the bands) plus
incidence-angle lookup tables; calibrated bands (BETA0/SIGMA0/GAMMA)
compute (DN^2 + lut.offset) / gains[col] as float32; the fake RPC
block maps rationalFunctions children onto the GDAL RPC keys.

SAFE facts: manifest.safe dataObject hrefs give the measurement
TIFFs (band order = manifest order); the gml coordinates of the
frameSet render as the FOOTPRINT metadata item in lon-lat order with
the reference's exact "%s %s,...,%s %s, %s %s" close format.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["rs2_open", "rs2_rpc", "safe_open"]


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def rs2_open(product_xml: str, read, calibration: str | None = None
             ) -> tuple[np.ndarray, dict]:
    """``read(name) -> bytes``. calibration None|'BETA0'|'SIGMA0'|'GAMMA'
    -> float32 (DN^2 + offset) / gains."""
    from gdal_spark.functions.tiff import tiff_parse

    root = ET.fromstring(product_xml)
    poles = []
    luts = {}
    for el in root.iter():
        t = _strip(el.tag)
        if t == "fullResolutionImageData":
            poles.append((el.get("pole", ""), (el.text or "").strip()))
        elif t == "lookupTable":
            luts[el.get("incidenceAngleCorrection", "")] = \
                (el.text or "").strip()
    bands = []
    for _, href in poles:
        arr, _ = tiff_parse(read(href))
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        bands.append(arr)
    out = np.stack(bands, axis=-1) if len(bands) > 1 else bands[0]

    meta: dict = {"poles": [p for p, _ in poles]}
    if calibration:
        lut_name = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
                    "GAMMA": "Gamma"}[calibration]
        lroot = ET.fromstring(read(luts[lut_name]).decode("utf-8",
                                                          "replace"))
        offset = 0.0
        gains = None
        for el in lroot.iter():
            if _strip(el.tag) == "offset":
                offset = float((el.text or "0").strip())
            elif _strip(el.tag) == "gains":
                gains = np.array([float(v) for v in el.text.split()],
                                 np.float32)
        dn = out.astype(np.float32)
        g = gains[: dn.shape[1]] if gains is not None else \
            np.ones(dn.shape[1], np.float32)
        if dn.ndim == 2:
            out = (dn * dn + np.float32(offset)) / g[None, :]
        else:
            out = (dn * dn + np.float32(offset)) / g[None, :, None]
        out = out.astype(np.float32)
        meta["calibration"] = calibration
    return out, meta


_RPC_MAP = {
    "biasError": "ERR_BIAS", "randomError": "ERR_RAND",
    "lineOffset": "LINE_OFF", "pixelOffset": "SAMP_OFF",
    "latitudeOffset": "LAT_OFF", "longitudeOffset": "LONG_OFF",
    "heightOffset": "HEIGHT_OFF", "lineScale": "LINE_SCALE",
    "pixelScale": "SAMP_SCALE", "latitudeScale": "LAT_SCALE",
    "longitudeScale": "LONG_SCALE", "heightScale": "HEIGHT_SCALE",
    "lineNumeratorCoefficients": "LINE_NUM_COEFF",
    "lineDenominatorCoefficients": "LINE_DEN_COEFF",
    "pixelNumeratorCoefficients": "SAMP_NUM_COEFF",
    "pixelDenominatorCoefficients": "SAMP_DEN_COEFF",
}


def rs2_rpc(product_xml: str) -> dict:
    root = ET.fromstring(product_xml)
    rf = None
    for el in root.iter():
        if _strip(el.tag) == "rationalFunctions":
            rf = el
            break
    if rf is None:
        return {}
    out = {}
    for el in rf:
        key = _RPC_MAP.get(_strip(el.tag))
        if key and el.text is not None:
            out[key] = el.text.strip()
    return out


def safe_open(manifest: str, read, swath: str | None = None
              ) -> tuple[np.ndarray, dict]:
    """``read(href) -> bytes`` resolves './'-relative manifest hrefs.
    ``swath`` like 'IW_VH' selects one measurement; default stacks all
    measurements in manifest order."""
    from gdal_spark.functions.tiff import tiff_parse

    root = ET.fromstring(manifest)
    hrefs = []
    for el in root.iter():
        if _strip(el.tag) == "fileLocation":
            href = el.get("href", "")
            if href.endswith((".tiff", ".tif")):
                hrefs.append(href[2:] if href.startswith("./") else href)
    footprint = None
    for el in root.iter():
        if _strip(el.tag) == "coordinates" and el.text:
            v = re.split(r"[,\s]+", el.text.strip())
            if len(v) >= 8:
                footprint = ("POLYGON((%s %s,%s %s,%s %s,%s %s, %s %s))" %
                             (v[1], v[0], v[3], v[2], v[5], v[4],
                              v[7], v[6], v[1], v[0]))
            break

    def swath_of(href: str) -> str:
        name = href.rsplit("/", 1)[-1]
        parts = name.split("-")
        if len(parts) >= 4:
            return (parts[1] + "_" + parts[3]).upper()
        return name.upper()

    selected = hrefs
    if swath is not None:
        selected = [h for h in hrefs if swath_of(h) == swath.upper()]
        if not selected:
            raise ValueError(f"no measurement for swath {swath}")
    bands = []
    names = []
    for href in selected:
        arr, _ = tiff_parse(read(href))
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        bands.append(arr)
        names.append(swath_of(href))
    out = np.stack(bands, axis=-1) if len(bands) > 1 else bands[0]
    meta = {"bands": names}
    if footprint:
        meta["FOOTPRINT"] = footprint
    return out, meta
