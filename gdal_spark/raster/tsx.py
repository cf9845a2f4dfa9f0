"""TerraSAR-X / TanDEM-X / PAZ product + COSAR imagery drivers
(frmts/tsx/tsxdataset.cpp, frmts/cosar/cosar_dataset.cpp — re-derived,
no code copied).

TSX products are a level1Product XML naming per-polarization imagery
components (GeoTIFF for detected MGD/GEC/EEC variants, COSAR .cos for
SSC slant-range complex), a GEOREF.XML geolocation grid and a mapping
grid. Identify requires a TSX1_SAR / TDX1_SAR / PAZ1_SAR basename and
the <level1Product root (tsxdataset.cpp:246-290).

COSAR is an annotated binary matrix: big-endian header with range
samples at byte 8, azimuth samples at 12, rangeline-total-bytes (RTNB)
at 20, "CSAR" magic at 28 and version at 32 (1 = CInt16 COSAR,
2 = half-float COSSC). Line y starts at RTNB*(y+4) — four annotation
rows lead the file — and opens with the 1-based Range Sample First/
Last Valid indices; sample k of a line sits at byte (k+1)*4 of its
record, everything outside [RSFV, RSLV] is zero fill
(cosar_dataset.cpp:71-143).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["cosar_decode", "tsx_identify", "tsx_open", "tsx_georef_gcps"]


# --------------------------------------------------------------- COSAR

def cosar_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """COSAR/COSSC annotated binary matrix -> (complex array, meta)."""
    if len(data) < 36 or data[28:32] != b"CSAR":
        raise ValueError("not a COSAR file (CSAR magic missing)")
    be = lambda o: int.from_bytes(data[o:o + 4], "big")
    version = be(32)
    if version not in (1, 2):
        raise ValueError(f"COSAR: unsupported version {version}")
    w = be(8)
    h = be(12)
    rtnb = be(20)
    if w <= 0 or h <= 0:
        raise ValueError("COSAR: invalid dimensions")

    out = np.zeros((h, w), np.complex64)
    for y in range(h):
        base = rtnb * (y + 4)
        rsfv = be(base)
        rslv = be(base + 4)
        if (rslv < rsfv or rsfv == 0 or rslv == 0 or rsfv - 1 >= w
                or rslv - 1 >= w or rsfv >= rtnb or rslv > rtnb):
            raise ValueError("COSAR: RSLV/RSFV values are not sane")
        n = rslv - rsfv + 1
        off = base + (rsfv + 1) * 4
        if version == 1:
            iq = np.frombuffer(data, ">i2", 2 * n, off).astype(np.float32)
        else:
            iq = np.frombuffer(data, ">f2", 2 * n, off).astype(np.float32)
        out[y, rsfv - 1:rslv] = iq[0::2] + 1j * iq[1::2]
    meta = {
        "VERSION": version,
        "RTNB": rtnb,
        "DATA_TYPE": "CInt16" if version == 1 else "CFloat32",
    }
    return out, meta


# ----------------------------------------------------------------- TSX

def tsx_identify(filename: str, head: bytes = b"") -> bool:
    base = filename.rsplit("/", 1)[-1].upper()
    if not (base.startswith("TSX1_SAR") or base.startswith("TDX1_SAR")
            or base.startswith("PAZ1_SAR")):
        return False
    return head.lstrip()[:14].lower() == b"<level1product" or not head


def _xget(node, path: str, default: str = "unknown") -> str:
    cur = node
    for part in path.split("."):
        if cur is None:
            return default
        cur = cur.find(part)
    if cur is None or cur.text is None:
        return default
    return cur.text.strip()


def tsx_georef_gcps(georef_xml: str) -> tuple[list[dict], dict]:
    """GEOREF.XML geolocation grid -> (gcps, ellipsoid metadata)
    (tsxdataset.cpp getGCPsFromGEOREF_XML)."""
    root = ET.fromstring(georef_xml)
    meta: dict = {}
    sphere = root.find("referenceFrames/sphere")
    if sphere is not None:
        meta["ELLIPSOID_ID"] = _xget(sphere, "ellipsoidID", "")
        meta["SEMI_MAJOR_AXIS"] = float(_xget(sphere, "semiMajorAxis", "0"))
        meta["SEMI_MINOR_AXIS"] = float(_xget(sphere, "semiMinorAxis", "0"))
    grid = root.find("geolocationGrid")
    gcps: list[dict] = []
    if grid is not None:
        for pt in grid.iter("gridPoint"):
            vals = {}
            ok = True
            for key in ("col", "row", "lon", "lat"):
                el = pt.find(key)
                if el is None or el.text is None:
                    ok = False
                    break
                vals[key] = float(el.text)
            if not ok:
                continue
            gcps.append({
                "id": str(len(gcps)),
                "pixel": vals["col"],
                "line": vals["row"],
                "x": vals["lon"],
                "y": vals["lat"],
                "z": 0.0,
            })
    return gcps, meta


def tsx_open(main_xml_name: str, xml_text: str, read
             ) -> tuple[list[tuple[str, np.ndarray]], dict, list[dict]]:
    """Open a TSX/TDX/PAZ product. ``read(relpath) -> bytes | None``
    resolves product components relative to the main XML's directory.

    Returns (bands as (POL, array), metadata, GCPs). GCPs come from
    GEOREF.XML when present, else (SSC only) from the scene corner and
    centre coordinates with the scene average height
    (tsxdataset.cpp:684-760).
    """
    if not tsx_identify(main_xml_name, xml_text.lstrip()[:20].encode()):
        raise ValueError("not a TerraSAR-X product")
    root = ET.fromstring(xml_text)
    info = root.find("productInfo")
    comps = root.find("productComponents")
    if info is None or comps is None:
        raise ValueError("TSX: missing productInfo/productComponents")

    meta = {
        "SCENE_CENTRE_TIME": _xget(
            info, "sceneInfo.sceneCenterCoord.azimuthTimeUTC"),
        "OPERATIONAL_MODE": _xget(info, "generationInfo.groundOperationsType"),
        "ORBIT_CYCLE": _xget(info, "missionInfo.orbitCycle"),
        "ABSOLUTE_ORBIT": _xget(info, "missionInfo.absOrbit"),
        "ORBIT_DIRECTION": _xget(info, "missionInfo.orbitDirection"),
        "IMAGING_MODE": _xget(info, "acquisitionInfo.imagingMode"),
        "PRODUCT_VARIANT": _xget(info, "productVariantInfo.productVariant"),
        "IMAGE_TYPE": _xget(info, "imageDataInfo.imageDataType"),
        "ROW_SPACING": _xget(info, "imageDataInfo.imageRaster.rowSpacing"),
        "COL_SPACING": _xget(info, "imageDataInfo.imageRaster.columnSpacing"),
        "AZIMUTH_LOOKS": _xget(info, "imageDataInfo.imageRaster.azimuthLooks"),
        "RANGE_LOOKS": _xget(info, "imageDataInfo.imageRaster.rangeLooks"),
    }
    variant = meta["PRODUCT_VARIANT"]

    bands: list[tuple[str, np.ndarray]] = []
    georef_xml: str | None = None
    for comp in comps:
        loc = comp.find("file/location")
        if loc is None:
            continue
        path = (_xget(loc, "path", "") + "/"
                + _xget(loc, "filename", "")).strip("/")
        if ".." in path.split("/"):
            raise ValueError(f"TSX: path traversal detected in {path}")
        ctype = _xget(comp, "type", " ")
        pol = _xget(comp, "polLayer", " ")
        if ctype.strip():
            if ctype.upper().startswith("MAPPING_GRID"):
                meta["MAPPING_GRID"] = path
            elif ctype.upper().startswith("GEOREF"):
                payload = read(path)
                if payload is not None:
                    georef_xml = payload.decode("utf-8", "replace")
        if pol.strip() and comp.tag.startswith("imageData"):
            payload = read(path)
            if payload is None:
                continue
            if path.lower().endswith(".cos"):
                arr, _ = cosar_decode(payload)
            else:
                from gdal_spark.functions.tiff import tiff_parse
                arr, _ = tiff_parse(payload)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
            bands.append((pol.upper(), arr))

    if len(bands) == 4:
        meta["MATRIX_REPRESENTATION"] = "SCATTERING"

    gcps: list[dict] = []
    if georef_xml is not None:
        gcps, gmeta = tsx_georef_gcps(georef_xml)
        meta.update(gmeta)
    if not gcps and variant.upper().startswith("SSC"):
        scene = info.find("sceneInfo")
        if scene is not None:
            avg_h = float(_xget(scene, "sceneAverageHeight", "0"))
            for node in scene:
                if node.tag not in ("sceneCenterCoord", "sceneCornerCoord"):
                    continue
                gcps.append({
                    "id": str(len(gcps)),
                    "pixel": float(_xget(node, "refColumn", "0")),
                    "line": float(_xget(node, "refRow", "0")),
                    "x": float(_xget(node, "lon", "0")),
                    "y": float(_xget(node, "lat", "0")),
                    "z": avg_h,
                })
    return bands, meta, gcps
