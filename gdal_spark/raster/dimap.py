"""DIMAP / DIMAP2 (SPOT / Pleiades) driver
(frmts/dimap/dimapdataset.cpp + gcore/mdreader/reader_pleiades.cpp —
re-derived).

Facts transcribed:
  DIMAP 1    METADATA.DIM: Data_Access DATA_FILE_PATH href (the
             companion may itself be a VRT — delegated to the engine's
             VRT renderer), Dataset_Frame vertices as GCPs
             (pixel = COL-0.5 / line = ROW-0.5), metadata translation
             {Production -> '', Production.Facility -> FACILITY_,
             Scene_Source -> '', Data_Processing -> '',
             Spectral_Band_Info -> SPECTRAL_}
  DIMAP 2    VOL_PHR.XML -> Dataset_Components DATASET_PATH; DIM_*.XML
             Raster_Data Data_Files tile_R/C mosaic; translation
             tables for DATASET_/FACILITY_/GEOMETRIC_/RADIOMETRIC_ +
             Strip_Source + Product_Settings; CLOUD/SNOW coverage with
             the IMAGERY-domain CLOUDCOVER alias; STRIP XML
             Ephemeris_Configuration -> EPHEMERIS_; Use_Area center
             Located_Geometric_Values (altitude, acquisition angles,
             solar incidences, GSD)
  RPC        Pleiades RPC_*.XML Global_RFM: RFM_Validity offsets and
             scales, Inverse_Model *_COEFF_1..20 merged with a leading
             space per value, LINE_OFF/SAMP_OFF minus the 1-based
             top-left offset
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["dimap1_open", "dimap2_open", "dimap_rpc", "read_dimap"]


def _text_children(el) -> dict:
    out = {}
    for child in el:
        if len(child) == 0 and child.text is not None and child.tag:
            out[child.tag] = child.text.strip()
    return out


def _find_path(root, path: str):
    cur = root
    for part in path.split("."):
        nxt = None
        for child in cur:
            if child.tag == part:
                nxt = child
                break
        if nxt is None:
            return None
        cur = nxt
    return cur


def _apply_translation(root, table: list[tuple[str, str]], md: dict):
    for path, prefix in table:
        el = _find_path(root, path)
        if el is None:
            continue
        if len(el) == 0 and el.text and el.text.strip():
            md[prefix + path.split(".")[-1]] = el.text.strip()
            continue
        for name, value in _text_children(el).items():
            md[prefix + name] = value


_DIM1_TABLE = [
    ("Production", ""),
    ("Production.Facility", "FACILITY_"),
    ("Dataset_Sources.Source_Information.Scene_Source", ""),
    ("Data_Processing", ""),
    ("Image_Interpretation.Spectral_Band_Info", "SPECTRAL_"),
]

_DIM2_TABLE = [
    ("Product_Information.Delivery_Identification", "DATASET_"),
    ("Product_Information.Producer_Information", "DATASET_"),
    ("Dataset_Sources.Source_Identification.Strip_Source", ""),
    ("Processing_Information.Production_Facility", "FACILITY_"),
    ("Processing_Information.Product_Settings", ""),
    ("Processing_Information.Product_Settings.Geometric_Settings",
     "GEOMETRIC_"),
    ("Processing_Information.Product_Settings.Radiometric_Settings",
     "RADIOMETRIC_"),
]

_STRIP_TABLE = [
    ("Acquisition_Configuration.Platform_Configuration."
     "Ephemeris_Configuration", "EPHEMERIS_"),
]

_LGV_TABLE = [
    ("SATELLITE_ALTITUDE", ""),
    ("Acquisition_Angles", ""),
    ("Solar_Incidences", ""),
    ("Ground_Sample_Distance", ""),
]


def dimap1_open(xml_text: str, read) -> tuple[np.ndarray | None, dict]:
    """``read(name) -> bytes`` resolves companion files."""
    root = ET.fromstring(xml_text)
    md: dict = {}
    _apply_translation(root, _DIM1_TABLE, md)

    gcps = []
    frame = _find_path(root, "Dataset_Frame")
    if frame is not None:
        for vertex in frame:
            if vertex.tag != "Vertex":
                continue
            vals = _text_children(vertex)
            gcps.append({
                "pixel": float(vals["FRAME_COL"]) - 0.5,
                "line": float(vals["FRAME_ROW"]) - 0.5,
                "x": float(vals["FRAME_LON"]),
                "y": float(vals["FRAME_LAT"]),
                "z": float(vals.get("FRAME_Z", 0.0)),
            })

    arr = None
    href = None
    for el in root.iter("DATA_FILE_PATH"):
        href = el.get("href")
        break
    if href is not None:
        data = read(href)
        if data.lstrip().startswith(b"<VRT"):
            from gdal_spark.raster.vrt import render_vrt

            def opener(path):
                from gdal_spark.functions.tiff import tiff_parse
                a, _ = tiff_parse(read(path.rsplit("/", 1)[-1]))
                return a

            bands = render_vrt(data.decode("utf-8", "replace"), "",
                               open_file=opener)
            arr = np.ascontiguousarray(np.moveaxis(bands, 0, -1))
        else:
            from gdal_spark.functions.tiff import tiff_parse
            arr, _ = tiff_parse(data)
    meta = {"metadata": md, "gcps": gcps, "gcp_srs": "WGS84"}
    return arr, meta


def dimap_rpc(rpc_xml: str) -> dict:
    root = ET.fromstring(rpc_xml)
    grfm = None
    for el in root.iter():
        if el.tag == "Global_RFM":
            grfm = el
            break
    if grfm is None:
        grfm = root
    flat: dict = {}
    for el in grfm.iter():
        if len(el) == 0 and el.text and el.text.strip():
            flat[el.tag] = el.text.strip()
    rpc: dict = {}
    for key in ("LAT_OFF", "LONG_OFF", "HEIGHT_OFF", "LINE_SCALE",
                "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE", "HEIGHT_SCALE"):
        if key in flat:
            rpc[key] = flat[key]
    for key in ("LINE_OFF", "SAMP_OFF"):  # 1-based top-left convention
        if key in flat:
            try:
                rpc[key] = "%.15g" % (float(flat[key]) - 1)
            except ValueError:
                rpc[key] = flat[key]
    for group in ("LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF",
                  "SAMP_DEN_COEFF"):
        vals = []
        for j in range(1, 21):
            v = flat.get("%s_%d" % (group, j))
            if v is None:
                break
            vals.append(v)
        if vals:
            rpc[group] = "".join(" " + v for v in vals)
    return rpc


def dimap2_open(dim_xml: str, read, strip_xml: str | None = None,
                rpc_xml: str | None = None
                ) -> tuple[np.ndarray, dict]:
    from gdal_spark.functions.tiff import tiff_parse

    root = ET.fromstring(dim_xml)
    md: dict = {}
    _apply_translation(root, _DIM2_TABLE, md)

    for tag in ("CLOUD_COVERAGE", "SNOW_COVERAGE"):
        el = _find_path(root, "Dataset_Content." + tag)
        if el is not None and el.text and el.text.strip():
            md[tag] = el.text.strip()
            unit = el.get("unit")
            if unit:
                md[tag + "_UNIT"] = unit

    imagery_md = {}
    if md.get("CLOUD_COVERAGE") and md.get("CLOUD_COVERAGE_UNIT") == \
            "percent":
        imagery_md["CLOUDCOVER"] = md["CLOUD_COVERAGE"]

    if strip_xml:
        _apply_translation(ET.fromstring(strip_xml), _STRIP_TABLE, md)

    use_area = _find_path(root, "Geometric_Data.Use_Area")
    if use_area is not None:
        for lgv in use_area:
            lt = lgv.find("LOCATION_TYPE")
            if lt is None or (lt.text or "").strip().lower() != "center":
                continue
            _apply_translation(lgv, _LGV_TABLE, md)
            break

    dims = {}
    rd = _find_path(root, "Raster_Data.Raster_Dimensions")
    if rd is not None:
        dims = _text_children(rd)
    w = int(dims.get("NCOLS", "0"))
    h = int(dims.get("NROWS", "0"))
    nb = int(dims.get("NBANDS", "1"))

    arr = np.zeros((h, w, nb), np.uint8)
    row_off: dict[int, int] = {}
    col_off: dict[int, int] = {}
    tiles = []
    for df in root.iter("Data_File"):
        r = int(df.get("tile_R", "1"))
        c = int(df.get("tile_C", "1"))
        href_el = df.find("DATA_FILE_PATH")
        href = href_el.get("href") if href_el is not None else None
        if href:
            tiles.append((r, c, href))
    y = 0
    for r, c, href in sorted(tiles):
        tile, _ = tiff_parse(read(href))
        if tile.ndim == 2:
            tile = tile[:, :, None]
        if r not in row_off:
            row_off[r] = y
            y += tile.shape[0]
        if c not in col_off:
            col_off[c] = (c - 1) * tile.shape[1]
        y0, x0 = row_off[r], col_off[c]
        arr[y0:y0 + tile.shape[0], x0:x0 + tile.shape[1], :] = \
            tile[: h - y0, : w - x0, :]

    meta: dict = {"metadata": md}
    if imagery_md:
        meta["imagery"] = imagery_md
    if rpc_xml:
        meta["rpc"] = dimap_rpc(rpc_xml)
    return arr, meta


def read_dimap(path: str):
    """Open a DIMAP product from a directory / METADATA.DIM / VOL or
    DIM XML path; -> (array or None, meta)."""
    import os

    if os.path.isdir(path):
        entries = sorted(os.listdir(path))
        for cand in ("VOL_PHR.XML", "METADATA.DIM"):
            if cand in entries:
                path = os.path.join(path, cand)
                break
        else:
            dims = [e for e in entries if e.startswith("DIM_")
                    and e.upper().endswith(".XML")]
            if dims:
                path = os.path.join(path, dims[0])
    dirname = os.path.dirname(path)

    def read(name):
        with open(os.path.join(dirname, name), "rb") as fh:
            return fh.read()

    with open(path, "rb") as fh:
        text = fh.read().decode("utf-8", "replace")
    base = os.path.basename(path).upper()
    if base.startswith("VOL"):
        root = ET.fromstring(text)
        for el in root.iter():
            if el.tag in ("DATASET_PATH", "COMPONENT_PATH"):
                href = el.get("href")
                if href and href.upper().startswith("DIM_"):
                    path = os.path.join(dirname, href)
                    text = read(href).decode("utf-8", "replace")
                    base = href.upper()
                    break
    if base == "METADATA.DIM" or "<METADATA_FORMAT" in text and \
            'version="1' in text.split("METADATA_FORMAT", 1)[-1][:40]:
        return dimap1_open(text, read)
    name_part = os.path.basename(path)[4:-4]  # DIM_<x>.XML
    strip_xml = rpc_xml = None
    for fname in sorted(os.listdir(dirname)):
        up = fname.upper()
        if up.startswith("STRIP_") and name_part in fname:
            strip_xml = read(fname).decode("utf-8", "replace")
        elif up.startswith("RPC_") and name_part in fname:
            rpc_xml = read(fname).decode("utf-8", "replace")
    return dimap2_open(text, read, strip_xml=strip_xml, rpc_xml=rpc_xml)
