"""TIL (DigitalGlobe tiled product) and NSIDC sea-ice .bin drivers
(frmts/til/tildataset.cpp + gcore/mdreader/reader_digital_globe.cpp,
frmts/raw/nsidcbindataset.cpp — re-derived).

TIL facts: key=value tile list (numTiles, TILE_n.filename and the
UL/LR row/col offsets) mosaicked from the referenced TIFFs; the IMD
companion (BEGIN_GROUP key=value) or the .XML <isd> form supplies
IMAGERY-domain metadata (satId -> SATELLITEID, cloudCover ->
CLOUDCOVER, firstLineTime -> ACQUISITIONDATETIME).

NSIDC .bin facts: 300-byte ASCII descriptive header; columns/rows at
offsets 6/12 ("  316"/"  332"); uint8 concentration grid follows;
ANTARCTIC at offset 230 selects the southern polar stereographic
grid.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["til_tiles", "til_decode", "imd_imagery_metadata",
           "nsidcbin_decode"]


def til_tiles(til_text: str) -> list[dict]:
    tiles: dict[int, dict] = {}
    n_tiles = 0
    for line in til_text.splitlines():
        line = line.split(";")[0].strip()
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        val = val.strip().strip('"')
        if key.lower() == "numtiles":
            n_tiles = int(val)
        m = re.match(r"TILE_(\d+)\.(\w+)", key, re.IGNORECASE)
        if m:
            t = tiles.setdefault(int(m.group(1)), {})
            t[m.group(2).lower()] = val
    out = []
    for i in sorted(tiles):
        t = tiles[i]
        out.append({
            "filename": t.get("filename"),
            "ulcol": int(t.get("ulcoloffset", "0")),
            "ulrow": int(t.get("ulrowoffset", "0")),
            "lrcol": int(t.get("lrcoloffset", "0")),
            "lrrow": int(t.get("lrrowoffset", "0")),
        })
    return out[:n_tiles] if n_tiles else out


def til_xml_tiles(xml_text: str) -> tuple[list[dict], dict]:
    root = ET.fromstring(xml_text)
    tiles = []
    for tile in root.iter("TILE"):
        vals = {c.tag.lower(): (c.text or "").strip() for c in tile}
        tiles.append({
            "filename": vals.get("filename"),
            "ulcol": int(vals.get("ulcoloffset", "0")),
            "ulrow": int(vals.get("ulrowoffset", "0")),
            "lrcol": int(vals.get("lrcoloffset", "0")),
            "lrrow": int(vals.get("lrrowoffset", "0")),
        })
    md = {}
    for image in root.iter("IMAGE"):
        for c in image:
            if c.text and c.text.strip():
                md[c.tag.upper()] = c.text.strip()
    imagery = {}
    if "SATID" in md:
        imagery["SATELLITEID"] = md["SATID"]
    if "CLOUDCOVER" in md:
        imagery["CLOUDCOVER"] = md["CLOUDCOVER"]
    if "FIRSTLINETIME" in md:
        imagery["ACQUISITIONDATETIME"] = md["FIRSTLINETIME"]
    return tiles, imagery


def imd_imagery_metadata(imd_text: str) -> dict:
    vals = {}
    for line in imd_text.splitlines():
        line = line.split(";")[0].strip()
        if "=" in line:
            k, _, v = line.partition("=")
            vals[k.strip()] = v.strip().strip('"')
    imagery = {}
    if "satId" in vals:
        imagery["SATELLITEID"] = vals["satId"]
    if "cloudCover" in vals:
        imagery["CLOUDCOVER"] = vals["cloudCover"]
    if "firstLineTime" in vals:
        imagery["ACQUISITIONDATETIME"] = vals["firstLineTime"]
    return imagery


def til_decode(til_text: str, read, imd_text: str | None = None
               ) -> tuple[np.ndarray, dict]:
    """``read(name) -> bytes`` resolves tile files (case-insensitively
    handled by the caller)."""
    from gdal_spark.functions.tiff import tiff_parse

    if til_text.lstrip().startswith("<"):
        tiles, imagery = til_xml_tiles(til_text)
    else:
        tiles = til_tiles(til_text)
        imagery = imd_imagery_metadata(imd_text) if imd_text else {}
    h = max(t["lrrow"] for t in tiles)
    w = max(t["lrcol"] for t in tiles)
    arr = None
    for t in tiles:
        tile, _ = tiff_parse(read(t["filename"]))
        if tile.ndim == 2:
            tile = tile[:, :, None]
        if arr is None:
            arr = np.zeros((h, w, tile.shape[2]), tile.dtype)
        arr[t["ulrow"]:t["lrrow"], t["ulcol"]:t["lrcol"], :] = \
            tile[: t["lrrow"] - t["ulrow"], : t["lrcol"] - t["ulcol"], :]
    if arr is not None and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return arr, {"imagery": imagery, "n_tiles": len(tiles)}


def nsidcbin_decode(data: bytes) -> tuple[np.ndarray, dict]:
    header = data[:300].decode("latin-1", "replace")
    cols = int(header[6:11])
    rows = int(header[12:17])
    south = header[230:239] == "ANTARCTIC"
    arr = np.frombuffer(data, np.uint8, cols * rows, 300).reshape(rows, cols)
    # NSIDC polar stereographic grids (25 km): fixed corner origins
    if south:
        gt = (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0)
    else:
        gt = (-3837500.0, 25000.0, 0.0, 5837500.0, 0.0, -25000.0)
    md = {"FILENAME": header[126:150].strip().rstrip("."),
          "TITLE": header[150:230].strip(),
          "DATA": header[230:300].strip()}
    return np.ascontiguousarray(arr), {"gt": gt, "south": south,
                                       "metadata": md}
