"""Racurs PHOTOMOD PRF / x-dem tiled-mosaic driver.

Re-expresses frmts/prf/phprfdataset.cpp: the phini XML of
``<i n=.. v=..>`` name/value elements, ph_R_C tile grid with
DispX/DispY placement, parts_ext tile extension (.tif for .prf
megatiff, .demtif for .x-dem), ChannelsInfo type mapping
(U/bytes -> UInt8/16, F -> Float32), GeoRef A_0..B_2 affine with the
PH_GEOREF_SHIFT_Y (=1.0) row correction, the x-dem XR/YR extents to
pixel-is-point geotransform (half-pixel shift + DemShift), ZR min/max
statistics, BadZ nodata, and Scale>0 tiles as pyramid overviews.

Tiles decode independently (TIFF / nested sourceless VRT), so a Spark
mosaic stage maps one task per tile and composites by (DispX, DispY)
— no serial megatiff pass.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["prf_open", "PRFDataset"]

_SHIFT_Y = 1.0  # PH_GEOREF_SHIFT_Y


def _pairs(el) -> dict:
    """phini <x> element children -> {name: value} (i/d/s items)."""
    out = {}
    for c in el:
        n, v = c.get("n"), c.get("v")
        if n is not None and v is not None:
            out[n] = v
    return out


def _tile_array(path: str, width: int, height: int, dtype) -> np.ndarray:
    raw = open(path, "rb").read()
    head = raw[:64].lstrip()
    if head.startswith(b"<VRTDataset"):
        from gdal_spark.raster.vrt import render_vrt

        arr = render_vrt(raw.decode("utf-8", "replace"), os.path.dirname(path))
        arr = arr[0] if arr.shape[0] == 1 else np.moveaxis(arr, 0, -1)
    elif raw[:2] in (b"II", b"MM"):
        from gdal_spark.functions.tiff import tiff_parse

        arr = tiff_parse(raw)[0]
    else:
        from gdal_spark.raster.vrt import default_open

        arr = default_open(path)
    arr = np.asarray(arr)
    if arr.shape[0] != height or arr.shape[1] != width:
        out = np.zeros((height, width) + arr.shape[2:], arr.dtype)
        out[: arr.shape[0], : arr.shape[1]] = arr[:height, :width]
        arr = out
    return arr.astype(dtype, copy=False)


class PRFDataset:
    def __init__(self, path: str):
        root = ET.fromstring(open(path, "rb").read())
        self.path = path
        self.is_dem = path.lower().endswith(".x-dem")
        base = os.path.splitext(path)[0]
        self.parts_dir = base
        kv = _pairs(root)
        self.width = int(kv.get("Width", "0"))
        self.height = int(kv.get("Height", "0"))
        self.nbands = int(kv.get("QChans", "1"))
        parts_ext = ".demtif" if self.is_dem else ".tif"
        if "parts_ext" in kv:
            parts_ext = "." + kv["parts_ext"]
        self.parts_ext = parts_ext
        # ChannelsInfo -> dtype (phprfdataset.cpp ParseChannelsInfo)
        self.dtype = np.dtype(np.uint8)
        ci = None
        for el in root:
            if el.get("n") == "ChannelsInfo":
                ci = _pairs(el)
        if ci is not None:
            t = ci.get("type", "U")
            bps = int(ci.get("bytes_ps", "1"))
            if t == "F":
                self.dtype = np.dtype(np.float32)
            elif bps == 2:
                self.dtype = np.dtype(np.uint16)
            else:
                self.dtype = np.dtype(np.uint8)
        elif int(kv.get("BytesPS", "1")) == 2:
            self.dtype = np.dtype(np.uint16)

        # geotransform
        self.geotransform: tuple | None = None
        dem_md = {k: float(kv[k]) for k in
                  ("XR_0", "XR_1", "YR_0", "YR_1", "ZR_0", "ZR_1", "BadZ")
                  if k in kv}
        dem_shift = (0.0, 0.0, 0.0)
        for el in root:
            n = el.get("n")
            if n == "GeoRef" and not self.is_dem:
                g = _pairs(el)
                if all(k in g for k in
                       ("A_0", "A_1", "A_2", "B_0", "B_1", "B_2")):
                    gt = [float(g["A_0"]), float(g["A_1"]), float(g["A_2"]),
                          float(g["B_0"]), float(g["B_1"]), float(g["B_2"])]
                    gt[3] -= _SHIFT_Y * gt[4]
                    gt[3] -= _SHIFT_Y * gt[5]
                    self.geotransform = tuple(gt)
            elif n == "DemShift":
                s = _pairs(el)
                dem_shift = (float(s.get("x", 0)), float(s.get("y", 0)),
                             float(s.get("z", 0)))
        if self.is_dem and all(
            k in dem_md for k in ("XR_0", "XR_1", "YR_0", "YR_1")
        ) and self.width > 1 and self.height > 1:
            xscale = (dem_md["XR_1"] - dem_md["XR_0"]) / (self.width - 1)
            yscale = (dem_md["YR_0"] - dem_md["YR_1"]) / (self.height - 1)
            self.geotransform = (
                dem_md["XR_0"] - 0.5 * xscale + dem_shift[0], xscale, 0.0,
                dem_md["YR_1"] - 0.5 * yscale + dem_shift[1], 0.0, yscale,
            )
        self.unit_type = "m" if self.is_dem else ""
        self.nodata = dem_md.get("BadZ")
        self.statistics = (
            (dem_md["ZR_0"], dem_md["ZR_1"])
            if "ZR_0" in dem_md and "ZR_1" in dem_md else None
        )

        # tiles: elements with Width/Height/DispX/DispY (+Scale => overview)
        self.tiles = []
        self.overviews = []
        for el in root:
            if el.tag != "x":
                continue
            t = _pairs(el)
            if "Width" not in t or "Height" not in t:
                continue
            name = el.get("n")
            if name in ("ChannelsInfo", "GeoRef", "DemShift", "Resolution"):
                continue
            rec = {
                "name": name,
                "width": int(t["Width"]),
                "height": int(t["Height"]),
                "xoff": int(t.get("DispX", "0")),
                "yoff": int(t.get("DispY", "0")),
                "scale": int(t.get("Scale", "0")),
            }
            if rec["width"] == 0 or rec["height"] == 0:
                continue
            (self.overviews if rec["scale"] else self.tiles).append(rec)

    def overview_size(self, i: int = 0) -> tuple[int, int]:
        ov = self.overviews[i]
        return ov["width"], ov["height"]

    def read(self, band: int = 1) -> np.ndarray:
        """Mosaic the base tiles into (height, width) for one band."""
        out = np.zeros((self.height, self.width), self.dtype)
        for t in self.tiles:
            p = os.path.join(self.parts_dir, t["name"] + self.parts_ext)
            if not os.path.exists(p):
                continue
            arr = _tile_array(p, t["width"], t["height"], self.dtype)
            if arr.ndim == 3:
                arr = arr[:, :, band - 1]
            y0, x0 = t["yoff"], t["xoff"]
            h = min(t["height"], self.height - y0)
            w = min(t["width"], self.width - x0)
            out[y0 : y0 + h, x0 : x0 + w] = arr[:h, :w]
        return out

    def read_overview(self, i: int = 0, band: int = 1) -> np.ndarray:
        ov = self.overviews[i]
        p = os.path.join(self.parts_dir, ov["name"] + self.parts_ext)
        arr = _tile_array(p, ov["width"], ov["height"], self.dtype)
        if arr.ndim == 3:
            arr = arr[:, :, band - 1]
        return arr


def prf_open(path: str) -> PRFDataset:
    if not (path.lower().endswith(".prf") or path.lower().endswith(".x-dem")):
        raise ValueError("not a PHOTOMOD PRF/x-dem file")
    head = open(path, "rb").read(256)
    if b"phini" not in head:
        raise ValueError("not a PHOTOMOD phini document")
    return PRFDataset(path)
