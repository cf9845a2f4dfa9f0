"""Golden Software grid drivers: GSAG (ASCII), GSBG (Surfer 6 binary),
GS7BG (Surfer 7 binary).

Format facts transcribed (frmts/gsg/{gsagdataset,gsbgdataset,
gs7bgdataset}.cpp — decode re-derived):
  GSAG   "DSAA", nx ny, xmin xmax, ymin ymax, zmin zmax (pixel-center
         extremes), rows stored bottom-up, blank value 1.70141e38
  GSBG   "DSBB" + int16 nx/ny + 6 doubles + float32 rows bottom-up
  GS7BG  "DSRB" tag/size sections: GRID (int32 nrow/ncol, doubles
         xLL/yLL/xSize/ySize/zMin/zMax/rotation/blank) + DATA
         (float64 rows bottom-up)
All three georeference from pixel centers: gt = (xmin - dx/2, dx, 0,
ymax + dy/2, 0, -dy).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["gsag_decode", "gsag_encode", "gsbg_decode", "gsbg_encode",
           "gs7bg_decode", "gs7bg_encode"]

_BLANK = 1.701410009187828e38


def _gt_of(xmin, xmax, ymin, ymax, nx, ny):
    dx = (xmax - xmin) / (nx - 1) if nx > 1 else 1.0
    dy = (ymax - ymin) / (ny - 1) if ny > 1 else 1.0
    return (xmin - dx / 2, dx, 0.0, ymax + dy / 2, 0.0, -dy)


def gsag_decode(data: bytes | str) -> tuple[np.ndarray, dict]:
    text = data.decode("ascii", "replace") if isinstance(data, bytes) \
        else data
    toks = text.split()
    if not toks or toks[0] != "DSAA":
        raise ValueError("not a Golden Software ASCII grid")
    nx, ny = int(toks[1]), int(toks[2])
    xmin, xmax = float(toks[3]), float(toks[4])
    ymin, ymax = float(toks[5]), float(toks[6])
    vals = np.array(toks[9:9 + nx * ny], dtype=np.float64)
    arr = vals.reshape(ny, nx)[::-1].astype(np.float32)
    return np.ascontiguousarray(arr), {
        "gt": _gt_of(xmin, xmax, ymin, ymax, nx, ny), "nodata": _BLANK}


def gsag_encode(arr: np.ndarray, gt: tuple) -> str:
    ny, nx = arr.shape
    xmin = gt[0] + gt[1] / 2
    xmax = xmin + (nx - 1) * gt[1]
    ymax = gt[3] + gt[5] / 2
    ymin = ymax + (ny - 1) * gt[5]
    a = arr.astype(np.float64)
    lines = ["DSAA", "%d %d" % (nx, ny),
             "%.10g %.10g" % (xmin, xmax),
             "%.10g %.10g" % (ymin, ymax),
             "%.10g %.10g" % (float(a.min()), float(a.max()))]
    for row in a[::-1]:
        lines.append(" ".join("%.10g" % v for v in row))
        lines.append("")
    return "\n".join(lines) + "\n"


def gsbg_decode(data: bytes) -> tuple[np.ndarray, dict]:
    if data[:4] != b"DSBB":
        raise ValueError("not a Surfer 6 binary grid")
    nx, ny = struct.unpack_from("<hh", data, 4)
    xmin, xmax, ymin, ymax, zmin, zmax = struct.unpack_from("<6d", data, 8)
    arr = np.frombuffer(data, "<f4", nx * ny, 56).reshape(ny, nx)[::-1]
    return np.ascontiguousarray(arr), {
        "gt": _gt_of(xmin, xmax, ymin, ymax, nx, ny),
        "nodata": float(np.float32(_BLANK)),
        "zmin": zmin, "zmax": zmax}


def gsbg_encode(arr: np.ndarray, gt: tuple) -> bytes:
    ny, nx = arr.shape
    xmin = gt[0] + gt[1] / 2
    xmax = xmin + (nx - 1) * gt[1]
    ymax = gt[3] + gt[5] / 2
    ymin = ymax + (ny - 1) * gt[5]
    a = arr.astype(np.float32)
    head = b"DSBB" + struct.pack("<hh", nx, ny) + struct.pack(
        "<6d", xmin, xmax, ymin, ymax, float(a.min()), float(a.max()))
    return head + np.ascontiguousarray(a[::-1]).astype("<f4").tobytes()


def gs7bg_decode(data: bytes) -> tuple[np.ndarray, dict]:
    if data[:4] != b"DSRB":
        raise ValueError("not a Surfer 7 binary grid")
    pos = 4
    (hsize,) = struct.unpack_from("<i", data, pos)
    pos += 4 + hsize  # header section payload (version)
    meta = {}
    arr = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<i", data, pos + 4)
        pos += 8
        if tag == b"GRID":
            (ny, nx) = struct.unpack_from("<ii", data, pos)
            (xll, yll, dx, dy, zmin, zmax, rot, blank) = \
                struct.unpack_from("<8d", data, pos + 8)
            meta = {"gt": (xll - dx / 2, dx, 0.0,
                           yll + (ny - 1) * dy + dy / 2, 0.0, -dy),
                    "nodata": blank, "zmin": zmin, "zmax": zmax}
            meta["_shape"] = (ny, nx)
        elif tag == b"DATA" and "_shape" in meta:
            ny, nx = meta.pop("_shape")
            arr = np.frombuffer(data, "<f8", nx * ny, pos)
            arr = np.ascontiguousarray(arr.reshape(ny, nx)[::-1])
        pos += size
    if arr is None:
        raise ValueError("Surfer 7 grid without GRID/DATA sections")
    return arr, meta


def gs7bg_encode(arr: np.ndarray, gt: tuple) -> bytes:
    ny, nx = arr.shape
    xll = gt[0] + gt[1] / 2
    yll = gt[3] + gt[5] / 2 + (ny - 1) * gt[5]
    a = arr.astype(np.float64)
    out = [b"DSRB", struct.pack("<i", 4), struct.pack("<i", 1)]
    out.append(b"GRID")
    out.append(struct.pack("<i", 72))
    out.append(struct.pack("<ii", ny, nx))
    out.append(struct.pack("<8d", xll, yll, gt[1], -gt[5],
                           float(a.min()), float(a.max()), 0.0, _BLANK))
    body = np.ascontiguousarray(a[::-1]).astype("<f8").tobytes()
    out.append(b"DATA")
    out.append(struct.pack("<i", len(body)))
    out.append(body)
    return b"".join(out)
