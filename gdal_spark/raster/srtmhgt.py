"""SRTMHGT driver (frmts/srtmhgt/srtmhgtdataset.cpp).

Format facts transcribed (decode re-derived):
  size/type ladder   Open        :437-460 (1201x1201 i2, 1801x3601 i2,
                     3601x3601 u1/.raw, 3601x3601 i2, 3601x3601 f4 .hgts,
                     7201x7201 i2)
  filename georef    Open        (N|S)dd(E|W)ddd -> 1x1 degree tile,
                     pixel centers on the integer corners
  nodata             SRTMHG_NODATA_VALUE = -32768
  writer             CreateCopy  (big-endian int16)
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["srtmhgt_decode", "srtmhgt_encode"]

_SIZES = {
    1201 * 1201 * 2: (1201, 1201, ">i2"),
    1801 * 3601 * 2: (3601, 1801, ">i2"),
    3601 * 3601 * 1: (3601, 3601, "u1"),
    3601 * 3601 * 2: (3601, 3601, ">i2"),
    3601 * 3601 * 4: (3601, 3601, ">f4"),
    7201 * 7201 * 2: (7201, 7201, ">i2"),
}

_NAME_RE = re.compile(r"([NS])(\d{2})([EW])(\d{3})", re.IGNORECASE)


def _latlon(filename: str) -> tuple[int, int]:
    base = filename.rsplit("/", 1)[-1]
    m = _NAME_RE.search(base)
    if not m:
        raise ValueError("SRTMHGT filename must carry NddEddd georef")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def srtmhgt_decode(data: bytes, filename: str) -> tuple[np.ndarray, dict]:
    if len(data) not in _SIZES:
        raise ValueError(f"unsupported SRTMHGT size {len(data)}")
    h, w, dt = _SIZES[len(data)]
    lat, lon = _latlon(filename)
    arr = np.frombuffer(data, np.dtype(dt), w * h).reshape(h, w)
    arr = arr.astype(arr.dtype.newbyteorder("="), copy=False)
    psx = 1.0 / (w - 1)
    psy = 1.0 / (h - 1)
    gt = (lon - psx / 2, psx, 0.0, lat + 1 + psy / 2, 0.0, -psy)
    meta = {"gt": gt, "dtype": arr.dtype.name}
    if arr.dtype != np.uint8:
        meta["nodata"] = -32768.0
    return arr, meta


def srtmhgt_encode(arr: np.ndarray) -> bytes:
    """CreateCopy: big-endian int16, size must be one of the SRTM tile
    shapes (1201 or 3601 square)."""
    h, w = arr.shape
    if (h, w) not in ((1201, 1201), (3601, 3601), (3601, 1801), (7201, 7201)):
        raise ValueError("SRTMHGT output must be a 1201/1801/3601/7201 tile")
    return arr.astype(">i2").tobytes()
