"""DTED driver — frmts/dted (dted_api.c DTEDOpen/DTEDReadProfileEx,
dteddataset.cpp).

Layout: UHL (80 bytes) + DSI (648) + ACC (2700), then one column record
per longitude profile: 8-byte header (sentinel + block count + 2-byte
longitude count at bytes 4-5 + latitude count), nYSize 16-bit
big-endian SIGNED-MAGNITUDE samples south-to-north, 4-byte checksum.

Transcribed semantics:

* 1-based UHL fields (dted_api.c DTEDGetField:36-47): lon DDDMMSSH at
  5/8/10 + hemisphere 11, lat at 13/16/18 + hemisphere 19, pixel sizes
  at 21/25 in tenths of arcsec / 36000, sizes at 48/52;
* the MIL-D-89020 first-edition lat/long INVERSION detect (N/S in the
  longitude field -> swap, :262-300);
* UL corner = LL origin - half pixel + nYSize extent (:320-322);
* signed-magnitude decode with the improper two's-complement rescue
  for values < -16000 (:640-676);
* per-column checksum = 32-bit sum of header+data bytes (:684-700);
* raster row 0 is NORTH (the dataset flips the south-first profile,
  dteddataset.cpp:149).
"""

from __future__ import annotations

import numpy as np

UHL_SIZE, DSI_SIZE, ACC_SIZE = 80, 648, 2700
NODATA = -32767


def _field(rec: bytes, start1: int, n: int) -> str:
    return rec[start1 - 1:start1 - 1 + n].decode("ascii", "replace")


def _dms(rec: bytes, dpos: int, mpos: int, spos: int, hpos: int):
    deg = int(_field(rec, dpos, 3).lstrip("0") or "0")
    mn = int(_field(rec, mpos, 2).lstrip("0") or "0")
    sec = int(_field(rec, spos, 2).lstrip("0") or "0")
    hemi = chr(rec[hpos - 1])
    return deg + mn / 60.0 + sec / 3600.0, hemi


def parse_dted_header(data: bytes) -> dict:
    uhl = data[:UHL_SIZE]
    if uhl[:3] != b"UHL":
        raise ValueError("not a DTED file")
    px = int(_field(uhl, 21, 4)) / 36000.0
    py = int(_field(uhl, 25, 4)) / 36000.0
    nx = int(_field(uhl, 48, 4))
    ny = int(_field(uhl, 52, 4))
    lon, lon_h = _dms(uhl, 5, 8, 10, 12)
    lat, lat_h = _dms(uhl, 13, 16, 18, 20)
    # MIL-D-89020 first-edition inversion: N/S in the longitude field
    swap = False
    if lon_h == "W":
        lon = -lon
    elif lon_h == "N":
        swap = True
    elif lon_h == "S":
        lon = -lon
        swap = True
    if lat_h == "S" or (swap and lat_h == "W"):
        lat = -lat
    if swap:
        lon, lat = lat, lon
    ul_x = lon - 0.5 * px
    ul_y = lat - 0.5 * py + ny * py
    return {
        "nx": nx, "ny": ny, "px": px, "py": py,
        "ul_x": ul_x, "ul_y": ul_y,
        "gt": (ul_x, px, 0.0, ul_y, 0.0, -py),
        "data_offset": UHL_SIZE + DSI_SIZE + ACC_SIZE,
    }


def _decode_profile(rec: bytes, ny: int) -> np.ndarray:
    raw = np.frombuffer(rec, np.uint8, ny * 2, 8)
    hi, lo = raw[0::2].astype(np.int64), raw[1::2].astype(np.int64)
    v = ((hi & 0x7F) << 8) | lo
    neg = (hi & 0x80) != 0
    v = np.where(neg, -v, v)
    # improper two's complement rescue (dted_api.c:655-676)
    bad = neg & (v < -16000) & (v != NODATA)
    v = np.where(bad, ((hi << 8) | lo).astype(np.int16).astype(np.int64), v)
    return v


def profile_checksum_ok(rec: bytes, ny: int) -> bool:
    calc = int(np.frombuffer(rec, np.uint8, ny * 2 + 8, 0)
               .astype(np.uint64).sum())
    file_cs = int.from_bytes(rec[8 + ny * 2:12 + ny * 2], "big")
    return calc == file_cs


def read_dted(data: bytes, verify_checksum: bool = False) -> dict:
    """-> {**header, 'array': (ny, nx) int16 north-up,
    'checksum_ok': bool}."""
    h = parse_dted_header(bytes(data))
    nx, ny = h["nx"], h["ny"]
    col_size = 12 + ny * 2
    arr = np.full((ny, nx), NODATA, dtype=np.int64)
    ok = True
    base = h["data_offset"]
    for i in range(nx):
        rec = data[base + i * col_size: base + (i + 1) * col_size]
        if len(rec) < col_size:
            break  # truncated file: remaining columns stay nodata
        arr[:, i] = _decode_profile(rec, ny)[::-1]  # south-first -> north-up
        if verify_checksum and not profile_checksum_ok(rec, ny):
            ok = False
    h["array"] = arr.astype(np.int16)
    h["checksum_ok"] = ok
    return h


def dted_encode(arr: np.ndarray, lon: int = -80, lat: int = 43,
                level: int = 0) -> bytes:
    """North-up (ny, nx) int16 -> DTED with signed-magnitude profiles and
    valid per-column checksums (dted_create.c shape)."""
    ny, nx = arr.shape
    step_x = 36000 // max(1, nx - 1)
    step_y = 36000 // max(1, ny - 1)

    def dms(v: float, lon_axis: bool) -> bytes:
        h = ("W" if v < 0 else "E") if lon_axis else ("S" if v < 0 else "N")
        v = abs(v)
        return f"{int(v):03d}{0:02d}{0:02d}{h}".encode()

    uhl = bytearray(b" " * UHL_SIZE)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = dms(lon, True)
    uhl[12:20] = dms(lat, False)
    uhl[20:24] = str(step_x).rjust(4, "0").encode()
    uhl[24:28] = str(step_y).rjust(4, "0").encode()
    uhl[28:32] = b"0000"  # vertical accuracy
    uhl[47:51] = str(nx).rjust(4, "0").encode()
    uhl[51:55] = str(ny).rjust(4, "0").encode()
    dsi = b"DSI" + b" " * (DSI_SIZE - 3)
    acc = b"ACC" + b" " * (ACC_SIZE - 3)
    out = bytearray(bytes(uhl) + dsi + acc)
    for i in range(nx):
        col = arr[::-1, i].astype(np.int64)  # north-up -> south-first
        mag = np.abs(col)
        hi = ((mag >> 8) & 0x7F) | np.where(col < 0, 0x80, 0)
        lo = mag & 0xFF
        rec = bytearray(b"\xaa")
        rec += int(i).to_bytes(3, "big")
        rec += int(i).to_bytes(2, "big")  # longitude count
        rec += (0).to_bytes(2, "big")  # latitude count
        body = np.empty(2 * len(col), dtype=np.uint8)
        body[0::2] = hi
        body[1::2] = lo
        rec += body.tobytes()
        cs = int(np.frombuffer(bytes(rec), np.uint8).astype(np.uint64).sum())
        rec += cs.to_bytes(4, "big")
        out += rec
    return bytes(out)
