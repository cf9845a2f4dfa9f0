"""PCRaster CSF driver (frmts/pcraster + libcsf — re-derived).

Format facts: 'RUU CROSS SYSTEM MAP FORMAT' signature (32 bytes),
main header (version u2 @32, gisFileId u4 @34, projection u2 @38,
attrTable u4 @40, mapType u2 @44, byteOrder u4 @46), raster header at
offset 64 (valueScale u2, cellRepr u2, minVal/maxVal 8-byte slots,
xUL/yUL f8, nrRows/nrCols u4, cellSize f8 twice, angle f8), cell
matrix at offset 256. Cell representations: CR_UINT1 0x00, CR_INT4
0x26, CR_REAL4 0x5A, CR_REAL8 0xDB; missing values 255 / INT4_MIN /
NaN. Value scales: VS_BOOLEAN/NOMINAL/ORDINAL/SCALAR/DIRECTION/LDD.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["csf_decode", "csf_encode"]

_SIG = b"RUU CROSS SYSTEM MAP FORMAT"

_CR_DT = {0x00: "u1", 0x26: "i4", 0x5A: "f4", 0xDB: "f8"}
_MV = {0x00: 255.0, 0x26: float(-2147483647 - 1), 0x5A: float("nan"),
       0xDB: float("nan")}
_VS_NAMES = {0xE0: "VS_BOOLEAN", 0xE2: "VS_NOMINAL", 0xF2: "VS_ORDINAL",
             0xEB: "VS_SCALAR", 0xFB: "VS_DIRECTION", 0xF0: "VS_LDD",
             1: "VS_CLASSIFIED", 2: "VS_CONTINUOUS"}


def csf_decode(data: bytes) -> tuple[np.ndarray, dict]:
    if data[:27] != _SIG:
        raise ValueError("not a PCRaster CSF map")
    version, = struct.unpack_from("<H", data, 32)
    projection, = struct.unpack_from("<H", data, 38)
    value_scale, cell_repr = struct.unpack_from("<HH", data, 64)
    x_ul, y_ul = struct.unpack_from("<dd", data, 84)
    nrows, ncols = struct.unpack_from("<II", data, 100)
    cell_size, _dup, angle = struct.unpack_from("<ddd", data, 108)
    code = _CR_DT.get(cell_repr)
    if code is None:
        raise ValueError(f"unsupported CSF cell representation {cell_repr}")
    arr = np.frombuffer(data, "<" + code, nrows * ncols,
                        256).reshape(nrows, ncols)
    arr = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("=")))
    gt = (x_ul, cell_size, 0.0, y_ul, 0.0, -cell_size)
    return arr, {
        "gt": gt, "nodata": _MV[cell_repr],
        "value_scale": _VS_NAMES.get(value_scale, str(value_scale)),
        "version": version, "angle": angle, "projection": projection,
    }


def csf_encode(arr: np.ndarray, gt: tuple,
               value_scale: int | None = None) -> bytes:
    dt = arr.dtype.newbyteorder("=")
    cell_repr = {np.dtype("u1"): 0x00, np.dtype("i4"): 0x26,
                 np.dtype("f4"): 0x5A, np.dtype("f8"): 0xDB}[dt]
    if value_scale is None:
        value_scale = 0xEB if dt.kind == "f" else 0xE2
    h, w = arr.shape
    body = arr.astype("<" + _CR_DT[cell_repr]).tobytes()
    vals = arr[np.isfinite(arr)] if dt.kind == "f" else arr
    mn = float(vals.min()) if vals.size else 0.0
    mx = float(vals.max()) if vals.size else 0.0
    out = bytearray(256)
    out[:27] = _SIG
    struct.pack_into("<H", out, 32, 2)          # version
    struct.pack_into("<I", out, 34, 0)          # gisFileId
    struct.pack_into("<H", out, 38, 1)          # PT_YDECT2B
    struct.pack_into("<I", out, 40, 0)          # attrTable
    struct.pack_into("<H", out, 44, 0)          # mapType T_RASTER
    struct.pack_into("<I", out, 46, 1)          # byteOrder little
    struct.pack_into("<HH", out, 64, value_scale, cell_repr)
    if cell_repr == 0x00:
        struct.pack_into("<B", out, 68, int(mn))
        struct.pack_into("<B", out, 76, int(mx))
    elif cell_repr == 0x26:
        struct.pack_into("<i", out, 68, int(mn))
        struct.pack_into("<i", out, 76, int(mx))
    else:
        struct.pack_into("<d", out, 68, mn)
        struct.pack_into("<d", out, 76, mx)
    struct.pack_into("<dd", out, 84, gt[0], gt[3])
    struct.pack_into("<II", out, 100, h, w)
    struct.pack_into("<ddd", out, 108, gt[1], gt[1], 0.0)
    return bytes(out) + body
