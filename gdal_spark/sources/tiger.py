"""US Census TIGER/Line reader (ogr/ogrsf_frmts/tiger — re-derived,
no code copied; 2002 record layouts).

A TIGER module is a set of fixed-width text files sharing a basename:
TGRxxxxx.RT1 (complete chains), .RT2 (shape points), .RT7 (landmarks),
... Each record starts with its record-type char + 4-char version.

CompleteChain geometry (tigercompletechain.cpp:420-530): start point
from RT1 columns 191-200/201-209 (lon/lat, 6 implied decimals), then
every consecutive RT2 record with the same TLID contributes up to 10
(lon 10-digit, lat 9-digit) vertex pairs starting at column 19 with
stride 19 (a 0/0 pair ends the list), then the RT1 end point from
columns 210-219/220-228.

Landmarks (RT7) are points from LALONG/LALAT with the same scaling;
point landmarks with zero coordinates have no geometry.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TigerModule", "tiger_open", "RT1_FIELDS", "RT7_FIELDS"]

# (name, 1-based start, 1-based end, type) — TIGER/Line 2002 RT1
RT1_FIELDS = [
    ("TLID", 6, 15, int), ("SIDE1", 16, 16, int), ("SOURCE", 17, 17, str),
    ("FEDIRP", 18, 19, str), ("FENAME", 20, 49, str),
    ("FETYPE", 50, 53, str), ("FEDIRS", 54, 55, str), ("CFCC", 56, 58, str),
    ("FRADDL", 59, 69, str), ("TOADDL", 70, 80, str),
    ("FRADDR", 81, 91, str), ("TOADDR", 92, 102, str),
    ("FRIADDL", 103, 103, str), ("TOIADDL", 104, 104, str),
    ("FRIADDR", 105, 105, str), ("TOIADDR", 106, 106, str),
    ("ZIPL", 107, 111, int), ("ZIPR", 112, 116, int),
    ("AIANHHFPL", 117, 121, int), ("AIANHHFPR", 122, 126, int),
    ("AIHHTLIL", 127, 127, str), ("AIHHTLIR", 128, 128, str),
    ("CENSUS1", 129, 129, str), ("CENSUS2", 130, 130, str),
    ("STATEL", 131, 132, int), ("STATER", 133, 134, int),
    ("COUNTYL", 135, 137, int), ("COUNTYR", 138, 140, int),
    ("COUSUBL", 141, 145, int), ("COUSUBR", 146, 150, int),
    ("SUBMCDL", 151, 155, int), ("SUBMCDR", 156, 160, int),
    ("PLACEL", 161, 165, int), ("PLACER", 166, 170, int),
    ("TRACTL", 171, 176, int), ("TRACTR", 177, 182, int),
    ("BLOCKL", 183, 186, int), ("BLOCKR", 187, 190, int),
]

RT7_FIELDS = [
    ("FILE", 6, 10, int), ("LAND", 11, 20, int), ("SOURCE", 21, 21, str),
    ("CFCC", 22, 24, str), ("LANAME", 25, 54, str),
    ("LALONG", 55, 64, int), ("LALAT", 65, 73, int),
]

_SCALE = 1000000.0


def _field(rec: str, beg: int, end: int):
    return rec[beg - 1:end].strip()


def _typed(rec: str, fields) -> dict:
    out = {}
    for name, beg, end, typ in fields:
        raw = _field(rec, beg, end)
        if typ is int:
            try:
                out[name] = int(raw)
            except ValueError:
                out[name] = None
        else:
            out[name] = raw
    return out


class TigerModule:
    """files: extension (e.g. 'RT1') -> text content."""

    def __init__(self, files: dict[str, str]):
        self.files = {k.upper(): v for k, v in files.items()}
        self.version: str | None = None
        rt1 = self.files.get("RT1", "")
        self.chains: list[dict] = []
        rt2_by_tlid: dict[int, list[str]] = {}
        for rec in self.files.get("RT2", "").splitlines():
            if len(rec) < 19 or rec[0] != "2":
                continue
            try:
                tlid = int(_field(rec, 6, 15))
            except ValueError:
                continue
            rt2_by_tlid.setdefault(tlid, []).append(rec)

        for rec in rt1.splitlines():
            if not rec or rec[0] != "1":
                continue
            if self.version is None:
                self.version = rec[1:5]
            row = _typed(rec, RT1_FIELDS)
            pts = [(int(_field(rec, 191, 200)) / _SCALE,
                    int(_field(rec, 201, 209)) / _SCALE)]
            for srec in rt2_by_tlid.get(row["TLID"], []):
                for v in range(10):
                    beg = 19 + 19 * v
                    sx = _field(srec, beg, beg + 9)
                    sy = _field(srec, beg + 10, beg + 18)
                    nx = int(sx) if sx else 0
                    ny = int(sy) if sy else 0
                    if nx == 0 and ny == 0:
                        break
                    pts.append((nx / _SCALE, ny / _SCALE))
            pts.append((int(_field(rec, 210, 219)) / _SCALE,
                        int(_field(rec, 220, 228)) / _SCALE))
            row["geometry"] = np.array(pts, np.float64)
            self.chains.append(row)

        self.landmarks: list[dict] = []
        for rec in self.files.get("RT7", "").splitlines():
            if not rec or rec[0] != "7":
                continue
            row = _typed(rec, RT7_FIELDS)
            lon = row.pop("LALONG") or 0
            lat = row.pop("LALAT") or 0
            # the reference skips geometry only when BOTH are zero
            # (tigerpoint.cpp:94: dfX != 0 || dfY != 0)
            if lon or lat:
                row["geometry"] = (lon / _SCALE, lat / _SCALE)
            else:
                row["geometry"] = None
            self.landmarks.append(row)


def tiger_open(files: dict[str, str]) -> TigerModule:
    return TigerModule(files)
