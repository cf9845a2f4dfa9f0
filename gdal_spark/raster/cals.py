"""CALS type-1 raster driver (frmts/cals/calsdataset.cpp — re-derived).

Facts: a 2048-byte ASCII header of 128-byte records (srcdocid,
dstdocid, txtfilid, figid, srcgph, doccls, rtype: 1, rorient:
pel-path,line-progression, rpelcnt: W,H, rdensty, notes) followed by
a raw CCITT Group 4 codestream (the engine's functions/ccitt.py).
The reference CreateCopy inverts pixel values unless the source
already carries a bilevel colour table (a CALS round-trip therefore
keeps values stable); rorient 0,270 is the unrotated default and
rdensty round-trips TIFFTAG_XRESOLUTION.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions.ccitt import g4_decode, g4_encode

__all__ = ["cals_decode", "cals_encode"]


def cals_decode(data: bytes) -> tuple[np.ndarray, dict]:
    header = data[:2048].decode("latin-1", "replace")
    if "rtype: 1" not in header or "rpelcnt:" not in header:
        raise ValueError("not a CALS type-1 file")
    fields = {}
    for off in range(0, 2048, 128):
        rec = header[off:off + 128].strip()
        if ":" in rec:
            k, _, v = rec.partition(":")
            fields[k.strip()] = v.strip()
    w, h = (int(t) for t in fields["rpelcnt"].split(","))
    arr = g4_decode(data[2048:], w, h)
    meta: dict = {
        "fields": fields,
        "color_table": [(0, 0, 0, 255), (255, 255, 255, 255)],
    }
    if "rdensty" in fields:
        try:
            meta["density"] = int(fields["rdensty"])
        except ValueError:
            pass
    if "rorient" in fields:
        angles = fields["rorient"].split(",")
        if len(angles) == 2:
            a1, a2 = int(angles[0]), int(angles[1])
            if (a1, a2) != (0, 270):
                meta["pixel_path"] = a1
                meta["line_progression"] = a2
    return arr, meta


def cals_encode(arr: np.ndarray, color_table=None, density: int = 200,
                pixel_path: int = 0, line_progression: int = 270) -> bytes:
    """Values invert unless the source carries a bilevel colour table
    (the reference's CALSWrapperSrcBand rule — CALS-to-CALS copies are
    stable)."""
    a = (np.asarray(arr) != 0).astype(np.uint8)
    invert = True
    if color_table and len(color_table) >= 2:
        c0, c1 = color_table[0][:3], color_table[1][:3]
        if {c0, c1} == {(255, 255, 255), (0, 0, 0)}:
            invert = False
    if invert:
        a = 1 - a
    h, w = a.shape
    if w > 999999 or h > 999999:
        raise ValueError("CALS only supports dimensions <= 999999")
    blob = g4_encode(a)
    header = bytearray(b" " * 2048)
    records = [
        "srcdocid: NONE", "dstdocid: NONE", "txtfilid: NONE",
        "figid: NONE", "srcgph: NONE", "doccls: NONE", "rtype: 1",
        "rorient: %03d,%03d" % (pixel_path, line_progression),
        "rpelcnt: %06d,%06d" % (w, h),
        "rdensty: %04d" % (density if 1 <= density <= 9999 else 200),
        "notes: NONE",
    ]
    for i, rec in enumerate(records):
        header[i * 128:i * 128 + len(rec)] = rec.encode("latin-1")
    return bytes(header) + blob
