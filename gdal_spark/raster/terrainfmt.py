"""Terrain / legacy grid drivers: ILWIS, Terragen, Leveller.

  * ILWIS (frmts/ilwis/ilwisdataset.cpp): INI-style .mpr header —
    [MapStore] Data/Type/RowLength/StartOffset/SwapBytes, [Map] Size
    "rows cols", [GeoRef] in the .grf sidecar; raw row-major data in
    the .mp# companion. Types: Byte=u8, Int=i2, Long=i4, Float=f4,
    Real=f8.
  * Terragen (frmts/terragen/terragendataset.cpp): "TERRAGENTERRAIN "
    + chunk tags — SIZE/XPTS/YPTS (int16 + 2 pad), SCAL (3 float32),
    ALTW (int16 heightscale, int16 baseheight, then (xpts*ypts) int16
    LE south-up rows; the band is the raw int16 grid flipped to
    north-down; GetScale = SCAL*heightscale/65536).
  * Leveller (frmts/leveller/levellerdataset.cpp): "trrn" + version
    byte, then tagged fields (len byte + name + uint32 size + data);
    hf_w/hf_b dimensions, hf_data = float32 rows top-down
    (:980-1027 locate_data, :498-540 IReadBlock).

All three autotest checksums are pinned in tests/test_terrainfmt.py.
"""

from __future__ import annotations

import struct

import numpy as np

_ILWIS_TYPES = {
    "Byte": "u1", "Int": "<i2", "Long": "<i4", "Float": "<f4",
    "Real": "<f8",
}


def ilwis_decode(mpr_text: str, mp_data: bytes) -> tuple[np.ndarray, dict]:
    sec = None
    kv: dict = {}
    for line in mpr_text.splitlines():
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            sec = line[1:-1]
        elif "=" in line and sec:
            k, v = line.split("=", 1)
            kv[f"{sec}.{k.strip()}"] = v.strip()
    rows, cols = (int(x) for x in kv["Map.Size"].split())
    st = kv.get("MapStore.Type", "Byte")
    dt = np.dtype(_ILWIS_TYPES[st])
    if kv.get("MapStore.SwapBytes", "No") == "Yes":
        dt = dt.newbyteorder(">")
    off = int(kv.get("MapStore.StartOffset", "0"))
    arr = np.frombuffer(mp_data, dt, rows * cols, offset=off).reshape(
        rows, cols
    )
    return arr, kv


def terragen_decode(data: bytes) -> tuple[np.ndarray, dict]:
    if not data.startswith(b"TERRAGENTERRAIN "):
        raise ValueError("not a Terragen terrain file")
    pos = 16
    size = xpts = ypts = None
    scal = (30.0, 30.0, 30.0)
    meta: dict = {}
    while pos + 4 <= len(data):
        tag = data[pos : pos + 4]
        pos += 4
        if tag == b"SIZE":
            (size,) = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"XPTS":
            (xpts,) = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"YPTS":
            (ypts,) = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", data, pos)
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hs, bh = struct.unpack_from("<hh", data, pos)
            pos += 4
            nx = xpts if xpts else size + 1
            ny = ypts if ypts else size + 1
            arr = np.frombuffer(data, "<i2", nx * ny, offset=pos).reshape(
                ny, nx
            )
            meta.update(
                {
                    "heightscale": hs, "baseheight": bh, "scal": tuple(scal),
                    "scale": scal[2] * hs / 65536.0,
                    "offset": scal[2] * bh,
                }
            )
            # file rows are south-up; band is north-down
            return arr[::-1].copy(), meta
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"unknown terragen chunk {tag!r}")
    raise ValueError("no ALTW chunk")


def terragen_encode(arr: np.ndarray, heightscale: int = 1,
                    baseheight: int = 0, spacing: float = 30.0) -> bytes:
    h, w = arr.shape
    out = bytearray(b"TERRAGENTERRAIN ")
    out += b"XPTS" + struct.pack("<hxx", w)
    out += b"YPTS" + struct.pack("<hxx", h)
    out += b"SIZE" + struct.pack("<hxx", min(w, h) - 1)
    out += b"SCAL" + struct.pack("<3f", spacing, spacing, spacing)
    out += b"ALTW" + struct.pack("<hh", heightscale, baseheight)
    out += np.ascontiguousarray(arr[::-1], dtype="<i2").tobytes()
    out += b"EOF "
    return bytes(out)


def leveller_tags(data: bytes) -> dict:
    if data[:4] != b"trrn":
        raise ValueError("not a Leveller heightfield")
    version = data[4]
    tags = {"_version": (0, version)}
    pos = 5
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0 or n > 64 or pos + n + 4 > len(data):
            break
        name = data[pos : pos + n].decode("ascii", errors="replace")
        pos += n
        (dl,) = struct.unpack_from("<I", data, pos)
        pos += 4
        tags[name] = (pos, dl)
        pos += dl
    return tags


def leveller_decode(data: bytes) -> tuple[np.ndarray, dict]:
    tags = leveller_tags(data)
    if tags["_version"][1] < 6:
        raise ValueError("pre-v6 fixed-point Leveller unsupported")

    def geti(name):
        o, _ = tags[name]
        return struct.unpack_from("<i", data, o)[0]

    w, h = geti("hf_w"), geti("hf_b")
    off, dl = tags["hf_data"]
    arr = np.frombuffer(data, "<f4", w * h, offset=off).reshape(h, w)
    return arr, {"tags": sorted(tags)}


def leveller_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    out = bytearray(b"trrn\x06")

    def tag(name: str, payload: bytes):
        nonlocal out
        out.append(len(name))
        out += name.encode()
        out += struct.pack("<I", len(payload))
        out += payload

    tag("hf_w", struct.pack("<i", w))
    tag("hf_b", struct.pack("<i", h))
    tag("hf_data", np.ascontiguousarray(arr, dtype="<f4").tobytes())
    return bytes(out)
