"""Second raw-format wave: ERS, ROI_PAC, GenBin, RRASTER, SIGDEM.

Format layouts transcribed from the reference drivers:

  ERS     frmts/ers/ersdataset.cpp + ershdrnode.cpp  (ERMapper .ers
          header: nested Begin/End blocks, '#' comments outside quotes,
          BIL data file = header name minus .ers, HeaderOffset)
  ROI_PAC frmts/raw/roipacdataset.cpp   (JPL .rsc sidecar; dtype by
          extension: .dem i2 / .raw,.flg u1 / .int,.slc cf32 /
          .unw,.cor,.hgt,.msk 2-band RMG float32 / .amp 2-band f4)
  GenBin  frmts/raw/genbindataset.cpp   (Generic binary .hdr with
          'KEY: value' lines, BSQ/BIL/BIP, U8/U16/S16/F32/...)
  RRASTER frmts/rraster/rrasterdataset.cpp  (R raster package .grd INI
          + .gri raw; INT1U/INT2S/INT4S/FLT4S/FLT8S, BIL/BIP/BSQ)
  SIGDEM  frmts/sigdem/sigdemdataset.cpp    (132-byte big-endian header,
          int32 cells scaled by dfScaleFactorZ, NO_DATA 0x80000000)
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "ers_parse_header", "ers_decode", "roipac_decode", "genbin_decode",
    "rraster_decode", "rraster_encode", "sigdem_decode", "sigdem_encode",
]


# ---------------------------------------------------------------------------
# ERS (ERMapper)
# ---------------------------------------------------------------------------

_ERS_TYPES = {
    "unsigned8bitinteger": "u1", "signed8bitinteger": "i1",
    "unsigned16bitinteger": "u2", "signed16bitinteger": "i2",
    "unsigned32bitinteger": "u4", "signed32bitinteger": "i4",
    "ieee4bytereal": "f4", "ieee8bytereal": "f8",
}


def _ers_preprocess(text: str) -> tuple[str, list[str]]:
    """One pass over the header: quoted strings (which may span lines
    and contain '#', '{', '}', escaped quotes) are replaced by \x00N\x00
    sentinels; '#' comments outside quotes are stripped to end-of-line."""
    out = []
    strings: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == '"':
            j = i + 1
            val = ""
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    val += text[j + 1]
                    j += 2
                else:
                    val += text[j]
                    j += 1
            out.append(f"\x00{len(strings)}\x00")
            strings.append(val)
            i = j + 1
            continue
        if ch == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), strings


def _ers_unquote(tok: str, strings: list[str]) -> str:
    if tok.startswith("\x00") and tok.endswith("\x00"):
        return strings[int(tok.strip("\x00"))]
    return tok


def ers_parse_header(text: str) -> dict:
    """Line-oriented ERS header parse (ershdrnode.cpp): `X Begin` /
    `X End` nesting flattened to dotted keys ('RasterInfo.CellType',
    'RasterInfo.CellInfo.Xdimension', ...). Values take the remainder
    of the line after '='; quoted values lose their quotes; multi-line
    brace values keep only the first scalar token. Repeated keys keep
    the first value (ERSHdrNode::Find semantics)."""
    clean, strings = _ers_preprocess(text)
    kv: dict[str, str] = {}
    path: list[str] = []
    brace_depth = 0
    pending_key: str | None = None
    for raw in clean.splitlines():
        line = raw.strip()
        if not line:
            continue
        if brace_depth > 0:
            # inside a multi-line { ... } value: capture first scalar
            if pending_key is not None:
                tok = line.strip("{} \t")
                if tok:
                    kv.setdefault(
                        pending_key, _ers_unquote(tok.split()[0], strings)
                    )
                    pending_key = None
            brace_depth += line.count("{") - line.count("}")
            if brace_depth <= 0:
                brace_depth = 0
                pending_key = None
            continue
        if "=" in line:
            k, _, v = line.partition("=")
            k = k.strip()
            v = v.strip()
            key = (".".join(path[1:] + [k]) if len(path) > 1 else k).lower()
            if v.startswith("{"):
                inner = v.strip("{} \t")
                if inner:
                    kv.setdefault(key, _ers_unquote(inner.split()[0], strings))
                    pending_key = None
                else:
                    pending_key = key
                brace_depth = v.count("{") - v.count("}")
                if brace_depth <= 0:
                    brace_depth = 0
                    pending_key = None
                continue
            kv.setdefault(key, _ers_unquote(v, strings))
            continue
        toks = line.split()
        if len(toks) == 2 and toks[1].lower() == "begin":
            path.append(toks[0])
        elif len(toks) == 2 and toks[1].lower() == "end":
            if path and path[-1] == toks[0]:
                path.pop()
    return kv


def _dms(s: str) -> float:
    parts = s.split(":")
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    d = abs(float(parts[0]))
    m = float(parts[1]) if len(parts) > 1 else 0.0
    sec = float(parts[2]) if len(parts) > 2 else 0.0
    return sign * (d + m / 60.0 + sec / 3600.0)


def ers_decode(header_text: str, data: bytes) -> tuple[np.ndarray, dict]:
    """ERS raster: BIL interleave in the companion data file."""
    kv = ers_parse_header(header_text)
    if kv.get("datasettype", "").lower() != "erstorage":
        raise ValueError("not an ERS header")
    w = int(kv["rasterinfo.nrofcellsperline"])
    h = int(kv["rasterinfo.nroflines"])
    nb = int(kv.get("rasterinfo.nrofbands", "1"))
    celltype = kv.get("rasterinfo.celltype", "Unsigned8BitInteger").lower()
    base = _ERS_TYPES.get(celltype)
    if base is None:
        raise ValueError(f"ERS cell type {celltype!r} not supported")
    bo = ">" if kv.get("byteorder", "LSBFirst").lower().startswith("msb") \
        else "<"
    dt = np.dtype(bo + base)
    off = int(kv.get("headeroffset", "0"))
    total = w * h * nb
    need = off + total * dt.itemsize
    if len(data) < need:  # placeholder/truncated data files read as zero
        data = data + b"\x00" * (need - len(data))
    arr = np.frombuffer(data, dt, total, off).reshape(h, nb, w)
    out = np.ascontiguousarray(arr.transpose(0, 2, 1))
    if nb == 1:
        out = out[:, :, 0]
    meta: dict = {}
    if "rasterinfo.nullcellvalue" in kv:
        meta["nodata"] = float(kv["rasterinfo.nullcellvalue"])
    try:
        xd = float(kv["rasterinfo.cellinfo.xdimension"])
        yd = float(kv["rasterinfo.cellinfo.ydimension"])
        if "rasterinfo.registrationcoord.eastings" in kv:
            lon = float(kv["rasterinfo.registrationcoord.eastings"])
            lat = float(kv["rasterinfo.registrationcoord.northings"])
        else:
            lon = _dms(kv["rasterinfo.registrationcoord.longitude"])
            lat = _dms(kv["rasterinfo.registrationcoord.latitude"])
        regx = float(kv.get("rasterinfo.registrationcellx", "0"))
        regy = float(kv.get("rasterinfo.registrationcelly", "0"))
        meta["gt"] = (lon - regx * xd, xd, 0.0, lat + regy * yd, 0.0, -yd)
    except KeyError:
        pass
    meta["datum"] = kv.get("coordinatespace.datum", "")
    meta["projection"] = kv.get("coordinatespace.projection", "")
    return out.astype(dt.newbyteorder("=")), meta


# ---------------------------------------------------------------------------
# ROI_PAC (JPL Repeat Orbit Interferometry package)
# ---------------------------------------------------------------------------

_ROIPAC_TYPES = {
    "raw": ("u1", 1), "flg": ("u1", 1), "dem": ("<i2", 1),
    "int": ("<c8", 1), "slc": ("<c8", 1), "amp": ("<f4", 2),
    "unw": ("<f4", 2), "cor": ("<f4", 2), "hgt": ("<f4", 2),
    "msk": ("<f4", 2),
}


def roipac_decode(rsc_text: str, data: bytes, ext: str
                  ) -> tuple[np.ndarray, dict]:
    """ROI_PAC: whitespace key-value .rsc sidecar; band layout is RMG
    (two band-interleaved-by-line float32 bands) for unw/cor/hgt/msk."""
    kv = {}
    for line in rsc_text.splitlines():
        toks = line.split(None, 1)
        if len(toks) == 2:
            kv[toks[0].upper()] = toks[1].strip()
    if "WIDTH" not in kv or "FILE_LENGTH" not in kv:
        raise ValueError("not a ROI_PAC .rsc")
    w = int(kv["WIDTH"])
    h = int(kv["FILE_LENGTH"])
    ext = ext.lower().lstrip(".")
    if ext not in _ROIPAC_TYPES:
        raise ValueError(f"ROI_PAC extension {ext!r} not supported")
    base, nb = _ROIPAC_TYPES[ext]
    dt = np.dtype(base)
    total = w * h * nb
    need = total * dt.itemsize
    if len(data) < need:
        data = data + b"\x00" * (need - len(data))
    arr = np.frombuffer(data, dt, total)
    if nb == 2:  # RMG: per line, band-1 row then band-2 row
        out = arr.reshape(h, 2, w).transpose(0, 2, 1)
        out = np.ascontiguousarray(out)
    else:
        out = arr.reshape(h, w)
    meta: dict = {k.lower(): v for k, v in kv.items()}
    if "X_FIRST" in kv:
        meta["gt"] = (
            float(kv["X_FIRST"]), float(kv.get("X_STEP", "1")), 0.0,
            float(kv["Y_FIRST"]), 0.0, float(kv.get("Y_STEP", "-1")),
        )
    return out.astype(dt.newbyteorder("=")) if out.dtype.kind != "c" \
        else out, meta


# ---------------------------------------------------------------------------
# GenBin (Generic binary .hdr)
# ---------------------------------------------------------------------------

_GENBIN_TYPES = {
    "U8": "u1", "S8": "i1", "U16": "u2", "S16": "i2",
    "U32": "u4", "S32": "i4", "F32": "f4", "F64": "f8",
}


def genbin_decode(hdr_text: str, data: bytes) -> tuple[np.ndarray, dict]:
    """Generic binary: 'KEY: value' header; BSQ/BIL/BIP interleave.
    BYTE_ORDER 'NA' or 'M' reads big-endian (the reference treats only
    'I'/'L*' as little-endian). Truncated data zero-pads."""
    kv = {}
    for line in hdr_text.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            kv[k.strip().upper()] = v.strip()
    if "BANDS" not in kv or "ROWS" not in kv or "COLS" not in kv:
        raise ValueError("not a GenBin header")
    nb = int(kv["BANDS"])
    h = int(kv["ROWS"])
    w = int(kv["COLS"])
    base = _GENBIN_TYPES.get(kv.get("DATATYPE", "U8").upper())
    if base is None:
        raise ValueError(f"GenBin datatype {kv.get('DATATYPE')!r}")
    border = kv.get("BYTE_ORDER", "NA").upper()
    bo = "<" if border.startswith("I") or border.startswith("L") else ">"
    dt = np.dtype(bo + base)
    total = w * h * nb
    need = total * dt.itemsize
    if len(data) < need:
        data = data + b"\x00" * (need - len(data))
    arr = np.frombuffer(data, dt, total)
    inter = kv.get("INTERLEAVING", "BSQ").upper()
    if nb == 1:
        out = arr.reshape(h, w)
    elif inter == "BIL":
        out = np.ascontiguousarray(arr.reshape(h, nb, w).transpose(0, 2, 1))
    elif inter == "BIP":
        out = arr.reshape(h, w, nb)
    else:
        out = np.ascontiguousarray(arr.reshape(nb, h, w).transpose(1, 2, 0))
    meta: dict = {k.lower(): v for k, v in kv.items()}
    if "UL_X_COORDINATE" in kv and "PIXEL_WIDTH" in kv:
        pw, ph = float(kv["PIXEL_WIDTH"]), float(kv["PIXEL_HEIGHT"])
        meta["gt"] = (float(kv["UL_X_COORDINATE"]), pw, 0.0,
                      float(kv["UL_Y_COORDINATE"]), 0.0, -ph)
    return out.astype(dt.newbyteorder("=")), meta


# ---------------------------------------------------------------------------
# RRASTER (R raster package .grd/.gri)
# ---------------------------------------------------------------------------

_RR_TYPES = {
    "INT1U": "u1", "INT1S": "i1", "INT2U": "u2", "INT2S": "i2",
    "INT4U": "u4", "INT4S": "i4", "FLT4S": "f4", "FLT8S": "f8",
    "LOG1S": "u1",
}
_RR_NAMES = {v: k for k, v in _RR_TYPES.items() if k != "LOG1S"}


def rraster_decode(grd_text: str, gri: bytes) -> tuple[np.ndarray, dict]:
    kv = {}
    for line in grd_text.splitlines():
        line = line.strip()
        if "=" in line and not line.startswith("["):
            k, _, v = line.partition("=")
            kv[k.strip().lower()] = v.strip()
    if "nrows" not in kv or "ncols" not in kv or "datatype" not in kv:
        raise ValueError("not an RRASTER .grd")
    h, w = int(kv["nrows"]), int(kv["ncols"])
    nb = int(kv.get("nbands", "1"))
    base = _RR_TYPES.get(kv["datatype"].upper())
    if base is None:
        raise ValueError(f"RRASTER datatype {kv['datatype']!r}")
    bo = ">" if kv.get("byteorder", "little").lower() == "big" else "<"
    dt = np.dtype(bo + base)
    arr = np.frombuffer(gri, dt, w * h * nb)
    order = kv.get("bandorder", "BIL").upper()
    if nb == 1:
        out = arr.reshape(h, w)
    elif order == "BIL":
        out = np.ascontiguousarray(arr.reshape(h, nb, w).transpose(0, 2, 1))
    elif order == "BIP":
        out = arr.reshape(h, w, nb)
    else:
        out = np.ascontiguousarray(arr.reshape(nb, h, w).transpose(1, 2, 0))
    xmin, xmax = float(kv["xmin"]), float(kv["xmax"])
    ymin, ymax = float(kv["ymin"]), float(kv["ymax"])
    meta: dict = {
        "gt": (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, -(ymax - ymin) / h),
        "projection": kv.get("projection", ""),
    }
    nod = kv.get("nodatavalue", "NA")
    if nod not in ("", "NA"):
        meta["nodata"] = float(nod)
    return out.astype(dt.newbyteorder("=")), meta


def rraster_encode(arr: np.ndarray, gt: tuple | None = None,
                   nodata: float | None = None) -> tuple[str, bytes]:
    """RRASTER writer (BIL, native little-endian)."""
    if arr.ndim == 2:
        arr3 = arr[:, :, None]
    else:
        arr3 = arr
    h, w, nb = arr3.shape
    base = {
        np.dtype(np.uint8): "u1", np.dtype(np.int16): "i2",
        np.dtype(np.int32): "i4", np.dtype(np.float32): "f4",
    }.get(arr.dtype, "f8")
    dt = np.dtype("<" + base)
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    xmin, xmax = gt[0], gt[0] + gt[1] * w
    ymax, ymin = gt[3], gt[3] + gt[5] * h
    mn = float(np.nanmin(arr)) if arr.size else 0.0
    mx = float(np.nanmax(arr)) if arr.size else 0.0
    grd = "\n".join([
        "[general]",
        "creator=gdal_spark",
        "created=",
        "[georeference]",
        f"nrows={h}",
        f"ncols={w}",
        f"xmin={xmin:.10g}",
        f"ymin={ymin:.10g}",
        f"xmax={xmax:.10g}",
        f"ymax={ymax:.10g}",
        "projection=",
        "[data]",
        f"datatype={_RR_NAMES[base]}",
        "byteorder=little",
        f"nbands={nb}",
        "bandorder=BIL",
        f"minvalue={mn:g}",
        f"maxvalue={mx:g}",
        f"nodatavalue={nodata if nodata is not None else 'NA'}",
        "[description]",
        "layername=band",
    ]) + "\n"
    body = np.ascontiguousarray(
        arr3.transpose(0, 2, 1).astype(dt)
    ).tobytes()
    return grd, body


# ---------------------------------------------------------------------------
# SIGDEM
# ---------------------------------------------------------------------------

SIGDEM_NO_DATA = -0x80000000


def sigdem_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """SIGDEM: 132-byte big-endian header then int32-BE cells; elevation
    = cell / scaleZ + offsetZ as float64; NO_DATA = 0x80000000."""
    if len(data) < 132 or data[:6] != b"SIGDEM":
        raise ValueError("not a SIGDEM file")
    version, csid = struct.unpack(">hi", data[6:12])
    (offx, sclx, offy, scly, offz, sclz, minx, miny, minz,
     maxx, maxy, maxz) = struct.unpack(">12d", data[12:108])
    cols, rows = struct.unpack(">ii", data[108:116])
    xdim, ydim = struct.unpack(">dd", data[116:132])
    cells = np.frombuffer(data, ">i4", cols * rows, 132).reshape(rows, cols)
    out = cells.astype(np.float64) / (sclz if sclz else 1.0) + offz
    out[cells == SIGDEM_NO_DATA] = np.nan
    meta = {
        "gt": (minx, xdim, 0.0, maxy, 0.0, -ydim),
        "version": version, "coordinate_system_id": csid,
        "nodata": np.nan,
    }
    return out, meta


def sigdem_encode(arr: np.ndarray, gt: tuple | None = None,
                  scale_z: float = 1000.0) -> bytes:
    """SIGDEM writer (CreateCopy semantics: int32 round((z-offZ)*scaleZ),
    offsets = min extents)."""
    if arr.ndim != 2:
        raise ValueError("SIGDEM is single-band")
    h, w = arr.shape
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    minx = gt[0]
    maxx = minx + gt[1] * w
    maxy = gt[3]
    miny = maxy + gt[5] * h
    a = np.asarray(arr, np.float64)
    finite = a[np.isfinite(a)]
    minz = float(finite.min()) if finite.size else 0.0
    maxz = float(finite.max()) if finite.size else 0.0
    hdr = b"SIGDEM" + struct.pack(
        ">hi12dii2d", 1, 0,
        minx, 1000.0, miny, 1000.0, 0.0, scale_z,
        minx, miny, minz, maxx, maxy, maxz,
        w, h, gt[1], -gt[5],
    )
    cells = np.where(
        np.isfinite(a),
        np.round(a * scale_z),
        float(SIGDEM_NO_DATA),
    ).astype(">i4")
    return hdr + cells.tobytes()
