"""VICAR driver (frmts/pds/vicardataset.cpp, no cfitsio/json-c — pure
numpy).

Format facts transcribed (decode re-derived):
  label grammar      KEY=VALUE tokens, 'string' with '' escape,
                     (a,b,c) lists; LBLSIZE first; EOL=1 appends a
                     second label block after the pixel records
  PROPERTY/TASK      group markers; TASK carries USER/DAT_TIM
  dtype ladder       FORMAT BYTE/HALF/FULL/REAL/DOUB/COMP (+WORD/LONG
                     aliases), INTFMT LOW/HIGH, REALFMT IEEE/RIEEE/VAX
  record layout      RECSIZE bytes per record = NBB prefix + N1 pixels;
                     NLB binary-header records precede the image;
                     ORG BSQ/BIL/BIP via the N1/N2/N3 axis map
  georef             ReadProjectionFromMapGroup  :2010-2070
                     (MAP_SCALE km, PDS 0.5-shift offsets)
  nodata             VICAR_NULL1/2/3 by format   :2540-2551
  scale/offset       DLRTO8.REFLECTANCE_*        :2846-2861
  HRSC metadata      hardcoded keyword list      :2891-2940
  binary prefixes    BLTYPE-keyed field schemas (frmts/pds/data/
                     vicar.json); GDAL_AUTOTEST schema embedded
  VAX reals          F/D-float word shuffle (port/cpl_vax.cpp)
"""

from __future__ import annotations

import numpy as np

__all__ = ["vicar_label", "vicar_decode", "vicar_encode",
           "vicar_prefix_rows"]

_FORMATS = {
    "BYTE": ("u1", 1), "HALF": ("i2", 2), "WORD": ("i2", 2),
    "FULL": ("i4", 4), "LONG": ("i4", 4), "REAL": ("f4", 4),
    "DOUB": ("f8", 8), "COMP": ("c8", 8), "COMPLEX": ("c8", 8),
}

# frmts/pds/data/vicar.json "GDAL_AUTOTEST" schema (size 29)
_BLTYPES = {
    "GDAL_AUTOTEST": [
        ("unsigned_char", "unsigned char", False),
        ("unsigned_short", "unsigned short", False),
        ("unsigned_int", "unsigned int", False),
        ("unsigned_int_hidden", "unsigned int", True),
        ("short", "short", False),
        ("int", "int", False),
        ("float", "float", False),
        ("double", "double", False),
    ],
}

_HRSC_KEYWORDS = [
    "M94_ORBIT.START_TIME", "M94_ORBIT.STOP_TIME",
    "M94_INSTRUMENT.DETECTOR_ID", "M94_CAMERAS.MACROPIXEL_SIZE",
    "FILE.EVENT_TYPE", "M94_INSTRUMENT.MISSION_PHASE_NAME",
    "HRORTHO.SPICE_FILE_NAME", "HRCONVER.MISSING_FRAMES",
    "HRCONVER.OVERFLOW_FRAMES", "HRCONVER.ERROR_FRAMES",
    "HRFOOT.BEST_GROUND_SAMPLING_DISTANCE",
    "DLRTO8.RADIANCE_SCALING_FACTOR", "DLRTO8.RADIANCE_OFFSET",
    "DLRTO8.REFLECTANCE_SCALING_FACTOR", "DLRTO8.REFLECTANCE_OFFSET",
    "HRCAL.RADIANCE_SCALING_FACTOR", "HRCAL.RADIANCE_OFFSET",
    "HRCAL.REFLECTANCE_SCALING_FACTOR", "HRCAL.REFLECTANCE_OFFSET",
    "HRORTHO.DTM_NAME", "HRORTHO.EXTORI_FILE_NAME",
    "HRORTHO.GEOMETRIC_CALIB_FILE_NAME",
]

_HRSC_SRC_KEYWORDS = [
    "M94_ORBIT.IMAGE_TIME", "FILE.EVENT_TYPE",
    "FILE.PROCESSING_LEVEL_ID", "M94_INSTRUMENT.DETECTOR_ID",
    "M94_CAMERAS.EXPOSURE_DURATION", "HRCONVER.INSTRUMENT_TEMPERATURE",
]


def _parse_tokens(text: str):
    """-> [(key, value)] with typed values; 'x''y' unescapes to x'y."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n\0":
            i += 1
        if i >= n:
            break
        eq = text.find("=", i)
        if eq == -1:
            break
        key = text[i:eq].strip()
        if not key or not key.replace("_", "").isalnum():
            break
        j = eq + 1
        while j < n and text[j] in " \t":
            j += 1
        if j < n and text[j] == "'":
            k = j + 1
            buf = []
            while k < n:
                if text[k] == "'":
                    if k + 1 < n and text[k + 1] == "'":
                        buf.append("'")
                        k += 2
                        continue
                    break
                buf.append(text[k])
                k += 1
            out.append((key, "".join(buf)))
            i = k + 1
        elif j < n and text[j] == "(":
            k = text.find(")", j)
            items = []
            for tok in text[j + 1:k].split(","):
                items.append(_scalar(tok.strip()))
            out.append((key, items))
            i = k + 1
        else:
            k = j
            while k < n and text[k] not in " \t\r\n\0":
                k += 1
            out.append((key, _scalar(text[j:k])))
            i = k
    return out


def _scalar(tok: str):
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def _render(v) -> str:
    if isinstance(v, float):
        return "%g" % v
    if isinstance(v, list):
        return "(" + ",".join(_render(x) for x in v) + ")"
    return str(v)


def vicar_label(data: bytes) -> dict:
    """Parse the full VICAR label (including EOL continuation) into a
    nested dict: top-level keys + PROPERTY/TASK name-keyed groups."""
    head = data[:32].decode("latin-1", "replace")
    if not head.lstrip().startswith("LBLSIZE"):
        raise ValueError("not a VICAR file")
    lblsize = int(head.split("=", 1)[1].split()[0])
    tokens = _parse_tokens(data[:lblsize].decode("latin-1", "replace"))
    top: dict = {}
    for k, v in tokens:
        if k in ("PROPERTY", "TASK"):
            break
        top[k] = v
    if top.get("EOL"):
        recsize = int(top.get("RECSIZE", 0))
        n2 = int(top.get("N2", 0))
        n3 = int(top.get("N3", 1))
        nlb = int(top.get("NLB", 0))
        off = lblsize + recsize * (nlb + n2 * n3)
        if off < len(data):
            eol_head = data[off:off + 64].decode("latin-1", "replace")
            if eol_head.lstrip().startswith("LBLSIZE"):
                eol_size = int(eol_head.split("=", 1)[1].split()[0])
                tokens += _parse_tokens(
                    data[off:off + eol_size].decode("latin-1", "replace"))

    label: dict = {}
    props: dict = {}
    tasks: dict = {}
    group = None
    for k, v in tokens:
        if k == "PROPERTY":
            group = props.setdefault(str(v), {})
        elif k == "TASK":
            group = tasks.setdefault(str(v), {})
        elif group is not None:
            group[k] = v
        else:
            label[k] = v
    if props:
        label["PROPERTY"] = props
    if tasks:
        label["TASK"] = tasks
    # the EOL continuation's own LBLSIZE must not clobber the primary
    # block's (it is what the record layout is measured from)
    label["LBLSIZE"] = lblsize
    return label


def _keyword(label: dict, dotted: str, default=None):
    if "." in dotted:
        grp, key = dotted.split(".", 1)
        for domain in ("PROPERTY", "TASK"):
            g = label.get(domain, {}).get(grp)
            if g is not None and key in g:
                return g[key]
        return default
    return label.get(dotted, default)


def _vax_f32(raw: bytes) -> np.ndarray:
    w = np.frombuffer(raw, "<u2").reshape(-1, 2).astype(np.uint32)
    u = (w[:, 0] << 16) | w[:, 1]
    sign = np.where(u >> 31, -1.0, 1.0)
    exp = (u >> 23) & 0xFF
    frac = (u & 0x7FFFFF).astype(np.float64)
    val = sign * (0.5 + frac / (1 << 24)) * np.exp2(exp.astype(np.float64)
                                                    - 128.0)
    return np.where(exp == 0, 0.0, val).astype(np.float32)


def _vax_f64(raw: bytes) -> np.ndarray:
    w = np.frombuffer(raw, "<u2").reshape(-1, 4).astype(np.uint64)
    u = (w[:, 0] << 48) | (w[:, 1] << 32) | (w[:, 2] << 16) | w[:, 3]
    sign = np.where((u >> 63) & 1, -1.0, 1.0)
    exp = ((u >> 55) & 0xFF).astype(np.float64)
    frac = (u & ((1 << 55) - 1)).astype(np.float64)
    val = sign * (0.5 + frac / float(1 << 56)) * np.exp2(exp - 128.0)
    return np.where(exp == 0, 0.0, val)


def _real_array(raw: bytes, fmt: str, realfmt: str, count: int) -> np.ndarray:
    if realfmt == "VAX":
        if fmt == "REAL":
            return _vax_f32(raw[:4 * count])
        if fmt == "DOUB":
            return _vax_f64(raw[:8 * count])
        if fmt in ("COMP", "COMPLEX"):
            f = _vax_f32(raw[:8 * count])
            return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    bo = ">" if realfmt == "IEEE" else "<"
    return np.frombuffer(raw, bo + _FORMATS[fmt][0], count)


def vicar_decode(data: bytes) -> tuple[np.ndarray, dict]:
    label = vicar_label(data)
    fmt = str(label.get("FORMAT", "BYTE")).upper()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported VICAR FORMAT {fmt}")
    code, isz = _FORMATS[fmt]
    nl = int(label["NL"])
    ns = int(label["NS"])
    nb = int(label.get("NB", 1))
    org = str(label.get("ORG", "BSQ")).upper()
    recsize = int(label["RECSIZE"])
    nbb = int(label.get("NBB", 0))
    nlb = int(label.get("NLB", 0))
    lblsize = int(label["LBLSIZE"])
    intfmt = str(label.get("INTFMT", "LOW")).upper()
    realfmt = str(label.get("REALFMT", "VAX")).upper()

    if org == "BSQ":
        n1, n2, n3 = ns, nl, nb
    elif org == "BIL":
        n1, n2, n3 = ns, nb, nl
    else:  # BIP
        n1, n2, n3 = nb, ns, nl
    n_rec = n2 * n3
    body = data[lblsize + recsize * nlb:]
    want = recsize * n_rec
    if len(body) < want:
        body = body + b"\x00" * (want - len(body))
    rec = np.frombuffer(body[:want], np.uint8).reshape(n_rec, recsize)
    pix = np.ascontiguousarray(rec[:, nbb:nbb + n1 * isz])

    if fmt in ("REAL", "DOUB", "COMP", "COMPLEX"):
        flat = _real_array(pix.tobytes(), fmt, realfmt, n_rec * n1)
    else:
        bo = ">" if intfmt == "HIGH" else "<"
        flat = np.frombuffer(pix.tobytes(), bo + code, n_rec * n1)
    cube = flat.reshape(n3, n2, n1)
    if org == "BSQ":
        arr = cube  # (nb, nl, ns)
        arr = arr.transpose(1, 2, 0)
    elif org == "BIL":
        arr = cube.transpose(0, 2, 1)  # (nl, ns, nb)
    else:
        arr = cube  # (nl, ns, nb)
    arr = np.ascontiguousarray(arr)
    arr = arr.astype(arr.dtype.newbyteorder("="), copy=False)
    if nb == 1:
        arr = arr[:, :, 0]

    meta: dict = {"label": label, "format": fmt, "org": org}
    # nodata by format (VICAR_NULL1/2/3)
    if fmt == "BYTE":
        meta["nodata"] = 0.0
    elif fmt == "HALF":
        meta["nodata"] = -32768.0
    elif fmt in ("FULL",):
        meta["nodata"] = float(-2147483648)

    mapg = label.get("PROPERTY", {}).get("MAP", {})
    if "MAP_SCALE" in mapg:
        xdim = float(mapg["MAP_SCALE"]) * 1000.0
        ydim = -xdim
        uly = 0.5
        if "LINE_PROJECTION_OFFSET" in mapg:
            uly = (float(mapg["LINE_PROJECTION_OFFSET"]) + 0.5) * -ydim * 1.0
        ulx = 0.5
        if "SAMPLE_PROJECTION_OFFSET" in mapg:
            ulx = (float(mapg["SAMPLE_PROJECTION_OFFSET"]) + 0.5) \
                * xdim * -1.0
        meta["gt"] = (ulx, xdim, 0.0, uly, 0.0, ydim)
        if "MAP_PROJECTION_TYPE" in mapg:
            meta["projection"] = str(mapg["MAP_PROJECTION_TYPE"])
            meta["target"] = str(mapg.get("TARGET_NAME", ""))

    scale = _keyword(label, "DLRTO8.REFLECTANCE_SCALING_FACTOR")
    offset = _keyword(label, "DLRTO8.REFLECTANCE_OFFSET")
    if scale is not None:
        meta["scale"] = float(scale)
    if offset is not None:
        meta["offset"] = float(offset)

    if str(label.get("BLTYPE", "")) == "M94_HRSC":
        md = {
            "SPACECRAFT_NAME": _render(_keyword(
                label, "M94_INSTRUMENT.INSTRUMENT_HOST_NAME", "")),
            "PRODUCT_TYPE": _render(label.get("TYPE", "")),
        }
        src = str(_keyword(label, "M94_INSTRUMENT.DETECTOR_ID", "")) == \
            "MEX_HRSC_SRC"
        for kw in (_HRSC_SRC_KEYWORDS if src else _HRSC_KEYWORDS):
            v = _keyword(label, kw)
            if v is not None:
                md[kw] = _render(v)
        meta["metadata"] = md
    return arr, meta


_PREFIX_TYPES = {
    "unsigned char": ("u1", 1), "unsigned short": ("u2", 2),
    "unsigned int": ("u4", 4), "char": ("i1", 1), "short": ("i2", 2),
    "int": ("i4", 4), "float": ("f4", 4), "double": ("f8", 8),
}


def vicar_prefix_rows(data: bytes) -> list[dict]:
    """Decode the NBB binary prefix of each record into rows using the
    BLTYPE-keyed schema registry (the reference's vicar.json)."""
    label = vicar_label(data)
    bltype = str(label.get("BLTYPE", ""))
    schema = _BLTYPES.get(bltype)
    if schema is None:
        raise ValueError(f"no binary-prefix schema for BLTYPE {bltype!r}")
    nbb = int(label.get("NBB", 0))
    if nbb == 0:
        return []
    recsize = int(label["RECSIZE"])
    lblsize = int(label["LBLSIZE"])
    nlb = int(label.get("NLB", 0))
    n2 = int(label.get("N2", int(label["NL"])))
    n3 = int(label.get("N3", 1))
    bintfmt = str(label.get("BINTFMT", "LOW")).upper()
    brealfmt = str(label.get("BREALFMT", "VAX")).upper()
    ibo = ">" if bintfmt == "HIGH" else "<"
    rows = []
    for r in range(n2 * n3):
        off = lblsize + recsize * (nlb + r)
        buf = data[off:off + nbb]
        pos = 0
        row = {}
        for name, typ, hidden in schema:
            code, sz = _PREFIX_TYPES[typ]
            chunk = buf[pos:pos + sz]
            pos += sz
            if hidden:
                continue
            if typ in ("float", "double"):
                if brealfmt == "VAX":
                    v = float(_vax_f32(chunk)[0]) if typ == "float" \
                        else float(_vax_f64(chunk)[0])
                else:
                    bo = ">" if brealfmt == "IEEE" else "<"
                    v = float(np.frombuffer(chunk, bo + code)[0])
            else:
                v = int(np.frombuffer(chunk, ibo + code)[0])
            row[name] = v
        rows.append(row)
    return rows


def vicar_encode(arr: np.ndarray, bltype: str = "",
                 extra: dict | None = None) -> bytes:
    """Minimal BSQ little-endian writer (CreateCopy shape)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    fmt = {np.dtype("u1"): "BYTE", np.dtype("i2"): "HALF",
           np.dtype("i4"): "FULL", np.dtype("f4"): "REAL",
           np.dtype("f8"): "DOUB", np.dtype("c8"): "COMP"}[
        arr.dtype.newbyteorder("=")]
    isz = _FORMATS[fmt][1]
    recsize = w * isz
    fields = {
        "FORMAT": "'%s'" % fmt, "TYPE": "'IMAGE'", "BUFSIZ": 20480,
        "DIM": 3, "EOL": 0, "RECSIZE": recsize, "ORG": "'BSQ'",
        "NL": h, "NS": w, "NB": nb, "N1": w, "N2": h, "N3": nb, "N4": 0,
        "NBB": 0, "NLB": 0, "HOST": "'X86-64-LINX'", "INTFMT": "'LOW'",
        "REALFMT": "'RIEEE'", "BHOST": "'X86-64-LINX'",
        "BINTFMT": "'LOW'", "BREALFMT": "'RIEEE'",
        "BLTYPE": "'%s'" % bltype, "COMPRESS": "'NONE'",
        "EOCI1": 0, "EOCI2": 0,
    }
    for k, v in (extra or {}).items():
        fields[k] = v
    body = "  ".join(f"{k}={v}" for k, v in fields.items())
    lblsize = 0
    for cand in range(recsize if recsize > 0 else 1, 10 ** 9, recsize):
        if cand >= len(body) + len("LBLSIZE=%d" % cand) + 2:
            lblsize = cand
            break
    hdr = ("LBLSIZE=%d  " % lblsize + body).ljust(lblsize, " ")
    pix = np.ascontiguousarray(
        arr.transpose(2, 0, 1)).astype(arr.dtype.newbyteorder("<")).tobytes()
    return hdr.encode("latin-1") + pix
