"""Arc/Info ASCII Grid (AAIGrid) and GRASS ASCII Grid drivers.

Pure-numpy transcription of the reference driver's on-disk facts
(frmts/aaigrid/aaigriddataset.cpp — the decode paths are re-derived):

  header parse       AAIGDataset::ParseHeader       :464-604
  GRASS header       GRASSASCIIDataset::ParseHeader :626-710
  dtype data scan    AAIGDataset::CommonOpen        :1167-1204
  "null" nodata      issue #5095 D12 rule           :564-578
  ccafs cellsize fix ParseHeader                    :517-528
  writer             AAIGDataset::CreateCopy        :1299-1540

Decoders take the whole (small) file as bytes — at cluster scale they
run inside mapInPandas batches over a binary column, like every other
codec in this engine (functions/codecs.py); no driver-side IO.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["aaig_decode", "grass_decode", "aaig_encode"]

_FLT_MAX = float(np.finfo(np.float32).max)
_DBL_MAX = float(np.finfo(np.float64).max)


def _atof_m(tok: str) -> float:
    """CPLAtofM: ',' accepted as the decimal separator."""
    return float(tok.replace(",", "."))


def _header_tokens(text: str, extra_seps: str = "") -> list[str]:
    for s in extra_seps:
        text = text.replace(s, " ")
    return text.split()


def _find_kv(tokens: list[str], key: str) -> str | None:
    low = [t.lower() for t in tokens]
    try:
        i = low.index(key.lower())
    except ValueError:
        return None
    return tokens[i + 1] if i + 1 < len(tokens) else None


def _parse_values(body: str, np_dtype, nodata: float | None) -> np.ndarray:
    # "null" (D12) and comma decimals are normalized before the bulk parse;
    # tokens are whitespace-separated in every layout (incl. one-per-line).
    if np_dtype == np.int32:
        # atoi semantics: the dtype scan guarantees no '.' in the data here
        return np.array(body.split(), dtype=np.int64).astype(np.int32)
    nd = nodata if nodata is not None else -_FLT_MAX
    body = body.replace(",", ".").replace("null", repr(nd))
    vals = np.array(body.split(), dtype=np.float64)
    return vals.astype(np_dtype)


def _data_has_float_marker(body: str) -> bool:
    """CommonOpen's chunk scan: any of '.' ',' 'e' 'E' in the data makes the
    band Float32 (:1193-1199). The scan covers the whole file."""
    return any(c in body for c in ".,eE")


def _split_header_data(text: str, keys: tuple[str, ...]) -> tuple[str, str]:
    """Find the start of real data: the first line whose first token is not
    a header keyword (transcribes the isalpha/null/nan rule of :1125-1161)."""
    lines = text.splitlines(keepends=True)
    pos = 0
    header_end = 0
    for ln in lines:
        stripped = ln.strip()
        tok = stripped.split(None, 1)[0].lower() if stripped else ""
        if tok and (tok[0].isalpha() and tok not in ("null", "nan")
                    and not tok.startswith("nan")):
            if tok.rstrip(":") in keys:
                header_end = pos + len(ln)
                pos += len(ln)
                continue
            # an alpha token that is not a keyword inside the header block
            header_end = pos + len(ln)
            pos += len(ln)
            continue
        break
    return text[:header_end], text[header_end:]


_AAIG_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
              "yllcenter", "cellsize", "dx", "dy", "nodata_value")
_GRASS_KEYS = ("north", "south", "east", "west", "rows", "cols",
               "null", "type", "multiplier")


def aaig_decode(data: bytes | str, datatype: str | None = None
                ) -> tuple[np.ndarray, dict]:
    """Arc/Info ASCII Grid. ``datatype`` mirrors the AAIGRID_DATATYPE /
    DATATYPE open option ('Int32' | 'Float32' | 'Float64')."""
    text = data.decode("ascii", "replace") if isinstance(data, bytes) else data
    header, body = _split_header_data(text, _AAIG_KEYS)
    toks = _header_tokens(header)

    ncols_s, nrows_s = _find_kv(toks, "ncols"), _find_kv(toks, "nrows")
    if ncols_s is None or nrows_s is None:
        raise ValueError("not an Arc/Info ASCII grid")
    w, h = int(ncols_s), int(nrows_s)
    if w <= 0 or h <= 0:
        raise ValueError("bad AAIGrid dimensions")

    cs = _find_kv(toks, "cellsize")
    if cs is not None:
        dy = dx = _atof_m(cs)
    else:
        dx_s, dy_s = _find_kv(toks, "dx"), _find_kv(toks, "dy")
        if dx_s is None or dy_s is None:
            raise ValueError("AAIGrid header lacks cellsize and dx/dy")
        dx, dy = _atof_m(dx_s), _atof_m(dy_s)

    area_or_point = "Area"
    xll, yll = _find_kv(toks, "xllcorner"), _find_kv(toks, "yllcorner")
    xlc, ylc = _find_kv(toks, "xllcenter"), _find_kv(toks, "yllcenter")
    if xll is not None and yll is not None:
        x0 = _atof_m(xll)
        # ccafs-climate cellsize-precision hack (:517-528)
        if (w % 360) == 0 and abs(x0 - (-180.0)) < 1e-12 and dx == dy \
                and abs(dx - 360.0 / w) < 1e-9:
            dy = dx = 360.0 / w
        gt = (x0, dx, 0.0, _atof_m(yll) + h * dy, 0.0, -dy)
    elif xlc is not None and ylc is not None:
        area_or_point = "Point"
        gt = (_atof_m(xlc) - 0.5 * dx, dx, 0.0,
              _atof_m(ylc) - 0.5 * dy + h * dy, 0.0, -dy)
    else:
        gt = (0.0, dx, 0.0, 0.0, 0.0, -dy)

    eDataType = None
    if datatype is not None:
        if datatype not in ("Int32", "Float32", "Float64"):
            datatype = None
        else:
            eDataType = datatype

    nodata = None
    nd_tok = _find_kv(toks, "nodata_value")
    if nd_tok is not None:
        if nd_tok == "null":
            if datatype is None or eDataType == "Float32":
                nodata, eDataType = -_FLT_MAX, "Float32"
            else:
                nodata, eDataType = -_DBL_MAX, "Float64"
        else:
            nodata = _atof_m(nd_tok)
            if datatype is None and (
                    "." in nd_tok or "," in nd_tok or math.isnan(nodata)
                    or nodata < -2147483648 or nodata > 2147483647):
                eDataType = "Float32"
                if not math.isinf(nodata) and (
                        0 < abs(nodata) < np.finfo(np.float32).tiny
                        or abs(nodata) > _FLT_MAX):
                    eDataType = "Float64"
            if eDataType == "Float32":
                nodata = float(np.float32(nodata))  # MapNoDataToFloat

    if eDataType is None and _data_has_float_marker(body):
        eDataType = "Float32"
    if eDataType is None:
        eDataType = "Int32"

    np_dtype = {"Int32": np.int32, "Float32": np.float32,
                "Float64": np.float64}[eDataType]
    if eDataType == "Float64" and nd_tok is not None and nd_tok != "null":
        nodata = _atof_m(nd_tok)

    vals = _parse_values(body, np_dtype, nodata)
    if vals.size < w * h:
        raise ValueError("AAIGrid: not enough data values")
    arr = vals[: w * h].reshape(h, w)
    return arr, {"gt": gt, "nodata": nodata, "dtype": eDataType,
                 "area_or_point": area_or_point}


def grass_decode(data: bytes | str, datatype: str | None = None
                 ) -> tuple[np.ndarray, dict]:
    """GRASS ASCII Grid (north:/south:/east:/west:/rows:/cols: header)."""
    text = data.decode("ascii", "replace") if isinstance(data, bytes) else data
    header, body = _split_header_data(text, _GRASS_KEYS)
    toks = _header_tokens(header, extra_seps=":")

    vals = {}
    for k in ("north", "south", "east", "west"):
        v = _find_kv(toks, k)
        if v is None:
            raise ValueError("not a GRASS ASCII grid")
        vals[k] = _atof_m(v)
    rows_s, cols_s = _find_kv(toks, "rows"), _find_kv(toks, "cols")
    if rows_s is None or cols_s is None:
        raise ValueError("not a GRASS ASCII grid")
    h, w = int(rows_s), int(cols_s)
    if w <= 0 or h <= 0:
        raise ValueError("bad GRASS grid dimensions")

    gt = (vals["west"], (vals["east"] - vals["west"]) / w, 0.0,
          vals["north"], 0.0, -(vals["north"] - vals["south"]) / h)

    eDataType = datatype if datatype in ("Int32", "Float32", "Float64") else None
    nodata = None
    nd_tok = _find_kv(toks, "null")
    if nd_tok is not None:
        nodata = _atof_m(nd_tok)
        if eDataType is None and ("." in nd_tok or "," in nd_tok
                                  or math.isnan(nodata)):
            eDataType = "Float32"
    type_tok = _find_kv(toks, "type")
    if type_tok is not None:
        eDataType = {"int": "Int32", "float": "Float32",
                     "double": "Float64"}.get(type_tok.lower(), eDataType)
    if eDataType is None and _data_has_float_marker(body):
        eDataType = "Float32"
    if eDataType is None:
        eDataType = "Int32"
    if eDataType == "Float32" and nodata is not None:
        nodata = float(np.float32(nodata))

    np_dtype = {"Int32": np.int32, "Float32": np.float32,
                "Float64": np.float64}[eDataType]
    arr_vals = _parse_values(body, np_dtype, nodata)
    if arr_vals.size < w * h:
        raise ValueError("GRASS grid: not enough data values")
    arr = arr_vals[: w * h].reshape(h, w)
    return arr, {"gt": gt, "nodata": nodata, "dtype": eDataType,
                 "area_or_point": "Area"}


def _fmt_float(v: float, fmt: str, state: dict) -> str:
    s = fmt % v
    # make sure at least one value carries a decimal point (#6060, :1490-1505)
    if not state["dot"]:
        if any(c in s for c in ".eE"):
            state["dot"] = True
        elif not (math.isinf(v) or math.isnan(v)):
            s += ".0"
            state["dot"] = True
    return s


def aaig_encode(arr: np.ndarray, gt: tuple, nodata: float | None = None,
                decimal_precision: int | None = None,
                significant_digits: int | None = None,
                force_cellsize: bool = False) -> str:
    """AAIGDataset::CreateCopy (:1299-1540): %.12f header, cellsize when the
    pixels are square, south-up inputs flipped north-up, integer bands as
    %d, float bands %.20g with the first-decimal-dot rule."""
    h, w = arr.shape
    yll = gt[3] + h * gt[5] if gt[5] < 0 else gt[3]
    if abs(gt[1] + gt[5]) < 1e-7 or abs(gt[1] - gt[5]) < 1e-7 or force_cellsize:
        header = ("ncols        %d\nnrows        %d\n"
                  "xllcorner    %.12f\nyllcorner    %.12f\n"
                  "cellsize     %.12f\n" % (w, h, gt[0], yll, gt[1]))
    else:
        header = ("ncols        %d\nnrows        %d\n"
                  "xllcorner    %.12f\nyllcorner    %.12f\n"
                  "dx           %.12f\ndy           %.12f\n"
                  % (w, h, gt[0], yll, gt[1], abs(gt[5])))

    read_as_int = arr.dtype.kind in "iub" and arr.dtype.itemsize <= 4
    if decimal_precision is not None:
        ffmt = "%%.%df" % decimal_precision
    elif significant_digits is not None:
        ffmt = "%%.%dg" % significant_digits
    else:
        ffmt = "%.20g"

    if nodata is not None:
        header += "NODATA_value "
        header += ("%d" % int(nodata)) if read_as_int else (ffmt % nodata)
        header += "\n"

    rows = arr if gt[5] < 0 else arr[::-1]
    out = [header]
    state = {"dot": False}
    for row in rows:
        if read_as_int:
            out.append(" ".join("%d" % v for v in row))
        else:
            out.append(" ".join(
                _fmt_float(float(v), ffmt, state) for v in row))
        out.append(" \n")
    return "".join(out)
