"""gdal_calc equivalent: multi-input raster algebra with numpy syntax.

Re-expresses osgeo_utils/gdal_calc.py (swig/python/gdal-utils/
osgeo_utils/gdal_calc.py) semantics over numpy arrays plus a
distributed ``calc_tiles`` DataFrame form:

  * inputs A..Z (or arbitrary identifiers), each an array + optional
    1-based band pick; an identifier may also bind a LIST of arrays
    (gdal_calc's multi-file alpha lists, ``calc="sum(a, axis=0)"``).
  * the calc string is evaluated in a numpy namespace — but through an
    AST whitelist (same policy as raster/pixelfuncs.py): arithmetic,
    comparisons, allowlisted functions, ``numpy.<fn>`` attribute calls
    and ``axis=`` keywords only; no attribute walks, no dunders.
  * eval happens on the NATIVE input dtypes, so uint8 + uint8 wraps
    exactly like the reference (autotest test_gdal_calc_py_2a's 12368
    checksum is a wraparound sum).
  * output type = explicit ``out_type`` else the GDAL DataTypeUnion of
    the inputs (gdal_calc.py:399-407) — np.promote_types reproduces
    GDAL's table on the real-typed lattice.
  * nodata: cells where ANY input (with an input NDV declared) equals
    its NDV get the output NoDataValue, via the reference's exact
    arithmetic form ``(mask==0)*result + out_ndv*mask``
    (gdal_calc.py:634-636); default output NDV per type from
    DefaultNDVLookup (gdal_calc.py:49-66); ``hide_nodata`` ignores
    input NDVs entirely.
  * write cast saturates to the output type's range and rounds
    half away from zero (GDALCopyWords clamp semantics).

Scale shape: ``calc_tiles`` is one mapInPandas over tile-aligned rows —
no shuffle, no driver involvement; at 100 TB each task evaluates its
own tiles only.
"""

from __future__ import annotations

import ast
from collections.abc import Iterator

import numpy as np

# default output NoDataValue per dtype (gdal_calc.py DefaultNDVLookup)
DEFAULT_NDV = {
    np.dtype(np.uint8): 255,
    np.dtype(np.uint16): 65535,
    np.dtype(np.int16): -32768,
    np.dtype(np.uint32): 4294967293,
    np.dtype(np.int32): -2147483647,
    np.dtype(np.float32): 3.402823466e38,
    np.dtype(np.float64): 1.7976931348623158e308,
}

_CALC_FUNCS = {
    "sqrt", "abs", "absolute", "exp", "log", "log2", "log10", "sin",
    "cos", "tan", "arcsin", "arccos", "arctan", "arctan2", "floor",
    "ceil", "round", "rint", "minimum", "maximum", "where", "clip",
    "power", "sign", "fmod", "hypot", "sum", "max", "min", "mean",
    "median", "std", "prod", "logical_and", "logical_or", "logical_not",
    "logical_xor", "isnan", "nan_to_num", "float32", "float64", "uint8",
    "int16", "int32", "real", "imag", "conj",
}

_CALC_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare,
    ast.Call, ast.Name, ast.Load, ast.Constant, ast.IfExp, ast.Tuple,
    ast.List, ast.Attribute, ast.keyword,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.Invert, ast.And, ast.Or,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.LShift, ast.RShift,
)


def _check_calc(tree: ast.Expression, names: set[str]) -> None:
    """AST whitelist: gdal_calc evals in a raw numpy namespace; we keep
    the surface but close the code-exec hole (same policy as
    pixelfuncs._check_expr, plus `numpy.<allowlisted fn>` and `axis=`
    keywords, which gdal_calc's own autotest uses)."""
    for node in ast.walk(tree):
        if not isinstance(node, _CALC_NODES):
            raise ValueError(f"calc: disallowed syntax {type(node).__name__!r}")
        if isinstance(node, ast.Attribute):
            if (
                not isinstance(node.value, ast.Name)
                or node.value.id not in ("numpy", "np")
                or node.attr not in _CALC_FUNCS
            ):
                raise ValueError("calc: only numpy.<allowlisted fn> attributes")
        elif isinstance(node, ast.Name):
            if node.id not in names and node.id not in _CALC_FUNCS and node.id not in (
                "numpy", "np",
            ):
                raise ValueError(f"calc: unknown name {node.id!r}")
        if isinstance(node, ast.Call):
            fn = node.func
            ok = (isinstance(fn, ast.Name) and fn.id in _CALC_FUNCS) or isinstance(
                fn, ast.Attribute
            )
            if not ok:
                raise ValueError("calc: only allowlisted functions callable")
            for kw in node.keywords:
                if kw.arg not in ("axis", "dtype"):
                    raise ValueError("calc: only axis=/dtype= keywords allowed")
        if isinstance(node, ast.Constant) and not isinstance(
            node.value, (int, float, bool)
        ):
            raise ValueError("calc: only numeric constants allowed")


class _NP:
    """attribute gate so `numpy.max` resolves but `numpy.load` doesn't"""

    def __getattr__(self, attr):
        if attr not in _CALC_FUNCS:
            raise AttributeError(attr)
        return getattr(np, attr)


def calc_eval(expr: str, env: dict[str, object]):
    """whitelisted numpy eval of a gdal_calc expression"""
    tree = ast.parse(expr, mode="eval")
    _check_calc(tree, set(env))
    ns = {name: getattr(np, name) for name in _CALC_FUNCS if hasattr(np, name)}
    ns.update(env)
    gate = _NP()
    ns["numpy"] = gate
    ns["np"] = gate
    return eval(compile(tree, "<calc>", "eval"), {"__builtins__": {}}, ns)


def write_cast(arr: np.ndarray, dtype) -> np.ndarray:
    """GDALCopyWords conversion: saturate to the target range, round
    half away from zero for integer targets (gcore/rasterio.cpp)."""
    dtype = np.dtype(dtype)
    arr = np.asarray(arr)
    if arr.dtype == dtype:
        return arr
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.where(arr >= 0, np.floor(arr + 0.5), np.ceil(arr - 0.5))
        return np.clip(arr, info.min, info.max).astype(dtype)
    return arr.astype(dtype)


def _pick_band(arr: np.ndarray, band: int) -> np.ndarray:
    if arr.ndim == 2:
        return arr
    return arr[:, :, band - 1]


def _nbands(arr: np.ndarray) -> int:
    return 1 if arr.ndim == 2 else arr.shape[2]


def gdal_calc(
    calc,
    inputs: dict,
    bands: dict | None = None,
    nodata: dict | None = None,
    out_type=None,
    nodata_value=None,
    hide_nodata: bool = False,
    all_bands: str | None = None,
):
    """numpy core of the gdal_calc pipeline.

    calc: one expression string, or a list (one output band per calc).
    inputs: identifier -> 2-D/3-D array, or list of arrays (alpha list).
    bands: identifier -> 1-based band pick (default 1).
    nodata: identifier -> that input's NDV (list inputs: one value).
    out_type: numpy dtype; default = promotion union of input dtypes.
    nodata_value: output NDV; None => per-type default; "none" => unset.
    all_bands: identifier whose band count drives a multi-band output
      while other identifiers stay on their picked band.

    Returns (out array (H, W, nbands), out_ndv or None).
    """
    calcs = [calc] if isinstance(calc, str) else list(calc)
    bands = dict(bands or {})
    nodata = dict(nodata or {})
    if hide_nodata:
        nodata = {}

    flat: list[np.ndarray] = []
    for v in inputs.values():
        flat.extend(v if isinstance(v, (list, tuple)) else [v])
    if not flat:
        raise ValueError("gdal_calc: no inputs")
    shape = flat[0].shape[:2]
    for a in flat:
        if a.shape[:2] != shape:
            raise ValueError("gdal_calc: input dimensions differ")

    if out_type is None:
        dt = flat[0].dtype
        for a in flat[1:]:
            dt = np.promote_types(dt, a.dtype)
        out_dtype = np.dtype(dt)
    else:
        out_dtype = np.dtype(out_type)

    if isinstance(nodata_value, str) and nodata_value.lower() == "none":
        out_ndv = None
    elif nodata_value is None:
        out_ndv = DEFAULT_NDV.get(out_dtype)
    else:
        out_ndv = nodata_value

    if len(calcs) > 1:
        n_out = len(calcs)
    elif all_bands:
        n_out = _nbands(
            inputs[all_bands][0]
            if isinstance(inputs[all_bands], (list, tuple))
            else inputs[all_bands]
        )
    else:
        n_out = 1

    out = np.zeros(shape + (n_out,), dtype=out_dtype)
    for bi in range(n_out):
        env: dict[str, object] = {}
        mask = None
        for name, val in inputs.items():
            arrs = val if isinstance(val, (list, tuple)) else [val]
            picked = []
            for a in arrs:
                if name == all_bands and len(calcs) == 1:
                    b = bi + 1
                else:
                    b = bands.get(name, 1)
                pa = _pick_band(a, b)
                picked.append(pa)
                ndv = nodata.get(name)
                if ndv is not None:
                    m = (pa == ndv)
                    mask = m.astype(np.int64) if mask is None else (
                        1 * np.logical_or(mask == 1, m)
                    )
            env[name] = picked[0] if not isinstance(val, (list, tuple)) else np.stack(
                picked
            )
        res = calc_eval(calcs[bi if len(calcs) > 1 else 0], env)
        if mask is not None and out_ndv is not None:
            # reference's exact propagation arithmetic (gdal_calc.py:634)
            res = ((1 * (mask == 0)) * res) + (out_ndv * mask)
        elif not isinstance(res, np.ndarray) or res.shape != shape:
            res = np.ones(shape) * res
        out[:, :, bi] = write_cast(res, out_dtype)
    return out, out_ndv


def calc_tiles(
    df,
    calc,
    letters: dict[str, str],
    fmt: str = "tiff",
    bands: dict | None = None,
    nodata: dict | None = None,
    out_type=None,
    nodata_value=None,
    hide_nodata: bool = False,
    all_bands: str | None = None,
    id_col: str = "image_id",
):
    """Distributed gdal_calc: every row of ``df`` carries one aligned
    tile per identifier (``letters`` maps identifier -> binary column of
    ``fmt``-encoded bytes). One mapInPandas, no shuffle: each task
    decodes, evaluates and re-encodes only its own tiles — the 100 TB
    plan is a single codegen scan + Arrow-batched Python stage.

    Returns (id_col, bytes, w, h, band_count, fmt) with bytes = the
    ``fmt``-encoded calc result.
    """
    import pandas as pd
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("band_count", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
        ]
    )
    cols = [id_col] + list(letters.values())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arrs = {
                    name: codecs.decode_image(bytes(getattr(r, col)), fmt)
                    for name, col in letters.items()
                }
                out, _ = gdal_calc(
                    calc,
                    arrs,
                    bands=bands,
                    nodata=nodata,
                    out_type=out_type,
                    nodata_value=nodata_value,
                    hide_nodata=hide_nodata,
                    all_bands=all_bands,
                )
                enc = codecs.encode_image(
                    out[:, :, 0] if out.shape[2] == 1 else out, fmt
                )
                rows.append(
                    (
                        getattr(r, id_col),
                        enc,
                        out.shape[1],
                        out.shape[0],
                        out.shape[2],
                        fmt,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return df.select(*cols).mapInPandas(gen, sch)
