"""VRT derived-band pixel-function catalog.

Reference: the named C pixel functions registered in
frmts/vrt/pixelfunctions.cpp:4309-4377 (GDALAddDerivedBandPixelFunc) and
used by VRTDerivedRasterBand (frmts/vrt/vrtderivedrasterband.cpp). Each
function here is the numpy restatement of the published semantics: inputs
are a list of (h, w) float64 band arrays, output one (h, w) array.
Complex-only functions (real/imag/conj/phase/cmul/intensity-on-complex)
are represented by their real-input behavior; muparser `expression`
bands map to eval'd numpy expressions (apps/gdalalg_raster_calc.cpp:730
vectorizes the same way).

The registry is the engine's "pixel function by name" dispatch —
`apply_named(name, bands, **kwargs)` inside any mapInPandas stage.
"""

from __future__ import annotations

import ast

import numpy as np


def _stack(bands: list[np.ndarray]) -> np.ndarray:
    return np.stack([np.asarray(b, dtype=np.float64) for b in bands], axis=0)


def px_sum(bands, k: float = 0.0):
    return _stack(bands).sum(axis=0) + k


def px_diff(bands):
    a, b = bands
    return np.asarray(a, float) - np.asarray(b, float)


def px_mul(bands, k: float = 1.0):
    return np.prod(_stack(bands), axis=0) * k


def px_div(bands):
    a, b = _stack(bands)
    return np.divide(a, b, out=np.zeros_like(a), where=b != 0)


def px_min(bands):
    return _stack(bands).min(axis=0)


def px_max(bands):
    return _stack(bands).max(axis=0)


def px_norm_diff(bands):
    """(a - b) / (a + b), 0 where the denominator vanishes (NDVI shape)."""
    a, b = _stack(bands)
    den = a + b
    return np.divide(a - b, den, out=np.zeros_like(a), where=den != 0)


def px_intensity(bands):
    """Real-input intensity: x * x (squared magnitude)."""
    (a,) = _stack(bands)
    return a * a


def px_sqrt(bands):
    return np.sqrt(np.maximum(_stack(bands)[0], 0.0))


def px_log10(bands):
    a = _stack(bands)[0]
    return np.log10(np.maximum(a, 1e-300))


def px_dB(bands, fact: float = 20.0):
    """fact * log10(|x|) (pixelfunctions.cpp dB: 20 for amplitude,
    10 for power)."""
    a = np.abs(_stack(bands)[0])
    return fact * np.log10(np.maximum(a, 1e-300))


def px_exp(bands, base: float = np.e, fact: float = 1.0):
    return np.power(base, fact * _stack(bands)[0])


def px_pow(bands, power: float = 1.0):
    return np.power(_stack(bands)[0], power)


def px_scale(bands, offset: float = 0.0, scale: float = 1.0):
    """offset + scale * x (VRT ScaleOffset/ScaleRatio semantics)."""
    return offset + scale * _stack(bands)[0]


def px_mean(bands):
    return _stack(bands).mean(axis=0)


def px_geometric_mean(bands):
    s = np.maximum(_stack(bands), 1e-300)
    return np.exp(np.log(s).mean(axis=0))


def px_harmonic_mean(bands):
    s = _stack(bands)
    with np.errstate(divide="ignore"):
        inv = np.where(s != 0, 1.0 / np.where(s == 0, 1.0, s), np.inf)
    return s.shape[0] / inv.sum(axis=0)


def px_median(bands):
    return np.median(_stack(bands), axis=0)


def px_mode(bands):
    """Per-pixel most frequent band value (ties -> smallest)."""
    s = _stack(bands)
    out = np.empty(s.shape[1:], dtype=np.float64)
    flat = s.reshape(s.shape[0], -1)
    for i in range(flat.shape[1]):
        vals, cnt = np.unique(flat[:, i], return_counts=True)
        out.flat[i] = vals[np.argmax(cnt)]
    return out


def px_replace_nodata(bands, to: float = 0.0, nodata: float | None = None):
    a = _stack(bands)[0]
    mask = np.isnan(a) if nodata is None else (a == nodata)
    return np.where(mask, to, a)


def px_reclassify(bands, mapping: dict[float, float] | None = None,
                  default: float | None = None):
    """Value remap (pixelfunctions.cpp reclassify: explicit class map with
    optional PASS_THROUGH/default)."""
    a = _stack(bands)[0]
    out = a.copy() if default is None else np.full_like(a, default)
    for src, dst in (mapping or {}).items():
        out[a == src] = dst
    return out


def px_interpolate_linear(bands, t0: float = 0.0, dt: float = 1.0, t: float = 0.0):
    """Linear interpolation across the band stack at time t
    (pixelfunctions.cpp interpolate_linear: bands at t0 + i*dt)."""
    s = _stack(bands)
    pos = (t - t0) / dt
    i0 = int(np.clip(np.floor(pos), 0, s.shape[0] - 1))
    i1 = int(np.clip(i0 + 1, 0, s.shape[0] - 1))
    frac = np.clip(pos - i0, 0.0, 1.0)
    return s[i0] * (1 - frac) + s[i1] * frac


# the muparser surface: arithmetic, comparisons, ternary-ish numpy calls —
# no attribute access, no subscripts of arbitrary objects, no name smuggling
_EXPR_FUNCS = {
    "sqrt": np.sqrt, "abs": np.abs, "exp": np.exp, "log": np.log,
    "log10": np.log10, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "arcsin": np.arcsin, "arccos": np.arccos, "arctan": np.arctan,
    "arctan2": np.arctan2, "floor": np.floor, "ceil": np.ceil,
    "round": np.round, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "clip": np.clip, "power": np.power,
    "sign": np.sign, "fmod": np.fmod, "hypot": np.hypot,
}

_EXPR_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare,
    ast.Call, ast.Name, ast.Load, ast.Constant, ast.IfExp, ast.Tuple,
    # operators
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.Invert, ast.And, ast.Or,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.BitAnd, ast.BitOr, ast.BitXor,
)


def _check_expr(tree: ast.Expression, allowed_names: set[str]) -> None:
    """AST whitelist for px_expression (the reference uses muparser — a
    real arithmetic parser with no code-exec surface,
    frmts/vrt/vrtexpression_muparser.cpp). Rejects attribute access,
    subscripts, lambdas, comprehensions, dunders — everything except
    arithmetic over band names and the allowlisted numpy functions."""
    for node in ast.walk(tree):
        if not isinstance(node, _EXPR_NODES):
            raise ValueError(
                f"px_expression: disallowed syntax {type(node).__name__!r}"
            )
        if isinstance(node, ast.Name):
            if node.id not in allowed_names and node.id not in _EXPR_FUNCS:
                raise ValueError(f"px_expression: unknown name {node.id!r}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _EXPR_FUNCS:
                raise ValueError("px_expression: only allowlisted functions callable")
            if node.keywords:
                raise ValueError("px_expression: keyword arguments not allowed")
        if isinstance(node, ast.Constant) and not isinstance(
            node.value, (int, float, bool)
        ):
            raise ValueError("px_expression: only numeric constants allowed")


def px_expression(bands, expr: str = "B1", names: list[str] | None = None):
    """muparser-style expression band (vrtexpression_muparser.cpp;
    vectorized the same way gdalalg_raster_calc.cpp:730 rewrites
    per-pixel formulas to whole-array numpy ops). The expression is
    parsed with `ast` and checked against a node/name whitelist before
    evaluation — arithmetic over B1..Bn / provided names plus an
    allowlisted numpy function set; no attribute access, no subscripts.

    Expressions in muparser's own C-like grammar (`&&`, `||`, `!`,
    ternary `?:`, `^` as power — the syntax GDAL VRT expression bands
    actually carry) route to the hand-written recursive-descent parser
    in raster/muparser.py."""
    env: dict[str, object] = dict(_EXPR_FUNCS)
    for i, b in enumerate(bands):
        env[f"B{i + 1}"] = np.asarray(b, dtype=np.float64)
        if names and i < len(names):
            env[names[i]] = env[f"B{i + 1}"]
    # muparser-only tokens (&&, ||, !, ?:, ^-as-power): bands are float64
    # so python-& / ^ would be type errors anyway — route to the grammar
    if any(t in expr for t in ("&&", "||", "?", "^", "!")):
        from gdal_spark.raster import muparser

        return muparser.evaluate(expr, env)
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError:
        from gdal_spark.raster import muparser

        return muparser.evaluate(expr, env)
    _check_expr(tree, set(env))
    return eval(  # noqa: S307 - AST-whitelisted: names + arithmetic only
        compile(tree, "<px_expression>", "eval"), {"__builtins__": {}}, env
    )


REGISTRY = {
    "sum": px_sum, "diff": px_diff, "mul": px_mul, "div": px_div,
    "min": px_min, "max": px_max, "norm_diff": px_norm_diff,
    "intensity": px_intensity, "sqrt": px_sqrt, "log10": px_log10,
    "dB": px_dB, "exp": px_exp, "pow": px_pow, "scale": px_scale,
    "mean": px_mean, "geometric_mean": px_geometric_mean,
    "harmonic_mean": px_harmonic_mean, "median": px_median,
    "mode": px_mode, "replace_nodata": px_replace_nodata,
    "reclassify": px_reclassify, "interpolate_linear": px_interpolate_linear,
    "expression": px_expression,
}


def apply_named(name: str, bands: list[np.ndarray], **kwargs) -> np.ndarray:
    return REGISTRY[name](bands, **kwargs)
