"""`gdal raster reclassify` equivalent (interval-grammar remap).

Re-expresses frmts/vrt/vrtreclassifier.cpp:

  * mapping text "FROM = TO; ..." where FROM is a constant, an interval
    '(' / '[' lo ',' hi ')' / ']' (inf/-inf allowed), NAN, NO_DATA or
    DEFAULT, and TO is a number, NO_DATA or PASS_THROUGH
    (Reclassifier::Init:196-346);
  * open bounds tighten by one ulp (Interval::Parse:147-153 nextafter),
    so containment tests are always closed;
  * overlapping intervals are rejected after sorting (Finalize:165-193);
  * lookup: NaN -> NaN rule; else interval (binary search in the
    reference, vectorized masks here); else DEFAULT value/PASS_THROUGH;
    else error (the gdalalg app refuses unmatched values);
  * '#' comments and blank lines are stripped (the @file form of
    gdalalg_raster_reclassify.cpp).

Distributed form ``reclassify_tiles``: the mapping compiles ONCE on the
driver to a small interval table broadcast in the UDF closure; pixels
remap inside Arrow batches — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import math
import re

import numpy as np

_NUM = r"[+-]?(?:inf|[0-9.eE+-]+)"


class Reclassifier:
    def __init__(self):
        self.intervals: list[tuple[float, float, float | None]] = []
        self.nan_value: float | None = None
        self.default_value: float | None = None
        self.default_passthrough = False
        self.has_default = False

    def finalize(self):
        self.intervals.sort(key=lambda t: t[0])
        for (a0, b0, _), (a1, b1, _) in zip(self.intervals, self.intervals[1:]):
            if not (a0 > b1 or b0 < a1):
                raise ValueError(
                    f"interval [{a0},{b0}] overlaps with [{a1},{b1}]"
                )
        return self


def _parse_number(tok: str) -> float:
    t = tok.strip().lower()
    if t in ("inf", "+inf"):
        return math.inf
    if t == "-inf":
        return -math.inf
    return float(tok)


def parse_mapping(text: str, nodata: float | None = None) -> Reclassifier:
    # strip comments; the @file form is one entry per line with no ';'
    # (gdalalg_raster_reclassify.cpp reads line-by-line), so newlines
    # separate entries exactly like ';' does
    text = re.sub(r"#[^\n]*", "", text)
    text = text.replace("\n", ";")
    text = " ".join(text.split())
    rc = Reclassifier()
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"expected '=' in mapping entry {part!r}")
        frm, to = part.split("=", 1)
        frm = frm.strip()
        to = to.strip()

        if to.upper().startswith("NO_DATA"):
            if nodata is None:
                raise ValueError("value mapped to NO_DATA, but NoData not set")
            dst: float | None = float(nodata)
            passthrough = False
        elif to.upper().startswith("PASS_THROUGH"):
            dst = None
            passthrough = True
        else:
            dst = _parse_number(to)
            passthrough = False

        u = frm.upper()
        if u.startswith("DEFAULT"):
            if passthrough:
                rc.default_passthrough = True
            else:
                rc.default_value = dst
            rc.has_default = True
        elif u.startswith("NO_DATA"):
            if nodata is None:
                raise ValueError("value mapped from NO_DATA, but NoData not set")
            v = float(nodata)
            rc.intervals.append((v, v, dst))
        elif u.startswith("NAN"):
            rc.nan_value = math.nan if passthrough else dst
        elif frm[0] in "([":
            m = re.match(
                rf"^([(\[])\s*({_NUM})\s*,\s*({_NUM})\s*([)\]])$", frm
            )
            if not m:
                raise ValueError(f"bad interval {frm!r}")
            lo = _parse_number(m.group(2))
            hi = _parse_number(m.group(3))
            if math.isnan(lo) or math.isnan(hi) or lo > hi:
                raise ValueError(f"bad interval bounds {frm!r}")
            if m.group(1) == "(":
                lo = math.nextafter(lo, math.inf)
            if m.group(4) == ")":
                hi = math.nextafter(hi, -math.inf)
            rc.intervals.append((lo, hi, dst))
        else:
            v = _parse_number(frm)
            rc.intervals.append((v, v, dst))
    if not rc.intervals and rc.nan_value is None and not rc.has_default:
        raise ValueError("empty mapping")
    return rc.finalize()


def reclassify_array(
    arr: np.ndarray,
    mapping: str | Reclassifier,
    nodata: float | None = None,
    out_dtype=None,
) -> np.ndarray:
    """Vectorized remap of one band (or HxWxB stack, per-band identical
    mapping like gdalalg multiple-bands mode)."""
    rc = parse_mapping(mapping, nodata) if isinstance(mapping, str) else mapping
    src = arr.astype(np.float64)
    out = np.zeros_like(src)
    found = np.zeros(src.shape, bool)

    isnan = np.isnan(src)
    if isnan.any() and rc.nan_value is not None:
        out[isnan] = rc.nan_value
        found |= isnan
    for lo, hi, dst in rc.intervals:
        m = (~isnan) & (src >= lo) & (src <= hi) & ~found
        if dst is None:
            out[m] = src[m]
        else:
            out[m] = dst
        found |= m
    rest = ~found
    if rest.any():
        if rc.default_value is not None:
            out[rest] = rc.default_value
        elif rc.default_passthrough:
            out[rest] = src[rest]
        else:
            bad = src[rest].ravel()[0]
            raise ValueError(
                f"encountered value {bad} with no specified mapping"
            )
    return out.astype(out_dtype if out_dtype is not None else arr.dtype)


def reclassify_column(col, mapping: str | Reclassifier,
                      nodata: float | None = None):
    """Compile the interval grammar to a pure Column CASE chain (whole-stage
    codegen, zero UDF) — the scalar-column twin of ``reclassify_array`` for
    remapping a numeric DataFrame column. Unmatched values with no DEFAULT
    yield NULL (the gdalalg app errors instead; Column expressions cannot
    raise per-row, documented deviation)."""
    from pyspark.sql import functions as F

    rc = parse_mapping(mapping, nodata) if isinstance(mapping, str) else mapping
    expr = None
    if rc.nan_value is not None:
        nan_dst = (
            col if math.isnan(rc.nan_value) else F.lit(float(rc.nan_value))
        )
        expr = F.when(F.isnan(col), nan_dst)
    for lo, hi, dst in rc.intervals:
        cond = (col >= F.lit(lo)) & (col <= F.lit(hi))
        val = col if dst is None else F.lit(float(dst))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    if rc.has_default:
        default = col if rc.default_passthrough else F.lit(
            float(rc.default_value)
        )
        expr = default if expr is None else expr.otherwise(default)
    return expr


def reclassify_tiles(df, mapping: str, nodata: float | None = None, out_dtype="same"):
    """Distributed reclassify over an image table (image_id, bytes, fmt,
    + passthrough columns): mapping parsed once, pixels remapped per
    Arrow batch, bytes re-encoded in place."""
    import pandas as pd

    rc_spec = (mapping, nodata)

    def run(batches):
        from gdal_spark.functions import codecs
        from gdal_spark.functions.tiff import tiff_encode

        rc = parse_mapping(rc_spec[0], rc_spec[1])
        for pdf in batches:
            out_bytes = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = reclassify_array(arr, rc, nodata=rc_spec[1])
                if res.ndim == 3 and res.shape[2] == 1:
                    res = res[:, :, 0]
                out_bytes.append(tiff_encode(res))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            pdf["fmt"] = "tiff"
            yield pdf

    return df.mapInPandas(run, df.schema)
