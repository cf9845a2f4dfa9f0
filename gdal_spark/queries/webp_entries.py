"""WebP roundtrip contract query (VP8L lossless + lossy VP8 decode).

Every executor task builds closed-form RGB and palette images, pushes
them through the full webp encode -> decode path (functions/webp.py —
the engine's re-derivation of the reference's frmts/webp driver for
the lossless VP8L payload) across three encoder configurations
(subtract-green, predictor transform, color-indexing/palette), and
emits integer pixel aggregates of the DECODED image plus a bit-exact
flag. DuckDB recomputes the aggregates from the closed form, so any
drift anywhere in the bitstream writer, prefix coding, transforms, or
their inverses fails the driver's hash compare.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_S = 16


def _rgb(k: int) -> np.ndarray:
    y, x = np.mgrid[0:_S, 0:_S]
    r = (x * 3 + y * 5 + k) % 256
    g = (x * 7 + y + 2 * k) % 256
    b = (x + y * 11 + 3 * k) % 256
    return np.stack([r, g, b], -1).astype(np.uint8)


def _pal(k: int) -> np.ndarray:
    y, x = np.mgrid[0:_S, 0:_S]
    return (((x + y + k) % 13) * 19).astype(np.uint8)


def webp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("variant", T.StringType()),
            T.StructField("vsum", T.LongType()),
            T.StructField("vmin", T.IntegerType()),
            T.StructField("vmax", T.IntegerType()),
            T.StructField("exact", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import webp as W
        from gdal_spark.functions import webp_fixtures as FX

        rows = []
        for pdf in batches:
            for k in pdf["n_nationkey"]:
                k = int(k)
                rgb = _rgb(k)
                pal = _pal(k)
                for variant, src, opts in [
                    ("plain", rgb, {}),
                    ("pred", rgb, {"predictor": 7}),
                    ("pal", pal, {"palette": True, "subtract_green": False}),
                ]:
                    dec = W.webp_decode(W.webp_encode(src, **opts))
                    want = src if src.ndim == 3 else np.stack([src] * 3, -1)
                    ok = bool(np.array_equal(dec, want))
                    g = dec[..., 1] if variant != "pal" else dec[..., 0]
                    rows.append(
                        (k, variant, int(g.sum()), int(g.min()),
                         int(g.max()), ok)
                    )
                # lossy VP8 (RFC 6386 decoder): fixed committed fixture;
                # 'exact' here means PSNR >= 30 dB vs the generating
                # gradient (the reference autotest's lossy tolerance)
                dec = W.webp_decode(FX.LOSSY_WEBP)
                srcl = FX.fixture_gradient().astype(float)
                mse = ((dec.astype(float) - srcl) ** 2).mean()
                psnr_ok = bool(mse == 0 or
                               10 * np.log10(255 * 255 / mse) >= 30.0)
                g = dec[..., 1]
                rows.append((k, "lossy", int(g.sum()), int(g.min()),
                             int(g.max()), psnr_ok))
        yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return (
        load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(run, sch)
    )


_WEBP_ORACLE = f"""
    WITH px AS (
        SELECT n.n_nationkey AS k, x.range AS x, y.range AS y,
               (x.range * 7 + y.range + 2 * n.n_nationkey) % 256 AS g,
               ((x.range + y.range + n.n_nationkey) % 13) * 19 AS p
        FROM nation n
        CROSS JOIN range({_S}) x CROSS JOIN range({_S}) y
    ),
    agg AS (
        SELECT k,
               CAST(SUM(g) AS BIGINT) AS g_sum,
               CAST(MIN(g) AS INT) AS g_min, CAST(MAX(g) AS INT) AS g_max,
               CAST(SUM(p) AS BIGINT) AS p_sum,
               CAST(MIN(p) AS INT) AS p_min, CAST(MAX(p) AS INT) AS p_max
        FROM px GROUP BY k
    )
    SELECT k, v.variant,
           CASE WHEN v.variant = 'pal' THEN p_sum ELSE g_sum END AS vsum,
           CASE WHEN v.variant = 'pal' THEN p_min ELSE g_min END AS vmin,
           CASE WHEN v.variant = 'pal' THEN p_max ELSE g_max END AS vmax,
           TRUE AS exact
    FROM agg CROSS JOIN (VALUES ('plain'), ('pred'), ('pal')) v(variant)
    UNION ALL
    -- lossy VP8 fixture: decoded green-channel aggregates are fixed
    -- constants of the committed stream (vp8.py is deterministic);
    -- exact=TRUE encodes the PSNR>=30 gate passing
    SELECT n_nationkey AS k, 'lossy' AS variant,
           CAST(15279 AS BIGINT) AS vsum, 0 AS vmin, 120 AS vmax,
           TRUE AS exact
    FROM nation
"""


SPARK = {"webp_roundtrip": webp_roundtrip}
ORACLE = {"webp_roundtrip": _WEBP_ORACLE}
