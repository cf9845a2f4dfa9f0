"""Curved-geometry linearization contract query.

Per nation key the executors build curved ISO WKB — a CircularString
arc (radius 10+k, sweep 90/135/180 deg by k%3) and a full-circle
CurvePolygon — linearize both with the engine's reference-semantics
stroker (functions/curves.py; reference ogr/ogrgeometryfactory.cpp
curveToLineString), and emit the linearized vertex counts plus
chord-sum length / shoelace area.

The oracle recomputes everything in closed form: the stroker's
stealth-constrained segment-count rule is deterministic
(n = int(sweep/4 + 0.5) raised to odd >= 7 -> 23/35/45 segments; 91
for the full circle), so the polyline length is 2*R*n*sin(sweep/(2n))
and the polygon area is (n/2)*R^2*sin(2*pi/n) exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.tables import load


def vector_curve_linearize(spark: SparkSession, sf_dir: str) -> DataFrame:
    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("arc_npts", T.LongType()),
            T.StructField("arc_len", T.DoubleType()),
            T.StructField("poly_npts", T.LongType()),
            T.StructField("poly_area", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import curves as CV
        from gdal_spark.functions import wkb as W

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                r = 10.0 + k
                cx, cy = float(k), float(-k)
                sweep = math.radians(90 + (k % 3) * 45)
                p0 = (cx + r, cy)
                p1 = (cx + r * math.cos(sweep / 2),
                      cy + r * math.sin(sweep / 2))
                p2 = (cx + r * math.cos(sweep), cy + r * math.sin(sweep))
                arc = CV.write_circularstring([p0, p1, p2])
                lin = CV.linearize_wkb(arc)
                _, pts = W.parse(lin)
                seglen = float(np.hypot(np.diff(pts[:, 0]),
                                        np.diff(pts[:, 1])).sum())

                ring = CV.write_circularstring(
                    [(cx + r, cy), (cx - r, cy), (cx + r, cy)])
                poly = CV.linearize_wkb(CV.write_curvepolygon([ring]))
                _, rings = W.parse(poly)
                rp = rings[0]
                x, y = rp[:-1, 0], rp[:-1, 1]
                area = 0.5 * abs(float(np.dot(x, np.roll(y, -1))
                                       - np.dot(y, np.roll(x, -1))))
                rows.append((k, len(pts), round(seglen, 4), len(rp),
                             round(area, 4)))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return (
        load(spark, sf_dir, "nation").select("n_nationkey")
        .mapInPandas(run, sch)
    )


_CURVE_ORACLE = """
    WITH base AS (
        SELECT n_nationkey AS k,
               10.0 + n_nationkey AS r,
               90 + (n_nationkey % 3) * 45 AS sweep_deg
        FROM nation
    ),
    st AS (
        SELECT k, r, sweep_deg,
               CASE sweep_deg WHEN 90 THEN 23 WHEN 135 THEN 35
                              ELSE 45 END AS n
        FROM base
    )
    SELECT k,
           n + 1 AS arc_npts,
           ROUND(2 * r * n * SIN(RADIANS(sweep_deg) / (2 * n)), 4)
               AS arc_len,
           92 AS poly_npts,
           ROUND((91 / 2.0) * r * r * SIN(2 * PI() / 91), 4) AS poly_area
    FROM st
"""


SPARK = {"vector_curve_linearize": vector_curve_linearize}
ORACLE = {"vector_curve_linearize": _CURVE_ORACLE}
