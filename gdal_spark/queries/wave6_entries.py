"""Driver-contract entries for the round-2 sixth driver wave
(MRF pyramid + page-range scan; NGSGEOID rides the shiftgrid tests).

mrf_pyramid_scan — a closed-form DEM f(r, c) = ((r*37 + c*101) % 97)
  * 0.25 is written as a DEFLATE MRF with a uniform-scale-2 Rsets
  pyramid, NNB overviews are built with the exact mrf_overview.cpp
  kernel (top-left of each 2x2), and levels 0 and 1 are read back by
  the DISTRIBUTED page scan (each Spark task range-reads and decodes
  one page from its (offset, nbytes) index entry alone — the
  object-storage access pattern MRF's external index exists for).
  Per-page sums are closed-form on both levels (NNB level 1 is just
  f(2r, 2c)), so DuckDB recomputes every value and the driver
  hash-checks the whole write -> pyramid -> ranged-scan cycle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRID = 32
BS = 8


def mrf_pyramid_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gdal_spark.raster.mrf import (
        build_mrf_overviews, mrf_write, scan_mrf_pages,
    )

    r, c = np.meshgrid(np.arange(GRID), np.arange(GRID), indexing="ij")
    dem = (((r * 37 + c * 101) % 97) * 0.25).astype(np.float32)
    d = tempfile.mkdtemp(prefix="mrf_contract_")
    p = os.path.join(d, "dem.mrf")
    mrf_write(dem, p, compression="DEFLATE", blocksize=BS,
              uniform_scale=2)
    build_mrf_overviews(p, "NNB")
    lv0 = scan_mrf_pages(spark, p, level=0)
    lv1 = scan_mrf_pages(spark, p, level=1)
    return (
        lv0.unionByName(lv1)
        .select("level", "py", "px",
                F.col("psum").alias("page_sum"))
        .orderBy("level", "py", "px")
    )


_MRF_ORACLE = f"""
    WITH base AS (
        SELECT 0 AS level, (r.range // {BS}) AS py, (c.range // {BS}) AS px,
               ((r.range * 37 + c.range * 101) % 97) * 0.25 AS v
        FROM range({GRID}) r CROSS JOIN range({GRID}) c
    ), ovr AS (
        SELECT 1 AS level, (r.range // {BS}) AS py, (c.range // {BS}) AS px,
               ((2 * r.range * 37 + 2 * c.range * 101) % 97) * 0.25 AS v
        FROM range({GRID // 2}) r CROSS JOIN range({GRID // 2}) c
    )
    SELECT level, py, px, sum(v) AS page_sum
    FROM (SELECT * FROM base UNION ALL SELECT * FROM ovr)
    GROUP BY level, py, px
    ORDER BY level, py, px
"""

SPARK = {"mrf_pyramid_scan": mrf_pyramid_scan}
ORACLE = {"mrf_pyramid_scan": _MRF_ORACLE}
