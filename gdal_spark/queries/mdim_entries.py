"""Contract entries for the multidim (N-D array) engine (multidim.py).

These are fully oracle-backed: the array's value at (i,j,k) is a closed
integer formula, so DuckDB can re-derive every cell with generate_series
and check the whole distributed slice/transpose/reduce pipeline
value-for-value (reference ops: gdalmultidim_array_view.cpp slicing,
gdalmultidim_array_transposed.cpp, apps/gdalmdimtranslate_lib.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import multidim as MD

SHAPE = (40, 32, 24)
CHUNKS = (16, 16, 16)


def _cell(i, j, k):
    return ((i * 7919 + j * 104729 + k * 1299709) % 100003) / 100.0


_CELL_SQL = "((i*7919 + j*104729 + k*1299709) % 100003) / 100.0"

# slice window [5:37, 8:30, 3:21]
S0, E0, S1, E1, S2, E2 = 5, 37, 8, 30, 3, 21


def mdim_slice_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mdim translate view=[5:37,8:30,3:21] -> mean over the 3rd dim:
    chunk-pruned slice (one shuffle onto the output chunk grid) + partial
    reduce (second shuffle on surviving coords), exploded to rows."""
    md = MD.create(spark, SHAPE, CHUNKS, _cell)
    sl = MD.slice_view(md, (S0, S1, S2), (E0, E1, E2))
    red = MD.reduce(sl, axis=2, op="mean")
    return (
        MD.to_rows(red)
        .select("i0", "i1", F.round("v", 4).alias("v"))
        .orderBy("i0", "i1")
    )


_SLICE_MEAN_SQL = f"""
SELECT i - {S0} AS i0, j - {S1} AS i1,
       round(avg({_CELL_SQL}), 4) AS v
FROM generate_series({S0}, {E0 - 1}) t1(i),
     generate_series({S1}, {E1 - 1}) t2(j),
     generate_series({S2}, {E2 - 1}) t3(k)
GROUP BY i, j
ORDER BY i0, i1
"""


def mdim_transpose_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed `gdal mdim convert` shape: slice -> transpose(2,0,1)
    -> max over the (new) 3rd axis = original j. Exercises coord
    permutation + ragged edge chunks through both shuffles."""
    md = MD.create(spark, SHAPE, CHUNKS, _cell)
    tr = MD.transpose(MD.slice_view(md, (S0, S1, S2), (E0, E1, E2)), (2, 0, 1))
    red = MD.reduce(tr, axis=2, op="max")
    return (
        MD.to_rows(red)
        .select("i0", "i1", F.round("v", 4).alias("v"))
        .orderBy("i0", "i1")
    )


_TRANSPOSE_MAX_SQL = f"""
SELECT k - {S2} AS i0, i - {S0} AS i1,
       round(max({_CELL_SQL}), 4) AS v
FROM generate_series({S0}, {E0 - 1}) t1(i),
     generate_series({S1}, {E1 - 1}) t2(j),
     generate_series({S2}, {E2 - 1}) t3(k)
GROUP BY i, k
ORDER BY i0, i1
"""


def mdim_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetStatistics over the full array (codegen'd combine of per-chunk
    partials)."""
    md = MD.create(spark, SHAPE, CHUNKS, _cell)
    s = MD.statistics(md)
    return s.select(
        "n",
        F.round("min_v", 4).alias("min_v"),
        F.round("max_v", 4).alias("max_v"),
        F.round("mean_v", 4).alias("mean_v"),
        F.round("std_v", 4).alias("std_v"),
    )


_STATS_SQL = f"""
SELECT count(*) AS n,
       round(min(v), 4) AS min_v,
       round(max(v), 4) AS max_v,
       round(avg(v), 4) AS mean_v,
       round(sqrt(avg(v*v) - avg(v)*avg(v)), 4) AS std_v
FROM (
  SELECT {_CELL_SQL} AS v
  FROM generate_series(0, {SHAPE[0] - 1}) t1(i),
       generate_series(0, {SHAPE[1] - 1}) t2(j),
       generate_series(0, {SHAPE[2] - 1}) t3(k)
)
"""


SPARK = {
    "mdim_slice_mean": mdim_slice_mean,
    "mdim_transpose_max": mdim_transpose_max,
    "mdim_statistics": mdim_statistics,
}
ORACLE = {
    "mdim_slice_mean": _SLICE_MEAN_SQL,
    "mdim_transpose_max": _TRANSPOSE_MAX_SQL,
    "mdim_statistics": _STATS_SQL,
}


def mdim_mosaic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`gdal mdim mosaic`: a(4x4)@(0,0) + b(4x4)@(0,4) + c(2x2)@(1,3)
    — union extent (4x8), last-input-wins overlap, every cell emitted.
    DuckDB recomputes the paste in closed form."""
    from gdal_spark import multidim as MD

    a = MD.create(spark, (4, 4), (2, 2), lambda i, j: i * 10 + j)
    b = MD.create(spark, (4, 4), (2, 2), lambda i, j: 1000 + i * 10 + j)
    c = MD.create(spark, (2, 2), (2, 2), lambda i, j: 77 + i + j)
    out = MD.mosaic(
        [a, b, c],
        origins=[(0.0, 0.0), (0.0, 4.0), (1.0, 3.0)],
        steps=(1.0, 1.0),
        fill_value=-1.0,
    )
    rows = MD.to_rows(out)
    return rows.select(
        F.col("i0").cast("int").alias("i"),
        F.col("i1").cast("int").alias("j"),
        F.col("v"),
    )


_MOSAIC_ORACLE = """
    WITH g AS (
        SELECT i.range AS i, j.range AS j
        FROM range(4) i CROSS JOIN range(8) j
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(CASE
                WHEN i BETWEEN 1 AND 2 AND j BETWEEN 3 AND 4
                    THEN 77 + (i - 1) + (j - 3)
                WHEN j < 4 THEN i * 10 + j
                ELSE 1000 + i * 10 + (j - 4)
           END AS DOUBLE) AS v
    FROM g
"""

SPARK["mdim_mosaic_cells"] = mdim_mosaic_cells
ORACLE["mdim_mosaic_cells"] = _MOSAIC_ORACLE
