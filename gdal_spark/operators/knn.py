"""kNN join — H3-style k-ring candidate expansion + windowed top-k.

Reference analog: GDAL's gridding nearest-neighbor searches run a quadtree
AOI search then distance-sort with per-quadrant caps (alg/gdalgrid.cpp:
257-325, port/cpl_quad_tree.cpp). Cluster restatement:

  * exact path (small query set): broadcast the queries, cross-probe each
    points partition, window top-k — zero shuffle of the big side beyond
    the final per-query reduction.
  * scale path: explode queries to kring(cell, k) candidate cells, cell
    equi-join against cell-keyed points, window top-k. Ring radius must
    cover the kth neighbor: callers pick `res`/`ring` so the expected
    density makes that hold (or iterate with doubling ring).

Distances are planar euclidean in the native coordinate space (matching
GDALGrid semantics, which operates in projected coords).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gdal_spark.functions import cells as C


def _dist2(qx, qy, px, py):
    return (qx - px) * (qx - px) + (qy - py) * (qy - py)


def knn_join_broadcast(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_xy: tuple[str, str] = ("x", "y"),
    query_xy: tuple[str, str] = ("qx", "qy"),
    query_key: str = "query_id",
    point_key: str = "pt_id",
) -> DataFrame:
    """Exact kNN for a small (broadcastable) query set."""
    px, py = (F.col(c) for c in point_xy)
    qx, qy = (F.col(c) for c in query_xy)
    cand = points.crossJoin(F.broadcast(queries))
    cand = cand.withColumn("dist2", _dist2(qx, qy, px, py))
    w = Window.partitionBy(query_key).orderBy(F.col("dist2").asc(), F.col(point_key).asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_join_cells(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 6,
    ring: int = 1,
    point_xy: tuple[str, str] = ("x", "y"),
    query_xy: tuple[str, str] = ("qx", "qy"),
    query_key: str = "query_id",
    point_key: str = "pt_id",
) -> DataFrame:
    """Scale-path kNN: k-ring cell expansion join.

    Approximate at ring boundaries (exact iff the kth neighbor lies within
    `ring` cells); the big `points` side shuffles once on its cell key —
    at 100 TB that key is also the table's physical partitioning, so the
    exchange is pruned to co-located buckets.
    """
    px, py = (F.col(c) for c in point_xy)
    qx, qy = (F.col(c) for c in query_xy)
    pts = points.withColumn("cell", C.lonlat_cell(px, py, res))
    qrs = queries.withColumn(
        "cell", F.explode(C.kring(C.lonlat_cell(qx, qy, res), ring))
    )
    cand = pts.join(qrs, on="cell", how="inner").withColumn(
        "dist2", _dist2(qx, qy, px, py)
    )
    w = Window.partitionBy(query_key).orderBy(F.col("dist2").asc(), F.col(point_key).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("cell")
    )


def idw_at_queries(
    knn: DataFrame,
    query_key: str = "query_id",
    value_col: str = "z",
    power: float = 2.0,
) -> DataFrame:
    """Inverse-distance-weighted interpolation over a kNN result
    (GDALGridInverseDistanceToAPower semantics, alg/gdalgrid.cpp:61)."""
    wcol = F.lit(1.0) / F.pow(F.sqrt(F.col("dist2")), F.lit(power))
    exact = F.col("dist2") == 0.0
    return (
        knn.withColumn("_w", F.when(exact, F.lit(None)).otherwise(wcol))
        .groupBy(query_key)
        .agg(
            (
                F.coalesce(
                    F.max(F.when(exact, F.col(value_col))),
                    F.sum(F.col("_w") * F.col(value_col)) / F.sum("_w"),
                )
            ).alias("idw_z"),
            F.count(F.lit(1)).alias("n_neighbors"),
        )
    )
