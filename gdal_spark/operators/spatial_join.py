"""Cell-partitioned spatial join — the flagship operator.

Re-expresses OGR layer-algebra Intersection (ogr/ogrsf_frmts/generic/
ogrlayer.cpp:5385) for the 100 TB regime:

  GDAL (single node)                    gdal_spark (cluster)
  ------------------------------------  --------------------------------
  nested loop over input layer          cell equi-join (shuffle or
                                        broadcast on the packed cell key)
  envelope pre-filter on method extent  bbox column conjunction BEFORE the
  (ogrlayer.cpp:4004)                   exact UDF (Catalyst-visible)
  prepared geometries per filter        per-Arrow-batch polygon prep inside
  (ogrlayer.cpp:3919)                   the pandas UDF (parse WKB once per
                                        distinct polygon per batch)
  -                                     pair dedup (same pair found in many
                                        cells) via the REFERENCE-POINT rule
                                        (keep the pair only in the one cell
                                        containing the intersection-bbox
                                        corner) — a filter, not a shuffle
  -                                     skew: hot cells salted S ways +
                                        AQE skew-join as backstop

Predicates:
  * center_within — image footprint center inside polygon (ray casting,
    ogrlinearring.cpp:452 semantics)
  * intersects    — image footprint box intersects polygon exactly
                    (box clip non-empty)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gdal_spark.functions import cells as C
from gdal_spark.functions import geom


def box_intersects_by_id_udf(poly_map: dict):
    """Exact box-polygon intersection keyed by polygon id —
    polygons ship ONCE per worker in the UDF closure (the dimension is
    already driver-collected for the broadcast join)."""

    @pandas_udf(T.BooleanType())
    def fn(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series,
        pid: pd.Series,
    ) -> pd.Series:
        out = np.zeros(len(xmin), dtype=bool)
        x0 = xmin.to_numpy(float)
        y0 = ymin.to_numpy(float)
        x1 = xmax.to_numpy(float)
        y1 = ymax.to_numpy(float)
        pids = pid.to_numpy()
        for u in np.unique(pids):
            m = pids == u
            out[m] = geom.boxes_intersect_wkb(x0[m], y0[m], x1[m], y1[m], poly_map[int(u)])
        return pd.Series(out)

    return fn


@pandas_udf(T.BooleanType())
def pip_udf(px: pd.Series, py: pd.Series, wkb_col: pd.Series) -> pd.Series:
    """Vectorized point-in-polygon: batches are grouped by distinct polygon
    so each polygon is parsed/prepared once and probed with a numpy array
    of points (prepared-geometry pattern)."""
    out = np.zeros(len(px), dtype=bool)
    pxv = px.to_numpy(dtype=np.float64)
    pyv = py.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb_col)
    for u, buf in enumerate(uniques):
        mask = codes == u
        out[mask] = geom.points_in_wkb(pxv[mask], pyv[mask], bytes(buf))
    return pd.Series(out)


@pandas_udf(T.BooleanType())
def box_intersects_udf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series, wkb_col: pd.Series
) -> pd.Series:
    """Exact box-polygon intersection, vectorized per distinct polygon
    (geom.boxes_intersect_wkb decision ladder; the per-row clip runs only
    for edge-crossing-without-containment leftovers)."""
    out = np.zeros(len(xmin), dtype=bool)
    x0 = xmin.to_numpy(float)
    y0 = ymin.to_numpy(float)
    x1 = xmax.to_numpy(float)
    y1 = ymax.to_numpy(float)
    codes, uniques = pd.factorize(wkb_col)
    for u, buf in enumerate(uniques):
        m = codes == u
        out[m] = geom.boxes_intersect_wkb(x0[m], y0[m], x1[m], y1[m], bytes(buf))
    return pd.Series(out)


# beyond this many edges the unrolled-codegen PIP expression would bloat
# the generated method; larger polygons use the interpreted aggregate path
_UNROLL_MAX_EDGES = 32


def _edges_rows(poly_map: dict) -> list[tuple]:
    """(poly_id, [[ylo, yhi, x1, y1, slope], ...]) — every NON-HORIZONTAL
    ring edge of the polygon (horizontal edges never satisfy the half-open
    crossing rule), exteriors and holes together: even-odd ray-casting
    parity over the union of ring edges IS point-in-polygon-with-holes.
    Slope and the y-interval are precomputed driver-side so the per-probe
    test is 3 comparisons + 1 fma."""
    from gdal_spark.functions import wkb as W

    rows = []
    for pid, buf in poly_map.items():
        edges = []
        for rings in W.polygon_rings(buf):
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                for (x1, y1), (x2, y2) in zip(r[:-1].tolist(), r[1:].tolist()):
                    if y1 == y2:
                        continue
                    edges.append(
                        [min(y1, y2), max(y1, y2), x1, y1, (x2 - x1) / (y2 - y1)]
                    )
        rows.append((pid, edges))
    return rows


@pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
def edges_array_udf(wkb_col: pd.Series) -> pd.Series:
    """WKB -> prepared edge array [[ylo,yhi,x1,y1,slope],...] (computed
    once per POLYGON row — it then rides the shuffle instead of raw WKB,
    so the exact phase never leaves the JVM)."""
    from gdal_spark.functions import wkb as W

    out = []
    for buf in wkb_col:
        edges = []
        for rings in W.polygon_rings(bytes(buf)):
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                for (x1, y1), (x2, y2) in zip(r[:-1].tolist(), r[1:].tolist()):
                    if y1 == y2:
                        continue
                    edges.append(
                        [min(y1, y2), max(y1, y2), x1, y1, (x2 - x1) / (y2 - y1)]
                    )
        out.append(edges)
    return pd.Series(out)


def pip_unrolled_from_array(cx, cy, edges, cap: int):
    """Crossing parity over edges[0..cap-1] as a fully-unrolled codegen
    expression; F.get past the array end yields NULL -> term 0, so
    shorter polygons need no padding (getItem would raise under ANSI)."""
    parity = None
    for i in range(cap):
        e = F.get(edges, i)
        ylo, yhi = e.getItem(0), e.getItem(1)
        x1, y1, sl = e.getItem(2), e.getItem(3), e.getItem(4)
        hit = (ylo <= cy) & (cy < yhi) & (cx < x1 + (cy - y1) * sl)
        bit = F.when(hit, F.lit(1)).otherwise(F.lit(0))
        parity = bit if parity is None else parity + bit
    return parity % 2 == 1


def pip_edges_predicate(cx, cy, edges):
    """Pure-JVM ray casting: crossing parity via F.aggregate over the
    polygon's prepared edge array — no Python boundary at all. Half-open
    crossing rule of OGRLinearRing::isPointInRing
    (ogr/ogrlinearring.cpp:452-521): for a non-horizontal edge,
    (y1<=y<y2 or y2<=y<y1) == (ylo<=y<yhi), and x < x-intersection."""

    def step(acc, e):
        ylo, yhi = e.getItem(0), e.getItem(1)
        x1, y1, slope = e.getItem(2), e.getItem(3), e.getItem(4)
        hit = (ylo <= cy) & (cy < yhi) & (cx < x1 + (cy - y1) * slope)
        return acc + F.when(hit, F.lit(1)).otherwise(F.lit(0))

    return F.aggregate(edges, F.lit(0), step) % 2 == 1


def _cells_side(
    df: DataFrame, res: int, bbox: tuple[str, str, str, str], out: str = "cell"
) -> DataFrame:
    xmin, ymin, xmax, ymax = bbox
    return df.withColumn(
        out,
        F.explode(
            C.cover_cells(F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax), res)
        ),
    )


def spatial_join(
    left: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    predicate: str = "center_within",
    left_bbox: tuple[str, str, str, str] = ("lon_min", "lat_min", "lon_max", "lat_max"),
    poly_bbox: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    left_key: str = "image_id",
    poly_key: str = "poly_id",
    broadcast_polygons: bool | None = None,
    salt: int = 0,
    carry: list[str] | None = None,
    keep_wkb: bool = False,
) -> DataFrame:
    """Join `left` rows (bbox'd) to polygons (wkb + bbox) they hit.

    Returns left rows + matching polygon key columns (inner, 1:N across
    polygons, each pair exactly once).

    broadcast_polygons: None = let Catalyst/AQE decide (autoBroadcast
    threshold); True = force broadcast (dims <= ~64MB: no shuffle at all);
    False = shuffle path, optionally salted `salt` ways for hot cells.

    Exactly-once pairs WITHOUT a dedup shuffle:
      * center_within probes a point, which lies in exactly one cell —
        the left side is keyed by that single cell (no explode at all).
      * intersects explodes the left bbox, and a pair discovered in many
        shared cells is kept only in the cell containing the lower-left
        corner of the two bboxes' intersection (a point both cover sets
        contain) — the standard reference-point rule, evaluated as a
        Catalyst column filter instead of dropDuplicates.
    """
    if carry is not None:
        # prune to keys + bbox + requested pass-throughs BEFORE the join:
        # every column kept here is buffered through the Python-UDF filter
        # for millions of candidate pairs, so width is a first-order cost
        left = left.select(*dict.fromkeys([left_key, *left_bbox, *carry]))
        polygons = polygons.select(*dict.fromkeys([poly_key, *poly_bbox, "wkb"]))

    # broadcast path: the polygon dim is driver-sized anyway, so ship each
    # worker the geometry ONCE (closure) and keep wkb out of the join
    poly_map: dict | None = None
    wkb_dim: DataFrame | None = None
    if broadcast_polygons:
        poly_map = {
            r[0]: bytes(r[1]) for r in polygons.select(poly_key, "wkb").collect()
        }
        if keep_wkb:
            wkb_dim = polygons.select(poly_key, "wkb")
        polygons = polygons.drop("wkb")
    shuffle_cap = 0
    if not broadcast_polygons and predicate == "center_within":
        # shuffle path: prepared edges computed ONCE per polygon row ride
        # the shuffle instead of WKB, and the exact phase unrolls to the
        # ACTUAL max edge count (one cheap agg over the polygon side —
        # O(polygons), amortized against O(candidates) probe work)
        polygons = polygons.withColumn("edges", edges_array_udf(F.col("wkb")))
        row = polygons.select(F.max(F.size("edges")).alias("m")).collect()
        shuffle_cap = int(row[0]["m"] or 0)
        if 0 < shuffle_cap <= 2 * _UNROLL_MAX_EDGES:
            # Flatten the prepared edges to SCALAR double columns on the
            # polygon side (O(polygons) rows) BEFORE the pair explosion.
            # Catalyst pushes the parity filter into the cell-join
            # condition, and a condition over flat doubles is the same
            # proven-fast shape as the broadcast path; leaving `edges`
            # as array<array<double>> instead re-extracts ~5*cap nested
            # elements per CANDIDATE PAIR inside the join condition,
            # measured 4x slower end-to-end (BENCH/SKEW.md fixture).
            flat = [
                F.get(F.col("edges"), i).getItem(j).alias(f"_e{i}_{f}")
                for i in range(shuffle_cap)
                for j, f in enumerate(("ylo", "yhi", "x1", "y1", "sl"))
            ]
            keep = [c for c in polygons.columns
                    if c != "edges" and (keep_wkb or c != "wkb")]
            polygons = polygons.select(*keep, *flat)

    lx0, ly0, lx1, ly1 = (F.col(c) for c in left_bbox)
    if predicate == "center_within":
        lc = left.withColumn(
            "cell", C.lonlat_cell((lx0 + lx1) / 2.0, (ly0 + ly1) / 2.0, res)
        )
    else:
        lc = _cells_side(left, res, left_bbox, "cell")
    pc = _cells_side(polygons, res, poly_bbox, "cell")

    if salt > 1 and not broadcast_polygons:
        # replicate each polygon-cell row `salt` ways; probes pick one slot
        pc = pc.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        lc = lc.withColumn("_salt", F.pmod(F.xxhash64(F.col(left_key)), F.lit(salt)))
        join_keys = ["cell", "_salt"]
    else:
        join_keys = ["cell"]

    if broadcast_polygons:
        pc = F.broadcast(pc)

    cand = lc.join(pc, on=join_keys, how="inner")

    # phase 1: envelope conjunction (Catalyst-visible, codegen'd)
    px0, py0, px1, py1 = (F.col(c) for c in poly_bbox)
    cand = cand.filter((lx0 <= px1) & (px0 <= lx1) & (ly0 <= py1) & (py0 <= ly1))

    # phase 2: exact kernel
    if predicate == "center_within":
        cx = (lx0 + lx1) / 2.0
        cy = (ly0 + ly1) / 2.0
        if poly_map is not None:
            # stay 100% JVM: broadcast-join per-polygon edge data and
            # evaluate crossing parity inside the join condition. A
            # pandas-UDF filter here bottlenecks on the Arrow boundary and
            # double-books every core (JVM serializer + Python worker per
            # task); an F.aggregate lambda stays JVM but drops the whole
            # join out of codegen (interpreted + per-element allocation).
            # Small polygons therefore take the UNROLLED path: edges
            # padded to a fixed width of flat double columns, parity as a
            # branch-free codegen'd expression.
            spark = polygons.sparkSession
            edge_rows = _edges_rows(poly_map)
            max_e = max((len(e) for _, e in edge_rows), default=0)
            key_t = dict(cand.dtypes)[poly_key]
            if 0 < max_e <= _UNROLL_MAX_EDGES:
                flat = []
                for pid, edges in edge_rows:
                    row = [pid]
                    for ylo, yhi, x1, y1, sl in edges:
                        row += [ylo, yhi, x1, y1, sl]
                    # padding edge: empty y-interval, never crosses
                    row += [1.0, 0.0, 0.0, 0.0, 0.0] * (max_e - len(edges))
                    flat.append(tuple(row))
                names = [
                    f"_e{i}_{f}"
                    for i in range(max_e)
                    for f in ("ylo", "yhi", "x1", "y1", "sl")
                ]
                schema = f"{poly_key} long, " + ", ".join(f"{n} double" for n in names)
                edges_df = spark.createDataFrame(flat, schema).withColumn(
                    poly_key, F.col(poly_key).cast(key_t)
                )
                cand = cand.join(F.broadcast(edges_df), on=poly_key)
                parity = None
                for i in range(max_e):
                    ylo, yhi = F.col(f"_e{i}_ylo"), F.col(f"_e{i}_yhi")
                    x1, y1, sl = (
                        F.col(f"_e{i}_x1"), F.col(f"_e{i}_y1"), F.col(f"_e{i}_sl")
                    )
                    hit = (ylo <= cy) & (cy < yhi) & (cx < x1 + (cy - y1) * sl)
                    bit = F.when(hit, F.lit(1)).otherwise(F.lit(0))
                    parity = bit if parity is None else parity + bit
                cand = cand.filter(parity % 2 == 1).drop(*names)
            else:
                edges_df = spark.createDataFrame(
                    edge_rows, f"{poly_key} long, edges array<array<double>>"
                ).withColumn(poly_key, F.col(poly_key).cast(key_t))
                cand = cand.join(F.broadcast(edges_df), on=poly_key)
                cand = cand.filter(pip_edges_predicate(cx, cy, F.col("edges"))).drop(
                    "edges"
                )
        elif 0 < shuffle_cap <= 2 * _UNROLL_MAX_EDGES:
            # fully-codegen unrolled parity over the flat edge columns;
            # a NULL edge slot (shorter polygon) makes `hit` NULL and
            # the WHEN falls to 0 — no padding rows needed
            parity = None
            names = []
            for i in range(shuffle_cap):
                ylo, yhi = F.col(f"_e{i}_ylo"), F.col(f"_e{i}_yhi")
                x1, y1, sl = (
                    F.col(f"_e{i}_x1"), F.col(f"_e{i}_y1"), F.col(f"_e{i}_sl")
                )
                names += [f"_e{i}_{f}"
                          for f in ("ylo", "yhi", "x1", "y1", "sl")]
                hit = (ylo <= cy) & (cy < yhi) & (cx < x1 + (cy - y1) * sl)
                bit = F.when(hit, F.lit(1)).otherwise(F.lit(0))
                parity = bit if parity is None else parity + bit
            cand = cand.filter(parity % 2 == 1).drop(*names)
        else:
            # arbitrarily complex polygons: Arrow-batched kernel fallback
            cand = cand.filter(pip_udf(cx, cy, F.col("wkb"))).drop("edges")
    elif predicate == "intersects":
        # reference-point dedup BEFORE the exact kernel: evaluate the UDF
        # once per pair, not once per shared cell
        ref_cell = C.lonlat_cell(F.greatest(lx0, px0), F.greatest(ly0, py0), res)
        cand = cand.filter(F.col("cell") == ref_cell)
        if poly_map is not None:
            cand = cand.filter(
                box_intersects_by_id_udf(poly_map)(lx0, ly0, lx1, ly1, F.col(poly_key))
            )
        else:
            cand = cand.filter(
                box_intersects_udf(lx0, ly0, lx1, ly1, F.col("wkb"))
            )
    else:
        raise ValueError(f"unknown predicate {predicate!r}")

    drop = ["cell"] + (["_salt"] if salt > 1 and not broadcast_polygons else [])
    cand = cand.drop(*drop)
    if wkb_dim is not None:
        # geometry re-attached AFTER filtering: only final pairs pay for it
        cand = cand.join(F.broadcast(wkb_dim), on=poly_key)
    return cand


def count_per_polygon(joined: DataFrame, poly_key: str = "poly_id") -> DataFrame:
    return joined.groupBy(poly_key).agg(F.count(F.lit(1)).alias("n_images"))
