"""Distributed polygonal-coverage simplification.

Reference parity: `gdal vector simplify-coverage`
(apps/gdalalg_vector_simplify_coverage.cpp), which wraps GEOS
CoverageSimplifier: in a noded polygonal coverage (neighbors share
identical boundary vertex chains), simplification must (a) simplify each
shared boundary exactly once so both owners stay conformal (no slivers or
gaps), and (b) preserve junction nodes — vertices where the set of
adjacent polygons changes (T-nodes) — even when they are collinear for
one of the owners. Independent per-polygon Douglas-Peucker breaks both.

Spark-first decomposition (every stage a DataFrame op, no driver loops):

  1. explode    polygons -> directed boundary segments, each with a
                canonical undirected key (exact coord bytes — a noded
                coverage shares bit-identical vertices).
  2. label      groupBy segment key -> sorted owner set ("pair label").
                One shuffle keyed by an 8-byte hash; this is the analog
                of GEOS's coverage edge classification.
  3. chain      re-join labels to the per-ring ordered segment list, then
                applyInPandas per ring: split the closed walk at label
                changes -> maximal chains; emit (ring -> chain refs in
                order) plus one chain-payload candidate per owner.
  4. simplify   groupBy canonical chain key -> simplify ONCE
                (Douglas-Peucker with chain endpoints pinned).
  5. reassemble join simplified payloads back to the ordered refs and
                rebuild each ring with applyInPandas per polygon.

Deviation from GEOS CoverageSimplifier (documented): no cross-chain
intersection repair — a tolerance large enough to fold one simplified
chain across another is not detected (GEOS steers the simplification
away). The coverage-conformance property (identical shared boundaries,
preserved nodes) is exact.

Scale shape: shuffles are keyed by segment/chain hashes (uniform);
per-ring and per-chain work is local pandas; chain payloads ride the
shuffle as packed float64 bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import simplify as SIMP
from gdal_spark.functions import wkb as W

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType()),
        T.StructField("ring_idx", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("ax", T.DoubleType()),
        T.StructField("ay", T.DoubleType()),
        T.StructField("bx", T.DoubleType()),
        T.StructField("by", T.DoubleType()),
        T.StructField("skey", T.BinaryType()),
    ]
)


def _seg_key(ax: float, ay: float, bx: float, by: float) -> bytes:
    a = np.array([ax, ay]).tobytes()
    b = np.array([bx, by]).tobytes()
    lo, hi = (a, b) if a <= b else (b, a)
    return hashlib.md5(lo + hi).digest()[:12]


def _explode_segments(batches):
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            polys = W.polygon_rings(bytes(r.wkb))
            for ri, ring in enumerate(
                rr for poly in polys for rr in poly
            ):
                v = np.asarray(ring, dtype=np.float64)
                if np.array_equal(v[0], v[-1]):
                    v = v[:-1]  # drop closure; walk is circular
                n = len(v)
                for i in range(n):
                    a, b = v[i], v[(i + 1) % n]
                    rows.append(
                        (
                            r.poly_id, ri, i,
                            float(a[0]), float(a[1]),
                            float(b[0]), float(b[1]),
                            _seg_key(a[0], a[1], b[0], b[1]),
                        )
                    )
        yield pd.DataFrame(
            rows, columns=[f.name for f in _SEG_SCHEMA.fields]
        )


_CHAINREF_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType()),
        T.StructField("ring_idx", T.IntegerType()),
        T.StructField("chain_pos", T.IntegerType()),
        T.StructField("reversed", T.BooleanType()),
        T.StructField("ckey", T.BinaryType()),
        T.StructField("coords", T.BinaryType()),
    ]
)


def _chain_canonical(coords: np.ndarray) -> tuple[bytes, bool, np.ndarray]:
    """Canonical orientation: open chains point from the lexicographically
    smaller endpoint; closed loops rotate to their smallest vertex and
    take the smaller-neighbor direction. Returns (key, was_reversed,
    canonical_coords)."""
    closed = bool(np.array_equal(coords[0], coords[-1]))
    if closed:
        body = coords[:-1]
        i0 = int(np.lexsort((body[:, 1], body[:, 0]))[0])
        rolled = np.roll(body, -i0, axis=0)
        fwd = np.vstack([rolled, rolled[:1]])
        rev = fwd[::-1]
        # pick direction by comparing the second vertex
        use_rev = tuple(rev[1]) < tuple(fwd[1])
        canon = rev if use_rev else fwd
    else:
        use_rev = tuple(coords[-1]) < tuple(coords[0])
        canon = coords[::-1] if use_rev else coords
    key = hashlib.md5(np.ascontiguousarray(canon).tobytes()).digest()[:12]
    return key, use_rev, canon


def _rings_to_chains(key, pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("pos")
    n = len(pdf)
    labels = pdf["label"].to_numpy()
    pts = pdf[["ax", "ay"]].to_numpy()
    # node vertices: where the incoming segment's label differs from the
    # outgoing segment's label (circular walk)
    nodes = [i for i in range(n) if labels[i - 1] != labels[i]]
    rows = []
    poly_id = int(pdf["poly_id"].iloc[0])
    ring_idx = int(pdf["ring_idx"].iloc[0])
    if not nodes:
        # single-label ring (island or fully-shared hole): one closed chain
        coords = np.vstack([pts, pts[:1]])
        ckey, rev, canon = _chain_canonical(coords)
        rows.append((poly_id, ring_idx, 0, rev, ckey, canon.tobytes()))
    else:
        for ci in range(len(nodes)):
            i, j = nodes[ci], nodes[(ci + 1) % len(nodes)]
            idx = (
                list(range(i, j + 1))
                if j > i
                else list(range(i, n)) + list(range(0, j + 1))
            )
            coords = pts[np.array(idx) % n]
            ckey, rev, canon = _chain_canonical(coords)
            rows.append((poly_id, ring_idx, ci, rev, ckey, canon.tobytes()))
    return pd.DataFrame(
        rows, columns=[f.name for f in _CHAINREF_SCHEMA.fields]
    )


def simplify_coverage(df: DataFrame, tol: float) -> DataFrame:
    """df: (poly_id long, wkb binary) noded polygonal coverage.
    Returns (poly_id, wkb) with every boundary chain Douglas-Peucker
    simplified exactly once, chain endpoints (junction nodes) pinned."""
    segs = df.mapInPandas(_explode_segments, schema=_SEG_SCHEMA)
    labels = (
        segs.groupBy("skey")
        .agg(F.sort_array(F.collect_set("poly_id")).alias("owners"))
        .select(
            "skey",
            F.md5(F.concat_ws(",", F.col("owners").cast("array<string>"))).alias(
                "label"
            ),
        )
    )
    labeled = segs.join(labels, "skey")
    refs = labeled.groupBy("poly_id", "ring_idx").applyInPandas(
        _rings_to_chains, schema=_CHAINREF_SCHEMA
    )

    simp_schema = T.StructType(
        [
            T.StructField("ckey", T.BinaryType()),
            T.StructField("scoords", T.BinaryType()),
        ]
    )

    def _simplify_chain(key, pdf: pd.DataFrame) -> pd.DataFrame:
        coords = np.frombuffer(bytes(pdf["coords"].iloc[0]), np.float64).reshape(-1, 2)
        closed = bool(np.array_equal(coords[0], coords[-1]))
        if closed:
            out = SIMP.simplify_ring(coords, tol)
            if out is None:
                out = coords  # preserve-topology: keep degenerate loops
        else:
            out = SIMP.dp_simplify(coords, tol)
        return pd.DataFrame(
            {"ckey": [pdf["ckey"].iloc[0]], "scoords": [out.tobytes()]}
        )

    simplified = (
        refs.select("ckey", "coords")
        .groupBy("ckey")
        .applyInPandas(_simplify_chain, schema=simp_schema)
    )

    out_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def _reassemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        poly_id = int(pdf["poly_id"].iloc[0])
        rings = []
        for ring_idx, grp in pdf.groupby("ring_idx"):
            grp = grp.sort_values("chain_pos")
            verts: list[np.ndarray] = []
            for r in grp.itertuples(index=False):
                c = np.frombuffer(bytes(r.scoords), np.float64).reshape(-1, 2)
                if r.reversed:
                    c = c[::-1]
                # chains join end-to-start: drop the duplicated junction
                verts.append(c[:-1])
            ring = np.vstack(verts + [verts[0][:1]])
            rings.append(ring)
        return pd.DataFrame(
            {"poly_id": [poly_id], "wkb": [bytearray(W.write_polygon(rings))]}
        )

    return (
        refs.drop("coords")
        .join(simplified, "ckey")
        .groupBy("poly_id")
        .applyInPandas(_reassemble, schema=out_schema)
    )
