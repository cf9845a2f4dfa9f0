"""Distributed coverage simplification (operators/coverage.py) vs the
properties GEOS CoverageSimplifier guarantees: shared boundaries simplify
identically on both sides, junction (T-)nodes survive, area transfers
balance. Reference: apps/gdalalg_vector_simplify_coverage.cpp."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geom as G
from gdal_spark.functions import simplify as S
from gdal_spark.functions import wkb as W
from gdal_spark.operators.coverage import simplify_coverage
from gdal_spark.queries.simplify_entries import COV_TOL, _coverage_polys


def _cov_df(spark, ks):
    rows = []
    for k in ks:
        for i, buf in enumerate(_coverage_polys(k)):
            rows.append((k * 4 + i, bytearray(buf)))
    return spark.createDataFrame(rows, "poly_id: long, wkb: binary")


def _seg_multiset(buf):
    segs = set()
    for poly in W.polygon_rings(bytes(buf)):
        for ring in poly:
            v = np.asarray(ring)
            for i in range(len(v) - 1):
                a, b = tuple(v[i]), tuple(v[i + 1])
                segs.add((min(a, b), max(a, b)))
    return segs


class TestCoverageSimplify:
    def test_tnode_preserved_but_naive_drops_it(self, spark):
        out = {
            r["poly_id"]: bytes(r["wkb"])
            for r in simplify_coverage(_cov_df(spark, [0]), COV_TOL).collect()
        }
        a_simplified = out[0]
        # coverage result keeps the T-node at (10,10): 6 ring points
        assert S.n_points_wkb(a_simplified) == 6
        ring = W.polygon_rings(a_simplified)[0][0]
        assert any(tuple(v) == (10.0, 10.0) for v in ring)
        # naive per-polygon DP on the same input drops it
        naive = S.simplify_wkb(bytes(_coverage_polys(0)[0]), COV_TOL)
        assert S.n_points_wkb(naive) == 5

    @pytest.mark.parametrize("k", [0, 1, 3, 7, 13])
    def test_shared_boundaries_conformal(self, spark, k):
        """Every interior boundary segment of the simplified coverage
        appears exactly twice (once per owner) -> no slivers or gaps."""
        out = [
            bytes(r["wkb"])
            for r in simplify_coverage(_cov_df(spark, [k]), COV_TOL).collect()
        ]
        assert len(out) == 3
        from collections import Counter

        counts = Counter()
        for buf in out:
            for s in _seg_multiset(buf):
                counts[s] += 1
        # interior segments are exactly the doubles; they must form the
        # A-B, A-C and B-C boundaries and nothing may appear 3+ times
        assert max(counts.values()) == 2
        doubles = [s for s, c in counts.items() if c == 2]
        assert len(doubles) >= 3

    def test_bump_threshold_and_area_transfer(self, spark):
        # k=1 -> d=0.04 removed; k=4 -> d=0.16 kept
        for k, kept in [(1, False), (4, True)]:
            res = {
                r["poly_id"] % 4: bytes(r["wkb"])
                for r in simplify_coverage(_cov_df(spark, [k]), COV_TOL).collect()
            }
            d = (k % 5) * 0.04
            area_a = G.wkb_area(res[0])
            area_b = G.wkb_area(res[1])
            if kept:
                assert area_a == pytest.approx(200.0 - 5 * d)
                assert area_b == pytest.approx(100.0 + 5 * d)
            else:
                assert area_a == pytest.approx(200.0)
                assert area_b == pytest.approx(100.0)
            # conservation either way
            total = area_a + area_b + G.wkb_area(res[2])
            assert total == pytest.approx(400.0)

    def test_multiple_instances_dont_interact(self, spark):
        out = simplify_coverage(_cov_df(spark, [0, 1, 2]), COV_TOL)
        rows = out.collect()
        assert len(rows) == 9
        total = sum(G.wkb_area(bytes(r["wkb"])) for r in rows)
        assert total == pytest.approx(3 * 400.0)

    def test_island_ring_single_label(self, spark):
        """A polygon with no neighbors (island): its whole ring is one
        closed chain, simplified like plain ring DP, identically stable."""
        ring = np.array(
            [(0, 0), (2, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=float
        )
        df = spark.createDataFrame(
            [(99, bytearray(W.write_polygon([ring])))], "poly_id: long, wkb: binary"
        )
        out = simplify_coverage(df, 0.1).collect()
        assert len(out) == 1
        got = W.polygon_rings(bytes(out[0]["wkb"]))[0][0]
        assert len(got) == 5  # collinear midpoint removed, ring closed
        assert G.wkb_area(bytes(out[0]["wkb"])) == pytest.approx(16.0)


class TestCoverageCheck:
    def test_planted_defects_detected(self, spark):
        from gdal_spark.operators.coverage import (
            boundary_segment_stats,
            overlap_pairs,
        )
        from gdal_spark.queries.simplify_entries import (
            CHECK_CELL,
            _check_polys,
        )

        rows = []
        for k in (0, 1, 2):
            for i, buf in enumerate(_check_polys(k)):
                rows.append((k * 8 + i, bytearray(buf)))
        df = spark.createDataFrame(rows, "poly_id: long, wkb: binary")
        stats = boundary_segment_stats(df).collect()
        by_k = {}
        for r in stats:
            kk = r["min_owner"] // 8
            by_k.setdefault(kk, []).append(r["n_owners"])
        assert sorted(by_k[0]) == [1] * 8 + [2] * 4       # valid
        assert sorted(by_k[1]) == [1] * 12 + [2] * 2      # shifted D
        assert sorted(by_k[2]) == [1] * 6 + [2] * 4 + [3] * 2  # dup E
        ov = overlap_pairs(df, CHECK_CELL).collect()
        got = {(r["poly_a"], r["poly_b"]): round(r["inter_area"], 6) for r in ov}
        assert got == {
            (8, 11): 1.0, (9, 11): 9.0, (10, 11): 9.0,  # k=1 shifted D
            (16, 20): 100.0,                             # k=2 duplicate
        }

    def test_overlap_join_no_cartesian(self, spark):
        from gdal_spark.operators.coverage import overlap_pairs
        from gdal_spark.queries.simplify_entries import (
            CHECK_CELL,
            _check_polys,
        )

        rows = [
            (k * 8 + i, bytearray(buf))
            for k in range(4)
            for i, buf in enumerate(_check_polys(k))
        ]
        df = spark.createDataFrame(rows, "poly_id: long, wkb: binary")
        plan = (
            overlap_pairs(df, CHECK_CELL)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------------------------
# clean_coverage (gdalalg_vector_clean_coverage.cpp / GEOS CoverageCleaner)
# ----------------------------------------------------------------------------


def _sq(x0, y0, s):
    import numpy as np

    return np.array(
        [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)],
        dtype=np.float64,
    )


def test_clean_coverage_min_index(spark):
    from pyspark.sql import types as T

    from gdal_spark.functions import geom as G
    from gdal_spark.functions import wkb as W
    from gdal_spark.operators.coverage import clean_coverage

    schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )
    rows = [
        # 0 and 1 overlap in a 2 x 9.5 staggered notch; 2 is disjoint;
        # 3 sits entirely inside 0 -> fully ceded and dropped
        (0, bytearray(W.write_polygon([_sq(0.001, 0.001, 10)]))),
        (1, bytearray(W.write_polygon([_sq(8, 0.5, 10)]))),
        (2, bytearray(W.write_polygon([_sq(100, 0, 5)]))),
        (3, bytearray(W.write_polygon([_sq(2, 2, 3)]))),
    ]
    df = spark.createDataFrame(rows, schema=schema)
    out = (
        clean_coverage(df, snap_tol=0.01, cell=16.0)
        .toPandas()
        .set_index("poly_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]  # 3 fully ceded
    areas = {i: G.wkb_area(bytes(out.loc[i, "wkb"])) for i in out.index}
    assert abs(areas[0] - 100.0) < 1e-9  # snap removed the 0.001 jitter
    assert abs(areas[1] - 81.0) < 1e-9  # lost the 2 x 9.5 notch
    assert abs(areas[2] - 25.0) < 1e-9
    assert W.bbox(bytes(out.loc[0, "wkb"]))[0] == 0.0
