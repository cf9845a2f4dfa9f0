"""Distributed connected components (operators/components.py).

Graph-shape cases for the min-label-propagation fixpoint, plus the
dedup_clusters property that every cluster_id is a member of its own
cluster (canonical-survivor invariant).
"""

from __future__ import annotations

import pytest

from gdal_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter(spark):
    # a path graph exercises multi-round propagation (diameter = n-1)
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_cycle_and_self_loop(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (9, 9)])
    assert got == {5: 5, 6: 5, 7: 5, 9: 9}


def test_star_merges_in_one_round(spark):
    got = _cc(spark, [(100, k) for k in range(101, 110)])
    assert set(got.values()) == {100}
    assert len(got) == 10


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], ["src", "dst"])
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=2)
