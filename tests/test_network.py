"""GNM network analysis parity (gnm/gnmgraph.cpp): Dijkstra path
convention [(start,-1), (v, edge), ...], bidirectional traversal,
block states, Yen's k-shortest on the canonical example, BFS
connectivity, and the distributed Bellman-Ford against the in-memory
Dijkstra."""

import math

import pytest

from gdal_spark.operators.network import Graph, sssp_bellman_ford


def _simple() -> Graph:
    g = Graph()
    # a weighted diamond: 1 -> 2 -> 4 cheap, 1 -> 3 -> 4 expensive
    g.add_edge(100, 1, 2, cost=1.0)
    g.add_edge(101, 2, 4, cost=1.0)
    g.add_edge(102, 1, 3, cost=2.0)
    g.add_edge(103, 3, 4, cost=5.0)
    return g


def test_dijkstra_path_convention():
    g = _simple()
    path = g.dijkstra_shortest_path(1, 4)
    assert path == [(1, -1), (2, 100), (4, 101)]
    assert g.dijkstra_shortest_path(4, 1) == []  # directed: no way back
    assert g.dijkstra_shortest_path(1, 1) == [(1, -1)]


def test_bidirectional_and_blocked():
    g = Graph()
    g.add_edge(1, 10, 20, bidir=True, cost=1.0)
    g.add_edge(2, 20, 30, bidir=True, cost=1.0)
    assert g.dijkstra_shortest_path(30, 10) == [(30, -1), (20, 2), (10, 1)]
    g.change_block_state(20, True)  # block the middle vertex
    assert g.dijkstra_shortest_path(30, 10) == []
    g.change_block_state(20, False)
    g.change_block_state(2, True)  # block the edge instead
    assert g.dijkstra_shortest_path(30, 10) == []
    g.change_all_block_state(False)
    assert g.dijkstra_shortest_path(30, 10) != []


def test_duplicate_edge_rejected():
    g = _simple()
    with pytest.raises(ValueError):
        g.add_edge(100, 1, 4)


def test_yen_canonical_example():
    # the classic C/D/E/F/G/H network: best 3 paths C->H are
    # C-E-F-H (5), C-E-G-H (7), C-D-F-H (8)
    C, D, E, F, G, H = range(6)
    g = Graph()
    g.add_edge(0, C, D, cost=3)
    g.add_edge(1, C, E, cost=2)
    g.add_edge(2, D, F, cost=4)
    g.add_edge(3, E, D, cost=1)
    g.add_edge(4, E, F, cost=2)
    g.add_edge(5, E, G, cost=3)
    g.add_edge(6, F, G, cost=2)
    g.add_edge(7, F, H, cost=1)
    g.add_edge(8, G, H, cost=2)
    paths = g.k_shortest_paths(C, H, 3)
    assert len(paths) == 3

    def cost(p):
        return sum(g.edges[e]["cost"] for _v, e in p if e in g.edges)

    def verts(p):
        return [v for v, _e in p]

    assert verts(paths[0]) == [C, E, F, H] and cost(paths[0]) == 5
    assert verts(paths[1]) == [C, E, G, H] and cost(paths[1]) == 7
    assert verts(paths[2]) == [C, D, F, H] and cost(paths[2]) == 8


def test_connected_components_bfs():
    g = _simple()
    g.add_edge(200, 7, 8)  # disconnected island
    pairs = g.connected_components([1])
    visited = {v for v, _e in pairs}
    assert visited == {1, 2, 3}  # 4 has no out-edges; island unreached
    assert (1, 100) in pairs and (1, 102) in pairs
    with pytest.raises(ValueError):
        g.connected_components([])


def test_sssp_bellman_ford_matches_dijkstra(spark):
    import random

    rng = random.Random(7)
    g = Graph()
    rows = []
    for eid in range(60):
        a, b = rng.randrange(12), rng.randrange(12)
        if a == b:
            continue
        c = float(rng.randint(1, 9))
        try:
            g.add_edge(eid, a, b, cost=c)
        except ValueError:
            continue
        rows.append((a, b, c))
    edges = spark.createDataFrame(rows, "src long, dst long, cost double")
    got = {
        r.node: r.dist for r in sssp_bellman_ford(edges, start=0).collect()
    }
    # oracle: dijkstra tree marks from the in-memory graph
    for node in g.vertices:
        path = g.dijkstra_shortest_path(0, node)
        if path:
            want = sum(
                g.edges[e]["cost"] for _v, e in path if e in g.edges
            )
            assert got.get(node) == pytest.approx(want), node
        else:
            assert node not in got or math.isinf(got[node])
