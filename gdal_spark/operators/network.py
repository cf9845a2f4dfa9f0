"""GNM network analysis — gnm/gnmgraph.cpp (GDAL's Geographic Network
Model: the `gnm analyse` dijkstra / kpaths / connectivity commands).

``Graph`` transcribes GNMGraph:
  * AddEdge (:73-116): bidirectional edges register as out-edges of both
    vertices; duplicate edge ids rejected; Delete/ChangeEdge,
    ChangeBlockState (vertex or edge), ChangeAllBlockState.
  * DijkstraShortestPathTree (:457-540): multimap-ordered best-first
    relaxation over out-edges using the DIRECT cost only, skipping
    blocked edges/vertices; path trace-back via GetOppositVertex with
    the reference's [(vertex, edge), ..., (start, -1)-reversed]
    convention (:185-240) — the returned path starts with
    (start, -1) and pairs every following vertex with its incoming
    edge.
  * KShortestPaths (:247-425): Yen's algorithm — spur-node loop,
    infinity-cost edge masking (not deletion), root-path node removal,
    candidate multimap with duplicate suppression.
  * ConnectedComponents (:427-450): BFS from the emitter set returning
    (vertex, out-edge) pairs in visit order (TraceTargets).

``sssp_bellman_ford`` is the 100 TB-shaped form: single-source shortest
path by iterative DataFrame relaxation (edges join + groupBy-min per
round, AQE-friendly, converges in graph-diameter rounds) — Dijkstra's
priority queue is inherently sequential; frontier relaxation is how a
cluster does it.
"""

from __future__ import annotations

import math


class Graph:
    def __init__(self):
        self.vertices: dict[int, dict] = {}
        self.edges: dict[int, dict] = {}

    def add_vertex(self, fid: int):
        if fid not in self.vertices:
            self.vertices[fid] = {"out": [], "blocked": False}

    def add_edge(
        self, con_fid: int, src: int, tgt: int,
        bidir: bool = False, cost: float = 1.0, inv_cost: float = 1.0,
    ):
        if con_fid in self.edges:
            raise ValueError("The edge already exist.")
        self.add_vertex(src)
        self.add_vertex(tgt)
        self.edges[con_fid] = {
            "src": src, "tgt": tgt, "bidir": bidir,
            "cost": float(cost), "inv_cost": float(inv_cost),
            "blocked": False,
        }
        self.vertices[src]["out"].append(con_fid)
        if bidir:
            self.vertices[tgt]["out"].append(con_fid)

    def delete_edge(self, con_fid: int):
        self.edges.pop(con_fid, None)
        for v in self.vertices.values():
            v["out"] = [e for e in v["out"] if e != con_fid]

    def change_edge(self, fid: int, cost: float, inv_cost: float):
        if fid in self.edges:
            self.edges[fid]["cost"] = float(cost)
            self.edges[fid]["inv_cost"] = float(inv_cost)

    def change_block_state(self, fid: int, block: bool):
        if fid in self.vertices:
            self.vertices[fid]["blocked"] = block
        elif fid in self.edges:
            self.edges[fid]["blocked"] = block

    def change_all_block_state(self, block: bool):
        for v in self.vertices.values():
            v["blocked"] = block
        for e in self.edges.values():
            e["blocked"] = block

    def get_opposite_vertex(self, edge_fid: int, vertex_fid: int) -> int:
        e = self.edges.get(edge_fid)
        if e is not None:
            if vertex_fid == e["src"]:
                return e["tgt"]
            if vertex_fid == e["tgt"]:
                return e["src"]
        return -1

    # -- DijkstraShortestPathTree (:457-540) ----------------------------------
    def _shortest_tree(self, start: int, cost_override=None):
        import heapq

        costf = (
            (lambda eid: self.edges[eid]["cost"])
            if cost_override is None
            else (lambda eid: cost_override.get(eid, self.edges[eid]["cost"]))
        )
        marks = {v: math.inf for v in self.vertices}
        if start not in marks:
            return {}
        marks[start] = 0.0
        tree = {start: -1}
        seen: set[int] = set()
        heap = [(0.0, start)]
        while heap:
            mark, cur = heapq.heappop(heap)
            if cur in seen:
                continue
            seen.add(cur)
            for eid in self.vertices[cur]["out"]:
                e = self.edges.get(eid)
                if e is None or e["blocked"]:
                    continue
                tgt = self.get_opposite_vertex(eid, cur)
                new_mark = mark + costf(eid)
                if (
                    tgt not in seen
                    and new_mark < marks[tgt]
                    and not self.vertices[tgt]["blocked"]
                ):
                    marks[tgt] = new_mark
                    tree[tgt] = eid
                    heapq.heappush(heap, (new_mark, tgt))
        return tree

    def dijkstra_shortest_path(
        self, start: int, end: int, cost_override=None
    ) -> list[tuple[int, int]]:
        tree = self._shortest_tree(start, cost_override)
        path = []
        nxt = end
        while True:
            if nxt not in tree:
                return []
            if nxt == start:
                path.append((nxt, -1))
                return path[::-1]
            path.append((nxt, tree[nxt]))
            nxt = self.get_opposite_vertex(tree[nxt], nxt)

    # -- KShortestPaths / Yen (:247-425) --------------------------------------
    def k_shortest_paths(self, start: int, end: int, k: int):
        if k == 0:
            return []
        first = self.dijkstra_shortest_path(start, end)
        if not first:
            return []
        A = [first]
        B: list[tuple[float, list]] = []
        for _ in range(k - 1):
            ak = A[-1]
            for i in range(len(ak) - 1):
                masked: dict[int, float] = {}
                spur = ak[i][0]
                root = ak[: i + 1]
                for other in A:
                    if i >= len(other):
                        continue
                    if root == other[: i + 1] and i < len(other[: i + 1]):
                        if i + 1 < len(other):
                            masked[other[i + 1][1]] = math.inf
                for vtx, _e in root[:-1]:
                    for eid in self.vertices[vtx]["out"]:
                        masked[eid] = math.inf
                spur_path = self.dijkstra_shortest_path(
                    spur, end, cost_override=masked
                )
                if spur_path:
                    full = root + spur_path[1:]
                    cost = sum(
                        self.edges[e]["cost"] if e in self.edges else 0.0
                        for _v, e in full
                    )
                    B.append((cost, full))
            if not B:
                break
            B.sort(key=lambda t: t[0])
            A.append(B[0][1])
            B = [b for b in B if b[1] != A[-1]]
        return A

    # -- ConnectedComponents (:427-450) ---------------------------------------
    def connected_components(self, emitters: list[int]):
        if not emitters:
            raise ValueError("Emitters list is empty.")
        from collections import deque

        marked: set[int] = set()
        out: list[tuple[int, int]] = []
        queue = deque(emitters)
        while queue:
            cur = queue.popleft()
            if cur in marked or cur not in self.vertices:
                continue
            marked.add(cur)
            for eid in self.vertices[cur]["out"]:
                out.append((cur, eid))
                tgt = self.get_opposite_vertex(eid, cur)
                if tgt not in marked:
                    queue.append(tgt)
        return out


def sssp_bellman_ford(edges_df, start: int, max_iter: int = 50):
    """Distributed single-source shortest path over an edges DataFrame
    (src: long, dst: long, cost: double) [+ optional extra key columns,
    e.g. a graph id — relaxation is then per-graph]: iterative frontier
    relaxation, one edges-join + groupBy-min per round, converging in
    diameter rounds. Returns (keys..., node, dist)."""
    from pyspark.sql import functions as F

    keys = [c for c in edges_df.columns if c not in ("src", "dst", "cost")]
    dist = (
        edges_df.select(*keys).distinct()
        .withColumn("node", F.lit(start).cast("long"))
        .withColumn("dist", F.lit(0.0))
        if keys
        else edges_df.sparkSession.createDataFrame(
            [(start, 0.0)], "node long, dist double"
        )
    )
    # join on shared column names (src renamed to node) — expression-based
    # self-joins on a shared lineage trip failAmbiguousSelfJoin
    e = edges_df.withColumnRenamed("src", "node")
    prev_sum = None
    for _ in range(max_iter):
        relaxed = dist.join(e, on=keys + ["node"]).select(
            *keys,
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("cost")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy(*keys, "node")
            .agg(F.min("dist").alias("dist"))
        )
        chk = dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        cur = (chk.n, float(chk.s))
        if cur == prev_sum:
            break
        prev_sum = cur
        dist = dist.localCheckpoint(eager=True)  # cut the iterative lineage
    return dist
