"""PageRank operator semantics against a pure-Python replica."""

from __future__ import annotations

from windowsession_using_kafka_flink_docker_spark.operators.cluster import pagerank


def _reference_pagerank(nodes, edges, damping=0.85, iterations=10):
    """Straightforward dict implementation of the same recurrence
    (no dangling redistribution, fixed iterations, uniform start)."""
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out_deg[s]
        rank = {v: (1 - damping) / n + damping * contrib[v] for v in nodes}
    return rank


def test_matches_reference_on_asymmetric_graph(spark):
    nodes = [1, 2, 3, 4, 5]
    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (4, 1)]  # 5 is isolated+dangling
    nodes_df = spark.createDataFrame([(v,) for v in nodes], "id BIGINT")
    edges_df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.id: r.rank for r in pagerank(edges_df, nodes_df).collect()}
    want = _reference_pagerank(nodes, edges)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # the dangling isolated node keeps exactly the teleport mass
    assert abs(got[5] - 0.15 / 5) < 1e-12
    # a node fed by more in-links outranks its peers
    assert got[2] > got[4]


def test_uniform_on_cycle(spark):
    nodes_df = spark.createDataFrame([(v,) for v in (1, 2, 3)], "id BIGINT")
    edges_df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src BIGINT, dst BIGINT")
    got = {r.id: r.rank for r in pagerank(edges_df, nodes_df).collect()}
    for v in (1, 2, 3):
        assert abs(got[v] - 1 / 3) < 1e-12


class TestBfsHops:
    """bfs_hops vs a plain-Python deque BFS on a fixed graph: two
    components, a cycle, a chain longer than the hop cap, and an
    isolated non-source node."""

    EDGES = [(1, 2), (2, 3), (3, 4), (4, 1),      # 4-cycle
             (3, 5), (5, 6), (6, 7), (7, 8),      # tail chain
             (20, 21), (21, 22)]                  # separate component

    def _brute(self, sources, max_hops, directed=False):
        from collections import defaultdict, deque
        adj = defaultdict(set)
        for a, b in self.EDGES:
            adj[a].add(b)
            if not directed:
                adj[b].add(a)
        dist = {s: 0 for s in sources}
        dq = deque(sources)
        while dq:
            u = dq.popleft()
            if dist[u] == max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    def _run(self, spark, sources, max_hops, directed=False):
        from windowsession_using_kafka_flink_docker_spark.operators.cluster import (
            bfs_hops,
        )
        edges = spark.createDataFrame(self.EDGES, ["src", "dst"])
        src_df = spark.createDataFrame([(s,) for s in sources], ["id"])
        out = bfs_hops(edges, src_df, max_hops=max_hops, directed=directed)
        return {r.id: r.hops for r in out.collect()}

    def test_single_source(self, spark):
        assert self._run(spark, [1], 10) == self._brute([1], 10)

    def test_multi_source_and_other_component(self, spark):
        got = self._run(spark, [1, 20], 10)
        assert got == self._brute([1, 20], 10)
        assert got[22] == 2  # reached through the second seed

    def test_hop_cap_truncates(self, spark):
        got = self._run(spark, [1], 2)
        assert got == self._brute([1], 2)
        assert 6 not in got  # 3 hops away, cap is 2

    def test_directed_respects_orientation(self, spark):
        got = self._run(spark, [5], 10, directed=True)
        assert got == self._brute([5], 10, directed=True)
        assert 3 not in got  # edge (3,5) only points 3 -> 5
