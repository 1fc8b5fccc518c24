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
