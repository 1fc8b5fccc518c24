"""Connected components over a near-duplicate pair graph.

Pair generation (minhash_lsh_pairs / ngram_jaccard_pairs / simhash_near_dups,
operators/dedup.py) emits edges; an actual dedup pipeline must then group
transitively-connected documents into clusters and keep one canonical doc
per cluster — A~B and B~C dedup to one survivor even when A~C was never
emitted. The reference has no graph surface at all (SURVEY.md §2.11); this
is part of the LLM-data-pipeline extension mandate.

Spark-first design: alternating min-label propagation expressed as joins —
each round every node adopts the smallest component label among itself and
its neighbors. Convergence takes O(graph diameter) rounds, and near-dup
graphs are unions of small dense clusters (LSH emits most intra-cluster
edges), so 2-4 rounds is typical; `max_iter` bounds the pathological chain
case. Each round is one shuffle of the (persisted, edge-count-sized) label
frame — no collect, no driver-side graph. At petabyte scale the same loop
holds: the label frame carries (id, comp) longs only, edges are hash-
partitioned once and reused every round, and localCheckpoint truncates the
growing lineage so round N doesn't replan rounds 1..N-1. The classic
refinement for whale-components (large-star/small-star, Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) can replace the
neighbor-min step without changing this interface, but near-dup components
are bounded by LSH bucket caps upstream, so the simple propagation is the
right default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "id", src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Label each node with the minimum node id of its connected component.

    ``nodes``: one row per vertex (isolated vertices become singleton
    components). ``edges``: undirected pairs, one row per edge (either
    orientation). Returns ``(id, comp)`` with ``comp`` = min id reachable.

    Eager: runs one Spark job per propagation round plus a convergence
    probe; callers treat it like the other eager graph/dedup builders
    (`_EAGER` in tests/test_plan_quality.py).
    """
    spark = nodes.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # Symmetrize once; partition by the gather side so every round's
    # edge-label join reuses this layout instead of reshuffling the edges.
    und = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .union(edges.select(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v")))
        .dropDuplicates(["u", "v"])
        .repartition(n_part, "v")
        .localCheckpoint(eager=True)
    )

    lbl = (nodes.select(F.col(id_col).cast("long").alias("id"))
           .dropDuplicates(["id"])
           .withColumn("comp", F.col("id"))
           .localCheckpoint(eager=True))

    for _ in range(max_iter):
        # min label among each node's neighbors (gather over v -> u)
        neigh = (
            und.join(lbl.select(F.col("id").alias("v"), F.col("comp").alias("_nc")), "v")
            .groupBy("u").agg(F.min("_nc").alias("_nc"))
            .select(F.col("u").alias("id"), "_nc")
        )
        # Pointer jumping: also adopt comp(comp(id)) — label chains halve
        # every round, so a diameter-d path converges in O(log d) rounds
        # instead of d (the hash-to-min trick). Both side frames carry
        # (long, long) rows only.
        hop = lbl.select(F.col("id").alias("comp"), F.col("comp").alias("_hc"))
        new_lbl = (
            lbl.join(neigh, "id", "left")
            .join(hop, "comp", "left")
            .select(
                "id",
                F.col("comp").alias("_old"),
                F.least(
                    "comp",
                    F.coalesce("_nc", "comp"),
                    F.coalesce("_hc", "comp"),
                ).alias("comp"),
            )
            .withColumn("_changed", F.col("comp") != F.col("_old"))
            .drop("_old")
            .localCheckpoint(eager=True)
        )
        converged = new_lbl.where("_changed").isEmpty()  # reads the checkpoint, no recompute
        lbl = new_lbl.drop("_changed")
        if converged:
            break
    return lbl


def neardup_clusters(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for every document given near-dup pairs.

    Output: ``(doc_id, cluster_id, cluster_size, is_canonical)`` — one row
    per input document; ``cluster_id`` is the min doc_id in the component;
    the canonical (kept) doc is the one equal to its cluster_id. Filtering
    to ``is_canonical`` is exactly the "keep one per near-dup cluster"
    dedup step.
    """
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src="id_a", dst="id_b")
    size = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(size, "comp")
        .select(
            F.col("id").alias(id_col),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).alias("is_canonical"),
        )
    )


def pagerank(edges: DataFrame, n_nodes_df: DataFrame, damping: float = 0.85,
             iterations: int = 10, src: str = "src", dst: str = "dst",
             checkpoint_every: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the iterative-
    algorithm shape next to connected_components.

    ``rank_i = (1-d)/N + d * sum_{j->i} rank_j / outdeg_j``, run exactly
    ``iterations`` times from the uniform start (1/N). Dangling mass is NOT
    redistributed (nodes with outdeg 0 simply leak their damped mass), so
    the recurrence is a pure join+aggregate both engines can replay
    bit-for-bit — the catalog instantiation uses a k-NN graph where every
    node has outdegree k, so nothing dangles anyway.

    Scale shape: the per-iteration work is one join of the (id, rank)
    frame against the edge list (pre-aggregated to per-src outdegree once)
    and one groupBy(dst) sum — two shuffles over slim long/double frames,
    never the payloads; ``localCheckpoint`` every few rounds truncates the
    lineage so iteration N doesn't replan 1..N-1 (the same discipline as
    the component loop above). Nodes never referenced as a dst fall back
    to the teleport term via the outer join with the node frame.

    ``n_nodes_df``: one-column frame of ALL node ids (ranks must include
    in-degree-0 nodes). Returns (id, rank) un-rounded; callers round.
    """
    nodes = n_nodes_df.toDF("id")
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty node frame")
    out_deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    ed = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), "_deg")
        .repartition(F.col("_dst"))
        .persist()
    )
    ed.count()
    teleport = (1.0 - damping) / n
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contrib = (
            ed.join(ranks, ed._src == ranks.id)
            .select("_dst", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib._dst, "left")
            .select(
                "id",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    return ranks


def pagerank_oracle_sql(edges_cte: str, nodes_cte: str, damping: float = 0.85,
                        iterations: int = 10) -> str:
    """DuckDB replica of :func:`pagerank` as ``iterations`` chained CTEs —
    the same join+aggregate recurrence unrolled, so the oracle replays the
    exact float arithmetic (teleport + d * sum of rank/deg contributions).

    ``edges_cte``/``nodes_cte`` are CTE *names* already defined by the
    caller with columns (src, dst) / (id).
    """
    n_expr = f"(SELECT COUNT(*) FROM {nodes_cte})"
    parts = [
        f"deg AS (SELECT src, COUNT(*) AS deg FROM {edges_cte} GROUP BY src)",
        f"r0 AS (SELECT id, 1.0 / {n_expr} AS rank FROM {nodes_cte})",
    ]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(f"""{cur} AS (
  SELECT n.id,
         (1.0 - {damping}) / {n_expr}
         + {damping} * COALESCE(c.contrib, 0.0) AS rank
  FROM {nodes_cte} n LEFT JOIN (
    SELECT e.dst AS id, SUM(p.rank / deg.deg) AS contrib
    FROM {edges_cte} e
    JOIN deg ON deg.src = e.src
    JOIN {prev} p ON p.id = e.src
    GROUP BY e.dst
  ) c ON c.id = n.id
)""")
    return ",\n".join(parts) + f",\nfinal_rank AS (SELECT * FROM r{iterations})"


def bfs_hops(edges: DataFrame, sources: DataFrame, max_hops: int = 10,
             src: str = "src", dst: str = "dst",
             directed: bool = False) -> DataFrame:
    """Multi-source BFS hop distance over an edge list — the traversal
    primitive next to connected_components (labels) and pagerank (mass):
    "how many similarity hops from any seed document is this one?", the
    query behind contamination-radius and influence-neighborhood checks
    on the near-dup/kNN graphs.

    Frontier algorithm as joins: round h joins the current frontier
    against the (symmetrized unless ``directed``) edge frame, anti-joins
    out already-settled nodes, and stamps survivors with ``hops = h``.
    Exactly-correct distances because frontier h settles ALL nodes at
    hop h before h+1 runs; nodes unreachable within ``max_hops`` are
    absent from the result (callers outer-join if they need NULLs).

    Scale shape: the edge frame is hash-partitioned on the probe side
    once and reused every round; per round the shuffled state is the
    frontier/settled (id, hops) long frames only — never payloads; the
    two driver-side scalars per round (materialize + empty-check) are
    bounded by the hop cap. Only the NEW frontier is materialized each
    round (``localCheckpoint``) — the settled set is kept as the list of
    already-checkpointed per-hop frontiers and only *unioned lazily* for
    the anti-join probe, so per-round materialization cost is
    O(frontier), not O(V) (ADVICE r6: the previous form re-checkpointed
    the whole growing settled set every hop, O(V * max_hops) total). The
    union node count grows with the hop cap, but every leaf is a
    truncated-lineage checkpoint, so round N never replans rounds
    1..N-1.
    """
    from functools import reduce

    if directed:
        sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().repartition(F.col("a")).persist()
    sym.count()
    frontier = (sources.toDF("id").distinct()
                .select("id", F.lit(0).alias("hops"))
                .localCheckpoint(eager=True))
    frontiers = [frontier]
    for h in range(1, max_hops + 1):
        settled_ids = reduce(DataFrame.union,
                             (f.select("id") for f in frontiers))
        nxt = (
            sym.join(frontier, sym.a == frontier.id)
            .select(F.col("b").alias("id")).distinct()
            .join(settled_ids, "id", "left_anti")
            .select("id", F.lit(h).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        frontiers.append(nxt)
        frontier = nxt
    sym.unpersist()
    return reduce(DataFrame.union, frontiers)
