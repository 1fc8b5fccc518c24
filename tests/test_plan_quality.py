"""Physical-plan audits: the properties that decide whether a plan survives
a 100 TB scale-up, asserted on `.explain` output so regressions are caught
at test time, not in production.

- dimension joins must broadcast (no shuffle of the fact side for the join)
- scans must push filters and prune columns (ReadSchema is the contract)
- no unconditioned cross joins anywhere in the catalog
- the whole-stage-codegen hot path must not fall back to interpreted
  row-at-a-time Python (no BatchEvalPython in any catalog plan)
"""

from __future__ import annotations

import pytest

from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

SF = None  # filled from fixture


def _plan(spark, name, sf_dir, mode: str = "formatted") -> str:
    df = CATALOG[name].spark(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


# Near-dup operators eagerly materialize + unpersist inside the builder, so
# building their "plan" runs real jobs; exclude them from the cheap sweep
# (their plan shape is asserted via their own operator tests).
_EAGER = {"minhash_lsh_neardups", "ngram_jaccard_neardups", "simhash_neardups",
          "winnow_neardup_pairs", "ivf_ann_topk", "neardup_clusters",
          # one-scan doc-stats materialization (see bm25_topk docstring)
          "bm25_search", "tfidf_search",
          # rewrites the bucketed table at plan-construction time
          "session_fixed_gap_bucketed",
          # trains + encodes (persist/count) at plan-construction time
          "pq_ann_topk", "pq_rerank_all_vs_exact",
          # iterative: runs one job per iteration at plan-construction time
          "pagerank_similarity_graph", "knn_bfs_hops",
          # run the full portable near-dup pipelines (eager builders) to
          # measure recall at plan-construction time
          "minhash_recall_vs_exact", "simhash_recall_vs_exact",
          # eager containment ssjoin builder (localCheckpoint)
          "containment_neardups",
          # iterative merge loop: localCheckpoints the word-type table
          # per step at plan-construction time
          "bpe_tokenizer_train",
          # composes the eager ngram ssjoin stage over its own planted
          # corpus (pair stage localCheckpoints at construction)
          "curation_pipeline_e2e"}

# Sanctioned Arrow-batched Python stages — and ONLY these:
# - media decode (opaque binary payloads, no JVM expression can decode);
# - similarity scoring (dense linear algebra: one numpy/BLAS gemm per
#   Arrow batch; the interpreted per-element HOF lambdas are 100-1000x
#   slower — see operators/similarity.py module docstring).
# Everything else in the catalog must stay native-expression.
_PANDAS_OK = {"media_features", "media_frame_sample",
              "image_ahash_fingerprints",
              # real JPEG codec work (encode + entropy decode) runs
              # inside Arrow-batched mapInPandas by design
              "image_jpeg_ahash", "jpeg_hamming_neardups",
              "image_jpeg420_planes",
              # vectorized per-doc signature math (64-wide majority vote /
              # 64-permutation min matrix) — equality with the pure-
              # expression forms is pinned in test_dedup_similarity.py::
              # TestSimhashVectorizedSignature / TestMinhashVectorizedSignature
              "simhash_neardups", "simhash_recall_vs_exact",
              "minhash_lsh_neardups", "minhash_recall_vs_exact",
              "cosine_topk", "ann_cosine_topk", "embedding_neardups",
              "ann_recall_vs_exact", "ivf_recall_vs_exact",
              # the semantic leg IS cosine_topk (one broadcast query
              # vector scored scan-side by the sanctioned gemm batch);
              # the lexical leg and the fusion stay native
              "semantic_rrf_hybrid_search",
              "ann_multiprobe_topk", "ann_multiprobe_recall_vs_exact",
              "knn_degree_assortativity", "knn_neighbor_jaccard",
              "knn_local_clustering"}


@pytest.mark.parametrize(
    "name", sorted(n for n in CATALOG if n not in _EAGER)
)
def test_no_cartesian_and_no_python_rows(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir, "extended")
    assert "CartesianProduct" not in plan, f"{name} plans an unconditioned cross join"
    if name not in _PANDAS_OK:
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-at-a-time Python"
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
            f"{name} uses a Python stage where native expressions should suffice"
        )


def test_q1_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or \
           "PushedFilters: [LessThanOrEqual(l_shipdate" in plan, plan
    # Column pruning: the 16-column lineitem scan must read only the 7
    # referenced columns — l_comment (the widest) must not be read.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_comment" not in read_schema[0]
    assert "l_shipdate" in read_schema[0] and "l_quantity" in read_schema[0]


def test_revenue_by_nation_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, "revenue_by_nation", sf_dir)
    assert "BroadcastHashJoin" in plan
    # The big fact table must not be sort-merge-joined (that would shuffle
    # the full lineitem scan for the join).
    assert "SortMergeJoin" not in plan


def test_enrichment_broadcasts_static_dim(spark, sf_dir):
    plan = _plan(spark, "stream_static_enrichment", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sessionization_single_shuffle(spark, sf_dir):
    """One hash exchange (on the group keys) is the whole shuffle budget of
    sessionization — a second exchange would mean the plan re-partitions
    needlessly at 100 TB. Also: a partial HashAggregate must sit *before*
    the exchange (map-side combine is what absorbs the reference's phase-4
    hot-user skew)."""
    plan = _plan(spark, "session_fixed_gap", sf_dir, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    pre_exchange = plan.split("Exchange hashpartitioning")[1]
    assert "HashAggregate" in pre_exchange, plan


def test_cosine_topk_broadcasts_queries_not_corpus(spark, sf_dir):
    plan = _plan(spark, "cosine_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan  # 10-row query side broadcast
    # corpus side must be a plain scan into the join, never exchanged first
    before_join = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in before_join


@pytest.mark.parametrize("name", ["session_fixed_gap", "q1_pricing_summary"])
def test_whole_stage_codegen_covers_hot_path(spark, sf_dir, name):
    """Codegen inspection must happen on the *executed* plan (with AQE the
    pre-execution tree is an opaque AdaptiveSparkPlan and codegen explain
    reports zero subtrees for every query); fused stages render as ``*(n)``
    markers. The scan→filter→project→partial-agg hot path must be inside a
    codegen stage."""
    df = CATALOG[name].spark(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "*(1)" in executed, executed


def test_salted_agg_two_stages_no_hot_reducer(spark, sf_dir):
    """The salted plan must contain exactly two hash exchanges (one per
    stage) and the stage-1 grouping must include the salt column."""
    plan = _plan(spark, "salted_skew_aggregation", sf_dir, "simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "_salt" in plan


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from pyspark.sql import functions as F
    from windowsession_using_kafka_flink_docker_spark.operators.skew import salted_agg
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    got = sorted(
        (r.user_id, round(r.s, 2), r.c) for r in
        salted_agg(ev, ["user_id"], {"s": ("sum", "value"), "c": ("count", "value")})
        .withColumnRenamed("s", "s").collect()
    )
    want = sorted(
        (r.user_id, round(r.s, 2), r.c) for r in
        ev.groupBy("user_id").agg(F.sum("value").alias("s"), F.count("value").alias("c")).collect()
    )
    assert got == want


def test_resample_has_no_unbounded_following_frame(spark, sf_dir):
    """BASELINE.md round-5 lesson: WindowExec evaluates
    [currentRow, unboundedFollowing] frames with a per-row tail rescan —
    O(rows²) per key (measured 8x on this query). The forward fill must
    stay a running descending-order frame."""
    plan = _plan(spark, "resample_locf_hourly", sf_dir, "formatted")
    assert "UNBOUNDED FOLLOWING" not in plan.upper(), (
        "resample plans a following frame — re-read BASELINE.md round 5")
    # one Window op, both fills in it, over a single exchange pair
    assert plan.count(") Window") <= 2


def test_runtime_bloom_filter_available_for_selective_joins(spark, sf_dir):
    """At 100 TB, a selective dim-side predicate should inject a runtime
    bloom filter on the fact scan (row-level runtime filtering). The
    size thresholds that gate injection (creation side 10 MB, application
    side 10 GB) are exactly what real fact tables meet and the test
    parquet never will — so lower them here to prove the engine's plans
    DO take the optimization when scale warrants it."""
    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    confs = {
        # application side must SCAN at least this much (default 10 GB —
        # the "is the fact side big enough to be worth filtering" gate);
        # the creation-side threshold is a MAX (dim must be small) and
        # the filtered orders slice already satisfies it.
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "1",
        # runtime filters target SHUFFLE joins; at test scale every dim
        # broadcasts (where DPP, not bloom, is the mechanism), so force
        # the shuffle-join path a 100 TB fact⋈fact join would take.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = (load_table(spark, sf_dir, "orders")
                  .where(F.col("o_orderpriority") == "1-URGENT"))
        li = load_table(spark, sf_dir, "lineitem")
        j = (li.join(orders.hint("merge"),
                     li.l_orderkey == orders.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("extended"))
        assert "might_contain" in plan, (
            "runtime bloom filter not injected on the fact side")
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_partition_pruning_reads_only_matching_partitions(spark, sf_dir):
    """The partitioned-layout roundtrip must plan a scan whose
    PartitionFilters carry the date predicate — i.e. the week-long query
    lists 7 of 30 event_date directories, not the whole table."""
    plan = _plan(spark, "partition_pruning_roundtrip", sf_dir, "formatted")
    assert "PartitionFilters" in plan, plan
    # the date bounds must appear inside the partition filter clause, not
    # as a post-scan Filter over the data columns
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "2024-01-08" in pf and "2024-01-14" in pf, pf


def test_skyline_witness_is_broadcast(spark, sf_dir):
    """The per-price dominance witness table must broadcast back onto
    parts — a shuffle join here would defeat the whole point of
    compressing facts to distinct prices first."""
    plan = _plan(spark, "skyline_pareto_parts", sf_dir, "formatted")
    assert "BroadcastHashJoin" in plan, plan


def test_bucketed_join_entry_zero_exchange(spark, sf_dir):
    """The join_bucketed_zero_shuffle catalog entry must plan NO Exchange
    at all: the bucketed scans satisfy the join's distribution AND the
    join's clustering satisfies the downstream per-customer aggregation.
    Broadcast is disabled so nothing hides a shuffle at test scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "join_bucketed_zero_shuffle", sf_dir, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_q3_top_k_avoids_global_sort_and_broadcasts_dims(spark, sf_dir):
    """Q3's ORDER BY ... LIMIT 10 must plan as TakeOrderedAndProject
    (per-partition top-k + 10-row driver merge, never a global sort),
    and the BUILDING customer slice must broadcast."""
    plan = _plan(spark, "q3_shipping_priority", sf_dir, "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q22_not_exists_becomes_broadcast_anti_join(spark, sf_dir):
    """The correlated NOT EXISTS must reach the physical plan as a
    broadcast left-anti join — the recent-orders projection is one slim
    column after pushdown, so shuffling customers for it would be
    wasted."""
    plan = _plan(spark, "q22_idle_rich_customers", sf_dir, "formatted")
    assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_equi_depth_histogram_has_no_global_sort_of_facts(spark, sf_dir):
    """The histogram entry must NOT contain a single-partition Sort/Window
    over the orders table: the global rank comes from range partitioning
    + per-partition row_number; the only single-partition window is the
    16-row per-partition-count prefix (Exchange SinglePartition feeding a
    16-row aggregate result is fine, one feeding a full-table Sort is
    not). Assert by checking the ntile window function itself is absent
    and a range exchange is present."""
    plan = _plan(spark, "equi_depth_histogram", sf_dir, "formatted")
    assert "ntile" not in plan.lower(), plan
    assert "rangepartitioning" in plan.lower(), plan


def test_interval_merge_and_weighted_median_single_exchange(spark, sf_dir):
    """The round-7 windowed analytics must keep the one-exchange shape
    their docstrings promise: the partition-key exchange feeds the
    running window(s) AND the downstream aggregations (grouping on a
    superset of the partitioning key never re-shuffles)."""
    for name in ("interval_coverage_merge", "weighted_median_price"):
        plan = _plan(spark, name, sf_dir, "simple")
        assert plan.count("Exchange") == 1, f"{name}:\n{plan}"


def test_q19_pushes_disjunction_and_broadcasts_part(spark, sf_dir):
    """Q19's shape: the quantity disjunction must reach the lineitem
    SCAN as a data filter (not evaluate only post-join), the brand
    IN-list must prune the part scan, and the dimension must broadcast
    — the whole point of the disjunctive-predicate entry."""
    plan = _plan(spark, "q19_disjunctive_revenue", sf_dir, "formatted")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the pushed quantity disjunction must reach a scan's PushedFilters
    # block ('formatted' puts filters in the per-node detail)
    pushed = [ln for ln in plan.splitlines()
              if "PushedFilters" in ln and "l_quantity" in ln]
    assert pushed and any("Or(" in ln for ln in pushed), plan


def test_ranged_rank_entries_have_no_fact_scale_single_partition_sort(
        spark, sf_dir):
    """gini_spend_inequality and mann_whitney_spend_ab promise the
    ranged-rank construction: a range exchange must be present and the
    plan must not route the per-user spend frame through a
    single-partition ordered window (the offsets prefix over
    num_ranges rows is the only SinglePartition consumer, and it feeds
    a broadcast, not a Sort of facts)."""
    for name in ("gini_spend_inequality", "mann_whitney_spend_ab"):
        plan = _plan(spark, name, sf_dir, "formatted")
        assert "rangepartitioning" in plan.lower(), (name, plan)


def test_q21_top_k_and_dimension_broadcasts(spark, sf_dir):
    """Q21's decorrelated shape: the final ORDER BY numwait LIMIT 100
    must plan as TakeOrderedAndProject (per-partition top-k, never a
    global sort of the supplier aggregate), and the supplier/nation
    dimensions must broadcast — the fact side shuffles only for the
    per-order and per-supplier aggregates."""
    plan = _plan(spark, "q21_waiting_suppliers", sf_dir, "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # r17: the per-order aggregate carries the unique late supplier's key
    # and late-line count, so the pair frame has ONE consumer — the old
    # filter + re-join shape scanned/joined lineitem twice (exchange
    # reuse never fired on the duplicated pair aggregation).
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 1, plan
    # r18: one fact exchange for BOTH the pair and per-order aggregates —
    # the up-front hash(l_orderkey) repartition satisfies each aggregate's
    # clustering (subset of its group keys), so only the per-supplier
    # aggregate adds a second shuffle (2 total, was 3).
    n_shuffles = sum(1 for ln in plan.splitlines()
                     if ln.lstrip().lstrip(":+- ").startswith("Exchange ("))
    assert n_shuffles <= 2, (n_shuffles, plan)


def test_cramers_v_margins_broadcast_no_fact_self_join(spark, sf_dir):
    """The R x C contingency is assembled from the cell/row/column/total
    aggregates of ONE fact table — the margin frames and the zero-fill
    grid must come back as broadcasts (domain-sized), never as a
    sort-merge join that would re-shuffle anything fact-sized."""
    plan = _plan(spark, "cramers_v_status_priority", sf_dir, "formatted")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_spearman_uses_ranged_ranks_and_broadcast_qty_map(spark, sf_dir):
    """spearman_qty_price promises the ranged-rank construction for BOTH
    margins (range exchange present; the only single-partition windows
    are the 16-row offset prefixes) and a broadcast join for the <=50-row
    quantity rank map."""
    plan = _plan(spark, "spearman_qty_price", sf_dir, "formatted")
    assert "rangepartitioning" in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan
    # the tie-group windows run inside the range partitions, never a
    # single global Sort of the fact projection
    assert "ntile" not in plan.lower(), plan


def test_ndv_kmv_two_stage_kmin_and_two_scans(spark, sf_dir):
    """orders_column_ndv_kmv promises the scale-honest ANALYZE plan:
    the k-min selection is two-stage (per-partition collect_set partials
    merged by the maintainer's bounded-array merge) — NEVER a window
    that funnels a fact column's full distinct-hash set into one task —
    and the entry reads orders exactly twice (one all-columns scalar
    aggregate, one (column, hash) explode), not once per column per
    statistic."""
    plan = _plan(spark, "orders_column_ndv_kmv", sf_dir, "formatted")
    assert "Window" not in plan, plan
    n_scans = sum(1 for ln in plan.splitlines()
                  if ln.lstrip().startswith("(") and "Scan parquet" in ln)
    assert n_scans <= 2, (n_scans, plan)


def test_no_expand_in_benched_plans(spark, sf_dir):
    """No headline-bench entry may plan an Expand: the two-countDistinct
    form q21 originally used duplicates every fact row through the
    aggregation shuffle (measured 1.45 -> 1.18 s at sf0.1 after the
    pair-level rewrite). Expand is legitimate for CUBE/ROLLUP/unpivot
    entries — none of which are benched — so the benched set is held to
    zero."""
    for name in sorted(n for n, s in CATALOG.items()
                       if s.bench and n not in _EAGER):
        plan = _plan(spark, name, sf_dir, "simple")
        assert "Expand" not in plan, f"{name} plans an Expand:\n{plan}"


def test_q20_single_fact_scan_and_windowed_totals(spark, sf_dir):
    """q20_dominant_supplier_parts promises ONE lineitem scan: the
    per-part totals come from a window over the already-aggregated
    (part, supplier) frame, because the aggregate-joined-back form plans
    a second fact scan when exchange reuse does not fire. Four scans
    total (lineitem, part, supplier, nation), dimensions broadcast."""
    plan = _plan(spark, "q20_dominant_supplier_parts", sf_dir, "formatted")
    n_scans = sum(1 for ln in plan.splitlines()
                  if ln.lstrip().startswith("(") and "Scan parquet" in ln)
    assert n_scans <= 4, (n_scans, plan)
    assert "BroadcastHashJoin" in plan, plan
    # r18: one fact exchange feeds BOTH the (part, supplier) aggregate and
    # the per-part window (hash(l_partkey) satisfies both), so only the
    # final supplier-grain aggregate adds a second shuffle (2 total, was 3).
    n_shuffles = sum(1 for ln in plan.splitlines()
                     if ln.lstrip().lstrip(":+- ").startswith("Exchange ("))
    assert n_shuffles <= 2, (n_shuffles, plan)


def test_q15_stages_revenue_once_and_broadcasts_winners(spark, sf_dir):
    """q15_top_supplier_revenue promises the staged decorrelation: the
    per-supplier revenue frame materializes ONCE (localCheckpoint — the
    planner does not reuse the aggregate exchange across the scalar-max
    and probe consumers; measured two lineitem scans without it), so the
    final stage reads at most two parquet scans (supplier, nation) plus
    the checkpointed RDD, and every join is a broadcast."""
    plan = _plan(spark, "q15_top_supplier_revenue", sf_dir, "formatted")
    n_scans = sum(1 for ln in plan.splitlines()
                  if ln.lstrip().startswith("(") and "Scan parquet" in ln)
    assert n_scans <= 2, (n_scans, plan)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q2_single_fact_scan_windowed_correlated_min(spark, sf_dir):
    """q2_min_cost_supplier promises: both dimension filters broadcast
    INTO one lineitem scan before the pair aggregate, the correlated min
    is a window over the aggregated pair frame (no join-back second fact
    scan), and the top-100 is TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "q2_min_cost_supplier", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" in plan, plan


def test_q11_stages_part_values_once(spark, sf_dir):
    """q11_important_part_value promises the staged decorrelation: the
    per-part value frame materializes ONCE (localCheckpoint — measured 2
    lineitem scans without it, same planner behavior q15 measured), so
    the final plan reads ZERO parquet fact scans; the 1-row total joins
    back as a broadcast nested-loop, never a shuffle."""
    plan = _plan(spark, "q11_important_part_value", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 0, plan
    assert "SortMergeJoin" not in plan, plan


def test_q18_single_fact_scan_broadcast_semijoin(spark, sf_dir):
    """q18_large_volume_customers promises: ONE lineitem scan feeds the
    by-order aggregate, the surviving big-order list broadcasts into
    orders and the matches broadcast into customer (both fact-scale at
    100 TB), and the top-100 is TakeOrderedAndProject."""
    plan = _plan(spark, "q18_large_volume_customers", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q5_region_prune_before_fact_shuffles(spark, sf_dir):
    """q5_local_supplier_volume promises: ONE lineitem scan, the ASIA
    nation list broadcast into the customer and supplier scans before
    any fact shuffle, and no forced broadcast of fact-scale tables —
    the fact-fact joins are AQE's choice (broadcast at test scale,
    co-partitioned shuffle at 100 TB). No Cartesian anywhere."""
    plan = _plan(spark, "q5_local_supplier_volume", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q10_filters_prune_both_fact_scans(spark, sf_dir):
    """q10_returned_item_losses promises: the quarter filter and the
    returnflag filter reach their scans (pushed filters), ONE scan per
    fact table, and the top-20 is TakeOrderedAndProject."""
    plan = _plan(spark, "q10_returned_item_losses", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # pushdown evidence: returnflag filter in the lineitem scan's
    # PushedFilters, orderdate bounds in the orders scan's
    assert "EqualTo(l_returnflag,R)" in plan.replace(" ", ""), plan
    assert "o_orderdate" in plan.split("orders.parquet")[0] \
        or "GreaterThanOrEqual(o_orderdate" in plan.replace(" ", ""), plan


def test_q14_single_scan_unforced_dimension_join(spark, sf_dir):
    """q14_promo_revenue_share promises: one date-pruned lineitem scan,
    a 2-column part projection (ReadSchema prunes to p_partkey, p_type),
    and no Cartesian; the dimension join is AQE's choice, not forced."""
    plan = _plan(spark, "q14_promo_revenue_share", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "p_type" in plan, plan


def test_q6_pure_scan_aggregate(spark, sf_dir):
    """q6_forecast_revenue_change promises: NO join of any kind, the
    discount/quantity predicates pushed to the parquet reader, a
    4-column ReadSchema, and one map-side-combined aggregate. (The
    shipdate range applies post-scan because load_table rebuilds
    nanosecond timestamps — the repo-wide property.)"""
    plan = _plan(spark, "q6_forecast_revenue_change", sf_dir, "formatted")
    assert "Join" not in plan, plan
    flat = plan.replace(" ", "")
    assert "GreaterThanOrEqual(l_discount,0.05)" in flat, plan
    assert "LessThan(l_quantity,24.0)" in flat, plan
    assert flat.count("l_orderkey") == 0, plan  # column pruning
    assert "HashAggregate" in plan, plan


def test_q7_pair_predicate_without_cartesian(spark, sf_dir):
    """q7_nation_pair_volume promises: the symmetric-OR nation-pair
    predicate never plans a Cartesian — each side is a broadcast
    semi-filter into its fact-scale dimension, the OR evaluates on the
    joined frame; one lineitem scan."""
    plan = _plan(spark, "q7_nation_pair_volume", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q8_one_aggregate_no_expand(spark, sf_dir):
    """q8_market_share promises: ONE aggregate computes both the
    conditional numerator and the market denominator per year — no
    Expand, no second fact scan, no self-join."""
    plan = _plan(spark, "q8_market_share", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q13_outer_join_double_aggregate(spark, sf_dir):
    """q13_customer_order_distribution promises: a genuine outer join
    (zero-order customers must survive) feeding two aggregates, no
    Expand, no Cartesian."""
    plan = _plan(spark, "q13_customer_order_distribution", sf_dir,
                 "formatted")
    assert "Outer" in plan or "LeftOuter" in plan, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q16_anti_join_single_distinct(spark, sf_dir):
    """q16_supplier_part_counts promises: the NOT-IN exclusion is a
    broadcast LEFT ANTI join (never a correlated per-row NOT IN) and
    the single COUNT(DISTINCT) plans without an Expand (the q21
    two-distinct lesson in reverse)."""
    plan = _plan(spark, "q16_supplier_part_counts", sf_dir, "formatted")
    assert "LeftAnti" in plan, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # r17: no standalone pair-distinct exchange — COUNT(DISTINCT)'s own
    # partial/final pair is the only shuffle pair left (3 -> 2 shuffle
    # Exchange nodes; the pre-.distinct() duplicated the dedup work).
    import re as _re
    shuffles = len(_re.findall(r"\(\d+\) Exchange", plan))
    assert shuffles <= 2, f"{shuffles} shuffle exchanges:\n{plan}"


def test_q4_exists_as_semi_join(spark, sf_dir):
    """q4_priority_late_shipments promises: the correlated EXISTS is ONE
    left-semi join (multi-line matches deduplicate inside the join,
    never a distinct over an inner-join blowup), the quarter filter
    prunes the orders scan, no Cartesian."""
    plan = _plan(spark, "q4_priority_late_shipments", sf_dir, "formatted")
    assert "LeftSemi" in plan, plan
    assert plan.count("orders.parquet") == 1, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan


def _assert_semi_probe_is_preaggregated_fact(plan: str) -> None:
    """r17 optimization pin for the EXISTS-as-MAX rewrites
    (q4_priority_late_shipments, semi_join_late_orders): the lineitem
    side of the semi join must be a per-orderkey max(l_shipdate)
    aggregate — the fact table collapses to one slim row per order via
    map-side partial aggregation BEFORE any exchange/broadcast, never a
    raw 2-column fact projection shipped whole into the join."""
    assert "max(l_shipdate" in plan, plan
    # the aggregate's partial pass must sit directly on the lineitem scan
    # (below the join and below its exchange): find the lineitem scan
    # node id and require a partial_max HashAggregate referencing it.
    assert "partial_max(l_shipdate" in plan, plan


def test_q4_semi_probe_preaggregated(spark, sf_dir):
    plan = _plan(spark, "q4_priority_late_shipments", sf_dir, "formatted")
    _assert_semi_probe_is_preaggregated_fact(plan)


def test_semi_join_late_orders_probe_preaggregated(spark, sf_dir):
    plan = _plan(spark, "semi_join_late_orders", sf_dir, "formatted")
    assert "LeftSemi" in plan, plan
    _assert_semi_probe_is_preaggregated_fact(plan)


def test_q9_part_filter_before_fact_join(spark, sf_dir):
    """q9_product_type_profit promises: the name filter prunes the part
    side before the fact join, ONE lineitem scan, one (nation, year)
    aggregate, no Expand, no Cartesian."""
    plan = _plan(spark, "q9_product_type_profit", sf_dir, "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    flat = plan.replace(" ", "")
    assert "p_name" in flat, plan  # filter present on the part scan side


def test_q12_one_aggregate_both_counts(spark, sf_dir):
    """q12_returnflag_priority_classes promises: one date-pruned
    lineitem scan, a co-partitioned orderkey join, and ONE aggregate
    computing both conditional counts — no Expand, no second scan."""
    plan = _plan(spark, "q12_returnflag_priority_classes", sf_dir,
                 "formatted")
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 1, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ordered_set_percentiles_value_domain_plan(spark, sf_dir):
    """ordered_set_percentiles promises: one orders scan collapsed to
    the per-priority distinct price grid, the only sort a value-domain
    window, ONE final aggregate for all six statistics — no Expand, no
    Cartesian, no global sort of the fact rows."""
    plan = _plan(spark, "ordered_set_percentiles", sf_dir, "formatted")
    assert plan.count("orders.parquet") == 1, plan
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the window runs AFTER the fact rows collapse to the value grid:
    # exactly one HashAggregate pair below the window (partial+final
    # distinct-cents counts), never a Sort over the raw scan
    assert "Window" in plan, plan


def test_trend_grid_family_stages_daily_once(spark, sf_dir):
    """spend_autocorrelation and theil_sen_trend promise the staged
    daily grid: the |users| x |days| aggregate materializes ONCE
    (localCheckpoint — measured 3 events scans for the ACF without it,
    one per grid consumer), so the final stage reads ZERO parquet scans
    and no fact-sized shuffle survives — only grid-sized joins."""
    for name in ("spend_autocorrelation", "theil_sen_trend"):
        plan = _plan(spark, name, sf_dir, "formatted")
        n_scans = sum(1 for ln in plan.splitlines()
                      if ln.lstrip().startswith("(") and "Scan parquet" in ln)
        assert n_scans == 0, (name, n_scans, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_cuped_and_mann_kendall_stage_their_grids(spark, sf_dir):
    """cuped_adjusted_ab stages the armed unit frame and
    mann_kendall_trend the daily grid (both have 3 consumers), so each
    final stage reads ZERO parquet scans — the fact scan happens once
    at checkpoint materialization."""
    for name in ("cuped_adjusted_ab", "mann_kendall_trend"):
        plan = _plan(spark, name, sf_dir, "formatted")
        n_scans = sum(1 for ln in plan.splitlines()
                      if ln.lstrip().startswith("(") and "Scan parquet" in ln)
        assert n_scans == 0, (name, n_scans, plan)


def test_feature_hashing_is_one_scan_no_join(spark, sf_dir):
    """feature_hashed_counts promises: one documents scan pruned to the
    two used columns, explode, ONE map-side-combinable aggregate — no
    join, no window, no second pass."""
    plan = _plan(spark, "feature_hashed_counts", sf_dir, "formatted")
    assert plan.count("documents.parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_feature_moments_is_one_scan_two_aggregates(spark, sf_dir):
    """feature_bucket_moments promises: the same single pruned documents
    pass as the matrix entry, then two map-side-combinable aggregates
    ((doc, bucket) cells -> bucket moments) — no join, no window."""
    plan = _plan(spark, "feature_bucket_moments", sf_dir, "formatted")
    assert plan.count("documents.parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_bloom_prejoin_filters_scan_side_before_exchange(spark, sf_dir):
    """The bloom probe must run as a scan-side Filter on the lineitem
    branch BEFORE that branch's join exchange — pruning after the
    shuffle would defeat the runtime-filter point. The bitmap itself
    arrives by BroadcastNestedLoopJoin (one-row cross join), never a
    shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "bloom_prejoin_urgent_revenue", sf_dir, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    # the probe branch: scan -> bnlj(bitmap) -> filter(bit tests) -> exchange
    smj_probe_side = plan.split("SortMergeJoin")[1]
    assert "shiftleft" in plan and "bit_or" not in smj_probe_side.split(
        "Exchange")[0], plan
    fil = plan.find("shiftleft")
    exch = plan.find("Exchange hashpartitioning(l_orderkey")
    assert fil != -1 and exch != -1 and fil > exch, (
        "probe filter must appear below (after in EXPLAIN text) the "
        "probe-side exchange, i.e. evaluated before it:\n" + plan)


def test_bloom_prejoin_prunes_and_composes_exactly(spark, sf_dir):
    """Pruning power + composed exactness: the probe output must contain
    every true match (no false negatives — the bloom invariant), prune
    the fact table hard, and the probe+join composition must equal the
    plain join exactly."""
    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.operators import bloom as B
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    urgent = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey"))
    pruned = B.bloom_probe(li, "l_orderkey", B.bloom_build(urgent, "o_orderkey"))
    n_fact = li.count()
    n_pruned = pruned.count()
    n_true = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"],
                     "left_semi").count()
    n_pruned_true = pruned.join(
        urgent, pruned["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).count()
    assert n_pruned_true == n_true, "bloom dropped a true match"
    assert n_true <= n_pruned < n_fact, (n_true, n_pruned, n_fact)
    # fp rate under 5% at this build-side cardinality (sizing comment in
    # operators/bloom.py puts the expectation near 0.2-2%)
    assert (n_pruned - n_true) <= 0.05 * max(1, n_fact - n_true)


def test_bpe_rewrite_broadcasts_best_pair_no_shuffle(spark, sf_dir):
    """bpe_tokenizer_train promises (r13 VERDICT item 7): each merge
    step's REWRITE stage joins the vocabulary-bounded word-type table
    against the 1-row best-pair via broadcast — BroadcastNestedLoopJoin
    with ZERO shuffle exchanges — so at 100 TB the per-iteration cost is
    a map over the type table, never a repartition of it. The entry is
    an eager builder (each step localCheckpoints), so the per-step plans
    are read back from the SQL status store rather than from a lazy
    explain."""
    import time

    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        BPE_MERGES,
    )

    store = spark._jsparkSession.sharedState().statusStore()
    # Watermark on the MAX executionId, not executionsCount(): after the
    # status store evicts (long shared-JVM sessions exceed
    # retainedExecutions), count lags the id sequence and an id >= count
    # filter would sweep in earlier tests' BPE runs (saw 25 == 8 in the
    # r15 full-suite run).
    _execs = store.executionsList()
    before = 1 + max((_execs.apply(i).executionId()
                      for i in range(_execs.size())), default=-1)
    CATALOG["bpe_tokenizer_train"].spark(spark, sf_dir)

    def _rewrite_plans():
        out = []
        execs = store.executionsList()
        for i in range(execs.size()):
            e = execs.apply(i)
            if e.executionId() < before:
                continue
            d = e.physicalPlanDescription()
            if "replace(" in d and "BroadcastNestedLoopJoin" in d:
                out.append(d)
        return out

    # the status store fills from the listener bus asynchronously
    deadline = time.time() + 20
    plans = _rewrite_plans()
    while len(plans) < BPE_MERGES and time.time() < deadline:
        time.sleep(0.2)
        plans = _rewrite_plans()
    assert len(plans) == BPE_MERGES, (
        f"expected one rewrite execution per merge step, saw {len(plans)}")
    for d in plans:
        shuffles = (d.count("Exchange hashpartitioning")
                    + d.count("Exchange rangepartitioning")
                    + d.count("Exchange SinglePartition"))
        assert shuffles == 0, (
            "BPE rewrite stage shuffles the word-type table:\n" + d[:2000])
        assert "BroadcastExchange" in d, (
            "best-pair not broadcast into the rewrite:\n" + d[:2000])


def test_curation_e2e_stage_fusion_shape(spark, sf_dir):
    """curation_pipeline_e2e promises (r13 VERDICT item 7, tightened by
    the r15 single-scan rewrite): the five stages compose with no
    cartesian product and no Python stage; every stage boundary is a
    keyed join (semi/anti on doc_id), with the id-only sides broadcast.
    Since r15 the corpus is localCheckpointed once right after the scan,
    so the FINAL plan touches the documents parquet ZERO times (the one
    scan happens inside the eager checkpoint) and every stage reads the
    materialized blocks (ExistingRDD) — the original funnel re-derived
    the gated frame per boundary, 8 corpus scans in one plan."""
    plan = _plan(spark, "curation_pipeline_e2e", sf_dir, "formatted")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan, (
        "stage boundaries must be semi/anti joins")
    assert "BroadcastHashJoin" in plan, (
        "id-list sides should broadcast into the stage joins")
    scans = plan.count("documents.parquet")
    assert scans == 0, (
        f"documents scanned {scans}x in the final plan — the single-scan "
        "rewrite regressed (corpus must come from the checkpoint blocks)")
    assert "ExistingRDD" in plan, (
        "checkpointed corpus must feed the stages as materialized blocks")


def test_session_topn_plan_shapes(spark, sf_dir):
    """session_top10_global / session_top2_per_user promises (promoted
    r15, plans/parity.py): the global top-10 plans as
    TakeOrderedAndProject (per-partition top-k + 10-row merge, never a
    fact-scale single-partition sort); the per-user rank reuses the
    sessionization exchange (one hashpartitioning on user_id feeds
    MergingSessions, Sort, WindowGroupLimit, and Window alike); neither
    plans a cartesian product or a Python stage."""
    topg = _plan(spark, "session_top10_global", sf_dir)
    assert "TakeOrderedAndProject" in topg, topg[:1500]
    for name in ("session_top2_per_user", "session_top10_global"):
        p = _plan(spark, name, sf_dir, "extended")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p and "MapInPandas" not in p

    topu = _plan(spark, "session_top2_per_user", sf_dir, "simple")
    assert topu.count("Exchange hashpartitioning") == 1, topu[:2000]
    assert "WindowGroupLimit" in topu, topu[:2000]


def test_big_customer_alert_single_exchange(spark, sf_dir):
    """The r16 bisect of the r15 bench delta ended by PROVING the plan
    optimal and attributing the delta to host jitter (SURVEY 2.109) —
    this pin keeps it optimal: ONE hashpartitioning exchange on user_id
    reused by both the session aggregation and the first-per-user rank
    window, with WindowGroupLimit pushing the top-1 ahead of the full
    Window. A second exchange or a lost group-limit is a real
    regression; a bench wobble is not."""
    p = _plan(spark, "big_customer_alert", sf_dir, "simple")
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    assert "WindowGroupLimit" in p, p[:2000]
