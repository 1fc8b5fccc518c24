"""Continuous analytics-maintenance job: one process keeping the
statistics families fresh from streams, never recomputing from
the full fact tables.

Wires the analytics maintainer fleet (streaming/analytics_twins.py
plus streaming/session_store.py; see ``--bounded-tokens`` for the
fixed-memory token-state variant):

- ``IncrementalDailyRevenueMaintainer`` over an orders drop-dir —
  per-day cent partials serving the CUSUM change-point and the
  seasonal-naive backtest (the driver-oracled
  ``cusum_changepoint_daily_revenue`` / ``seasonal_naive_backtest``);
- ``IncrementalTableStatsMaintainer`` (#10) on the same orders stream —
  per-column counters/min-max/KMV distinct sketch serving the
  ANALYZE-TABLE report (``orders_column_ndv_kmv``);
- ``IncrementalOrderCountMaintainer`` (#18) on the same orders stream
  (with ``--customer``) — per-customer exact order counts re-deriving
  the Q13 order-count distribution (``q13_customer_order_distribution``);
- ``IncrementalRankTestMaintainer`` (#17) on the same orders stream
  (with ``--customer`` as the static dimension) — per-(segment, arm,
  cents) exact counts re-deriving the BH-FDR rank-test report
  (``bh_fdr_segment_spend``);
- ``IncrementalSetMembershipMaintainer`` (#16) on the same orders
  stream — per-customer epoch bits serving the KMV set-difference
  audit.
- ``BoundedQuantileMaintainer`` (#15) on the same orders stream — the
  bounded bottom-k-by-hash price sample presenting the per-priority
  sample median at fixed state.
- ``IncrementalContingencyMaintainer`` (#11) on the same orders stream —
  R x C cell counts serving the chi-square / Cramér's V report
  (``cramers_v_status_priority``);
- ``IncrementalHhiMaintainer`` (#12) over a lineitem drop-dir with the
  static part dimension broadcast into each micro-batch merge —
  per-(type, supplier) quantity partials serving the concentration
  report (``supplier_hhi_by_parttype``);
- ``IncrementalProfitMaintainer`` (#19) on the same lineitem stream
  (with ``--supplier``/``--nation``/``--orders-dim`` as static
  frames) — per-(nation, year) exact e-4 Q9-profit partials
  re-deriving the driver-oracled ``q9_product_type_profit``;
- ``IncrementalTokenFrequencyMaintainer`` over a documents drop-dir —
  corpus (token, n) counts serving the heavy-hitter and Zipf
  presentations (``heavy_hitter_tokens`` / ``zipf_rank_frequency``);
- ``IncrementalSourceMixMaintainer`` (#13) on the same documents stream —
  per-(source, lang) doc/token counts serving the domain-mix report
  (``source_mix_report``);
- ``IncrementalCupedMaintainer`` (#21) on the same orders stream — the
  per-customer pre/post epoch spend grid re-deriving the driver-oracled
  ``cuped_adjusted_ab`` variance-reduced A/B report;
- ``IncrementalFeatureMomentsMaintainer`` (#22) on the same documents
  stream — the 256-row hashed-feature standardization moments
  re-deriving the driver-oracled ``feature_bucket_moments``;
- ``IncrementalTrendMaintainer`` (#20) over an events drop-dir — the
  per-(user, day-index) daily-cents grid re-deriving the driver-oracled
  ``grouped_ols_trend`` regression report;
- ``IncrementalSessionStoreMaintainer`` (#24) on the same events
  stream — the 10-minute-gap session table maintained by per-user tail
  merge (streaming/session_store.py); late-arrival slices quarantine
  to a dead-letter dir so one late drop-file cannot wedge the job, the
  backlog is logged per batch and at startup, and the job DRAINS the
  quarantine through ``repair_from_dead_letter`` before each resume;
- ``IncrementalBm25IndexMaintainer`` (#25) on the same documents
  stream — the persisted BM25 postings index appended one versioned
  increment per batch (streaming/bm25_index.py); queries serve from
  the index alone with bucket-pruned postings reads;
- ``IncrementalNearDupIndexMaintainer`` (#26) on the same documents
  stream — continuous dedup: each batch probed against the
  MinHash-LSH index of everything ingested so far (near-dup pairs
  persisted per batch), then appended as its own increment
  (streaming/neardup_index.py);
- ``IncrementalUserSpendMaintainer`` over an events drop-dir —
  per-user spend partials serving the Gini inequality report and the
  Welch-t / Mann-Whitney experiment readouts
  (``gini_spend_inequality`` / ``welch_t_spend_ab`` /
  ``mann_whitney_spend_ab``);
- ``IncrementalHllMaintainer`` (#27) on the same events stream — the
  per-(event_type, bucket) HyperLogLog register state (mergeable by
  per-bucket max, bounded by |types| x 512 rows) serving the NDV
  presentation through the same operators/hll.py fold as the batch
  audit;
- ``IncrementalPackingMaintainer`` (#28) on the documents stream —
  training-sequence bins maintained as docs arrive (only a shard's
  last bin is open; closed bins immutable), the same
  operators/packing.py greedy fold as the batch entry, with a loud
  in-order guard (ascending doc_id per shard across batches).

All states are key-space-bounded (calendar days / column domain /
category grid / type x supplier / source x lang / users /
vocabulary), versioned by
batch id, replay-idempotent, and lifecycle-guarded — the same
``_VersionedState`` scheme as the rollup/SCD2/join-view maintainers.
Run either side (or both) from file drop-dirs:

    spark-submit maintain_analytics_job.py \
        --orders /data/orders_incoming --events /data/events_incoming \
        --state-root /data/analytics_state --checkpoint-root /tmp/ckpt
"""

from __future__ import annotations

import argparse
import os

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.streaming import (
    BoundedQuantileMaintainer,
    BoundedTokenFrequencyMaintainer,
    IncrementalOrderCountMaintainer,
    IncrementalProfitMaintainer,
    IncrementalRankTestMaintainer,
    IncrementalSetMembershipMaintainer,
    IncrementalContingencyMaintainer,
    IncrementalDailyRevenueMaintainer,
    IncrementalHhiMaintainer,
    IncrementalSourceMixMaintainer,
    IncrementalTableStatsMaintainer,
    IncrementalTokenFrequencyMaintainer,
    IncrementalCupedMaintainer,
    IncrementalFeatureMomentsMaintainer,
    IncrementalHllMaintainer,
    IncrementalPackingMaintainer,
    IncrementalBm25IndexMaintainer,
    IncrementalJpegFingerprintMaintainer,
    IncrementalNearDupIndexMaintainer,
    IncrementalSessionStoreMaintainer,
    IncrementalTrendMaintainer,
    IncrementalUserSpendMaintainer,
    streaming_bounded_token_frequency_maintenance,
    streaming_contingency_maintenance,
    streaming_daily_revenue_maintenance,
    streaming_hhi_maintenance,
    streaming_hll_maintenance,
    streaming_packing_maintenance,
    streaming_source_mix_maintenance,
    streaming_quantile_maintenance,
    streaming_order_count_maintenance,
    streaming_profit_maintenance,
    streaming_rank_test_maintenance,
    streaming_set_membership_maintenance,
    streaming_table_stats_maintenance,
    streaming_token_frequency_maintenance,
    streaming_cuped_maintenance,
    streaming_feature_moments_maintenance,
    streaming_jpeg_fingerprint_maintenance,
    streaming_bm25_index_maintenance,
    streaming_neardup_index_maintenance,
    streaming_session_store_maintenance,
    streaming_trend_maintenance,
    streaming_user_spend_maintenance,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", default=None,
                    help="orders parquet drop directory (o_orderdate, "
                         "o_totalprice); omit to skip the revenue side")
    ap.add_argument("--events", default=None,
                    help="events parquet drop directory (ts, user_id, "
                         "value); omit to skip the spend side")
    ap.add_argument("--docs", default=None,
                    help="documents parquet drop directory (doc_id, "
                         "text, source, lang); omit to skip the "
                         "token-frequency and domain-mix sides")
    ap.add_argument("--lineitem", default=None,
                    help="lineitem parquet drop directory (l_partkey, "
                         "l_suppkey, l_quantity); omit to skip the "
                         "concentration side")
    ap.add_argument("--part", default=None,
                    help="static part dimension parquet (p_partkey, "
                         "p_type); required with --lineitem")
    ap.add_argument("--customer", default=None,
                    help="customer dimension parquet (c_custkey, "
                         "c_mktsegment); enables maintainer #17 (the "
                         "rank-test counts state) on the orders stream")
    ap.add_argument("--supplier", default=None,
                    help="static supplier dimension parquet (s_suppkey, "
                         "s_nationkey); with --nation and --orders-dim "
                         "enables maintainer #19 (the Q9-profit state) "
                         "on the lineitem stream")
    ap.add_argument("--nation", default=None,
                    help="static nation dimension parquet (n_nationkey, "
                         "n_name); see --supplier")
    ap.add_argument("--orders-dim", default=None,
                    help="orders parquet read as a STATIC frame "
                         "(o_orderkey, o_orderdate) for the order-year "
                         "enrichment of maintainer #19; distinct from "
                         "the --orders drop-dir stream")
    ap.add_argument("--bounded-tokens", action="store_true",
                    help="use the fixed-memory CMS+pool token state "
                         "(maintainer #14) instead of the exact "
                         "vocabulary-bounded one — the extreme-scale "
                         "drop-in where even Heaps-law state is too big")
    ap.add_argument("--compact-every", type=int, default=16,
                    help="fold the serving indexes (#25/#26) whenever "
                         "their increment count reaches N — runs inside "
                         "the foreachBatch thread (the only writer, so "
                         "the compaction quiescence contract holds); "
                         "bounds per-query read amplification on a "
                         "long-running stream. 0 disables the trigger "
                         "(restart-only compaction)")
    ap.add_argument("--state-root", default="/tmp/analytics_state")
    ap.add_argument("--checkpoint-root", default="/tmp/ckpt/analytics")
    args = ap.parse_args()
    if not args.orders and not args.events and not args.docs \
            and not args.lineitem:
        ap.error("at least one of --orders / --events / --docs / "
                 "--lineitem is required")
    if args.lineitem and not args.part:
        ap.error("--lineitem requires --part (the static dimension)")

    spark = get_spark("maintain-analytics-job")
    queries = []
    if args.orders:
        orders = (spark.readStream
                  .schema("o_orderdate TIMESTAMP, o_totalprice DOUBLE, "
                          "o_custkey BIGINT, o_orderkey BIGINT, "
                          "o_orderstatus STRING, o_orderpriority STRING")
                  .parquet(args.orders))
        rev = IncrementalDailyRevenueMaintainer(
            spark, os.path.join(args.state_root, "daily_revenue"))
        queries.append(streaming_daily_revenue_maintenance(
            orders, rev, os.path.join(args.checkpoint_root,
                                      "daily_revenue")))
        # maintainers #10/#11 share the orders stream: ANALYZE-TABLE
        # column statistics and the status x priority contingency state
        stats = IncrementalTableStatsMaintainer(
            spark, os.path.join(args.state_root, "table_stats"))
        queries.append(streaming_table_stats_maintenance(
            orders, stats, os.path.join(args.checkpoint_root,
                                        "table_stats")))
        cont = IncrementalContingencyMaintainer(
            spark, os.path.join(args.state_root, "contingency"))
        queries.append(streaming_contingency_maintenance(
            orders, cont, os.path.join(args.checkpoint_root,
                                       "contingency")))
        # maintainer #15: the bounded per-priority quantile sample
        quant = BoundedQuantileMaintainer(
            spark, os.path.join(args.state_root, "quantile"))
        queries.append(streaming_quantile_maintenance(
            orders, quant, os.path.join(args.checkpoint_root,
                                        "quantile")))
        # maintainer #17: per-(segment, arm, cents) rank-test counts
        # (needs the customer dimension for the segment enrichment)
        if args.customer:
            customer = spark.read.parquet(args.customer)
            rank = IncrementalRankTestMaintainer(
                spark, os.path.join(args.state_root, "rank_test"),
                customer)
            queries.append(streaming_rank_test_maintenance(
                orders, rank, os.path.join(args.checkpoint_root,
                                           "rank_test")))
        # maintainer #18: per-customer exact order counts (the Q13
        # distribution; shares the --customer static dimension)
        if args.customer:
            customer18 = spark.read.parquet(args.customer)
            ocount = IncrementalOrderCountMaintainer(
                spark, os.path.join(args.state_root, "order_count"),
                customer18)
            queries.append(streaming_order_count_maintenance(
                orders, ocount, os.path.join(args.checkpoint_root,
                                             "order_count")))
        # maintainer #16: per-customer epoch membership bits
        member = IncrementalSetMembershipMaintainer(
            spark, os.path.join(args.state_root, "set_membership"))
        queries.append(streaming_set_membership_maintenance(
            orders, member, os.path.join(args.checkpoint_root,
                                         "set_membership")))
        # maintainer #21 shares the orders stream: the per-customer
        # CUPED unit grid (pre/post epoch spend cents)
        cuped = IncrementalCupedMaintainer(
            spark, os.path.join(args.state_root, "cuped"))
        queries.append(streaming_cuped_maintenance(
            orders, cuped, os.path.join(args.checkpoint_root, "cuped")))
    if args.events:
        events = (spark.readStream
                  .schema("ts TIMESTAMP, user_id BIGINT, value DOUBLE, "
                          "event_type STRING")
                  .parquet(args.events))
        spend = IncrementalUserSpendMaintainer(
            spark, os.path.join(args.state_root, "user_spend"))
        queries.append(streaming_user_spend_maintenance(
            events, spend, os.path.join(args.checkpoint_root,
                                        "user_spend")))
        # maintainer #27 shares the events stream: the per-(event_type,
        # bucket) HLL register state — the mergeable-NDV sketch
        hll = IncrementalHllMaintainer(
            spark, os.path.join(args.state_root, "hll_ndv"))
        queries.append(streaming_hll_maintenance(
            events, hll, os.path.join(args.checkpoint_root, "hll_ndv")))
        # maintainer #20 shares the events stream: the per-(user, day)
        # daily-cents grid behind the OLS trend report
        trend = IncrementalTrendMaintainer(
            spark, os.path.join(args.state_root, "trend"))
        queries.append(streaming_trend_maintenance(
            events, trend, os.path.join(args.checkpoint_root, "trend")))
        # maintainer #24 shares the events stream: the incremental
        # session store (10-minute-gap session table kept current by
        # per-user tail merge). The continuous job configures a
        # dead-letter dir so one late drop-file quarantines its late
        # users' raw events (b=<batch_id> parquet, replay-idempotent)
        # instead of crash-looping the query; drain it periodically
        # through the late_event_session_repair path.
        sess = IncrementalSessionStoreMaintainer(
            spark, os.path.join(args.state_root, "session_store"),
            dead_letter_dir=os.path.join(args.state_root,
                                         "session_store_dead_letter"),
            compact_every=args.compact_every or None)
        # Drain dead letters left by a previous run BEFORE the stream
        # resumes — the quiescent moment the crash-safe drain protocol
        # is designed for (streaming/session_store.py:
        # repair_from_dead_letter); the backlog is logged either way so
        # a persistent late-arrival source is visible, never silent.
        pending = sess.dead_letter_backlog()
        if pending:
            drained = sess.repair_from_dead_letter()
            print(f"session_store: drained {drained} of {pending} "
                  "quarantined late event(s) into the store before "
                  "resuming (a remainder belongs to the newest batch — "
                  "it defers one restart so a crash replay can never "
                  "double-count)")
        else:
            print("session_store: dead-letter quarantine empty at start")
        try:
            folded = sess.compact_frozen()
            if folded:
                print(f"session_store: compacted {folded} frozen "
                      "increment(s) before resuming")
        except ValueError as e:
            # a torn LAST frozen increment is healed by the stream's
            # redelivery, not by failing the job before it can start
            print(f"session_store: skipping frozen compaction ({e}); "
                  "the re-delivered batch will overwrite the torn "
                  "increment")
        queries.append(streaming_session_store_maintenance(
            events, sess, os.path.join(args.checkpoint_root,
                                       "session_store")))
    if args.docs:
        docs = (spark.readStream
                .schema("doc_id BIGINT, text STRING, source STRING, "
                        "lang STRING")
                .parquet(args.docs))
        if args.bounded_tokens:
            bfreq = BoundedTokenFrequencyMaintainer(
                spark, os.path.join(args.state_root, "token_freq_bounded"))
            queries.append(streaming_bounded_token_frequency_maintenance(
                docs, bfreq, os.path.join(args.checkpoint_root,
                                          "token_freq_bounded")))
        else:
            freq = IncrementalTokenFrequencyMaintainer(
                spark, os.path.join(args.state_root, "token_freq"))
            queries.append(streaming_token_frequency_maintenance(
                docs, freq,
                os.path.join(args.checkpoint_root, "token_freq")))
        # maintainer #28 shares the documents stream: training-sequence
        # bins maintained from the per-shard tail (closed bins immutable)
        packm = IncrementalPackingMaintainer(
            spark, os.path.join(args.state_root, "packing"))
        queries.append(streaming_packing_maintenance(
            docs, packm, os.path.join(args.checkpoint_root, "packing")))
        # maintainer #13 shares the documents stream: domain-mix state
        mix = IncrementalSourceMixMaintainer(
            spark, os.path.join(args.state_root, "source_mix"))
        queries.append(streaming_source_mix_maintenance(
            docs, mix, os.path.join(args.checkpoint_root, "source_mix")))
        # maintainer #22 shares the documents stream: the 256-row
        # hashed-feature standardization moments
        fmom = IncrementalFeatureMomentsMaintainer(
            spark, os.path.join(args.state_root, "feature_moments"))
        queries.append(streaming_feature_moments_maintenance(
            docs, fmom, os.path.join(args.checkpoint_root,
                                     "feature_moments")))
        # maintainer #23 shares the documents stream: the JPEG aHash
        # chunk-bucket membership (codec once per new doc, set-union
        # merge)
        jfp = IncrementalJpegFingerprintMaintainer(
            spark, os.path.join(args.state_root, "jpeg_fingerprint"))
        queries.append(streaming_jpeg_fingerprint_maintenance(
            docs, jfp, os.path.join(args.checkpoint_root,
                                    "jpeg_fingerprint")))
        # maintainer #25 shares the documents stream: the persisted
        # BM25 postings index appended one versioned increment per
        # batch (inc=batch_id, replay-idempotent; queries serve from
        # the index alone with bucket-pruned postings reads)
        bmi = IncrementalBm25IndexMaintainer(
            spark, os.path.join(args.state_root, "bm25_index"),
            compact_every=args.compact_every or None)
        # Compact at the quiescent restart moment too (same rationale
        # as the session-store drain above) — it also HEALS a torn
        # mid-compaction state left by a crash, which the count trigger
        # would otherwise hit as a fail-closed read on the next batch.
        try:
            folded = bmi.compact()
            if folded:
                print(f"bm25_index: compacted {folded} increment(s) "
                      "before resuming")
        except ValueError as e:
            # a torn LAST batch is healed by the stream's redelivery,
            # not by failing the job before the stream can start
            print(f"bm25_index: skipping compaction ({e}); the "
                  "re-delivered batch will overwrite the torn increment")
        queries.append(streaming_bm25_index_maintenance(
            docs, bmi, os.path.join(args.checkpoint_root,
                                    "bm25_index")))
        # maintainer #26 shares the documents stream: continuous dedup
        # — each batch is probed against the MinHash-LSH index of
        # everything ingested so far (near-dup pairs persisted per
        # batch), then appended as its own increment
        ndi = IncrementalNearDupIndexMaintainer(
            spark, os.path.join(args.state_root, "neardup_index"),
            compact_every=args.compact_every or None)
        try:
            folded = ndi.compact()
            if folded:
                print(f"neardup_index: compacted {folded} increment(s) "
                      "before resuming")
        except ValueError as e:
            print(f"neardup_index: skipping compaction ({e}); the "
                  "re-delivered batch will overwrite the torn increment")
        queries.append(streaming_neardup_index_maintenance(
            docs, ndi, os.path.join(args.checkpoint_root,
                                    "neardup_index")))
    if args.lineitem:
        li = (spark.readStream
              .schema("l_partkey BIGINT, l_suppkey BIGINT, "
                      "l_quantity DOUBLE, l_orderkey BIGINT, "
                      "l_extendedprice DOUBLE, l_discount DOUBLE")
              .parquet(args.lineitem))
        part = spark.read.parquet(args.part)
        hhi = IncrementalHhiMaintainer(
            spark, os.path.join(args.state_root, "hhi"), part)
        queries.append(streaming_hhi_maintenance(
            li, hhi, os.path.join(args.checkpoint_root, "hhi")))
        # maintainer #19: per-(nation, year) exact Q9-profit partials
        # (needs the supplier/nation dimensions and the orders frame
        # for the order year; part is already required)
        if args.supplier and args.nation and args.orders_dim:
            profit = IncrementalProfitMaintainer(
                spark, os.path.join(args.state_root, "profit"),
                part, spark.read.parquet(args.supplier),
                spark.read.parquet(args.nation),
                spark.read.parquet(args.orders_dim))
            queries.append(streaming_profit_maintenance(
                li, profit, os.path.join(args.checkpoint_root,
                                         "profit")))
    for q in queries:
        q.awaitTermination()


if __name__ == "__main__":
    main()
