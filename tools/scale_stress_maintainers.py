#!/usr/bin/env python
"""Worst-case merge stress for EVERY incremental maintainer.

The maintainers all pin replay idempotence, but (before round 12) only
#15/#17/#18 had MEASURED worst-case merges — a super-linear state merge
in any of the others could hide behind small micro-batch tests. This
script runs the #17/#18 SCALING protocol over the whole fleet:

    1. seed: merge the FULL fact table as batch 0 (state now holds the
       complete key-space-bounded frame — the worst realistic state);
    2. time: replay the same full table as batch 1, three times. A
       replay recomputes v1 from the v0 base (latest_before), so the
       three samples do identical work; the mean is reported.

Run once per scale factor and compare:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/scale_stress_maintainers.py
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  python tools/scale_stress_maintainers.py

Prints one JSON line {maintainer: mean_merge_sec}. A ratio >2x at
10x data flags a merge whose cost grows with HISTORY rather than with
(batch + bounded state) — exactly the regression the maintainers'
key-space-bounded design promises cannot happen.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-stress-maintainers")
    root = tempfile.mkdtemp(prefix="maint_stress_")

    from windowsession_using_kafka_flink_docker_spark.streaming import (
        BoundedQuantileMaintainer,
        BoundedTokenFrequencyMaintainer,
        IncrementalContingencyMaintainer,
        IncrementalCupedMaintainer,
        IncrementalDailyRevenueMaintainer,
        IncrementalFeatureMomentsMaintainer,
        IncrementalDriftMaintainer,
        IncrementalEwmaMaintainer,
        IncrementalHhiMaintainer,
        IncrementalJoinView,
        IncrementalJpegFingerprintMaintainer,
        IncrementalLedgerMaintainer,
        IncrementalOrderCountMaintainer,
        IncrementalProfitMaintainer,
        IncrementalRankTestMaintainer,
        IncrementalRollupMaintainer,
        IncrementalSessionStoreMaintainer,
        IncrementalSetMembershipMaintainer,
        IncrementalSourceMixMaintainer,
        IncrementalTableStatsMaintainer,
        IncrementalTokenFrequencyMaintainer,
        IncrementalTrendMaintainer,
        IncrementalUserSpendMaintainer,
        Scd2DimensionMaintainer,
    )

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # SCD2 change stream: the event stream read as (key, attr) changes
    scd_changes = events.select(
        "ts", "user_id", F.col("event_type").alias("tier"))
    jv_a = orders.select(F.col("o_custkey").alias("custkey"),
                         "o_orderkey", "o_totalprice")
    jv_b = customer.select(F.col("c_custkey").alias("custkey"), "c_name")

    def state(name: str) -> str:
        return os.path.join(root, name)

    # (label, constructor thunk, batch frame). Constructors take the
    # state dir; merge protocol is uniform via merge_batch except the
    # two-sided join view (handled below).
    fleet = [
        ("ewma", lambda: IncrementalEwmaMaintainer(
            spark, state("ewma")), events),
        ("drift", lambda: IncrementalDriftMaintainer(
            spark, state("drift")), events),
        ("ledger", lambda: IncrementalLedgerMaintainer(
            spark, state("ledger")), events),
        ("daily_revenue", lambda: IncrementalDailyRevenueMaintainer(
            spark, state("daily_revenue")), orders),
        ("user_spend", lambda: IncrementalUserSpendMaintainer(
            spark, state("user_spend")), events),
        ("trend", lambda: IncrementalTrendMaintainer(
            spark, state("trend")), events),
        ("cuped", lambda: IncrementalCupedMaintainer(
            spark, state("cuped")),
         orders.select("o_custkey", "o_orderdate", "o_totalprice")),
        ("token_freq", lambda: IncrementalTokenFrequencyMaintainer(
            spark, state("token_freq")), docs),
        ("table_stats", lambda: IncrementalTableStatsMaintainer(
            spark, state("table_stats")), orders),
        ("contingency", lambda: IncrementalContingencyMaintainer(
            spark, state("contingency")), orders),
        ("hhi", lambda: IncrementalHhiMaintainer(
            spark, state("hhi"), part), li),
        ("source_mix", lambda: IncrementalSourceMixMaintainer(
            spark, state("source_mix")), docs),
        ("feature_moments", lambda: IncrementalFeatureMomentsMaintainer(
            spark, state("feature_moments")), docs),
        ("jpeg_fingerprint", lambda: IncrementalJpegFingerprintMaintainer(
            spark, state("jpeg_fingerprint")), docs.select("doc_id")),
        ("bounded_token_freq", lambda: BoundedTokenFrequencyMaintainer(
            spark, state("bounded_token_freq")), docs),
        ("bounded_quantile", lambda: BoundedQuantileMaintainer(
            spark, state("bounded_quantile")), orders),
        ("set_membership", lambda: IncrementalSetMembershipMaintainer(
            spark, state("set_membership")), orders),
        ("rank_test", lambda: IncrementalRankTestMaintainer(
            spark, state("rank_test"), customer), orders),
        ("order_count", lambda: IncrementalOrderCountMaintainer(
            spark, state("order_count"), customer),
         orders.select("o_custkey", "o_orderkey")),
        ("profit", lambda: IncrementalProfitMaintainer(
            spark, state("profit"), part, supplier, nation, orders), li),
        ("rollup", lambda: IncrementalRollupMaintainer(
            spark, state("rollup")),
         events.select("ts", "event_type", "value")),
        ("scd2", lambda: Scd2DimensionMaintainer(
            spark, state("scd2"), key="user_id", attr_cols=("tier",),
            batch_ts_col="ts", change_order="ts"), scd_changes),
        # #24: replaying the SAME events would (correctly) trip the
        # late-arrival guard, so the stress batch is the full table
        # time-shifted past the store — a full-corpus-sized store merged
        # with a full-ingest-sized delta, the worst tail merge possible.
        ("session_store", lambda: IncrementalSessionStoreMaintainer(
            spark, state("session_store")),
         events.select(
             (F.col("ts") + F.expr("INTERVAL 40 DAYS")).alias("ts"),
             "user_id", "value"),
         events.select("ts", "user_id", "value")),
    ]

    out: dict[str, float | int] = {
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "runs": RUNS,
    }
    for label, build, batch, *rest in fleet:
        maint = build()
        maint.merge_batch(rest[0] if rest else batch, 0)  # seed (untimed)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            maint.merge_batch(batch, 1)  # replay: same base every time
            samples.append(time.perf_counter() - t0)
        out[label] = round(sum(samples) / len(samples), 2)
        print(f"  {label}: {out[label]} s", file=sys.stderr)

    jv = IncrementalJoinView(spark, state("joinview"), key="custkey")
    jv.apply_batch(jv_a, jv_b, 0)
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        jv.apply_batch(jv_a, jv_b, 1)
        samples.append(time.perf_counter() - t0)
    out["joinview"] = round(sum(samples) / len(samples), 2)
    print(f"  joinview: {out['joinview']} s", file=sys.stderr)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
