"""Bucketed-layout tests: co-location must remove exchanges while leaving
results bit-identical to the shuffled plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.sessionize import sessionize
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
from windowsession_using_kafka_flink_docker_spark.sources.bucketed import (
    bucketed_events,
    save_bucketed,
)


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_sessionization_zero_shuffle(spark, sf_dir):
    df = sessionize(bucketed_events(spark, sf_dir))
    plan = _executed(df)
    assert plan.count("Exchange") == 0, plan


def test_bucketed_equals_unbucketed(spark, sf_dir):
    want = sorted(map(str, sessionize(load_table(spark, sf_dir, "events")).collect()))
    got = sorted(map(str, sessionize(bucketed_events(spark, sf_dir)).collect()))
    assert got == want


def test_bucketed_table_written_once_per_fingerprint(spark, sf_dir):
    """Bucketing is an ingest-time layout: the second call for the same
    (sf_dir, buckets) must reuse the table, not rewrite it (no jobs before
    the query itself). Witness: the table's data files are untouched."""
    import glob
    import os

    df1 = bucketed_events(spark, sf_dir)
    tbl = [t.name for t in spark.catalog.listTables()
           if t.name.startswith("events_bucketed_")][0]
    path = (spark.sql(f"DESCRIBE FORMATTED {tbl}")
            .where("col_name = 'Location'")
            .collect()[0].data_type.replace("file:", ""))
    before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(path, "*"))}
    assert before, path
    df2 = bucketed_events(spark, sf_dir)
    after = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(path, "*"))}
    assert after == before, "second call rewrote the bucketed table"
    assert sorted(map(str, df2.collect())) == sorted(map(str, df1.collect()))


def test_colocated_join_zero_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts
    sort-merge-join without any exchange — the co-located layout for
    repeated fact-to-fact joins at scale. (Broadcast is disabled for the
    test: at test scale the dim side would broadcast, which hides the
    co-location property this asserts.)"""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    save_bucketed(orders, "orders_b_t", 8, "o_custkey")
    save_bucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
                  "customer_b_t", 8, "o_custkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b_t").join(spark.table("customer_b_t"), "o_custkey")
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
