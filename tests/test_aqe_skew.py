"""AQE skew-join handling: a pathologically skewed shuffle join must be
split at runtime by OptimizeSkewedJoin instead of serializing one whale
partition through one task — the runtime half of the skew story next to
the compile-time salting in operators/skew.py.

Thresholds are lowered to make the (small) test data legally 'skewed';
the production defaults kick in at 256 MB partitions, which is exactly
the regime a 100 TB hot-key join lives in.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_skewed_join_is_split_at_runtime(spark):
    # 1 whale key with 300k rows + 2k minnow keys with 10 rows each
    whale = spark.range(300_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    minnows = spark.range(20_000).select(
        (F.col("id") % 2000 + 1).alias("k"), F.col("id").alias("v"))
    left = whale.unionByName(minnows)
    right = spark.range(2001).select(F.col("id").alias("k"), F.lit(1).alias("w"))

    with _confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            # make the whale partition count as skewed at test scale
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "8KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "8KB",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            # force a shuffle join: broadcast would dodge the skew entirely
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
        },
    ):
        # No aggregation downstream: a groupBy on the join key would make
        # AQE keep the hash partitioning intact and (correctly) decline to
        # split the skewed partitions. Execute THIS df's queryExecution
        # (count() would plan its own) via collect of the slim projection.
        # keep the payload column: a k-only projection of the whale is a
        # constant that shuffle-compresses below any skew threshold
        joined = left.join(right, "k").select("k", "v")
        rows = joined.collect()
        assert len(rows) == 320_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]
