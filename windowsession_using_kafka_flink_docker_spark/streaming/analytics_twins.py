"""Streaming twins for the analytics entries that are incremental by
construction (VERDICT r6 item 5): ``ewma_daily_spend`` and
``distribution_drift_report``.

Both batch entries reduce the fact stream to key-space-bounded mergeable
partials before any derivation:

- EWMA: per-(user, day) spend sums. The clamped-geometric-weight EWMA
  (plans/analytics.py ewma_from_daily) is a pure function of that daily
  frame, so the maintained state is the daily partials and presentation
  re-derives the smoother — a new day's arrival re-weights every prior
  day, which NO per-user scalar state could track, but the daily partial
  table can, at |users| x |days| rows regardless of fact volume.
- drift: per-event_type conditional counts against the FIXED half-month
  boundary. Exact integers, so the maintained report equals the batch
  report bit-for-bit under any batch interleaving.

Versioning/replay is byte-for-byte the rollup maintainer's scheme
(streaming/rollup.py): version ``v{batch_id}`` derived from the newest
version strictly below ``batch_id``, overwritten on replay, pruned to
current+previous, with the coupled-lifecycle guard against a fresh
checkpoint over stale state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


class _VersionedState:
    """Shared versioned-parquet state plumbing (see streaming/rollup.py
    for the replay-safety argument)."""

    def __init__(self, spark: SparkSession, state_dir: str, schema: str):
        self.spark = spark
        self.state_dir = state_dir
        self.schema = schema
        os.makedirs(state_dir, exist_ok=True)

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("v=") and os.path.exists(
                    os.path.join(self.state_dir, name, "_SUCCESS")):
                out.append(int(name[2:]))
        return sorted(out)

    def read(self, version: int) -> DataFrame:
        return self.spark.read.schema(self.schema).parquet(
            os.path.join(self.state_dir, f"v={version}"))

    def current(self) -> DataFrame:
        versions = self.versions()
        if not versions:
            return self.spark.createDataFrame([], self.schema)
        return self.read(versions[-1])

    def latest_before(self, batch_id: int) -> DataFrame | None:
        versions = [v for v in self.versions() if v < batch_id]
        return self.read(versions[-1]) if versions else None

    def guard(self, batch_id: int) -> None:
        versions = self.versions()
        if versions and versions[-1] > batch_id:
            raise ValueError(
                f"state_dir {self.state_dir} already holds version "
                f"v={versions[-1]} > incoming batch_id {batch_id}; "
                "checkpoint_dir and state_dir must be reset together")

    def write(self, batch_id: int, df: DataFrame) -> None:
        target = os.path.join(self.state_dir, f"v={batch_id}")
        df.coalesce(1).write.mode("overwrite").parquet(target)
        for v in self.versions():
            if v < batch_id - 1:
                shutil.rmtree(os.path.join(self.state_dir, f"v={v}"),
                              ignore_errors=True)


class IncrementalEwmaMaintainer:
    """Maintains per-(user, day) spend partials; ``current()`` derives
    the clamped-exponent EWMA exactly as the driver-oracled batch entry
    does (same ewma_from_daily core, same cent rounding)."""

    _SCHEMA = "user_id BIGINT, d DATE, _sum DOUBLE"

    def __init__(self, spark: SparkSession, state_dir: str):
        self.state = _VersionedState(spark, state_dir, self._SCHEMA)

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.state.guard(batch_id)
        delta = (batch_df
                 .groupBy("user_id", F.to_date("ts").alias("d"))
                 .agg(F.sum("value").alias("_sum")))
        prev = self.state.latest_before(batch_id)
        merged = (prev.unionByName(delta) if prev is not None else delta)
        merged = (merged.groupBy("user_id", "d")
                  .agg(F.sum("_sum").alias("_sum")))
        self.state.write(batch_id, merged)

    def current(self) -> DataFrame:
        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            ewma_from_daily,
        )
        daily = self.state.current().select(
            "user_id", "d",
            F.round(F.col("_sum") * 100, 0).cast("long").alias("cents"))
        return ewma_from_daily(daily)


class IncrementalDriftMaintainer:
    """Maintains per-event_type conditional counts against the fixed
    half boundary; ``current()`` is bit-identical to the batch
    distribution_drift_report presentation (exact integer counts in,
    scaled-floor shares out)."""

    _SCHEMA = "event_type STRING, n_a BIGINT, n_b BIGINT"

    def __init__(self, spark: SparkSession, state_dir: str,
                 boundary: str = "2024-01-15"):
        self.state = _VersionedState(spark, state_dir, self._SCHEMA)
        self.boundary = boundary

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.state.guard(batch_id)
        is_a = F.to_date("ts") <= F.lit(self.boundary).cast("date")
        delta = batch_df.groupBy("event_type").agg(
            F.sum(is_a.cast("long")).alias("n_a"),
            F.sum((~is_a).cast("long")).alias("n_b"))
        prev = self.state.latest_before(batch_id)
        merged = (prev.unionByName(delta) if prev is not None else delta)
        merged = merged.groupBy("event_type").agg(
            F.sum("n_a").alias("n_a"), F.sum("n_b").alias("n_b"))
        self.state.write(batch_id, merged)

    def current(self) -> DataFrame:
        counts = self.state.current()
        tot = counts.agg(F.sum("n_a").alias("t_a"),
                         F.sum("n_b").alias("t_b"))
        p = F.col("n_a") / F.col("t_a").cast("double")
        q = F.col("n_b") / F.col("t_b").cast("double")
        return counts.crossJoin(F.broadcast(tot)).select(
            "event_type", "n_a", "n_b",
            F.floor(p * 10000).cast("long").alias("p_e4"),
            F.floor(q * 10000).cast("long").alias("q_e4"),
            F.floor(F.abs(p - q) * 10000).cast("long").alias("abs_drift_e4"),
        )


def _maintenance_stream(events: DataFrame, maintainer, checkpoint_dir: str,
                        query_name: str) -> StreamingQuery:
    return (events.writeStream
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(maintainer.merge_batch)
            .start())


def streaming_ewma_maintenance(
        events: DataFrame, maintainer: IncrementalEwmaMaintainer,
        checkpoint_dir: str) -> StreamingQuery:
    return _maintenance_stream(events, maintainer, checkpoint_dir,
                               "ewma_maintenance")


def streaming_drift_maintenance(
        events: DataFrame, maintainer: IncrementalDriftMaintainer,
        checkpoint_dir: str) -> StreamingQuery:
    return _maintenance_stream(events, maintainer, checkpoint_dir,
                               "drift_maintenance")


__all__ = [
    "IncrementalEwmaMaintainer",
    "IncrementalDriftMaintainer",
    "streaming_ewma_maintenance",
    "streaming_drift_maintenance",
]
