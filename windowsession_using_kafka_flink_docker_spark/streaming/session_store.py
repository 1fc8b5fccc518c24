"""Maintainer #24 — the incremental SESSION STORE.

The reference's whole purpose is session windows over a stream
(flink_stream_task1.py:30-41); its Flink jobs keep the session state
inside the engine and emit closed sessions once. This maintainer is the
materialized-view form of the same computation: the full session table
(10-minute gap, exact BIGINT cents) kept up to date across micro-batches
by TAIL MERGE — each batch is sessionized alone, then merged against the
store's per-user tail via :func:`merge_session_store`, the exact logic
the staged ``incremental_session_merge`` catalog entry certifies against
a full-recompute DuckDB oracle (plans/staging_r15.py; the helpers move
to operators/ when r15 promotes the entry).

Correctness precondition — and the one thing the tail merge cannot
absorb — is PER-USER EVENT-TIME MONOTONICITY across batches: every
event in batch N+1 must be at/after every stored event of its user
(the reference's own monotonic-watermark assumption,
flink_stream_task1.py:23-28). A violating batch is a LATE arrival; the
correct response is the ``late_event_session_repair`` path (re-
sessionize the touched users from raw events), which a state-only
maintainer cannot run — so ``merge_batch`` detects the overlap with a
tail-vs-head check and raises instead of silently corrupting the store.

Scale: per batch the work is sessionize-the-delta (one ingest), an
aggregate over two one-row-per-user frames for the guard, and the tail
merge. State is the session table itself — a maintained OUTPUT, like
the daily-revenue maintainer's day grid; at 100 TB it would live
time-partitioned with only tail partitions rewritten per batch (the
merge touches nothing older), where this sandbox version rewrites the
versioned-parquet snapshot whole (streaming/analytics_twins.py
_VersionedState, shared replay/crash semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
    _sessions_full,
    merge_session_store,
)
from windowsession_using_kafka_flink_docker_spark.streaming.analytics_twins import (
    _VersionedState,
)


class IncrementalSessionStoreMaintainer:
    """Maintains the full 10-minute-gap session table by per-batch tail
    merge. ``current()`` equals sessionizing every event seen so far
    from scratch (stream==batch bit-identical, asserted in
    tests/test_session_store_stream.py)."""

    _SCHEMA = ("user_id BIGINT, session_start TIMESTAMP, "
               "session_end TIMESTAMP, sum_cents BIGINT, "
               "event_count BIGINT")

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state = _VersionedState(spark, state_dir, self._SCHEMA)

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.state.guard(batch_id)
        fresh = _sessions_full(batch_df).localCheckpoint()
        prev = self.state.latest_before(batch_id)
        if prev is None:
            self.state.write(batch_id, fresh)
            return
        self._check_monotonic(prev, fresh)
        self.state.write(batch_id, merge_session_store(prev, fresh))

    def _check_monotonic(self, store: DataFrame, fresh: DataFrame) -> None:
        """Raise on per-user event-time overlap between the incoming
        batch and the store — a late arrival the tail merge would
        silently mis-sessionize. Cost: an aggregate over two
        one-row-per-user frames and one bounded count."""
        tails = store.groupBy("user_id").agg(
            F.max("session_end").alias("_tail_end"))
        heads = fresh.groupBy("user_id").agg(
            F.min("session_start").alias("_head_start"))
        late = (heads.join(tails, "user_id")
                .where(F.col("_head_start") < F.col("_tail_end")).count())
        if late:
            raise ValueError(
                f"{late} user(s) in this batch have events BEFORE their "
                "stored sessions end — a late arrival, which the tail "
                "merge cannot absorb; route the batch through the "
                "late_event_session_repair path (re-sessionize touched "
                "users from raw events) instead")

    def current(self) -> DataFrame:
        return self.state.current()


def streaming_session_store_maintenance(
        events: DataFrame, maintainer: IncrementalSessionStoreMaintainer,
        checkpoint_dir: str) -> StreamingQuery:
    return (events.writeStream
            .queryName("session_store_maintenance")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(maintainer.merge_batch)
            .start())
