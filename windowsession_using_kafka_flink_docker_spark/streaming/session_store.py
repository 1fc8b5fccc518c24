"""Maintainer #24 — the incremental SESSION STORE.

The reference's whole purpose is session windows over a stream
(flink_stream_task1.py:30-41); its Flink jobs keep the session state
inside the engine and emit closed sessions once. This maintainer is the
materialized-view form of the same computation: the full session table
(10-minute gap, exact BIGINT cents) kept up to date across micro-batches
by TAIL MERGE — each batch is sessionized alone, then merged against the
store's per-user tail via :func:`merge_session_store`
(operators/session_store.py — shared with the staged
``incremental_session_merge`` catalog entry, which certifies the merge
against a full-recompute DuckDB oracle).

Correctness precondition — and the one thing the tail merge cannot
absorb — is PER-USER EVENT-TIME MONOTONICITY across batches: every
event in batch N+1 must be at/after every stored event of its user
(the reference's own monotonic-watermark assumption,
flink_stream_task1.py:23-28). A violating user's batch slice is a LATE
arrival; the correct response is the ``late_event_session_repair`` path
(re-sessionize the touched users from raw events), which a state-only
maintainer cannot run. ``merge_batch`` therefore detects the overlap
with a tail-vs-head check and either fails fast (default) or — when a
``dead_letter_dir`` is configured, as the continuous
jobs/maintain_analytics_job.py wiring does — QUARANTINES the late
users' raw batch events to versioned parquet (``b=<batch_id>``,
overwrite-mode ⇒ replay-idempotent) and merges the rest, so one late
file can never wedge the whole job in a crash loop.

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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from windowsession_using_kafka_flink_docker_spark.operators.session_store import (
    merge_session_store,
    sessions_full,
)
from windowsession_using_kafka_flink_docker_spark.streaming.analytics_twins import (
    _VersionedState,
)


class IncrementalSessionStoreMaintainer:
    """Maintains the full 10-minute-gap session table by per-batch tail
    merge. ``current()`` equals sessionizing every merged event from
    scratch (stream==batch bit-identical, asserted in
    tests/test_session_store_stream.py).

    ``dead_letter_dir=None`` (default) fails fast on a late-arrival
    batch; a configured dir quarantines the late users' raw events to
    ``dead_letter_dir/b=<batch_id>`` and merges the rest."""

    _SCHEMA = ("user_id BIGINT, session_start TIMESTAMP, "
               "session_end TIMESTAMP, sum_cents BIGINT, "
               "event_count BIGINT")

    def __init__(self, spark: SparkSession, state_dir: str,
                 dead_letter_dir: str | None = None):
        self.spark = spark
        self.state = _VersionedState(spark, state_dir, self._SCHEMA)
        self.dead_letter_dir = dead_letter_dir

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.state.guard(batch_id)
        fresh = sessions_full(batch_df).localCheckpoint()
        prev = self.state.latest_before(batch_id)
        if prev is None:
            self.state.write(batch_id, fresh)
            return
        late_users = self._late_users(prev, fresh)
        n_late = late_users.count()
        if n_late:
            if self.dead_letter_dir is None:
                raise ValueError(
                    f"{n_late} user(s) in this batch have events BEFORE "
                    "their stored sessions end — a late arrival, which "
                    "the tail merge cannot absorb; configure a "
                    "dead_letter_dir to quarantine such slices, or route "
                    "the batch through the late_event_session_repair "
                    "path (re-sessionize touched users from raw events)")
            # Quarantine the late users' ENTIRE raw batch slice (the
            # repair path needs raw events, and a partial merge of a
            # late user would corrupt the store); overwrite per batch_id
            # keeps the quarantine replay-idempotent.
            (batch_df.join(late_users, "user_id", "left_semi")
             .write.mode("overwrite")
             .parquet(os.path.join(self.dead_letter_dir, f"b={batch_id}")))
            fresh = (fresh.join(late_users, "user_id", "left_anti")
                     .localCheckpoint())
        self.state.write(batch_id, merge_session_store(prev, fresh))

    @staticmethod
    def _late_users(store: DataFrame, fresh: DataFrame) -> DataFrame:
        """Users whose incoming sessions overlap their stored ones —
        the tail-vs-head check over two one-row-per-user frames."""
        tails = store.groupBy("user_id").agg(
            F.max("session_end").alias("_tail_end"))
        heads = fresh.groupBy("user_id").agg(
            F.min("session_start").alias("_head_start"))
        return (heads.join(tails, "user_id")
                .where(F.col("_head_start") < F.col("_tail_end"))
                .select("user_id"))

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
