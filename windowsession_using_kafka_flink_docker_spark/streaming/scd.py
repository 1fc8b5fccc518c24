"""Streaming SCD2 dimension maintenance — the other half of the
maintenance story next to ``streaming/rollup.py``.

``operators/scd.py::scd2_apply`` is the oracled batch transform (expire /
open / carry / drop-no-ops); this module runs it continuously: each
micro-batch of change rows MERGEs into a versioned dimension snapshot,
so the serving side always reads one parquet dir of current + expired
rows and the as-of join (``operators/asof.py``) can attach the version
valid at any event time.

Same durability scheme as the rollup maintainer: version ``v{batch_id}``
is derived from the newest version strictly below ``batch_id`` and
overwritten wholesale on replay, making foreachBatch's at-least-once
delivery land on byte-identical state; superseded versions are pruned
(current + previous kept). At 100 TB the dimension is partitioned by
``is_current`` so serving scans only current rows — exactly how the
batch entry ``scd2_customer_upsert`` writes it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from windowsession_using_kafka_flink_docker_spark.operators.scd import scd2_apply


class Scd2DimensionMaintainer:
    """Owns a versioned SCD2 dimension under ``state_dir``.

    ``key`` / ``attr_cols`` define the dimension; ``batch_ts_col`` names
    a column of the change stream giving each row's effective time (the
    batch's MAX is used as the version timestamp, so one batch = one
    version instant — the standard micro-batch CDC granularity).
    """

    def __init__(self, spark: SparkSession, state_dir: str, key: str,
                 attr_cols: tuple[str, ...], batch_ts_col: str = "ts",
                 change_order: str | None = None):
        self.spark = spark
        self.state_dir = state_dir
        self.key = key
        self.attr_cols = attr_cols
        self.batch_ts_col = batch_ts_col
        self.change_order = change_order
        self._schema = None  # captured from the first batch
        os.makedirs(state_dir, exist_ok=True)

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("v=") and os.path.exists(
                    os.path.join(self.state_dir, name, "_SUCCESS")):
                out.append(int(name[2:]))
        return sorted(out)

    def _read_version(self, version: int) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"v={version}"))

    def current(self) -> DataFrame:
        """Full dimension (current + expired rows); raises before any
        batch has been applied."""
        versions = self._versions()
        if not versions:
            raise ValueError("scd2 maintainer: no state yet")
        return self._read_version(versions[-1])

    def current_rows(self) -> DataFrame:
        return self.current().where(F.col("is_current"))

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = self._versions()
        if versions and versions[-1] > batch_id:
            # Same lifecycle coupling as ContinuousRollupMaintainer: a
            # restart with a fresh checkpoint (batch ids back at 0) but a
            # stale state_dir would rebase on nothing while current()
            # keeps serving the old run's max(_versions) state.
            raise ValueError(
                f"scd2 state_dir {self.state_dir} already holds version "
                f"v={versions[-1]} > incoming batch_id {batch_id}; "
                "checkpoint_dir and state_dir must be reset together")
        batch_ts = batch_df.agg(F.max(self.batch_ts_col)).collect()[0][0]
        changes = batch_df.select(self.key, *self.attr_cols,
                                  *((self.change_order,)
                                    if self.change_order else ()))
        base_versions = [v for v in self._versions() if v < batch_id]
        if base_versions:
            snap = self._read_version(base_versions[-1])
            history = snap.where(~F.col("is_current"))
            merged = scd2_apply(
                snap.where(F.col("is_current")), changes, key=self.key,
                batch_ts=F.lit(batch_ts), attr_cols=self.attr_cols,
                change_order=self.change_order,
            ).unionByName(history)
        else:
            # first batch: empty snapshot through the same transform, so
            # intra-batch dedup and row shape are identical to steady state
            empty_snap = (changes.select(self.key, *self.attr_cols)
                          .limit(0)
                          .withColumn("valid_from", F.lit(batch_ts)))
            merged = scd2_apply(
                empty_snap, changes, key=self.key,
                batch_ts=F.lit(batch_ts), attr_cols=self.attr_cols,
                change_order=self.change_order)
        target = os.path.join(self.state_dir, f"v={batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(target)
        for v in self._versions():
            if v < batch_id - 1:
                shutil.rmtree(os.path.join(self.state_dir, f"v={v}"),
                              ignore_errors=True)


def streaming_scd2_maintenance(
    changes: DataFrame, maintainer: Scd2DimensionMaintainer,
    checkpoint_dir: str, query_name: str = "scd2_maintenance",
) -> StreamingQuery:
    """Wire a change-row stream into the maintainer (foreachBatch)."""
    return (
        changes.writeStream
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(maintainer.merge_batch)
        .start()
    )


__all__ = ["Scd2DimensionMaintainer", "streaming_scd2_maintenance"]
