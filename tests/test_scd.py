"""SCD2 upsert semantics: expire, open, carry, and drop no-ops."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.scd import scd2_apply

T0 = datetime.datetime(2020, 1, 1)
T1 = datetime.datetime(2024, 6, 1)


def _run(spark):
    snapshot = spark.createDataFrame(
        [(1, 100.0, "A", T0),   # will be updated
         (2, 200.0, "B", T0),   # no-op resend
         (3, 300.0, "C", T0)],  # not in batch
        "k BIGINT, bal DOUBLE, seg STRING, valid_from TIMESTAMP")
    changes = spark.createDataFrame(
        [(1, 150.0, "A"),    # real update
         (2, 200.0, "B"),    # identical -> must be dropped
         (9, 900.0, "Z")],   # brand-new key
        "k BIGINT, bal DOUBLE, seg STRING")
    out = scd2_apply(snapshot, changes, key="k",
                     batch_ts=F.lit("2024-06-01").cast("timestamp"),
                     attr_cols=("bal", "seg"))
    return {(r.k, r.is_current): r for r in out.collect()}


def test_versions(spark):
    rows = _run(spark)
    # updated key: expired old version + new current version
    old = rows[(1, False)]
    assert (old.bal, old.valid_from, old.valid_to) == (100.0, T0, T1)
    new = rows[(1, True)]
    assert (new.bal, new.valid_from, new.valid_to) == (150.0, T1, None)
    # no-op resend: exactly one row, untouched
    assert (2, False) not in rows
    noop = rows[(2, True)]
    assert (noop.bal, noop.valid_from, noop.valid_to) == (200.0, T0, None)
    # untouched key carried
    carried = rows[(3, True)]
    assert (carried.bal, carried.valid_from) == (300.0, T0)
    # new key opens at batch time
    ins = rows[(9, True)]
    assert (ins.bal, ins.valid_from, ins.valid_to) == (900.0, T1, None)
    # row count: 3 current survivors + 1 insert + 1 expired
    assert len(rows) == 5


def test_duplicate_keys_in_batch_keep_one_current_row(spark):
    """A feed that re-sends a key within one batch must still leave exactly
    one current row per key (the SCD2 invariant). With ``change_order``,
    the highest-ordered row wins; without, the tie-break is deterministic
    (max over the attribute tuple)."""
    snapshot = spark.createDataFrame(
        [(1, 100.0, "A", T0)],
        "k BIGINT, bal DOUBLE, seg STRING, valid_from TIMESTAMP")
    changes = spark.createDataFrame(
        [(1, 150.0, "A", 10), (1, 175.0, "A", 20), (1, 125.0, "A", 15)],
        "k BIGINT, bal DOUBLE, seg STRING, seq INT")
    out = scd2_apply(snapshot, changes, key="k",
                     batch_ts=F.lit("2024-06-01").cast("timestamp"),
                     attr_cols=("bal", "seg"), change_order="seq").collect()
    current = [r for r in out if r.is_current]
    assert len(current) == 1 and current[0].bal == 175.0  # seq=20 wins
    expired = [r for r in out if not r.is_current]
    assert len(expired) == 1 and expired[0].bal == 100.0

    # no order column: deterministic-but-arbitrary winner, invariant holds
    out2 = scd2_apply(snapshot, changes.drop("seq"), key="k",
                      batch_ts=F.lit("2024-06-01").cast("timestamp"),
                      attr_cols=("bal", "seg")).collect()
    assert sum(r.is_current for r in out2) == 1
