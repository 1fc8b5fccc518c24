"""Generator (S2) parity tests: phase structure, hot-key skew behavior,
and the CSV wire-format round trip through the batch parse front end."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.alerts import big_customer_alerts
from windowsession_using_kafka_flink_docker_spark.operators.sessionize import sessionize
from windowsession_using_kafka_flink_docker_spark.sources.batch import read_csv_events
from windowsession_using_kafka_flink_docker_spark.sources.generator import (
    PHASES,
    generated_events,
    write_events_csv,
)


def test_phase_counts_match_reference_config(spark):
    got = {
        r.phase: r.n
        for r in generated_events(spark).groupBy("phase").agg(F.count("*").alias("n")).collect()
    }
    assert got == {p: n for p, (_, n, _) in enumerate(PHASES)}


def test_users_drawn_from_phase_tenant_lists(spark):
    ev = generated_events(spark)
    for p, (_, _, users) in enumerate(PHASES):
        got = {r.user_id for r in ev.where(F.col("phase") == p).select("user_id").distinct().collect()}
        assert got <= set(users)


def test_hot_user_skew_session(spark):
    """Phase 4 funnels 100k events into user 4 (generator1.py:51) — the
    built-in skew test. The sessionization must complete in bounded time
    (partial aggregation absorbs the hot key map-side; a quadratic or
    straggler-bound plan would blow well past the bound) and produce one
    100k-event session with the exact closed-form sum."""
    ev = generated_events(spark).select("user_id", "ts", "value")
    t0 = time.perf_counter()
    sessions = sessionize(ev).collect()
    elapsed = time.perf_counter() - t0
    hot = [r for r in sessions if r.user_id == 4 and r.event_count == 100_000]
    assert len(hot) == 1
    assert hot[0].session_sum == 4_000_000.0  # 100_000 events * (4*10)
    assert elapsed < 120, f"skewed sessionization took {elapsed:.1f}s"


def test_alerts_fire_at_reference_threshold(spark):
    """With generator-parity payloads (uid*10), the reference's untouched
    1M threshold (flink_stream_task2.py:82) matches real sessions."""
    ev = generated_events(spark).select("user_id", "ts", "value")
    alerts = big_customer_alerts(sessionize(ev), threshold=1_000_000.0).collect()
    users = sorted(r.user_id for r in alerts)
    assert 4 in users and 9999 in users
    assert len(users) == len(set(users))  # at most one alert per user
    assert all(r.session_sum >= 1_000_000.0 for r in alerts)


def test_csv_wire_roundtrip(spark, tmp_path):
    """Generator → CSV wire format → typed parse front end (P1/F1): every
    record survives with exact payload totals."""
    path = str(tmp_path / "wire")
    write_events_csv(spark, path)
    parsed = read_csv_events(spark, path)
    total_events = sum(n for _, n, _ in PHASES)
    assert parsed.count() == total_events
    got = parsed.agg(F.sum("payload_value")).collect()[0][0]
    want = generated_events(spark).agg(F.sum("value")).collect()[0][0]
    assert got == want
