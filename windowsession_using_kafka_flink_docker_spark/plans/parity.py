"""Parity queries — the reference's three jobs, batch-rendered on `events`.

Column mapping (FIXTURES.md §1): the driver's ``events`` table plays the
reference's Kafka stream; ``ts``/``user_id``/``value`` stand in for the CSV
``timestamp``/``userID``/``payload`` fields (generator1.py:21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.alerts import (
    BIG_CUSTOMER_THRESHOLD,
    big_customer_alerts,
)
from windowsession_using_kafka_flink_docker_spark.operators.sessionize import (
    gap_seconds_sql,
    sessionize,
    sessionize_dynamic,
    sessionize_oracle_sql,
)
from windowsession_using_kafka_flink_docker_spark.plans.catalog import _events, register
from windowsession_using_kafka_flink_docker_spark.sources.generator import (
    generated_events,
    generated_events_sql,
)

# At the test data's value scale (≤ ~500/event) the reference's 1 000 000
# threshold (flink_stream_task2.py:82) matches nothing; same operator, a
# threshold that exercises real rows at sf 0.01.
ALERT_THRESHOLD = 100.0


@register(
    "session_fixed_gap",
    oracle=sessionize_oracle_sql(30),
    description="Per-user 30s-gap sessionization, sum/count/avg "
                "(flink_stream_task1.py:48-75 parity)",
    bench=True,
    tags=("parity", "session_window"),
)
def session_fixed_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_events(spark, sf_dir))


@register(
    "session_dynamic_gap",
    oracle=sessionize_oracle_sql(gap_seconds_sql()),
    description="Per-user-tier dynamic gap sessionization "
                "(flink_stream_task3.py:54-62,106-111 intended semantics)",
    bench=True,
    tags=("parity", "session_window"),
)
def session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_dynamic(_events(spark, sf_dir))


@register(
    "big_customer_alert",
    oracle=f"""
WITH sessions AS ({sessionize_oracle_sql(30, having=f"SUM(_c) / 100.0 >= {ALERT_THRESHOLD}")}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY session_start, session_end) AS _rn
  FROM sessions
)
SELECT user_id, session_start, session_end, session_sum, event_count, session_avg
FROM ranked WHERE _rn = 1
""",
    description="Sessionize → HAVING sum>=threshold → first-per-user alert "
                "(flink_stream_task2.py:81-90 parity; declarative dedup "
                "replaces the process-global printed_users set). "
                f"DEVIATION: threshold {ALERT_THRESHOLD} instead of the "
                "reference's 1_000_000 so the query matches real rows at "
                "test scale; the operator default preserves 1_000_000",
    bench=True,
    tags=("parity", "session_window", "dedup"),
)
def big_customer_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sessionize(_events(spark, sf_dir))
    return big_customer_alerts(sessions, threshold=ALERT_THRESHOLD)


@register(
    "session_report",
    oracle=f"""
SELECT user_id, session_sum, session_avg
FROM ({sessionize_oracle_sql(30)})
""",
    description="task1's printed report projection: user, sum, avg "
                "(flink_stream_task1.py:64-75)",
    tags=("parity",),
)
def session_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_events(spark, sf_dir)).select(
        "user_id", "session_sum", "session_avg"
    )


@register(
    "csv_parse_roundtrip",
    oracle="""
WITH lines AS (
  SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') || ',' || user_id || ',' ||
         event_id || ',' || ROUND(value, 2) AS line
  FROM events
),
parsed AS (
  SELECT CAST(split_part(line, ',', 1) AS TIMESTAMP) AS ts,
         CAST(split_part(line, ',', 2) AS BIGINT) AS user_id,
         CAST(split_part(line, ',', 3) AS BIGINT) AS transaction_id,
         CAST(split_part(line, ',', 4) AS DOUBLE) AS payload_value
  FROM lines
)
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(payload_value), 2) AS total
FROM parsed
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY user_id
""",
    description="CSV wire-format parse with typed casts + malformed drop "
                "(parse_csv_event, flink_stream_task1.py:21-36,45-46) — "
                "serialized from events then parsed back, no Python UDF",
    tags=("parity", "csv"),
)
def csv_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.col("user_id"),
            F.col("event_id"),
            F.round("value", 2),
        ).alias("line")
    )
    parsed = lines.select(
        F.from_csv(
            F.col("line"),
            "ts TIMESTAMP, user_id BIGINT, transaction_id BIGINT, payload_value DOUBLE",
        ).alias("r")
    ).select("r.*")
    return (
        parsed.where("ts IS NOT NULL AND user_id IS NOT NULL")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("payload_value"), 2).alias("total"))
    )


@register(
    "generated_sessionization",
    oracle=f"""
WITH events_gen AS ({generated_events_sql()}),
sessions AS ({sessionize_oracle_sql(30, table="events_gen", tiebreak="transaction_id")})
SELECT * FROM sessions
""",
    description="S2 generator parity: the reference's 4-phase synthetic "
                "workload (generator1.py:35-51, incl. the phase-4 hot-user "
                "skew) generated closed-form in Spark AND replayed as a "
                "DuckDB CTE, then 30s-gap sessionized — generator and "
                "sessionizer hash-checked together",
    bench=True,
    tags=("parity", "generator", "session_window", "skew"),
)
def generated_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = generated_events(spark).select("user_id", "ts", "value")
    return sessionize(ev)


@register(
    "generated_big_customer_alert",
    oracle=f"""
WITH events_gen AS ({generated_events_sql()}),
sessions AS ({sessionize_oracle_sql(30, table="events_gen", tiebreak="transaction_id",
                                    having=f"SUM(_c) / 100.0 >= {BIG_CUSTOMER_THRESHOLD}")}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY session_start, session_end) AS _rn
  FROM sessions
)
SELECT user_id, session_start, session_end, session_sum, event_count, session_avg
FROM ranked WHERE _rn = 1
""",
    description="task2 at the reference's REAL 1,000,000 threshold "
                "(flink_stream_task2.py:82): on the generator-parity "
                "workload, payload = uid*10 makes hot users genuinely cross "
                "1M, so the unmodified reference threshold produces alerts "
                "(unlike the driver's events table, where it matches nothing)",
    tags=("parity", "generator", "dedup"),
)
def generated_big_customer_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = generated_events(spark).select("user_id", "ts", "value")
    return big_customer_alerts(sessionize(ev), threshold=BIG_CUSTOMER_THRESHOLD)


@register(
    "session_fixed_gap_bucketed",
    oracle=sessionize_oracle_sql(30),
    description="Same sessionization semantics as session_fixed_gap, but "
                "over a user_id-bucketed, (user_id, ts)-sorted layout of "
                "events — the plan contains ZERO Exchange nodes (the scan's "
                "bucketing satisfies the aggregation's distribution), which "
                "is the ingest-once layout that removes the sessionization "
                "shuffle at 100 TB",
    tags=("parity", "session_window", "bucketing"),
)
def session_fixed_gap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from windowsession_using_kafka_flink_docker_spark.sources.bucketed import bucketed_events
    return sessionize(bucketed_events(spark, sf_dir))


# --------------------------------------------------------------------
# Session-window top-N (promoted from plans/staging_r15.py in r15 per
# tools/promote_staging.py's PROMOTEPLAN): the reference's session
# aggregate (flink_stream_task1.py:48-75) extended with ranking — the
# "who are the heaviest sessions" question every session pipeline
# eventually asks. Sums are EXACT BIGINT cents, not ROUND(double, 2),
# so the engines' half-cent rounding split (BASELINE.md round-13
# close) can never reorder a ranking.

#: Gaps-and-islands sessionization over exact cents — the shared CTE
#: skeleton of the top-N oracles (sessionize_oracle_sql's islands logic
#: with BIGINT cents instead of ROUND(sum, 2)).
_SESS_CENTS_CTE = """
WITH flagged AS (
  SELECT user_id, ts AS _ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS _c, event_id AS _tb,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000 * 30
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, _ts, _c,
         SUM(_new) OVER (PARTITION BY user_id ORDER BY _ts, _tb
                         ROWS UNBOUNDED PRECEDING) AS _sid
  FROM flagged
),
sess AS (
  SELECT user_id, MIN(_ts) AS session_start,
         CAST(SUM(_c) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS event_count
  FROM islands GROUP BY user_id, _sid
)
"""


def _sessions_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 s fixed-gap sessions with EXACT cent sums — the Spark twin of
    ``_SESS_CENTS_CTE``'s ``sess`` table (same session_window semantics
    as operators/sessionize.py, re-aggregated because the public entry
    emits ROUND(double, 2) sums, which must not feed a ranking)."""
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 seconds"))
        .agg(F.sum(cents).alias("sum_cents"),
             F.count(F.lit(1)).cast("long").alias("event_count"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                "sum_cents", "event_count")
    )


@register(
    "session_top2_per_user",
    oracle=_SESS_CENTS_CTE + """
SELECT user_id, CAST(rk AS INTEGER) AS rk, session_start, sum_cents,
       event_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY sum_cents DESC, session_start) AS rk
  FROM sess)
WHERE rk <= 2
""",
    description="Per-user top-2 sessions by EXACT cent sum (30 s fixed "
                "gap; ties break to the earlier session) — the "
                "session-window top-N pattern: one sessionization shuffle "
                "on user_id, rank window reusing the same partitioning. "
                "Cents (not ROUND(double,2)) feed the ranking so the "
                "engines' half-cent rounding split (BASELINE.md round-13 "
                "close) can never reorder it.",
    tags=("session", "window", "topn"),
)
def session_top2_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-2 sessions by exact cent sum (ties: earlier session
    first). One sessionization shuffle on user_id, then the rank window
    reuses the same partitioning — no second exchange at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("sum_cents"), F.asc("session_start"))
    return (_sessions_cents(spark, sf_dir)
            .withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= 2)
            .select("user_id", "rk", "session_start", "sum_cents",
                    "event_count"))


@register(
    "session_top10_global",
    oracle=_SESS_CENTS_CTE + """
SELECT CAST(rk AS INTEGER) AS rk, user_id, session_start, sum_cents,
       event_count
FROM (
  SELECT *, row_number() OVER (ORDER BY sum_cents DESC, user_id,
                               session_start) AS rk
  FROM sess)
WHERE rk <= 10
""",
    description="Global top-10 sessions by exact cent sum with a total "
                "deterministic order (sum desc, user, start) — "
                "orderBy+limit plans as TakeOrderedAndProject "
                "(per-partition top-k + 10-row merge), never a "
                "fact-scale single-partition sort.",
    tags=("session", "window", "topn"),
)
def session_top10_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 sessions by exact cent sum (ties: user, start).
    orderBy + limit plans as TakeOrderedAndProject — per-partition
    top-10 then a 10-row merge, never a fact-scale single-partition
    sort; the 10-row rank window after the limit is free."""
    from pyspark.sql import Window

    top = (_sessions_cents(spark, sf_dir)
           .orderBy(F.desc("sum_cents"), F.asc("user_id"),
                    F.asc("session_start"))
           .limit(10))
    w = Window.orderBy(F.desc("sum_cents"), F.asc("user_id"),
                       F.asc("session_start"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rk"),
        "user_id", "session_start", "sum_cents", "event_count")
