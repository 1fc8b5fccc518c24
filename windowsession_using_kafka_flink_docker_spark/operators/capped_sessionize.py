"""Capped sessionization: inactivity-gap sessions with a maximum session
duration.

``session_window`` expresses "close after ``gap`` of silence" but cannot
cap a session's length — a bot that fires an event every second holds one
session open forever (unbounded state in streaming, one mega-session in
batch). The capped variant closes a session at ``cap`` seconds after its
first event even if events keep coming; the next event opens a new
sub-session. This is the Flink ``KeyedProcessFunction``-style semantics the
reference's stack could express but Spark's declarative API can't — here it
decomposes into two window passes (batch) or a custom stateful operator
(streaming, ``streaming/stateful.py``).

Definition (deterministic, SQL-expressible):
1. gap sessions: break where ``ts - lag(ts) > gap`` per key, cumulative-sum
   the breaks;
2. duration cap: within a gap session starting at ``t0``, segment index is
   ``(ts - t0) // cap`` — a session is one ``(key, gap_session, segment)``
   group.

100 TB design: pass 1 and 2 share the same hash partitioning on the key
(one exchange, two local sorts); the aggregation reuses it. No Python, no
state beyond window-function running values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CAP = 120.0  # seconds


def capped_sessionize(events: DataFrame, gap_sec: float = 30.0,
                      cap_sec: float = DEFAULT_CAP, key: str = "user_id",
                      ts: str = "ts", value: str = "value") -> DataFrame:
    gap_us = int(gap_sec * 1_000_000)
    cap_us = int(cap_sec * 1_000_000)
    w = Window.partitionBy(key).orderBy(ts)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    us = F.unix_micros(F.col(ts))
    prev_us = F.unix_micros(F.lag(ts).over(w))
    brk = F.when(us - prev_us > gap_us, 1).otherwise(0)

    gs = events.withColumn("_gs", F.sum(brk).over(cum))
    gw = Window.partitionBy(key, "_gs")
    seg = (
        gs.withColumn("_gs_start", F.min(ts).over(gw))
        .withColumn(
            "_seg",
            ((us - F.unix_micros(F.col("_gs_start"))) / F.lit(cap_us)).cast("long"),
        )
    )
    return (
        seg.groupBy(key, "_gs", "_seg")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.sum(value).alias("_sum"),
            F.count("*").alias("event_count"),
        )
        .select(
            F.col(key),
            "session_start",
            "session_end",
            F.round("_sum", 2).alias("session_sum"),
            "event_count",
            F.round(F.col("_sum") / F.greatest("event_count", F.lit(1)), 2)
            .alias("session_avg"),
        )
    )


def capped_sessionize_oracle_sql(gap_sec: float = 30.0,
                                 cap_sec: float = DEFAULT_CAP,
                                 table: str = "events") -> str:
    """DuckDB equivalent — same two-pass definition, µs precision (the
    session_window oracles learned that ms truncation diverges)."""
    gap_us = int(gap_sec * 1_000_000)
    cap_us = int(cap_sec * 1_000_000)
    return f"""
WITH brk AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS b
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), gs AS (
  SELECT *, SUM(b) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
), seg AS (
  SELECT *,
         (epoch_us(ts) - epoch_us(MIN(ts) OVER (PARTITION BY user_id, g)))
           // {cap_us} AS s
  FROM gs
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_sum,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       ROUND(SUM(value) / GREATEST(COUNT(*), 1), 2) AS session_avg
FROM seg
GROUP BY user_id, g, s
"""
