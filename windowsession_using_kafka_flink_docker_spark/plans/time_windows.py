"""Tumbling and sliding time-window queries — completeness extensions.

The reference uses *session* windows only (SURVEY.md §2.5 note (a)); these
add the other two event-time window shapes from the Structured Streaming
model (SIGMOD'18). Both work unchanged on streaming DataFrames with a
watermark upstream — the catalog registers the batch renderings so the
driver's DuckDB oracle can hash-check them.

Scale notes: ``F.window`` is a scan-side projection (bucket arithmetic on
the timestamp, no state in batch mode) followed by one hash-aggregate
shuffle on (bucket, keys); the sliding variant fans each row out to
``duration/slide`` buckets before the shuffle — at 100 TB keep that factor
small or pre-aggregate per slide-quantum and roll up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.catalog import _events, register


@register(
    "tumbling_window_traffic",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
    description="Fixed (tumbling) 5-minute event-time windows per event "
                "type — the streaming-model window shape the reference "
                "lacks; bucket arithmetic scan-side, one agg shuffle",
    tags=("extension", "time_window"),
)
def tumbling_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


@register(
    "sliding_window_traffic",
    oracle="""
WITH fanned AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) - (k * INTERVAL '5 minutes') AS window_start,
         value
  FROM events CROSS JOIN (VALUES (0), (1)) t(k)
)
SELECT window_start,
       window_start + INTERVAL '10 minutes' AS window_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM fanned
GROUP BY 1, 2
""",
    description="Sliding 10-minute windows every 5 minutes: each event "
                "belongs to duration/slide = 2 buckets (oracle fans out "
                "with a 2-row VALUES join — same algebra Spark's window "
                "generator applies scan-side)",
    tags=("extension", "time_window"),
)
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events", "total_value",
        )
    )


@register(
    "capped_sessionization",
    oracle=None,  # set below — built from the operator's oracle helper
    description="Inactivity-gap sessions with a 120 s max-duration cap — "
                "semantics session_window cannot express (a key emitting "
                "forever would hold one session open forever); two window "
                "passes sharing one hash partitioning; the streaming twin "
                "is the applyInPandasWithState operator in "
                "streaming/stateful.py",
    bench=True,
    tags=("extension", "session", "stateful"),
)
def capped_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from windowsession_using_kafka_flink_docker_spark.operators.capped_sessionize import (
        capped_sessionize,
    )
    return capped_sessionize(_events(spark, sf_dir))


# The oracle SQL lives next to the operator so batch, streaming, and oracle
# share one definition; inject it into the registered spec.
from windowsession_using_kafka_flink_docker_spark.operators.capped_sessionize import (  # noqa: E402
    capped_sessionize_oracle_sql,
)
from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG  # noqa: E402

CATALOG["capped_sessionization"].oracle = capped_sessionize_oracle_sql()
