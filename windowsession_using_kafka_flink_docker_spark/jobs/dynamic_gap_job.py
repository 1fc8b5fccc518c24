"""task3 demo job: Kafka → per-user-tier dynamic session gaps → console.

Streaming rendering of flink_stream_task3.py's *intended* pipeline (the
reference leaves the windowed stream unwired, task3:106-117; SURVEY.md
§2.5 note) — gap tiers: uid 9999 → 5 min, 2-9 → 2 min, 100-200 → 60 s,
else 30 s.
"""

from __future__ import annotations

import argparse

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.streaming import (
    kafka_events_source,
    session_report_writer,
    streaming_sessionize_dynamic,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--topic", default="events")
    ap.add_argument("--checkpoint", default="/tmp/ckpt/dynamic_gap")
    args = ap.parse_args()

    spark = get_spark("dynamic-gap-job")
    events = kafka_events_source(spark, args.bootstrap, args.topic)
    sessions = streaming_sessionize_dynamic(events, value="payload_value")
    query = (
        session_report_writer(sessions)
        .option("checkpointLocation", args.checkpoint)
        .start()
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()
