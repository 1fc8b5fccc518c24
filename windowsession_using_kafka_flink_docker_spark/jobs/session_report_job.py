"""task1 demo job: Kafka → parse → 30s session windows → console report.

Faithful streaming rendering of flink_stream_task1.py:44-87 — run under
spark-submit with the Kafka connector package (see docker/README.md):

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 \
        session_report_job.py --bootstrap kafka:9092
"""

from __future__ import annotations

import argparse

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.streaming import (
    kafka_events_source,
    session_report_writer,
    streaming_sessionize,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--topic", default="events")
    ap.add_argument("--checkpoint", default="/tmp/ckpt/session_report")
    args = ap.parse_args()

    spark = get_spark("session-report-job")
    events = kafka_events_source(spark, args.bootstrap, args.topic)
    sessions = streaming_sessionize(events, value="payload_value")
    query = (
        session_report_writer(sessions)
        .option("checkpointLocation", args.checkpoint)
        .start()
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()
