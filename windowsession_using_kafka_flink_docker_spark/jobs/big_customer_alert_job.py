"""task2 demo job: Kafka → sessionize → >= 1M filter → once-per-user alert
→ console grid + Kafka ``alerts`` topic.

Streaming rendering of flink_stream_task2.py:44-114, including the Kafka
sink the reference imports but never wires (task2:1,109).
"""

from __future__ import annotations

import argparse

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.operators.alerts import (
    BIG_CUSTOMER_THRESHOLD,
)
from windowsession_using_kafka_flink_docker_spark.streaming import (
    alert_grid_writer,
    kafka_events_source,
    kafka_sink,
    streaming_alerts,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--topic", default="events")
    ap.add_argument("--alerts-topic", default="alerts")
    ap.add_argument("--threshold", type=float, default=BIG_CUSTOMER_THRESHOLD)
    ap.add_argument("--dedup-within", default=None,
                    help="bound dedup state, e.g. '1 day'; default exact")
    ap.add_argument("--checkpoint", default="/tmp/ckpt/big_customer")
    args = ap.parse_args()

    spark = get_spark("big-customer-alert-job")
    events = kafka_events_source(spark, args.bootstrap, args.topic)
    alerts = streaming_alerts(
        events, threshold=args.threshold, dedup_within=args.dedup_within,
        value="payload_value",
    )
    console = (
        alert_grid_writer(alerts)
        .option("checkpointLocation", args.checkpoint + "/console")
        .start()
    )
    kafka = kafka_sink(
        alerts, args.bootstrap, args.alerts_topic,
        checkpoint=args.checkpoint + "/kafka",
    )
    console.awaitTermination()
    kafka.awaitTermination()


if __name__ == "__main__":
    main()
