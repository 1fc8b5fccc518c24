"""Generator demo job: produce the 4-phase synthetic workload
(generator1.py:35-51 parity) to the Kafka ``events`` topic in the CSV wire
format. Batch write — the stream is deterministic and bounded (104 100
records), so a batch Kafka write reproduces it exactly.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.sources.generator import generated_events


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--topic", default="events")
    args = ap.parse_args()

    spark = get_spark("generator-job")
    wire = generated_events(spark).select(
        F.col("user_id").cast("string").alias("key"),  # key=userID, generator1.py:24
        F.concat_ws(
            ",",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.col("user_id"),
            F.col("transaction_id"),
            F.col("value").cast("bigint"),
        ).alias("value"),
    )
    (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", args.bootstrap)
        .option("topic", args.topic)
        .save()
    )


if __name__ == "__main__":
    main()
