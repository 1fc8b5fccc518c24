"""Streaming sources — the reference's S1/S2 ingest surface on Structured
Streaming.

Reference parity targets:

- Kafka source: topic ``events``, earliest offsets, value-only string
  deserialization (flink_stream_task1.py:13-19; duplicated task2:14-20,
  task3:15-21) → ``spark.readStream.format("kafka")`` + ``CAST(value AS
  STRING)`` + ``from_csv``.
- CSV wire format ``"ts,user,session,payload"`` parsed to
  (TIMESTAMP, BIGINT, BIGINT, DOUBLE) with malformed rows dropped, never
  errored (parse_csv_event, flink_stream_task1.py:21-36,45-46) — expressed
  as ``from_csv`` PERMISSIVE + null filter, no Python in the per-record
  path.
- Time model (SURVEY.md §1.4): the reference accidentally windows on the
  Kafka record timestamp; we default to the embedded event timestamp (the
  deterministic, principled choice) and expose ``use_kafka_time=True`` for
  arrival-time parity.

Scale notes: the Kafka scan parallelizes per topic-partition; ``from_csv``
and the null filter are codegen'd JVM expressions, so a 1000-executor
deployment is bounded by Kafka fetch, not parse. File sources list+schedule
splits exactly like batch parquet/CSV scans (same pushdown machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Wire-format schema of the reference's CSV records (generator1.py:21,
#: field casts at flink_stream_task1.py:29-34).
EVENT_WIRE_SCHEMA = (
    "ts TIMESTAMP, user_id BIGINT, transaction_id BIGINT, payload_value DOUBLE"
)

#: Reference topic / group defaults (flink_stream_task1.py:14-17).
DEFAULT_TOPIC = "events"
DEFAULT_GROUP = "spark-session-group"


def parse_csv_events(raw: DataFrame, value_col: str = "value",
                     use_kafka_time: bool = False,
                     kafka_ts_col: str = "kafka_ts") -> DataFrame:
    """Parse the CSV wire format into typed event rows, dropping malformed
    records (flink_stream_task1.py:21-36 semantics, zero Python).

    Output columns: ``ts TIMESTAMP, user_id BIGINT, transaction_id BIGINT,
    payload_value DOUBLE``. ``use_kafka_time=True`` substitutes the source
    record timestamp for ``ts`` — the reference's (accidental) arrival-time
    windowing mode (SURVEY.md §1.4).
    """
    parsed = raw.withColumn("_r", F.from_csv(F.col(value_col), EVENT_WIRE_SCHEMA))
    if use_kafka_time:
        parsed = parsed.withColumn("_r", F.col("_r").withField("ts", F.col(kafka_ts_col)))
    return (
        parsed.select("_r.*")
        # 4-field contract: any malformed field nulls out; drop the row
        # (reference returns None and filters, task1:35-36,46).
        .where(
            "ts IS NOT NULL AND user_id IS NOT NULL AND "
            "transaction_id IS NOT NULL AND payload_value IS NOT NULL"
        )
    )


def kafka_raw_source(spark: SparkSession, bootstrap_servers: str = "localhost:9092",
                     topic: str = DEFAULT_TOPIC,
                     starting_offsets: str = "earliest",
                     group_id: str = DEFAULT_GROUP) -> DataFrame:
    """Raw Kafka stream: (value STRING, kafka_ts TIMESTAMP, key STRING).

    Mirrors the reference's source config — earliest offsets, value-only
    deserialization (flink_stream_task1.py:13-19). Requires the
    spark-sql-kafka connector package on the classpath.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", group_id)
        .load()
        .select(
            F.col("value").cast("string").alias("value"),
            F.col("timestamp").alias("kafka_ts"),
            F.col("key").cast("string").alias("key"),
        )
    )


def kafka_events_source(spark: SparkSession, bootstrap_servers: str = "localhost:9092",
                        topic: str = DEFAULT_TOPIC,
                        starting_offsets: str = "earliest",
                        use_kafka_time: bool = False) -> DataFrame:
    """Typed event stream from Kafka: source → CAST value → from_csv →
    malformed drop. The complete S1+P1+F1 front end of all three reference
    jobs as one declarative plan."""
    raw = kafka_raw_source(spark, bootstrap_servers, topic, starting_offsets)
    return parse_csv_events(raw, use_kafka_time=use_kafka_time)


def file_events_source(spark: SparkSession, path: str, fmt: str = "parquet",
                       schema: str | None = None,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded file-directory source (parquet/csv/json) — the Kafka-free
    way to drive the same streaming plans in tests and backfills.

    ``schema`` defaults to the driver's events-table shape. File sources
    need an explicit schema in streaming (no inference race).
    """
    if schema is None:
        schema = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                  "event_type STRING, value DOUBLE, props STRING")
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "csv":
        reader = reader.option("mode", "PERMISSIVE")
    return reader.load(path)


def rate_events_source(spark: SparkSession, rows_per_second: int = 100,
                       n_users: int = 14) -> DataFrame:
    """Synthetic unbounded event stream shaped like the generator's wire
    records (generator1.py:14-32): deterministic users cycling over
    ``n_users`` keys, payload = user_id * 10.

    Built on the ``rate`` source so throughput is controllable; used for
    demos and soak tests where Kafka isn't wired.
    """
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % n_users + 1).alias("user_id"),
            (F.col("value") % 1_000_000 + 1).alias("transaction_id"),
            ((F.col("value") % n_users + 1) * 10.0).alias("payload_value"),
        )
    )
