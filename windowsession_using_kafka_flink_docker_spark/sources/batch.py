"""Batch file sources (parquet / CSV / JSON).

The reference consumes only Kafka (flink_stream_task1.py:13-19); batch file
scans are part of the extension surface (SURVEY.md §2.11) and the substrate
for every oracle-checked query. Scans stay fully declarative so Catalyst
gets predicate pushdown + column pruning for free — at 100 TB the difference
between scanning 2 columns and scanning 11 is the whole ballgame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The star-schema + extension tables the test harness materializes.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


#: Timestamp columns per table — the harness's parquet writer has varied
#: across rounds (TIMESTAMP(NANOS) in early rounds, naive timestamp[us]
#: later), so normalize every variant to plain TimestampType carrying the
#: file's wall-clock as a UTC instant — exactly what DuckDB's reader sees.
_TS_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table from a scale-factor directory.

    Normalizes timestamp columns to TimestampType (UTC instant):
    - TIMESTAMP(NANOS) files read as int64 (spark.sql.legacy.parquet.
      nanosAsLong) are truncated ns → µs with exact integer arithmetic
      (`div 1000` — floor == truncate for the positive epochs here);
    - timestamp-without-timezone files (TIMESTAMP_NTZ) are pinned so the
      file's wall-clock IS the UTC wall-clock of the resulting instant,
      independent of spark.sql.session.timeZone. The NTZ->Timestamp cast
      alone interprets the wall-clock in the SESSION zone (a New York
      session would shift 12:00 -> 17:00Z), so we first convert_timezone
      the NTZ value from UTC into the session zone and let the cast undo
      that shift — net effect: instant == NTZ-as-UTC in any session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                col,
                F.to_timestamp(
                    F.convert_timezone(F.lit("UTC"), F.current_timezone(), F.col(col))
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Read several tables; returns {name: DataFrame}."""
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_csv_events(spark: SparkSession, path: str) -> DataFrame:
    """Typed CSV scan with malformed-row drop (PERMISSIVE + null filter).

    Batch rendering of the reference's parse-and-filter front end
    (flink_stream_task1.py:21-36,45-46): rows that fail the 4-field
    (ts,user,session,payload) contract become nulls and are dropped, never
    errors.
    """
    schema = "ts TIMESTAMP, user_id BIGINT, transaction_id BIGINT, payload_value DOUBLE"
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(path)
    return df.where(
        "ts IS NOT NULL AND user_id IS NOT NULL AND "
        "transaction_id IS NOT NULL AND payload_value IS NOT NULL"
    )
