"""Source-loader semantics: timestamp normalization must be session-tz-proof.

The driver regenerates the parquet fixtures with varying timestamp physical
types (TIMESTAMP(NANOS)-as-int64, TIMESTAMP_NTZ) across rounds; load_table
normalizes every variant to a plain TimestampType whose UTC wall-clock equals
the file's wall-clock. The NTZ branch is the subtle one: a bare NTZ->Timestamp
cast interprets the wall-clock in spark.sql.session.timeZone, so a non-UTC
session would silently shift every epoch vs the DuckDB oracle (which always
reads NTZ as-written). These tests pin the invariant under a hostile session
timezone.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


@pytest.fixture
def ny_session(spark):
    """Temporarily run the shared session in America/New_York."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def _write_ntz_parquet(spark, tmp_path) -> str:
    out = str(tmp_path / "events.parquet")
    spark.sql(
        "SELECT 1 AS event_id, 7 AS user_id, "
        "TIMESTAMP_NTZ '2024-01-01 12:00:00' AS ts"
    ).write.mode("overwrite").parquet(out)
    return str(tmp_path)


class TestNtzNormalization:
    def test_ntz_pinned_to_utc_in_utc_session(self, spark, tmp_path):
        sf_dir = _write_ntz_parquet(spark, tmp_path)
        df = load_table(spark, sf_dir, "events")
        [row] = df.select(F.unix_micros("ts").alias("us")).collect()
        want = int(datetime.datetime(
            2024, 1, 1, 12, tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
        assert row.us == want

    def test_ntz_pinned_to_utc_in_new_york_session(self, ny_session, tmp_path):
        # Regression: to_utc_timestamp(ntz, 'UTC') was a no-op and the
        # implicit cast shifted 12:00 -> 17:00Z under a New York session.
        sf_dir = _write_ntz_parquet(ny_session, tmp_path)
        df = load_table(ny_session, sf_dir, "events")
        [row] = df.select(F.unix_micros("ts").alias("us")).collect()
        want = int(datetime.datetime(
            2024, 1, 1, 12, tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
        assert row.us == want

    def test_real_fixture_epochs_match_duckdb(self, spark, sf_dir):
        """events.ts epochs must equal what DuckDB reads from the same file."""
        import duckdb

        con = duckdb.connect()
        want = con.execute(
            "SELECT CAST(epoch_ms(MIN(ts)) AS BIGINT), "
            "       CAST(epoch_ms(MAX(ts)) AS BIGINT) "
            f"FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()
        got = (
            load_table(spark, sf_dir, "events")
            .agg(
                (F.unix_micros(F.min("ts")) / 1000).cast("long").alias("lo"),
                (F.unix_micros(F.max("ts")) / 1000).cast("long").alias("hi"),
            )
            .collect()[0]
        )
        assert (got.lo, got.hi) == want
