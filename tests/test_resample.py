"""Resampling invariants beyond the oracle row: fill totality, grid
regularity, and interpolation boundedness."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG


@pytest.fixture(scope="module")
def resampled(spark, sf_dir):
    """Cached once for the module, UNPERSISTED on teardown — a cached
    plan fragment left in the session-scoped SparkSession would be
    substituted into later plan-shape assertions (test_plan_quality's
    window-frame lock) and corrupt their operator counts."""
    df = CATALOG["resample_locf_hourly"].spark(spark, sf_dir).cache()
    yield df
    df.unpersist()


def test_fill_is_total_and_grid_regular(resampled):
    df = resampled
    assert df.where(F.col("value_filled").isNull()
                    | F.col("value_interp").isNull()).count() == 0
    # regular grid: per user, row count == span hours + 1, all hours unique
    spans = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("hour").alias("n_distinct"),
        F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    bad = spans.where(
        (F.col("n") != F.col("n_distinct"))
        | (F.col("n") != (F.unix_timestamp("hi", "yyyy-MM-dd HH:mm")
                          - F.unix_timestamp("lo", "yyyy-MM-dd HH:mm"))
           / 3600 + 1)
    ).count()
    assert bad == 0


def test_observed_rows_pass_through(resampled):
    df = resampled
    obs = df.where("is_observed")
    # observed rows: zero staleness, interp == filled == the observation
    assert obs.where("hours_since_obs != 0").count() == 0
    # interp at an observed point is the scaled-floor of the value itself
    assert obs.where(
        F.col("value_interp") != F.floor(F.col("value_filled") * 10000) / 10000.0
    ).count() == 0


def test_interpolation_bounded_by_neighbors(resampled):
    """Linear interpolation never exits the [prev, next] envelope; with
    both neighbors equal it is constant (up to the 1e-4 floor grid)."""
    df = resampled
    assert df.where(~F.col("is_observed")).count() > 0  # real gaps exist
    # prev obs value is the LOCF column itself; next obs value is the
    # filled column of the next observed row ('hour' strings sort
    # chronologically). Interp must stay inside the [prev, next] envelope
    # up to the 1e-4 floor grid.
    from pyspark.sql import Window
    win = (Window.partitionBy("user_id").orderBy("hour")
           .rowsBetween(0, Window.unboundedFollowing))
    nxt = F.first(F.when(F.col("is_observed"), F.col("value_filled")),
                  ignorenulls=True).over(win)
    checked = df.select(
        "is_observed", "value_interp",
        F.col("value_filled").alias("prev"), nxt.alias("next"))
    bad = checked.where(~F.col("is_observed")).where(
        (F.col("value_interp") < F.least("prev", "next") - 1e-4)
        | (F.col("value_interp") > F.greatest("prev", "next") + 1e-4)
    ).count()
    assert bad == 0
