"""Mirror of the driver's correctness gate: every catalog query with an
oracle must match DuckDB on the test parquet; oracle-less queries must at
least execute and return a stable schema."""

from __future__ import annotations

import pytest

from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
from tests.oracle import compare

ORACLED = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, sf_dir, name):
    spec = CATALOG[name]
    ok, msg = compare(spec.spark(spark, sf_dir), spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec.spark(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema.fieldNames()


def test_no_half_cent_rounding_ties_at_driver_scale(spark, sf_dir):
    """Tripwire for the sf0.1 sweep's penny-tie finding (BASELINE round
    13 close): Spark's round(x, 2) rounds the shortest decimal
    representation half-up while DuckDB rounds the binary double, so a
    session average landing on an exact .xx5 decimal boundary splits by
    one cent between the engines. No such tie exists in the driver's
    sf0.01 data today — this test fails LOUDLY (before the driver does)
    if data or sessionization changes ever produce one."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.operators.sessionize import (
        sessionize,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events")
    raw = sessionize(ev).select(
        (F.col("session_sum") / F.greatest(F.lit(1), F.col("event_count")))
        .alias("avg_raw")).collect()
    ties = []
    for r in raw:
        v = r.avg_raw
        string_half_up = Decimal(str(v)).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP)
        binary_round = Decimal(repr(round(v, 2)))
        if string_half_up != binary_round:
            ties.append(v)
    assert not ties, (
        f"{len(ties)} session averages land on half-cent ties "
        f"(e.g. {ties[:3]}); Spark and DuckDB will round these apart — "
        "see BASELINE.md 'Round 13 (close)' before certifying")


def test_no_quality_score_rounding_ties_at_driver_scale(spark, sf_dir):
    """Tripwire for the r15 sf0.1 sweep's second rounding-tie family:
    quality_scores ROUND(score, 4) landed one sf0.1 document on an
    exact .xxxx5 decimal boundary (0.94525 -> Spark 0.9452 vs DuckDB
    0.9453 — the same shortest-decimal-half-up vs binary-double split
    as the session half-cent family, BASELINE round-13 close). No such
    tie exists in the driver's sf0.01 data today; this fails LOUDLY
    before the driver would. The exact-e4 integer-division rewrite
    (the repo's established fix for this class) is queued for r16 when
    the window can absorb the changed-entry recertification."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import (
        char_ratio,
        token_count,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    # the quality_score expression WITHOUT the final round (kept in
    # lockstep with operators/text_analysis.py:quality_score)
    t = F.col("text")
    n = F.length(t)
    toks = token_count(t)
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(n / toks)
    raw = (0.3 * (F.when(n < 20, F.lit(0.0)).when(n < 100, F.lit(0.5))
                  .otherwise(F.lit(1.0)))
           + 0.3 * char_ratio(t, r"[A-Za-z]")
           + 0.2 * (1 - F.least(char_ratio(t, r"[^\w\s]") * 5, F.lit(1.0)))
           + 0.2 * F.when((mean_word >= 3) & (mean_word <= 12),
                          F.lit(1.0)).otherwise(F.lit(0.5)))
    ties = []
    for r in docs.select(raw.alias("raw")).collect():
        v = r.raw
        string_half_up = Decimal(str(v)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP)
        binary_round = Decimal(repr(round(v, 4)))
        if string_half_up != binary_round:
            ties.append(v)
    assert not ties, (
        f"{len(ties)} quality scores land on 1e-4 rounding ties "
        f"(e.g. {ties[:3]}); Spark and DuckDB will round these apart — "
        "land the exact-e4 rewrite before certifying")
