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
