"""Local oracle parity for the r15 STAGING drafts (plans/staging_r15.py)
— the same gate the driver will apply once they register in r15, run
here so registration day is a rename, not a debug session. The staging
module is not imported by the catalog; these tests are the only
consumer until r15."""

from __future__ import annotations

import pytest

from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import STAGED
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_entry_matches_oracle(spark, sf_dir, name):
    fn, oracle, description, tags = STAGED[name]
    assert description.strip() and tags, f"{name} must ship documented"
    ok, msg = compare(fn(spark, sf_dir), oracle, sf_dir)
    assert ok, f"{name}: {msg}"


def test_staged_entries_have_rows(spark, sf_dir):
    """Non-vacuity: a draft whose result is empty at test scale would
    pass parity trivially and certify nothing."""
    for name, (fn, _, _, _) in STAGED.items():
        assert fn(spark, sf_dir).count() > 0, f"{name} is vacuous"


def test_staged_names_not_yet_registered():
    """The r14 window is saturated — staging must stay OUT of the
    catalog until r15 (registering now would strand an uncertifiable
    entry). This inverts on purpose when r15 moves them over."""
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

    clash = sorted(set(STAGED) & set(CATALOG))
    assert not clash, (
        f"staged entries already registered: {clash} — if this is the "
        "r15 promotion, delete the staging copies and this test's guard")
