"""Local oracle parity for the STAGED drafts (plans/staging_r15.py)
— the same gate the driver will apply once they register, run here so
registration day is a rename, not a debug session. The staging module
is not imported by the catalog; these tests are the only consumer
until promotion.

Promotion history lives in the staging module's docstring; tests for
promoted entries moved to tests/test_maintenance_entries.py (r18
window) and tests/test_plan_quality.py (r15) with their entries.
"""

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
    """Staging must stay OUT of the catalog until a window has free
    slots (registering early would strand an uncertifiable entry).
    This inverts on purpose on promotion day."""
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

    clash = sorted(set(STAGED) & set(CATALOG))
    assert not clash, (
        f"staged entries already registered: {clash} — if this is the "
        "promotion, delete the staging copies and this test's guard")


def test_queued_rewrites_oracle_exact_and_diff_confined(spark, sf_dir):
    """Every queued rewrite must pass its OWN oracle and keep the
    registered entry's schema. The allowed diff vs the registered
    pipeline depends on the rewrite class: a session-family exact-e2
    rewrite (a ``session_avg`` column exists) may move avg values only,
    by exactly one cent (the half-cent tie class — at the driver SFs no
    tie exists, so this doubles as a value-identity proof at
    certification scale); any other rewrite must be row-for-row EQUAL
    to the registered entry. (Queue empty since the r18-window
    landings — the gate stands ready for the next rewrite.)"""
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
    from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import REWRITES

    assert set(REWRITES) <= set(CATALOG), \
        "rewrites must target registered entries"
    for name, (fn, oracle) in REWRITES.items():
        ok, msg = compare(fn(spark, sf_dir), oracle, sf_dir)
        assert ok, f"{name} rewrite vs its own oracle: {msg}"

        old_df = CATALOG[name].spark(spark, sf_dir)
        new_df = fn(spark, sf_dir)
        assert old_df.columns == new_df.columns, name
        cols = old_df.columns

        if "session_avg" not in cols:
            o = sorted(tuple(r) for r in old_df.collect())
            n = sorted(tuple(r) for r in new_df.collect())
            assert o == n, f"{name}: rewrite must be value-identical"
            continue

        ai = cols.index("session_avg")

        def keyed(df):
            rows = [tuple(r) for r in df.collect()]
            return sorted(rows,
                          key=lambda t: (tuple(str(t[i]) for i in
                                               range(len(t)) if i != ai),
                                         t[ai]))

        o, n = keyed(old_df), keyed(new_df)
        assert len(o) == len(n), f"{name}: row count changed"
        moved = 0
        for a, b in zip(o, n):
            assert all(a[i] == b[i] for i in range(len(a)) if i != ai), \
                f"{name}: non-avg column moved: {a} -> {b}"
            if a[ai] != b[ai]:
                moved += 1
                assert abs(round(b[ai] - a[ai], 6)) == 0.01, \
                    f"{name}: {a[ai]} -> {b[ai]} not a one-cent tie move"
        assert moved <= max(2, len(o) // 100), \
            f"{name}: {moved} rows moved — more than the tie class"


def test_isotonic_fit_properties(spark, sf_dir):
    """The r16-drafted isotonic draft beyond oracle parity (which
    already proves PAV == minimax on real data at three SFs): the
    fitted sequence must be NON-DECREASING over the month index
    (compared by exact cross-multiplication, never doubles), and PAV
    must conserve weighted mass — sum(n_m * fitted_m) == sum of all
    cents — since each pooled block's fitted value is exactly its
    block mean."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
        isotonic_monthly_revenue,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    rows = sorted(isotonic_monthly_revenue(spark, sf_dir).collect(),
                  key=lambda r: r.month_idx)
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert a.fitted_num * b.fitted_den <= b.fitted_num * a.fitted_den, (
            f"fit decreases {a.month_idx} -> {b.month_idx}")
    mass = sum(Fraction(r.fitted_num, r.fitted_den) * r.n_orders
               for r in rows)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    total = load_table(spark, sf_dir, "orders").agg(
        F.sum(cents)).first()[0]
    assert mass == total


def test_semantic_rrf_plan_shape_and_fusion(spark, sf_dir):
    """The semantic-leg draft's scale promises: no cartesian product,
    no Python stage (the cosine leg is a broadcast of ONE query
    vector, never a corpus shuffle); and the fusion is non-trivial —
    the top-10 must contain a doc ranked by only one of the two legs
    (the whole point of RRF)."""
    from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
        semantic_rrf_hybrid_search,
    )

    df = semantic_rrf_hybrid_search(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("extended")
    p = df._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    got = df.collect()
    assert len(got) == 10
    assert any(r.r_bm25 is None or r.r_sem is None for r in got)
