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


def test_staged_plan_shapes(spark, sf_dir):
    """The scale promises the drafts make must hold before promotion:
    global top-10 plans as TakeOrderedAndProject (never a fact-scale
    single-partition sort), nothing plans a cartesian product or a
    Python stage, and the per-user rank reuses the sessionization
    exchange (exactly one shuffle of the session frame)."""
    from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
        session_top2_per_user,
        session_top10_global,
        event_type_crosscorr,
    )

    def plan(df, mode="formatted"):
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString(mode)
        return df._jdf.queryExecution().explainString(jmode)

    topg = plan(session_top10_global(spark, sf_dir))
    assert "TakeOrderedAndProject" in topg, topg[:1500]
    for df in (session_top2_per_user(spark, sf_dir),
               session_top10_global(spark, sf_dir),
               event_type_crosscorr(spark, sf_dir)):
        p = plan(df, "extended")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p and "MapInPandas" not in p

    # per-user rank over the session frame: the window partitions by the
    # same key the sessionization grouped on — no exchange between the
    # session aggregate and the rank (one hashpartitioning on user_id
    # feeds MergingSessions, Sort, WindowGroupLimit, and Window alike)
    topu = plan(session_top2_per_user(spark, sf_dir), "simple")
    assert topu.count("Exchange hashpartitioning") == 1, topu[:2000]
    assert "WindowGroupLimit" in topu, topu[:2000]


def test_crosscorr_matches_numpy_reference(spark):
    """event_type_crosscorr against an independent numpy Pearson on a
    crafted daily grid (injected through createDataFrame + a temp view
    shim of the Spark-side daily aggregation): the floor-scaled e4 value
    must equal numpy's within one ulp-step of the floor boundary."""
    import numpy as np

    from windowsession_using_kafka_flink_docker_spark.plans import staging_r15

    rng = np.random.RandomState(7)
    days = 40
    series = {
        "a": rng.randint(1, 500, size=days),
        # b tracks a at lag 1 with noise -> strong xcorr at lag 1
        "b": None,
        "c": rng.randint(1, 500, size=days),
    }
    series["b"] = np.roll(series["a"], 1) + rng.randint(0, 50, size=days)
    import datetime

    # build the real per-event frame, kept small: <= 30 events/day so
    # the materialized row count stays in the low thousands
    small = {t: np.clip(ys, 1, 30) for t, ys in series.items()}
    rows = []
    for t, ys in small.items():
        for x, y in enumerate(ys):
            d = datetime.date(2024, 1, 1) + datetime.timedelta(days=int(x))
            ts = datetime.datetime.combine(d, datetime.time(12))
            rows.extend([(ts, t)] * int(y))
    ev = spark.createDataFrame(rows, "ts TIMESTAMP, event_type STRING")

    import windowsession_using_kafka_flink_docker_spark.plans.staging_r15 as M
    orig = M.load_table
    M.load_table = lambda s, sf, name: ev
    try:
        got = {(r.type_a, r.type_b, r.lag): (r.m, r.xcorr_e4)
               for r in M.event_type_crosscorr(spark, "ignored").collect()}
    finally:
        M.load_table = orig

    types = sorted(small)
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            for lag in (0, 1, 2):
                a = small[ta][:days - lag].astype(np.float64)
                b = small[tb][lag:].astype(np.float64)
                m = len(a)
                d1 = m * (a * a).sum() - a.sum() ** 2
                d2 = m * (b * b).sum() - b.sum() ** 2
                if m < 8 or d1 <= 0 or d2 <= 0:
                    assert (ta, tb, lag) not in got
                    continue
                num = m * (a * b).sum() - a.sum() * b.sum()
                want = int(np.floor(num / np.sqrt(d1 * d2) * 10000))
                gm, ge4 = got[(ta, tb, lag)]
                assert gm == m, (ta, tb, lag)
                assert abs(ge4 - want) <= 1, (ta, tb, lag, ge4, want)
    # the planted lag-1 dependence must dominate: corr(a->b, lag1)
    # exceeds corr(a->c, lag1)
    assert got[("a", "b", 1)][1] > got[("a", "c", 1)][1]
