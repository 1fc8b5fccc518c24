"""Local oracle parity for STAGED drafts and queued REWRITES
(plans/staging_r15.py) — the same gate the driver will apply once a
draft registers, run here so registration day is a rename, not a debug
session. The staging module is not imported by the catalog; these
tests are its only consumer until promotion.

Both queues are empty since the r18-window promotions (history in the
staging module's docstring; promoted-entry tests live with their
entries in tests/test_maintenance_entries.py, tests/test_analytics.py
and tests/test_text_ops.py). The gates below iterate whatever the
queues hold, so the NEXT draft is covered the moment it lands in
STAGED/REWRITES — no new test wiring needed.
"""

from __future__ import annotations

from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
    REWRITES,
    STAGED,
)
from tests.oracle import compare


def test_staged_entries_match_oracle_and_are_non_vacuous(spark, sf_dir):
    """Every staged draft must pass its own DuckDB oracle AND return
    rows at test scale (an empty result would pass parity trivially
    and certify nothing)."""
    for name, (fn, oracle, description, tags) in STAGED.items():
        assert description.strip() and tags, f"{name} must ship documented"
        ok, msg = compare(fn(spark, sf_dir), oracle, sf_dir)
        assert ok, f"{name}: {msg}"
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
    to the registered entry."""
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

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


def test_hll_registers_within_expected_error(spark, sf_dir):
    """Beyond oracle parity (both engines compute identical registers):
    the CORRECTED estimate must actually be good. The entry pins only
    integer-exact columns (raw harmonic estimate + register fill
    count); the consumer-side small-range correction — linear counting
    m*ln(m/v) when raw <= 2.5m and empty registers remain — is applied
    here in Python, and the result must sit within 3.3 sigma of HLL's
    standard error (1.04/sqrt(512) = 4.6% -> 15%). Register-state
    consistency: filled_buckets <= min(m, n_exact)."""
    import math

    from windowsession_using_kafka_flink_docker_spark.plans.staging_r15 import (
        _HLL_M,
        hll_ndv_by_event_type,
    )

    rows = hll_ndv_by_event_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        assert 0 < r.filled_buckets <= min(_HLL_M, r.n_exact)
        v = _HLL_M - r.filled_buckets
        if r.ndv_hll_raw <= 2.5 * _HLL_M and v > 0:
            est = _HLL_M * math.log(_HLL_M / v)   # linear counting
        else:
            est = float(r.ndv_hll_raw)
        assert abs(est - r.n_exact) <= 0.15 * r.n_exact, (
            r.event_type, r.n_exact, r.filled_buckets, r.ndv_hll_raw, est)


def test_token_packing_respects_budget_and_isolates_oversized(spark):
    """The packing invariants the oracle cannot see directly: every
    multi-doc bin holds <= budget tokens; an oversized doc sits ALONE
    in its bin; bin ids are contiguous from 0 per shard; packing is
    order-preserving (first_doc/last_doc ranges of consecutive bins
    never interleave)."""
    import windowsession_using_kafka_flink_docker_spark.plans.staging_r15 as M

    # shard = doc_id % 16; keep everything in shard 0 for determinism
    docs = [
        (0, "tok " * 1000),     # 1000 tokens
        (16, "tok " * 1000),    # fits with previous (2000 <= 2048)
        (32, "tok " * 100),     # would overflow -> opens bin 1
        (48, "tok " * 5000),    # oversized -> isolates into bin 2
        (64, "tok " * 10),      # bin 3 (previous bin oversized)
        (80, "tok " * 10),      # joins bin 3
        (65, "tok " * 3),       # shard 1: its own fold, bin 0
    ]
    ev = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    orig = M.load_table
    M.load_table = lambda s, sf, name: ev
    try:
        out = {(r.shard, r.bin_id): (r.n_docs, r.bin_tokens,
                                     r.first_doc, r.last_doc)
               for r in M.token_budget_packing(spark, "x").collect()}
    finally:
        M.load_table = orig

    assert out == {
        (0, 0): (2, 2000, 0, 16),
        (0, 1): (1, 100, 32, 32),
        (0, 2): (1, 5000, 48, 48),
        (0, 3): (2, 20, 64, 80),
        (1, 0): (1, 3, 65, 65),
    }


def test_hll_register_build_is_partial_aggregated(spark, sf_dir):
    """The 100 TB claim the SCALING entry makes: the register build
    plans ONE hash exchange with a partial max BEFORE it — the shuffle
    carries per-task register states (<= |types| x 512 rows), never
    raw keys. No Python anywhere."""
    from windowsession_using_kafka_flink_docker_spark.operators.hll import (
        hll_registers,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    plan = (hll_registers(load_table(spark, sf_dir, "events"))
            ._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("simple")))
    assert plan.count("Exchange hashpartitioning") == 1
    pre_exchange = plan.split("Exchange hashpartitioning")[1]
    assert "partial_max" in pre_exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_late_packing_repair_crafted_and_conserving(spark, sf_dir):
    """Crafted: a late doc prepended mid-shard reshapes that shard's
    bins (bins_after > bins_before here) while an untouched shard
    never appears in the audit; and at SF scale the audit conserves
    token mass — tokens_added equals the late docs' own token sum per
    shard (packing repartitions tokens into bins, never creates or
    loses them)."""
    from pyspark.sql import functions as F

    import windowsession_using_kafka_flink_docker_spark.plans.staging_r15 as M
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import (
        token_count,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    # _PACK_LATE_MOD=23, OFF=7 -> id 7 is late; shard = id % 16 -> 7.
    # Ontime shard-7 docs are ids 23 and 39 (1500 tokens each: two
    # bins). With the late 1000-token id 7 folded in front, packing
    # becomes 1000 | 1500 | 1500 -> three bins, 1000 tokens added.
    docs = [
        (7, "tok " * 1000),
        (23, "tok " * 1500),
        (39, "tok " * 1500),
        (0, "tok " * 5),      # untouched shard-0 control
    ]
    ev = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    orig = M.load_table
    M.load_table = lambda s, sf, name: ev
    try:
        audit = {r.shard: (r.late_docs, r.bins_before, r.bins_after,
                           r.tokens_added)
                 for r in M.late_doc_packing_repair(spark, "x").collect()}
    finally:
        M.load_table = orig
    assert audit == {7: (1, 2, 3, 1000)}

    # SF-scale conservation
    real = M.late_doc_packing_repair(spark, sf_dir)
    late_toks = (load_table(spark, sf_dir, "documents")
                 .where(F.col("doc_id") % M._PACK_LATE_MOD
                        == M._PACK_LATE_OFF)
                 .groupBy((F.col("doc_id") % M._PACK_SHARDS)
                          .alias("shard"))
                 .agg(F.sum(token_count("text").cast("long"))
                      .alias("want")))
    bad = (real.join(late_toks, "shard")
           .where(F.col("tokens_added") != F.col("want")).count())
    assert bad == 0


def test_greedy_fold_resumption_property():
    """The algebra maintainer #28 rides: folding a token sequence in
    two parts — the second resumed from the first's returned tail —
    must equal folding it at once, for EVERY split point. Randomized
    over sizes spanning far-below to far-above the budget (oversized
    docs included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from windowsession_using_kafka_flink_docker_spark.operators.packing import (
        greedy_fold,
    )

    toks = st.lists(st.integers(min_value=0, max_value=5000),
                    min_size=0, max_size=60)

    @settings(max_examples=200, deadline=None)
    @given(xs=toks, frac=st.floats(min_value=0.0, max_value=1.0))
    def check(xs, frac):
        k = int(frac * len(xs))
        full, fb, fc, ff = greedy_fold(xs)
        a, b1, c1, f1 = greedy_fold(xs[:k])
        b, b2, c2, f2 = greedy_fold(xs[k:], b1, c1, f1)
        assert a + b == full
        assert (b2, c2, f2) == (fb, fc, ff)

    check()
