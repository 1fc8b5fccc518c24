"""Property-based tests (SURVEY.md §5.2): sessionization invariants and
CSV parse round-trip on hypothesis-generated event sets.

Spark sessions are expensive, so each property runs a modest number of
examples with deadline disabled; the generators are biased toward gap
boundaries (deltas straddling exactly 30 s) where the interesting
semantics live.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.sessionize import sessionize

BASE = datetime(2024, 8, 26, 8, 0, 0)

# Inter-event deltas in milliseconds, biased around the 30 000 ms gap
# boundary: equal-to-gap must merge, gap+1ms must split.
_delta_ms = st.one_of(
    st.integers(min_value=0, max_value=60_000),
    st.sampled_from([29_999, 30_000, 30_001]),
)

_user_events = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),  # user_id
              _delta_ms,
              st.integers(min_value=-500, max_value=500)),  # value
    min_size=1, max_size=40,
)


def _build_events(spark, raw):
    rows, clocks = [], {}
    for i, (uid, delta_ms, value) in enumerate(raw):
        clocks[uid] = clocks.get(uid, BASE) + timedelta(milliseconds=delta_ms)
        rows.append((i, clocks[uid], uid, float(value)))
    return rows, spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    )


@pytest.mark.usefixtures("spark")
class TestSessionizationProperties:
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(raw=_user_events)
    def test_events_partition_exactly_into_sessions(self, spark, raw):
        """Every event lands in exactly one session: per-user event counts
        and value totals are conserved, and sessions of one user never
        overlap (next start > previous end is not required — end includes
        the gap padding — but starts must be >= previous *last event*)."""
        rows, ev = _build_events(spark, raw)
        sessions = sessionize(ev).collect()

        per_user_counts: dict[int, int] = {}
        per_user_sums: dict[int, float] = {}
        for _, ts, uid, value in rows:
            per_user_counts[uid] = per_user_counts.get(uid, 0) + 1
            per_user_sums[uid] = per_user_sums.get(uid, 0.0) + value

        got_counts: dict[int, int] = {}
        got_sums: dict[int, float] = {}
        for s in sessions:
            got_counts[s.user_id] = got_counts.get(s.user_id, 0) + s.event_count
            got_sums[s.user_id] = got_sums.get(s.user_id, 0.0) + s.session_sum
        assert got_counts == per_user_counts
        for uid in per_user_sums:
            assert abs(got_sums[uid] - per_user_sums[uid]) < 0.05

        by_user: dict[int, list] = {}
        for s in sessions:
            by_user.setdefault(s.user_id, []).append(s)
        for group in by_user.values():
            group.sort(key=lambda s: s.session_start)
            for a, b in zip(group, group[1:]):
                # strictly more than the 30s gap between adjacent sessions
                assert b.session_start >= a.session_end

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(raw=_user_events)
    def test_gap_boundary_merge_semantics(self, spark, raw):
        """A delta of exactly the gap merges; strictly greater splits —
        verified against a direct per-user replay of the rule."""
        rows, ev = _build_events(spark, raw)
        sessions = sessionize(ev).collect()
        # replay: count sessions per user with the strict > 30s break rule
        per_user_ts: dict[int, list] = {}
        for _, ts, uid, _v in rows:
            per_user_ts.setdefault(uid, []).append(ts)
        want_counts = {}
        for uid, tss in per_user_ts.items():
            tss.sort()
            n = 1
            for a, b in zip(tss, tss[1:]):
                if (b - a) > timedelta(seconds=30):
                    n += 1
            want_counts[uid] = n
        got = {}
        for s in sessions:
            got[s.user_id] = got.get(s.user_id, 0) + 1
        assert got == want_counts


@pytest.mark.usefixtures("spark")
class TestParseRoundTripProperties:
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**6),      # seconds offset
                st.integers(min_value=1, max_value=10**9),      # user
                st.integers(min_value=1, max_value=10**6),      # tx
                st.integers(min_value=-10**9, max_value=10**9), # payload int
            ),
            min_size=1, max_size=30,
        ),
        n_malformed=st.integers(min_value=0, max_value=5),
    )
    def test_wire_roundtrip_preserves_good_rows_drops_bad(self, spark, rows, n_malformed):
        from windowsession_using_kafka_flink_docker_spark.streaming import parse_csv_events
        good = [
            f"{(BASE + timedelta(seconds=sec)).strftime('%Y-%m-%d %H:%M:%S')},{uid},{tx},{pay}"
            for sec, uid, tx, pay in rows
        ]
        bad = ["not,enough", "a,b,c,d", "", "2024-13-45 99:99:99,1,1,1", "x,y,z,w,extra"][:n_malformed]
        df = spark.createDataFrame([(line,) for line in good + bad], "value STRING")
        out = parse_csv_events(df).collect()
        assert len(out) == len(good)
        assert sorted((r.user_id, r.transaction_id, r.payload_value) for r in out) == \
               sorted((uid, tx, float(pay)) for _, uid, tx, pay in rows)


# --- as-of join: union-merge equals the obvious quadratic definition ------

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # key
        st.integers(min_value=0, max_value=120),          # seconds offset
        st.floats(min_value=0.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=0, max_size=25,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=_asof_events, right=_asof_events)
def test_asof_join_matches_naive(spark, left, right):
    """For arbitrary small event sets (including duplicate timestamps and
    empty sides), the union-merge as-of join must equal the quadratic
    reference: latest right row with r.ts <= l.ts per key. Right-side ties
    are collapsed to max(value) first, mirroring the catalog query."""
    from windowsession_using_kafka_flink_docker_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), v) for k, s, v in left],
        "user_id long, ts timestamp, value double",
    )
    rdf_raw = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), v) for k, s, v in right],
        "user_id long, ts timestamp, mark double",
    )
    rdf = rdf_raw.groupBy("user_id", "ts").agg(F.max("mark").alias("mark"))

    from windowsession_using_kafka_flink_docker_spark.operators.asof import (
        asof_join_bucketed,
    )

    got = sorted(
        (r.user_id, r.ts, r.value, r.asof_ts, r.mark)
        for r in asof_join(ldf, rdf, on=["user_id"],
                           right_cols={"mark": "mark"}).collect()
    )
    got_bucketed = sorted(
        (r.user_id, r.ts, r.value, r.asof_ts, r.mark)
        for r in asof_join_bucketed(ldf, rdf, on=["user_id"],
                                    right_cols={"mark": "mark"},
                                    bucket_sec=30.0).collect()
    )
    assert got_bucketed == got

    rights = {}
    for k, s, v in right:
        key = (k, s)
        rights[key] = max(rights.get(key, v), v)
    want = []
    for k, s, v in left:
        cands = [(rs, rv) for (rk, rs), rv in rights.items() if rk == k and rs <= s]
        if cands:
            rs, rv = max(cands)  # latest ts wins; unique per (key, ts)
            want.append((k, t0 + timedelta(seconds=s), v,
                         t0 + timedelta(seconds=rs), rv))
    assert got == sorted(want)


# --- SCD2 upsert invariants -------------------------------------------------

_scd_snapshot = st.lists(
    st.tuples(st.integers(min_value=1, max_value=20),      # key
              st.integers(min_value=0, max_value=5)),       # attr bucket
    min_size=1, max_size=15, unique_by=lambda t: t[0],
)
_scd_changes = st.lists(
    st.tuples(st.integers(min_value=1, max_value=30),       # key (some new)
              st.integers(min_value=0, max_value=5)),
    min_size=0, max_size=15, unique_by=lambda t: t[0],
)


class TestScd2Properties:
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(snap=_scd_snapshot, chg=_scd_changes)
    def test_version_invariants(self, spark, snap, chg):
        """For ANY snapshot/changes pair: every key has exactly one
        current row; expired rows exist iff the key was effectively
        changed; total rows = |snapshot| + |new keys| + |effective
        updates|."""
        from windowsession_using_kafka_flink_docker_spark.operators.scd import scd2_apply

        t0 = datetime(2020, 1, 1)
        snapshot = spark.createDataFrame(
            [(k, float(a), t0) for k, a in snap],
            "k BIGINT, bal DOUBLE, valid_from TIMESTAMP")
        changes = spark.createDataFrame(
            [(k, float(a)) for k, a in chg] or [(None, None)],
            "k BIGINT, bal DOUBLE").where(F.col("k").isNotNull())
        out = scd2_apply(snapshot, changes, key="k",
                         batch_ts=F.lit("2024-06-01").cast("timestamp"),
                         attr_cols=("bal",)).collect()

        snap_d = dict(snap)
        chg_d = dict(chg)
        effective = {k for k, a in chg_d.items()
                     if k in snap_d and snap_d[k] != a}
        new_keys = {k for k in chg_d if k not in snap_d}
        all_keys = set(snap_d) | new_keys

        current = [r for r in out if r.is_current]
        expired = [r for r in out if not r.is_current]
        assert {r.k for r in current} == all_keys
        assert len(current) == len(all_keys)  # exactly one current per key
        assert {r.k for r in expired} == effective
        assert len(out) == len(snap_d) + len(new_keys) + len(effective)
        for r in current:
            want = chg_d[r.k] if (r.k in effective or r.k in new_keys) else snap_d[r.k]
            assert r.bal == float(want)
            assert r.valid_to is None
        for r in expired:
            assert r.bal == float(snap_d[r.k])
            assert r.valid_to is not None


# --- PageRank invariants ----------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(min_value=1, max_value=8),
              st.integers(min_value=1, max_value=8)),
    min_size=0, max_size=20, unique=True,
).map(lambda es: [(s, d) for s, d in es if s != d])


class TestPagerankProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(edges=_edges)
    def test_mass_bounds(self, spark, edges):
        """For ANY digraph on 8 nodes: every rank >= teleport mass, total
        mass <= 1 (dangling leaks, never gains), and == 1 when no node
        dangles."""
        from windowsession_using_kafka_flink_docker_spark.operators.cluster import pagerank

        nodes = list(range(1, 9))
        nodes_df = spark.createDataFrame([(v,) for v in nodes], "id BIGINT")
        edges_df = spark.createDataFrame(
            edges or [(None, None)], "src BIGINT, dst BIGINT"
        ).where(F.col("src").isNotNull())
        ranks = {r.id: r.rank for r in pagerank(edges_df, nodes_df).collect()}
        assert set(ranks) == set(nodes)
        teleport = 0.15 / len(nodes)
        assert all(r >= teleport - 1e-12 for r in ranks.values())
        total = sum(ranks.values())
        assert total <= 1.0 + 1e-9
        srcs = {s for s, _ in edges}
        if srcs == set(nodes):  # no dangling nodes -> mass conserved
            assert abs(total - 1.0) < 1e-9


class TestBloomProperties:
    """Bloom pre-join (operators/bloom.py): the no-false-negative law —
    every build key must pass its own probe — and probe/plain-semi-join
    agreement after the exact join, on hypothesis-generated key sets
    including negatives, zero, and extreme longs (sign bugs in the
    bit-position arithmetic would surface here: pmod keeps positions
    non-negative, shiftleft(1L, 63) is a negative long whose bitwise
    AND must still test the bit)."""

    _keys = st.lists(
        st.one_of(
            st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
            st.sampled_from([0, -1, 1, 2 ** 62, -(2 ** 62), 63, 64]),
        ),
        min_size=1, max_size=50, unique=True,
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(build=_keys, probe=_keys)
    def test_no_false_negatives_and_exact_composition(self, spark,
                                                      build, probe):
        from windowsession_using_kafka_flink_docker_spark.operators import bloom as B

        b = spark.createDataFrame([(k,) for k in build], "k BIGINT")
        p = spark.createDataFrame([(k,) for k in probe], "k BIGINT")
        bits = B.bloom_build(b, "k")
        # every build key passes its own probe
        self_hits = B.bloom_probe(b, "k", bits).count()
        assert self_hits == len(build)
        # composed pre-filter + exact semi join == plain semi join
        pruned = B.bloom_probe(p, "k", bits)
        got = sorted(r.k for r in pruned.join(
            b.withColumnRenamed("k", "bk"),
            F.col("k") == F.col("bk"), "left_semi").collect())
        want = sorted(set(build) & set(probe))
        assert got == want
