"""As-of join: semantics vs a naive quadratic reference, tie handling,
tolerance, and the plan property that makes it scale (one exchange, no
conditional-join pair explosion)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.asof import asof_join


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _t("2024-01-01 00:00:10"), 100.0),
            (1, _t("2024-01-01 00:00:30"), 200.0),
            (2, _t("2024-01-01 00:00:05"), 300.0),   # no prior right row -> dropped
            (2, _t("2024-01-01 00:00:20"), 400.0),   # tie with right @20 -> matches
            (3, _t("2024-01-01 00:00:50"), 500.0),   # key absent on right -> dropped
        ],
        "user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (1, _t("2024-01-01 00:00:00"), 1.0),
            (1, _t("2024-01-01 00:00:25"), 2.0),
            (2, _t("2024-01-01 00:00:20"), 3.0),
        ],
        "user_id long, ts timestamp, mark double",
    )
    return left, right


def test_backward_asof_with_ties_and_inner_semantics(spark):
    left, right = _frames(spark)
    got = sorted(
        (r.user_id, r.ts, r.value, r.asof_ts, r.mark)
        for r in asof_join(left, right, on=["user_id"],
                           right_cols={"mark": "mark"}).collect()
    )
    assert got == [
        (1, _t("2024-01-01 00:00:10"), 100.0, _t("2024-01-01 00:00:00"), 1.0),
        (1, _t("2024-01-01 00:00:30"), 200.0, _t("2024-01-01 00:00:25"), 2.0),
        (2, _t("2024-01-01 00:00:20"), 400.0, _t("2024-01-01 00:00:20"), 3.0),
    ]


def test_tolerance_rejects_stale_matches(spark):
    left, right = _frames(spark)
    got = sorted(
        (r.user_id, r.ts)
        for r in asof_join(left, right, on=["user_id"],
                           right_cols={"mark": "mark"},
                           tolerance_sec=5.0).collect()
    )
    # only matches within 5 s of the left row survive
    assert got == [
        (1, _t("2024-01-01 00:00:30")),  # 30-25 = 5 s
        (2, _t("2024-01-01 00:00:20")),  # tie, 0 s
    ]


def test_matches_naive_quadratic_reference(spark, sf_dir):
    """The union-merge result must equal the obvious-but-unscalable plan:
    conditional join on ts>=rts then keep the latest right row per left."""
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    right = (ev.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts").agg(F.max("value").alias("mark")))

    fast = asof_join(left, right, on=["user_id"], right_cols={"mark": "mark"})

    r = right.select(F.col("user_id").alias("r_uid"), F.col("ts").alias("r_ts"), "mark")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("r_ts"))
    naive = (
        left.join(r, (left.user_id == r.r_uid) & (left.ts >= r.r_ts))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "ts", "value", F.col("r_ts").alias("asof_ts"), "mark")
    )
    key = lambda rows: sorted((r.user_id, r.ts, r.value, r.asof_ts, r.mark) for r in rows)
    assert key(fast.collect()) == key(naive.collect())


def test_plan_single_exchange_no_join_explosion(spark):
    left, right = _frames(spark)
    plan = asof_join(
        left, right, on=["user_id"], right_cols={"mark": "mark"}
    )._jdf.queryExecution().executedPlan().toString()
    # union-merge: exactly one hash exchange (for the window), and no join
    # operator of any kind — the quadratic candidate-pair stage never exists
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, plan


def test_null_payload_right_row_is_matched_as_is(spark):
    """A matched right row whose payload is NULL must yield a NULL payload
    (same-row semantics, like DuckDB ASOF JOIN) — not an older row's
    payload stitched onto the newer row's timestamp."""
    left = spark.createDataFrame(
        [(1, _t("2024-01-01 00:00:12"), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 00:00:05"), 7.0),
         (1, _t("2024-01-01 00:00:10"), None)],
        "user_id long, ts timestamp, mark double",
    )
    rows = asof_join(left, right, on=["user_id"],
                     right_cols={"mark": "mark"}).collect()
    assert len(rows) == 1
    assert rows[0].asof_ts == _t("2024-01-01 00:00:10")
    assert rows[0].mark is None


class TestBucketedAsof:
    def test_equals_flat_asof_on_events(self, spark, sf_dir):
        """Bucketed (hot-key-parallel) as-of must equal the flat union-merge
        exactly on real data, across bucket sizes that split matches and
        carries differently."""
        from windowsession_using_kafka_flink_docker_spark.operators.asof import (
            asof_join_bucketed,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

        ev = load_table(spark, sf_dir, "events")
        left = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
        right = (ev.where(F.col("event_type") == "view")
                 .groupBy("user_id", "ts").agg(F.max("value").alias("mark")))

        key = lambda rows: sorted(
            (r.user_id, r.ts, r.value, r.asof_ts, r.mark) for r in rows
        )
        want = key(asof_join(left, right, on=["user_id"],
                             right_cols={"mark": "mark"}).collect())
        for bucket_sec in (600.0, 7 * 24 * 3600.0):
            got = key(asof_join_bucketed(left, right, on=["user_id"],
                                         right_cols={"mark": "mark"},
                                         bucket_sec=bucket_sec).collect())
            assert got == want, f"bucket_sec={bucket_sec}"

    def test_carry_across_empty_buckets(self, spark):
        """A match that skips several empty buckets must resolve through the
        forward-filled grid; a left row before any right row must drop."""
        from windowsession_using_kafka_flink_docker_spark.operators.asof import (
            asof_join_bucketed,
        )

        left = spark.createDataFrame(
            [(1, _t("2024-01-01 00:00:05"), 0.0),    # before any right -> drop
             (1, _t("2024-01-01 05:30:00"), 1.0),    # 5 empty hours after right
             (1, _t("2024-01-01 00:10:30"), 2.0)],   # same-bucket match
            "user_id long, ts timestamp, value double",
        )
        right = spark.createDataFrame(
            [(1, _t("2024-01-01 00:10:00"), 7.0)],
            "user_id long, ts timestamp, mark double",
        )
        got = sorted(
            (r.value, r.asof_ts, r.mark)
            for r in asof_join_bucketed(left, right, on=["user_id"],
                                        right_cols={"mark": "mark"},
                                        bucket_sec=600.0).collect()
        )
        assert got == [
            (1.0, _t("2024-01-01 00:10:00"), 7.0),
            (2.0, _t("2024-01-01 00:10:00"), 7.0),
        ]

    def test_heavy_work_partitions_on_key_and_bucket(self, spark, sf_dir):
        """The within-bucket window must partition on (key, bucket) — that
        is the skew claim — visible as hashpartitioning(..., _bkt...)."""
        from windowsession_using_kafka_flink_docker_spark.operators.asof import (
            asof_join_bucketed,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

        ev = load_table(spark, sf_dir, "events")
        left = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
        right = ev.where(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("value").alias("mark"))
        import re

        plan = asof_join_bucketed(
            left, right, on=["user_id"], right_cols={"mark": "mark"}
        )._jdf.queryExecution().executedPlan().toString()
        # the skew claim: some partitioning clause must carry BOTH the key
        # and the bucket (matching user_id alone would also match the grid
        # aggregations and prove nothing)
        assert re.search(r"hashpartitioning\(user_id#\d+L?, _bkt#\d+L?", plan), plan


class TestAsofNulls:
    """NULL keys and NULL left payloads — the cases where window
    partitioning (groups NULLs) and equi-joins (never match NULL) diverge;
    the bucketed variant must stay exactly equal to the flat one."""

    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, _t("2024-01-01 10:00:05"), None),        # NULL payload
             (None, _t("2024-01-01 10:00:05"), 1.0),      # NULL key
             (2, _t("2024-01-01 10:00:05"), 2.0)],
            "user_id long, ts timestamp, value double",
        )
        right = spark.createDataFrame(
            [(1, _t("2024-01-01 10:00:01"), 7.0),
             (1, _t("2024-01-01 09:00:00"), 3.0),         # earlier bucket
             (None, _t("2024-01-01 09:00:00"), 5.0),      # NULL key, carry
             (2, _t("2024-01-01 08:00:00"), 9.0)],
            "user_id long, ts timestamp, mark double",
        )
        return left, right

    def test_bucketed_equals_flat_with_nulls(self, spark):
        from windowsession_using_kafka_flink_docker_spark.operators.asof import (
            asof_join_bucketed,
        )

        left, right = self._frames(spark)
        key = lambda rows: sorted(
            ((r.user_id, r.ts, r.value, r.asof_ts, r.mark) for r in rows), key=str
        )
        want = key(asof_join(left, right, on=["user_id"],
                             right_cols={"mark": "mark"}).collect())
        got = key(asof_join_bucketed(left, right, on=["user_id"],
                                     right_cols={"mark": "mark"},
                                     bucket_sec=3600.0).collect())
        assert got == want
        # and the semantics themselves: 3 lefts, all matched exactly once
        assert len(want) == 3
        by_user = {u: (a, m) for u, _, _, a, m in want}
        assert by_user[1] == (_t("2024-01-01 10:00:01"), 7.0)   # same bucket
        assert by_user[None] == (_t("2024-01-01 09:00:00"), 5.0)  # NULL-key carry
        assert by_user[2] == (_t("2024-01-01 08:00:00"), 9.0)   # carry

    def test_bucketed_tolerance_matches_flat(self, spark):
        from windowsession_using_kafka_flink_docker_spark.operators.asof import (
            asof_join_bucketed,
        )

        left, right = self._frames(spark)
        key = lambda rows: sorted(
            ((r.user_id, r.ts, r.asof_ts) for r in rows), key=str
        )
        want = key(asof_join(left, right, on=["user_id"],
                             right_cols={"mark": "mark"},
                             tolerance_sec=300.0).collect())
        got = key(asof_join_bucketed(left, right, on=["user_id"],
                                     right_cols={"mark": "mark"},
                                     bucket_sec=3600.0,
                                     tolerance_sec=300.0).collect())
        assert got == want
        assert len(want) == 1  # only user 1's 4-second-old view survives


class TestForwardAsof:
    def test_forward_with_ties_and_inner_semantics(self, spark):
        left, right = _frames(spark)
        got = sorted(
            (r.user_id, r.ts, r.value, r.asof_ts, r.mark)
            for r in asof_join(left, right, on=["user_id"],
                               right_cols={"mark": "mark"},
                               direction="forward").collect()
        )
        assert got == [
            (1, _t("2024-01-01 00:00:10"), 100.0,
             _t("2024-01-01 00:00:25"), 2.0),
            # left @30 has no future right row -> dropped (inner)
            (2, _t("2024-01-01 00:00:05"), 300.0,
             _t("2024-01-01 00:00:20"), 3.0),
            (2, _t("2024-01-01 00:00:20"), 400.0,   # tie matches
             _t("2024-01-01 00:00:20"), 3.0),
        ]

    def test_forward_tolerance_rejects_distant_matches(self, spark):
        left, right = _frames(spark)
        got = sorted(
            (r.user_id, r.ts)
            for r in asof_join(left, right, on=["user_id"],
                               right_cols={"mark": "mark"},
                               direction="forward",
                               tolerance_sec=15.0).collect()
        )
        assert got == [
            (1, _t("2024-01-01 00:00:10")),  # 25-10 = 15 s
            (2, _t("2024-01-01 00:00:05")),  # 20-5 = 15 s
            (2, _t("2024-01-01 00:00:20")),  # tie, 0 s
        ]

    def test_forward_matches_naive_quadratic_reference(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.sources.batch import (
            load_table,
        )

        ev = load_table(spark, sf_dir, "events").limit(4000)
        v = ev.where(F.col("event_type") == "view").select(
            "user_id", "ts", "value")
        p = (ev.where(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("pv")))
        got = sorted(
            (r.user_id, r.ts, r.asof_ts, r.pv)
            for r in asof_join(v, p, on=["user_id"], right_cols={"pv": "pv"},
                               direction="forward").collect())
        from pyspark.sql import Window
        naive = (
            v.alias("l").join(p.alias("r"),
                              (F.col("l.user_id") == F.col("r.user_id"))
                              & (F.col("l.ts") <= F.col("r.ts")))
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy("l.user_id", "l.ts", "l.value")
                .orderBy(F.col("r.ts"))))
            .where(F.col("_rn") == 1))
        want = sorted(
            (r["user_id"], r["ts"], r["asof_ts"], r["pv"])
            for r in naive.select(
                F.col("l.user_id").alias("user_id"),
                F.col("l.ts").alias("ts"),
                F.col("r.ts").alias("asof_ts"), "pv").collect())
        assert got == want
