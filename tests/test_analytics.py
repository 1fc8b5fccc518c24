"""Equality pins for the round-6 analytics scale paths: the distributed
global rank must reproduce the single-partition window functions exactly
(oracle parity for the entries themselves runs via test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
    global_rank_ranged,
    ntile_from_rank,
)
from windowsession_using_kafka_flink_docker_spark.sources.batch import (
    load_table,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return (load_table(spark, sf_dir, "orders")
            .select("o_totalprice", "o_orderkey"))


class TestDistributedGlobalRank:
    def test_equals_windowed_row_number(self, orders):
        """The range-partitioned rank (16-row ordered window only) must
        equal the single-partition row_number for every row."""
        ranged = global_rank_ranged(orders, ["o_totalprice", "o_orderkey"])
        w = Window.orderBy("o_totalprice", "o_orderkey")
        windowed = orders.withColumn(
            "wrank", F.row_number().over(w).cast("long"))
        diff = (ranged.join(windowed, ["o_totalprice", "o_orderkey"])
                .where(F.col("grank") != F.col("wrank")).count())
        assert diff == 0

    def test_equals_windowed_row_number_without_exchange_reuse(
            self, spark, orders):
        """ADVICE r6: correctness must not silently depend on the planner
        deduping the range exchange. With exchangeReuseEnabled=false the
        operator pins a single instantiation via persist — ranks must
        still match the windowed form exactly."""
        spark.conf.set("spark.sql.exchangeReuseEnabled", "false")
        try:
            ranged = global_rank_ranged(
                orders, ["o_totalprice", "o_orderkey"])
            w = Window.orderBy("o_totalprice", "o_orderkey")
            windowed = orders.withColumn(
                "wrank", F.row_number().over(w).cast("long"))
            diff = (ranged.join(windowed, ["o_totalprice", "o_orderkey"])
                    .where(F.col("grank") != F.col("wrank")).count())
            assert diff == 0
        finally:
            spark.conf.set("spark.sql.exchangeReuseEnabled", "true")

    @pytest.mark.parametrize("k", [3, 7, 10, 100000])
    def test_ntile_from_rank_equals_window_ntile(self, orders, k):
        """ntile reproduced from the rank must agree bucket-for-bucket
        with the native window function, including k > n (every rank its
        own bucket) and non-divisible remainders."""
        total = orders.count()
        w = Window.orderBy("o_totalprice", "o_orderkey")
        both = (orders
                .withColumn("wbin", F.ntile(k).over(w).cast("long"))
                .withColumn("r", F.row_number().over(w).cast("long"))
                .withColumn("fbin", ntile_from_rank(
                    F.col("r"), F.lit(total).cast("long"), k).cast("long")))
        diff = both.where(F.col("wbin") != F.col("fbin")).count()
        assert diff == 0


class TestNtileFormulaExhaustive:
    """Pure-Python mirror of ntile_from_rank's arithmetic (same floor-of-
    float-division shape), swept with hypothesis against a direct
    bucket-size simulation — catches remainder edge cases the 4-k Spark
    test can't enumerate."""

    @staticmethod
    def _formula(rank: int, total: int, k: int) -> int:
        import math
        q = math.floor(total / k)
        rem = total % k
        big = rem * (q + 1)
        if rank <= big:
            return math.floor((rank + q) / (q + 1))
        return rem + math.floor((rank - big + q - 1) / q)

    @staticmethod
    def _simulate(total: int, k: int) -> list[int]:
        """SQL-standard ntile: first total%k buckets get one extra row."""
        q, rem = divmod(total, k)
        out = []
        for b in range(1, k + 1):
            out.extend([b] * (q + 1 if b <= rem else q))
        return out

    def test_hypothesis_sweep(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=300, deadline=None)
        @given(total=st.integers(1, 500), k=st.integers(1, 600))
        def check(total, k):
            want = self._simulate(total, k)
            got = [self._formula(r, total, k) for r in range(1, total + 1)]
            assert got == want, (total, k)

        check()


class TestClampedBalanceIdentity:
    """The prefix-scan identity b_t = cum_t - min(0, running_min(cum_t))
    must equal the literal sequential recurrence b_t = max(0, b_{t-1} +
    x_t) for arbitrary integer ledgers — the non-associative clamp is
    exactly what makes this worth pinning."""

    def test_hypothesis_sweep(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                        max_size=40))
        def check(xs):
            b, out_rec = 0, []
            for x in xs:
                b = max(0, b + x)
                out_rec.append(b)
            cum, run_min, out_id = 0, 0, []
            for x in xs:
                cum += x
                run_min = min(run_min, cum)
                out_id.append(cum - min(0, run_min))
            assert out_rec == out_id

        check()

    def test_spark_matches_recurrence_on_real_data(self, spark, sf_dir):
        from collections import defaultdict

        from windowsession_using_kafka_flink_docker_spark.plans.catalog import (
            CATALOG,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import (
            load_table,
        )

        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type", "value").collect()
        ledgers = defaultdict(list)
        for r in ev:
            c = int(round(r.value * 100))
            d = c if r.event_type == "purchase" else (
                -c if r.event_type in ("error", "click") else 0)
            ledgers[r.user_id].append((r.ts, r.event_id, d))
        want = {}
        for u, rows in ledgers.items():
            b, peak = 0, 0
            for _, _, d in sorted(rows):
                b = max(0, b + d)
                peak = max(peak, b)
            want[u] = (peak, b)
        got = {r.user_id: (r.peak_balance_cents, r.final_balance_cents)
               for r in CATALOG["clamped_running_balance"]
               .spark(spark, sf_dir).collect()}
        assert got == want


class TestLargestRemainderProperties:
    """Hamilton apportionment invariants, swept in pure Python with the
    same integer arithmetic the entry uses: quotas sum EXACTLY to the
    budget, and every stratum is within one slot of exact
    proportionality (the property independent per-stratum rounding
    lacks)."""

    def test_hypothesis_sweep(self):
        import math

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(counts=st.lists(st.integers(1, 10**6), min_size=1,
                               max_size=20),
               budget=st.integers(1, 100_000))
        def check(counts, budget):
            total = sum(counts)
            base = [budget * n // total for n in counts]
            rem = [(budget * n - b * total, -i)
                   for i, (n, b) in enumerate(zip(counts, base))]
            deficit = budget - sum(base)
            assert 0 <= deficit < len(counts) or len(counts) == 1
            order = sorted(range(len(counts)),
                           key=lambda i: rem[i], reverse=True)
            quota = list(base)
            for i in order[:deficit]:
                quota[i] += 1
            assert sum(quota) == budget
            for n, q in zip(counts, quota):
                exact = budget * n / total
                assert math.floor(exact) <= q <= math.ceil(exact) + 0 or \
                    abs(q - exact) < 1, (n, q, exact)
                assert abs(q - exact) < 1

        check()


class TestIntervalMergeIdentity:
    """The running-max island construction must equal the textbook
    sweep-line interval union for arbitrary [s, e) multisets — including
    duplicate starts, nested intervals, and exact adjacency (s == prior
    max e merges, per the exclusive-end convention)."""

    def test_hypothesis_sweep(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=500, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 100), st.integers(1, 15)),
                        min_size=1, max_size=30))
        def check(raw):
            iv = sorted((s, s + d) for s, d in raw)
            # textbook sweep-line union
            merged = []
            for s, e in iv:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            want = (len(merged), sum(e - s for s, e in merged))
            # the entry's construction: new island iff s > running max e
            # over strictly-earlier rows; islands aggregate to min s /
            # max e
            islands, run_max = [], None
            for s, e in iv:
                if run_max is None or s > run_max:
                    islands.append([s, e])
                else:
                    islands[-1][0] = min(islands[-1][0], s)
                    islands[-1][1] = max(islands[-1][1], e)
                run_max = e if run_max is None else max(run_max, e)
            got = (len(islands), sum(e - s for s, e in islands))
            assert got == want

        check()


class TestWeightedMedianIdentity:
    """The 2*cum >= total pick must equal the definitional weighted
    lower median (smallest value whose cumulative weight reaches half
    the total) for arbitrary positive-weight multisets."""

    def test_hypothesis_sweep(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=500, deadline=None)
        @given(st.lists(st.tuples(st.integers(-50, 50), st.integers(1, 9)),
                        min_size=1, max_size=25))
        def check(pairs):
            pairs = sorted(pairs)
            total = sum(w for _, w in pairs)
            # definitional: smallest v with cumweight(<= v by walk) >= total/2
            cum = 0
            want = None
            for v, w in pairs:
                cum += w
                if 2 * cum >= total:
                    want = v
                    break
            # entry's form: min value among rows where 2*cum >= total
            cum = 0
            qualifying = []
            for v, w in pairs:
                cum += w
                if 2 * cum >= total:
                    qualifying.append(v)
            assert min(qualifying) == want

        check()


class TestABTestChiSquare:
    """ab_test_chi2_by_event: the scaled chi-square must equal an
    independent Python recomputation of Pearson's statistic from the
    emitted integer counts, and the hash arms must partition all users."""

    def test_chi2_matches_python_recomputation(self, spark, sf_dir):
        import math

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            ab_test_chi2_by_event,
        )

        rows = ab_test_chi2_by_event(spark, sf_dir).collect()
        assert rows, "harness produced no metrics"
        for r in rows:
            a, b = r.conv_a, r.n_a - r.conv_a
            c, d = r.conv_b, r.n_b - r.conv_b
            n = r.n_a + r.n_b
            chi2 = (n * (a * d - b * c) ** 2
                    / (r.n_a * r.n_b * (a + c) * (b + d)))
            assert r.chi2_e6 == math.floor(chi2 * 1_000_000)
            assert r.significant == (r.chi2_e6 >= 3_841_459)
            # conversion must be non-degenerate: the guard filtered
            # saturated metrics, so 0 < converters < population
            assert 0 < a + c < n

    def test_arms_partition_users(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            ab_test_chi2_by_event,
        )

        ev = load_table(spark, sf_dir, "events")
        n_users = ev.select("user_id").distinct().count()
        rows = ab_test_chi2_by_event(spark, sf_dir).collect()
        for r in rows:
            assert r.n_a + r.n_b == n_users
            assert r.n_a > 0 and r.n_b > 0, "md5 arm assignment collapsed"


class TestInequalityAndNonparametrics:
    """Brute-force Python recomputations for gini_spend_inequality,
    cusum_changepoint_daily_revenue, and mann_whitney_spend_ab — each
    entry's statistic re-derived definitionally from the raw parquet."""

    @pytest.fixture(scope="class")
    def user_spend(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        rows = (ev.groupBy("user_id")
                .agg(F.round(F.sum("value") * 100, 0).cast("long")
                     .alias("cents")).collect())
        return {r.user_id: r.cents for r in rows}

    @staticmethod
    def _arm(user_id: int) -> str:
        import hashlib

        h = hashlib.md5(str(user_id).encode()).hexdigest()
        return "A" if h[0] in "01234567" else "B"

    def test_gini_brute_force(self, spark, sf_dir, user_spend):
        import math

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            gini_spend_inequality,
        )

        xs = sorted(user_spend.values())
        n, s1 = len(xs), sum(xs)
        s2 = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * float(s2) - (n + 1.0) * s1) / (float(n) * s1)
        row = gini_spend_inequality(spark, sf_dir).collect()[0]
        assert row.n_users == n
        assert row.total_cents == s1
        assert abs(row.gini_e6 - math.floor(gini * 1_000_000)) <= 1
        top10 = sum(xs[n - n // 10:])
        bot50 = sum(xs[: n // 2])
        assert row.top10_share_e6 == top10 * 1_000_000 // s1
        assert row.bot50_share_e6 == bot50 * 1_000_000 // s1

    def test_cusum_brute_force(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            cusum_changepoint_daily_revenue,
        )

        orders = load_table(spark, sf_dir, "orders")
        daily = sorted(
            (r.d, r.cents)
            for r in orders.groupBy(F.col("o_orderdate").alias("d"))
            .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                 .cast("long").alias("cents")).collect())
        n = len(daily)
        s = sum(c for _, c in daily)
        pref, best = 0, None
        for j, (d, c) in enumerate(daily, start=1):
            if j == n:
                break
            pref += c
            cval = n * pref - j * s
            key = (abs(cval), -j)
            if best is None or key > best[0]:
                best = (key, d, j, cval)
        row = cusum_changepoint_daily_revenue(spark, sf_dir).collect()[0]
        assert row.n_days == n and row.total_cents == s
        assert row.peak_day_index == best[2]
        assert row.cusum_scaled == best[3]

    def test_mann_whitney_brute_force(self, spark, sf_dir, user_spend):
        import math

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            mann_whitney_spend_ab,
        )

        sample = sorted((c, u) for u, c in user_spend.items())
        n = len(sample)
        # doubled average ranks per tied value
        from collections import defaultdict

        positions = defaultdict(list)
        for i, (c, _) in enumerate(sample, start=1):
            positions[c].append(i)
        r2_a = 0
        n_a = n_b = 0
        for c, u in sample:
            pos = positions[c]
            r2 = min(pos) + max(pos)
            if self._arm(u) == "A":
                r2_a += r2
                n_a += 1
            else:
                n_b += 1
        u2_a = r2_a - n_a * (n_a + 1)
        tie_sum = sum(len(p) ** 3 - len(p) for p in positions.values())
        var = (n_a * n_b / 12.0
               * ((n + 1.0) - tie_sum / (n * (n - 1.0))))
        z = abs(u2_a - n_a * n_b) / (2 * math.sqrt(var))
        row = mann_whitney_spend_ab(spark, sf_dir).collect()[0]
        assert (row.n_a, row.n_b, row.u2_a) == (n_a, n_b, u2_a)
        assert abs(row.abs_z_e6 - math.floor(z * 1_000_000)) <= 1
        assert row.significant == (row.abs_z_e6 >= 1_959_964)


class TestDecompositionAndBacktest:
    """price_volume_decomposition: the two-term bridge must reconstruct the
    exact delta within floor error; seasonal_naive_backtest: MAE/MAPE
    re-derived from a Python dict of the daily series."""

    def test_decomposition_identity(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            price_volume_decomposition,
        )

        rows = price_volume_decomposition(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # vol + price == delta exactly in rationals; each term is
            # floored independently so the reconstruction is within 2
            recon = r.volume_effect_e4 + r.price_effect_e4
            assert 0 <= r.delta_e4 - recon <= 2, r
            # and the floors match a direct Python recomputation
            import math

            p1 = r.r1_e4 / r.q1
            p2 = r.r2_e4 / r.q2
            assert r.volume_effect_e4 == math.floor((r.q2 - r.q1) * p1)
            assert r.price_effect_e4 == math.floor((p2 - p1) * r.q2)

    def test_backtest_brute_force(self, spark, sf_dir):
        from datetime import timedelta

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            seasonal_naive_backtest,
        )

        orders = load_table(spark, sf_dir, "orders")
        daily = {
            r.d: r.cents
            for r in orders.groupBy(F.col("o_orderdate").alias("d"))
            .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                 .cast("long").alias("cents")).collect()
        }
        per_dow = {}
        for d, cents in daily.items():
            prev = daily.get(d - timedelta(days=7))
            if prev is None or cents <= 0:
                continue
            dow = d.isoweekday()
            err = abs(cents - prev)
            tot, pct, n = per_dow.get(dow, (0, 0, 0))
            per_dow[dow] = (tot + err, pct + err * 10000 // cents, n + 1)
        got = {r.dow: r for r in
               seasonal_naive_backtest(spark, sf_dir).collect()}
        assert set(got) == set(per_dow)
        for dow, (tot, pct, n) in per_dow.items():
            r = got[dow]
            assert r.n_days == n
            assert r.mae_cents == tot // n
            assert r.mape_e4 == pct // n


class TestExperimentStatisticIdentities:
    """Pure-Python hypothesis sweeps pinning the closed shortcut forms
    the experiment entries compute against the definitional statistics
    — over arbitrary integer contingency tables / samples, not just the
    one table in the parquet."""

    def test_chi2_shortcut_equals_definitional(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(a=st.integers(0, 10**6), b=st.integers(0, 10**6),
               c=st.integers(0, 10**6), d=st.integers(0, 10**6))
        def check(a, b, c, d):
            n = a + b + c + d
            # entry guards: both arms non-empty, conversions non-degenerate
            if min(a + b, c + d) == 0 or (a + c) in (0, n):
                return
            # shortcut (the entry's form): N*(ad-bc)^2 / product of margins
            shortcut = (n * (a * d - b * c) ** 2
                        / ((a + b) * (c + d) * (a + c) * (b + d)))
            # definitional: sum over cells of (O-E)^2/E
            definitional = 0.0
            for obs, row, col in ((a, a + b, a + c), (b, a + b, b + d),
                                  (c, c + d, a + c), (d, c + d, b + d)):
                e = row * col / n
                definitional += (obs - e) ** 2 / e
            assert abs(shortcut - definitional) <= 1e-6 * max(1.0, shortcut)

        check()

    def test_welch_sufficient_stats_equal_definitional(self):
        import math

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fractions import Fraction

        @settings(max_examples=200, deadline=None)
        @given(xs=st.lists(st.integers(-10**6, 10**6), min_size=2,
                           max_size=30),
               ys=st.lists(st.integers(-10**6, 10**6), min_size=2,
                           max_size=30))
        def check(xs, ys):
            # Definitional sample variance as an EXACT rational — the
            # floating-point definitional has its own rounding noise on
            # near-constant inputs, so the reference must be exact.
            def var_exact(v):
                n, s = len(v), sum(v)
                num = n * sum(x * x for x in v) - s * s  # exact int >= 0
                return Fraction(num, n * (n - 1))

            # entry's fixed form: the numerator n*ss - s^2 is exact
            # integer, cast to double once, then ONE IEEE division —
            # mirrors the DECIMAL(38,0)/HUGEINT expression both engines
            # run (cast each side, then divide; not rational division).
            def var_stats(v):
                n, s, ss = len(v), sum(v), sum(x * x for x in v)
                return float(n * ss - s * s) / float(n * (n - 1))

            va_e, va_s = var_exact(xs), var_stats(xs)
            vb_e, vb_s = var_exact(ys), var_stats(ys)
            # cast-then-divide is within 2 ulp of the true rational
            scale = max(1.0, float(va_e), float(vb_e))
            assert abs(float(va_e) - va_s) <= 1e-12 * scale
            assert abs(float(vb_e) - vb_s) <= 1e-12 * scale
            if va_e + vb_e == 0:
                return
            t_def = (abs(sum(xs) / len(xs) - sum(ys) / len(ys))
                     / math.sqrt(float(va_e) / len(xs)
                                 + float(vb_e) / len(ys)))
            t_stats = (abs(sum(xs) / len(xs) - sum(ys) / len(ys))
                       / math.sqrt(var_stats(xs) / len(xs)
                                   + var_stats(ys) / len(ys)))
            assert abs(t_def - t_stats) <= 1e-12 * max(1.0, t_def)

        check()

    def test_mann_whitney_doubled_ranks_equal_scipy_free_reference(self):
        from collections import defaultdict

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(pairs=st.lists(
            st.tuples(st.integers(0, 50), st.booleans()),
            min_size=4, max_size=60))
        def check(pairs):
            # reference: U_A = sum over (a in A, b in B) of
            #            1[a > b] + 0.5 * 1[a == b]
            a_vals = [v for v, is_a in pairs if is_a]
            b_vals = [v for v, is_a in pairs if not is_a]
            if len(a_vals) < 2 or len(b_vals) < 2:
                return
            u2_ref = sum(2 if a > b else (1 if a == b else 0)
                         for a in a_vals for b in b_vals)
            # entry's form: doubled tie-averaged rank sums
            srt = sorted(v for v, _ in pairs)
            pos = defaultdict(list)
            for i, v in enumerate(srt, start=1):
                pos[v].append(i)
            r2_a = sum(min(pos[v]) + max(pos[v]) for v in a_vals)
            n_a = len(a_vals)
            u2_entry = r2_a - 2 * (n_a * (n_a + 1) // 2)
            assert u2_entry == u2_ref

        check()


class TestCancellationSweep:
    """Adversarial hypothesis pins for every 'one IEEE expression'
    entry that subtracts large like-magnitude terms — the round-7
    Welch lesson generalized. Each test mirrors the entry's exact
    arithmetic form in pure Python (exact ints where the engines use
    BIGINT/DECIMAL/HUGEINT, a float cast exactly where the engines
    cast) and compares against an exact-rational definitional. The
    strategies deliberately generate near-cancelling inputs: values
    clustered around a huge base so differences are tiny relative to
    the terms subtracted."""

    # values near a huge base: the difference of any two terms is
    # ~1e0-1e6 while each term is ~1e12 — a double subtraction of
    # pre-rounded terms would lose the entire signal.
    _NEAR = None  # built lazily so hypothesis import stays test-local

    @staticmethod
    def _near_constant_lists(min_size=2, max_size=30):
        from hypothesis import strategies as st
        base = st.integers(10**11, 10**12)
        return base.flatmap(
            lambda b: st.lists(
                st.integers(b - 10**6, b + 10**6),
                min_size=min_size, max_size=max_size))

    def test_pearson_exact_radicands_near_constant_degrees(self):
        """knn_degree_assortativity's Pearson form: numerator
        n*sxy - sx*sy and both radicands formed exactly in integer,
        one cast each, one division — pinned against Fraction."""
        import math
        from fractions import Fraction

        from hypothesis import given, settings
        from hypothesis import strategies as st

        pair_lists = self._near_constant_lists(min_size=2).flatmap(
            lambda xs: st.tuples(
                st.just(xs),
                st.lists(st.integers(min(xs) - 100, max(xs) + 100),
                         min_size=len(xs), max_size=len(xs))))

        @settings(max_examples=200, deadline=None)
        @given(xy=pair_lists)
        def check(xy):
            xs, ys = xy
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            num = n * sxy - sx * sy          # exact int (the entry's form)
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx == 0 or dy == 0:
                return
            r_entry = float(num) / (math.sqrt(float(dx))
                                    * math.sqrt(float(dy)))
            # exact-rational definitional r^2 (sign carried separately)
            r2_exact = Fraction(num * num, dx * dy)
            r_exact = math.copysign(math.sqrt(float(r2_exact)), num)
            assert abs(r_entry - r_exact) <= 1e-12 * max(1.0, abs(r_exact))
            assert abs(r_entry) <= 1.0 + 1e-12

        check()

    def test_chi2_integer_det_survives_near_cancelling_margins(self):
        """ab_test_chi2_by_event: det = a*(n_b-b') - (n_a-a)*b' is
        EXACT BIGINT, so a*d ~ b*c at huge margins cannot cancel —
        pinned against the exact-rational definitional chi^2."""
        from fractions import Fraction

        from hypothesis import given, settings
        from hypothesis import strategies as st

        big = st.integers(10**8, 10**9)

        @settings(max_examples=200, deadline=None)
        @given(n_a=big, n_b=big, d_a=st.integers(-1000, 1000),
               frac_e6=st.integers(1, 999999))
        def check(n_a, n_b, d_a, frac_e6):
            # conversions tuned so conv_a/n_a ~ conv_b/n_b (det ~ 0
            # while every margin product is ~1e17)
            conv_a = n_a * frac_e6 // 10**6 + d_a
            conv_b = n_b * frac_e6 // 10**6
            if not (0 < conv_a < n_a and 0 < conv_b < n_b):
                return
            n_all, n_conv = n_a + n_b, conv_a + conv_b
            det = conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
            chi2_entry = (float(n_all) * float(det) * float(det)
                          / (float(n_a) * float(n_b) * float(n_conv)
                             * float(n_all - n_conv)))
            chi2_exact = Fraction(n_all * det * det,
                                  n_a * n_b * n_conv * (n_all - n_conv))
            assert (abs(chi2_entry - float(chi2_exact))
                    <= 1e-9 * max(1.0, float(chi2_exact)))

        check()

    def test_gini_exact_decimal_numerator_near_equal_spends(self):
        """gini_from_spend's fixed form: 2*s2 - (n+1)*s1 formed
        exactly (DECIMAL/HUGEINT), one cast, one division — pinned
        against the exact-rational Gini on near-equal huge spends,
        where the two terms agree to ~10 significant digits."""
        from fractions import Fraction

        from hypothesis import given, settings

        @settings(max_examples=200, deadline=None)
        @given(cents=self._near_constant_lists(min_size=2))
        def check(cents):
            xs = sorted(cents)
            n, s1 = len(xs), sum(xs)
            if s1 == 0:
                return
            s2 = sum((i + 1) * x for i, x in enumerate(xs))
            num = 2 * s2 - (n + 1) * s1       # exact int (entry's form)
            gini_entry = float(num) / (float(n) * float(s1)) * 1e6
            gini_exact = Fraction(num * 10**6, n * s1)
            assert abs(gini_entry - float(gini_exact)) <= 1e-9 * max(
                1.0, abs(float(gini_exact)))
            # the OLD form (double s2, subtract after rounding) must be
            # demonstrably worse or equal — documents why the fix holds
            old = (2.0 * float(s2) - (n + 1.0) * float(s1)) / (
                float(n) * float(s1)) * 1e6
            assert (abs(old - float(gini_exact))
                    >= abs(gini_entry - float(gini_exact)) - 1e-12)

        check()

    def test_cusum_scaled_statistic_is_division_free_exact(self):
        """cusum_from_daily: c_j = n*prefix_j - j*S in BIGINT — the
        subtraction is exact integer by construction, so the argmax
        day cannot flip; pinned against Fraction means."""
        from fractions import Fraction

        from hypothesis import given, settings

        @settings(max_examples=200, deadline=None)
        @given(cents=self._near_constant_lists(min_size=3))
        def check(cents):
            n, s = len(cents), sum(cents)
            pref, best = 0, None
            for j, c in enumerate(cents[:-1], start=1):
                pref += c
                stat = n * pref - j * s        # exact int (entry's form)
                key = (abs(stat), -j)
                if best is None or key > best[0]:
                    best = (key, j, pref, stat)
            _, j, pref, stat = best
            # the scaled statistic equals n*j*(mean_before - mean_all)
            exact = (Fraction(pref, j) - Fraction(s, n)) * n * j
            assert stat == exact               # bit-exact, no tolerance

        check()

    def test_mad_lower_median_pure_integer_huge_values(self):
        """mad_anomalies: lower median via 2*rank >= n, deviations
        |x - med| in BIGINT, 3x-MAD flag an integer comparison —
        bit-exact on huge near-constant values by construction."""
        from hypothesis import given, settings

        @settings(max_examples=200, deadline=None)
        @given(cents=self._near_constant_lists(min_size=1))
        def check(cents):
            xs = sorted(cents)
            n = len(xs)
            # entry's rank test: first position with 2*rn >= n
            med_entry = next(x for rn, x in enumerate(xs, start=1)
                             if 2 * rn >= n)
            # definitional lower median
            med_def = xs[(n - 1) // 2]
            assert med_entry == med_def
            devs = sorted(abs(x - med_entry) for x in xs)
            mad_entry = next(d for rn, d in enumerate(devs, start=1)
                             if 2 * rn >= n)
            assert mad_entry == devs[(n - 1) // 2]
            n_anom = sum(1 for x in xs if abs(x - med_entry) > 3 * mad_entry)
            assert 0 <= n_anom <= n  # flag is pure-integer, total order

        check()


class TestCramersV:
    """cramers_v_status_priority: every emitted cell of the contingency
    report re-derived definitionally in Python from the raw parquet —
    counts, exact-integer expected values, floor-quantized per-cell
    chi-square contributions, the exact-BIGINT total, and Cramer's V."""

    def test_matches_python_recomputation(self, spark, sf_dir):
        import math
        from collections import Counter

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            cramers_v_status_priority,
        )

        raw = [(r.o_orderstatus, r.o_orderpriority)
               for r in load_table(spark, sf_dir, "orders")
               .select("o_orderstatus", "o_orderpriority").collect()]
        n_total = len(raw)
        cellc = Counter(raw)
        rowc = Counter(s for s, _ in raw)
        colc = Counter(p for _, p in raw)
        rows = cramers_v_status_priority(spark, sf_dir).collect()
        # one row per (distinct status) x (distinct priority), zeros kept
        assert len(rows) == len(rowc) * len(colc)
        contribs = {}
        for r in rows:
            rt, ct = rowc[r.o_orderstatus], colc[r.o_orderpriority]
            n = cellc.get((r.o_orderstatus, r.o_orderpriority), 0)
            assert r.n == n
            assert r.row_total == rt and r.col_total == ct
            assert r.expected_e4 == (10000 * rt * ct) // n_total
            diff = n * n_total - rt * ct
            contrib = math.floor(
                float(diff) * float(diff)
                / float(n_total * rt * ct) * 1_000_000)
            assert r.contrib_e6 == contrib
            contribs[(r.o_orderstatus, r.o_orderpriority)] = contrib
        chi2_e6 = sum(contribs.values())
        mindim = min(len(rowc) - 1, len(colc) - 1)
        v_e4 = math.floor(
            math.sqrt(chi2_e6 / 1_000_000.0 / (float(n_total)
                                               * float(mindim))) * 10000)
        for r in rows:
            assert r.chi2_e6 == chi2_e6
            assert r.v_e4 == v_e4
        # V is a correlation-like magnitude
        assert 0 <= v_e4 <= 10000

    def test_cancellation_free_on_adversarial_margins(self, spark):
        """The Welch lesson applied to the contingency numerator: with a
        near-independent table of HUGE like-magnitude counts, n*N and
        r*c agree to ~9 significant digits; a double-first subtraction
        loses the low bits, the exact DECIMAL subtraction does not.
        Chosen so (n*N - r*c) is small relative to both products AND
        the true contribution is large enough that e6 quantization
        exposes any lost bits."""
        import math

        from pyspark.sql import functions as F

        # 2x2 table with counts ~1e8 and a tiny dependence epsilon:
        # products n*N and r*c are ~4e16 (past 2^53), differences ~5e9.
        cells = [("A", "X", 100_000_019), ("A", "Y", 99_999_983),
                 ("B", "X", 99_999_991), ("B", "Y", 100_000_009)]
        df = spark.createDataFrame(cells, "s STRING, p STRING, n BIGINT")
        rt = df.groupBy("s").agg(F.sum("n").alias("row_total"))
        ct = df.groupBy("p").agg(F.sum("n").alias("col_total"))
        tot = df.agg(F.sum("n").alias("total_n"))

        def dec(c):
            return c.cast("decimal(38,0)")

        full = (df.join(rt, "s").join(ct, "p").crossJoin(tot))
        diff = (dec(F.col("n")) * dec(F.col("total_n"))
                - dec(F.col("row_total")) * dec(F.col("col_total")))
        den = (dec(F.col("total_n")) * dec(F.col("row_total"))
               * dec(F.col("col_total")))
        d = diff.cast("double")
        got = {(r.s, r.p): r.c for r in full.select(
            "s", "p",
            F.floor(d * d / den.cast("double") * F.lit(1_000_000))
            .cast("long").alias("c")).collect()}
        n_total = sum(n for _, _, n in cells)
        rowc = {"A": 200_000_002, "B": 200_000_000}
        colc = {"X": 200_000_010, "Y": 199_999_992}
        for s, p, n in cells:
            diff_i = n * n_total - rowc[s] * colc[p]  # exact int
            want = math.floor(float(diff_i) * float(diff_i)
                              / float(n_total * rowc[s] * colc[p])
                              * 1_000_000)
            assert got[(s, p)] == want, (s, p)
            # the case is genuinely adversarial: subtracting the
            # products AFTER rounding each to double yields a
            # different difference (the lost low bits), so the exact
            # DECIMAL-first subtraction is load-bearing
            rounded_first = float(n * n_total) - float(rowc[s] * colc[p])
            assert rounded_first != float(diff_i), (s, p)


class TestSpearman:
    """spearman_qty_price: the doubled-average-rank closed form
    re-derived definitionally — once against the raw parquet, once as a
    hypothesis sweep against exact-rational Pearson on true average
    ranks (the tie-invariance and cancellation claims, pinned)."""

    @staticmethod
    def _doubled_ranks(vs):
        """2*average-rank per element: min_rank + max_rank of the tie
        group in the 1-based sorted order — always an exact integer."""
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        first, r2 = {}, [0] * len(vs)
        last = {}
        for pos, i in enumerate(order, start=1):
            first.setdefault(vs[i], pos)
            last[vs[i]] = pos
        for i, v in enumerate(vs):
            r2[i] = first[v] + last[v]
        return r2

    @classmethod
    def _rho_e6(cls, xs, ys):
        """The entry's integer path: exact int sufficient stats over the
        doubled ranks, exact int num/dx/dy, one IEEE expression,
        floored to e6 (None when either margin is constant)."""
        import math

        rx, ry = cls._doubled_ranks(xs), cls._doubled_ranks(ys)
        n = len(xs)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx == 0 or dy == 0:
            return None
        raw = math.floor(float(num)
                         / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
                         * 1_000_000)
        # the entry clamps: at exact rho = +/-1 the IEEE quotient can
        # round one ulp past +/-1 and the floor would leave the range
        return max(-1_000_000, min(1_000_000, raw))

    def test_matches_python_recomputation(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            spearman_qty_price,
        )

        raw = [(int(r.l_quantity), int(round(float(r.l_extendedprice)
                                             * 100)))
               for r in load_table(spark, sf_dir, "lineitem")
               .select("l_quantity", "l_extendedprice").collect()]
        xs = [q for q, _ in raw]
        ys = [p for _, p in raw]
        got = spearman_qty_price(spark, sf_dir).collect()
        assert len(got) == 1
        r = got[0]
        assert r.n_rows == len(raw)
        assert r.n_distinct_qty == len(set(xs))
        assert r.n_distinct_price == len(set(ys))
        assert r.spearman_e6 == self._rho_e6(xs, ys)

    def test_doubled_rank_form_equals_exact_rational(self):
        """Hypothesis sweep: the integer doubled-rank Pearson equals
        exact-rational Pearson on true average ranks to 1e-9 — including
        near-constant lists, the cancellation regime where the old
        double-first subtraction loses ~40 bits (the Welch lesson)."""
        import math
        from fractions import Fraction

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 5),
                                  st.integers(10**6, 10**6 + 9)),
                        min_size=2, max_size=40))
        def check(pairs):
            xs = [a for a, _ in pairs]
            ys = [b for _, b in pairs]
            got = self._rho_e6(xs, ys)

            # exact-rational reference on TRUE average ranks
            def avg_ranks(vs):
                order = sorted(range(len(vs)), key=lambda i: vs[i])
                first, last = {}, {}
                for pos, i in enumerate(order, start=1):
                    first.setdefault(vs[i], pos)
                    last[vs[i]] = pos
                return [Fraction(first[v] + last[v], 2) for v in vs]

            rx, ry = avg_ranks(xs), avg_ranks(ys)
            n = len(xs)
            mx = sum(rx) / n
            my = sum(ry) / n
            num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
            dx = sum((a - mx) ** 2 for a in rx)
            dy = sum((b - my) ** 2 for b in ry)
            if dx == 0 or dy == 0:
                assert got is None
                return
            rho = float(num) / math.sqrt(float(dx) * float(dy))
            assert got is not None
            assert abs(got / 1_000_000 - rho) <= 2e-6
            assert -1_000_000 <= got <= 1_000_000

        check()

    def test_rank_scaling_invariance(self):
        """Doubling both margins' values (a monotone map) cannot change
        the statistic — the defining property of a rank correlation."""
        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
        ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8]
        base = self._rho_e6(xs, ys)
        assert self._rho_e6([x * 2 for x in xs],
                            [y * 1000 + 7 for y in ys]) == base


class TestQ21WaitingSuppliers:
    """q21_waiting_suppliers: the decorrelated aggregate composition
    re-derived definitionally — the literal EXISTS / NOT-EXISTS
    double-subquery over the raw parquet, one Python pass per late
    line, exactly the correlated form the entry claims to replace."""

    def test_matches_correlated_definition(self, spark, sf_dir):
        from collections import defaultdict

        from windowsession_using_kafka_flink_docker_spark.plans.analytics import (
            q21_waiting_suppliers,
        )

        forders = {r.o_orderkey: r.o_orderdate
                   for r in load_table(spark, sf_dir, "orders")
                   .where("o_orderstatus = 'F'")
                   .select("o_orderkey", "o_orderdate").collect()}
        lines = [(r.l_orderkey, r.l_suppkey, r.l_shipdate)
                 for r in load_table(spark, sf_dir, "lineitem")
                 .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
                 if r.l_orderkey in forders]
        per_order = defaultdict(list)
        for okey, supp, ship in lines:
            days_late = (ship - forders[okey]).days
            per_order[okey].append((supp, days_late > 90))
        numwait = defaultdict(int)
        for okey, rows in per_order.items():
            supps = {s for s, _ in rows}
            late_supps = {s for s, late in rows if late}
            for supp, late in rows:
                # the correlated form: this line is late, EXISTS another
                # supplier on the order, NOT EXISTS another LATE supplier
                if (late and len(supps) >= 2
                        and late_supps == {supp}):
                    numwait[supp] += 1
        sup = {r.s_suppkey: (r.s_name, r.s_nationkey)
               for r in load_table(spark, sf_dir, "supplier")
               .select("s_suppkey", "s_name", "s_nationkey").collect()}
        nat = {r.n_nationkey: r.n_name
               for r in load_table(spark, sf_dir, "nation")
               .select("n_nationkey", "n_name").collect()}
        want = sorted(((sup[s][0], nat[sup[s][1]], n)
                       for s, n in numwait.items()),
                      key=lambda t: (-t[2], t[0]))[:100]
        got = [(r.s_name, r.n_name, r.numwait)
               for r in q21_waiting_suppliers(spark, sf_dir).collect()]
        assert got == want


class TestHhiIdentity:
    """supplier_hhi_by_parttype's scaled index, swept in pure Python with
    the same exact-integer-division arithmetic: bounded by
    [1e6/n (floored), 1e6], EXACTLY 1e6 at any monopoly (the
    double-multiply form this replaced rounded sq*1e6 past 2^53 and
    emitted 999999 for monopolies with t >= ~760k — hypothesis-found),
    and within 1 of the exact rational everywhere."""

    def test_hypothesis_sweep(self):
        import math
        from fractions import Fraction

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.lists(st.integers(1, 10**9), min_size=1, max_size=25))
        def check(qs):
            t = sum(qs)
            sq = sum(q * q for q in qs)
            n = len(qs)
            hhi = (sq * 1_000_000) // (t * t)  # the entry's exact form
            assert hhi <= 1_000_000
            assert hhi >= 1_000_000 // n - 1  # floor slack on the bound
            exact = Fraction(sq * 1_000_000, t * t)
            assert 0 <= float(exact) - hhi < 1  # true floor, no drift
            if n == 1:
                assert hhi == 1_000_000  # monopoly is exact
            # the replaced double form CAN disagree; when it does, the
            # exact form is the correct floor
            dbl = math.floor(sq * 1_000_000.0 / (t * t))
            if dbl != hhi:
                assert abs(dbl - hhi) == 1

        check()


class TestBenjaminiHochberg:
    """bh_fdr_segment_spend's real-data report is all-accept under H0
    (the md5 arms are random), so these pins exercise the REJECTION path
    and the step-up semantics on synthetic effects."""

    def _run(self, spark, rows):
        from windowsession_using_kafka_flink_docker_spark.plans.analytics \
            import bh_fdr_from_armed
        df = spark.createDataFrame(
            rows, "seg string, cents long, o_orderkey long, arm string")
        return {r["seg"]: r for r in bh_fdr_from_armed(df).collect()}

    def test_strong_effect_rejected_null_segment_not(self, spark):
        # segment X: arm A spends 100x arm B (n=60 per arm) -> huge z;
        # segment Y: identical distributions -> p = 1
        rows = []
        key = 0
        for i in range(60):
            rows.append(("X", 1_000_000 + i, (key := key + 1), "A"))
            rows.append(("X", 100 + i, (key := key + 1), "B"))
            rows.append(("Y", 500 + (i % 7), (key := key + 1), "A"))
            rows.append(("Y", 500 + (i % 7), (key := key + 1), "B"))
        out = self._run(spark, rows)
        assert out["X"]["rejected"] is True
        assert out["Y"]["rejected"] is False
        assert out["X"]["bh_rank"] == 1
        assert out["Y"]["p_cheb_e6"] == 1_000_000
        # Chebyshev p for a clean separation of n=60 vs 60:
        # 2U = 2*n_a*n_b, z = n_a*n_b / (2 sqrt(V)); check vs brute force
        import math
        n_a = n_b = 60
        n = n_a + n_b
        # no ties across arms in X by construction (values disjoint,
        # within-arm values distinct) -> tie_sum = 0
        z = (n_a * n_b) / (2 * math.sqrt(n_a * n_b / 12 * (n + 1)))
        assert out["X"]["abs_z_e6"] == math.floor(z * 1e6)
        assert out["X"]["p_cheb_e6"] == math.floor(1e6 / (z * z))

    def test_step_up_rejects_everything_below_largest_k(self, spark):
        """BH is a STEP-UP: if p_(k) clears its threshold, every smaller
        rank is rejected even when its own comparison would fail. Build
        three effect segments with increasing effect so the largest k
        clears, and verify all three reject."""
        rows = []
        key = 0
        for seg, hi_n in (("S1", 25), ("S2", 35), ("S3", 60)):
            for i in range(hi_n):
                rows.append((seg, 1_000_000 + i, (key := key + 1), "A"))
                rows.append((seg, 100 + i, (key := key + 1), "B"))
        out = self._run(spark, rows)
        assert [out[s]["rejected"] for s in ("S1", "S2", "S3")] \
            == [True, True, True]
        # ranks follow effect size: biggest n -> biggest z -> smallest p
        assert out["S3"]["bh_rank"] == 1
        assert out["S1"]["bh_rank"] == 3

    def test_m_counts_only_qualifying_segments(self, spark):
        """A segment with a one-row arm (n_a < 2) is excluded from the
        tests AND from m — BH's m is the number of tests actually run."""
        rows = [("Z", 100, 1, "A"), ("Z", 200, 2, "B")]  # n_a = n_b = 1
        key = 10
        for i in range(30):
            rows.append(("W", 1_000 + i, (key := key + 1), "A"))
            rows.append(("W", 10 + i, (key := key + 1), "B"))
        out = self._run(spark, rows)
        assert "Z" not in out
        assert out["W"]["m_tests"] == 1

    def test_rejected_matches_textbook_definition_from_output(self, spark):
        """Definitional pin: for every output row, rejected must equal
        the literal BH step-up 'exists j >= bh_rank with
        p_(j) * m <= j * alpha' recomputed in Python from the report's
        own p-values — so the suffix-max window rendering can never
        drift from the textbook procedure."""
        rows = []
        key = 0
        # a mix: one huge effect, one moderate, one null, one tiny-n
        for seg, hi_n, sep in (("A", 50, True), ("B", 12, True),
                               ("C", 40, False), ("D", 3, True)):
            for i in range(hi_n):
                hi = (1_000_000 + i) if sep else (500 + (i % 5))
                rows.append((seg, hi, (key := key + 1), "A"))
                rows.append((seg, 500 + (i % 5), (key := key + 1), "B"))
        out = sorted(self._run(spark, rows).values(),
                     key=lambda r: r["bh_rank"])
        m = out[0]["m_tests"]
        assert m == len(out)
        ps = [r["p_cheb_e6"] / 1e6 for r in out]  # floor(p*1e6) proxy
        for i, r in enumerate(out, start=1):
            # use the scaled-floor p for the recompute: floor can only
            # shrink p, so compare against the same floored values the
            # report exposes, with the threshold slack of one e-6 ulp
            textbook = any(ps[j - 1] * m <= j * 0.05 + 1e-6
                           for j in range(i, m + 1))
            lo = any(ps[j - 1] * m <= j * 0.05 - 1e-6
                     for j in range(i, m + 1))
            if textbook == lo:  # recompute is decisive outside the ulp band
                assert r["rejected"] == textbook, (r, ps)


class TestTheilSenRobustness:
    """Definitional pins for theil_sen_trend: the median-of-pair-slopes
    estimator on synthetic frames, including the breakdown property the
    docstring claims (one wild outlier day moves OLS, not Theil-Sen)."""

    @staticmethod
    def _with_events(spark, sf_dir, rows, td):
        import os

        spark.createDataFrame(
            rows, "ts TIMESTAMP, user_id BIGINT, value DOUBLE") \
            .write.parquet(os.path.join(td, "events.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(sf_dir, f"{t}.parquet")
            dst = os.path.join(td, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)

    def test_median_slope_exact_on_linear_series(self, spark, sf_dir):
        """A perfectly linear series: every pair slope equals the true
        slope, so Theil-Sen returns it exactly (e4-scaled)."""
        import datetime
        import tempfile

        from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

        # slope 3.25 currency units/day = 325 cents/day -> 3_250_000 e4
        rows = [(datetime.datetime(2024, 1, 1 + d, 12), 1, 10.0 + 3.25 * d)
                for d in range(6)]
        with tempfile.TemporaryDirectory() as td:
            self._with_events(spark, sf_dir, rows, td)
            out = {r["user_id"]: r for r in
                   CATALOG["theil_sen_trend"].spark(spark, td).collect()}
        assert out[1]["n_days"] == 6
        assert out[1]["n_pairs"] == 15
        assert out[1]["ts_slope_e4"] == 3_250_000

    def test_outlier_breaks_ols_not_theil_sen(self, spark, sf_dir):
        """Flat spend plus ONE 100x outlier day: OLS slope swings hard,
        the Theil-Sen median stays at zero."""
        import datetime
        import tempfile

        from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

        rows = [(datetime.datetime(2024, 1, 1 + d, 12), 7,
                 1000.0 if d == 8 else 10.0) for d in range(9)]
        with tempfile.TemporaryDirectory() as td:
            self._with_events(spark, sf_dir, rows, td)
            ts = {r["user_id"]: r for r in
                  CATALOG["theil_sen_trend"].spark(spark, td).collect()}
            ols = {r["user_id"]: r for r in
                   CATALOG["grouped_ols_trend"].spark(spark, td).collect()}
        # 36 pair slopes: 28 exactly 0, 8 touching the outlier -> median 0
        assert ts[7]["ts_slope_e4"] == 0
        # OLS is dragged far positive by the single outlier day
        assert ols[7]["slope_ce2"] > 50_000


class TestCupedIdentities:
    """Definitional pins for cuped_adjusted_ab on a synthetic frame
    where the post metric is EXACTLY linear in the covariate
    (y = 2x + 5000 cents): theta must be exactly 2, rho^2 exactly 1,
    and the CUPED-adjusted means of both arms must coincide (the whole
    point: pre-period differences between arms are removed) while the
    raw means differ."""

    def test_perfect_covariate_recovers_theta_and_equalizes_arms(
            self, spark, sf_dir):
        import datetime
        import os
        import tempfile

        from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

        rows = []
        for c in range(1, 201):
            x = 100 + 7 * c  # cents
            y = 2 * x + 5000
            rows.append((c, datetime.datetime(1996, 3, 1), x / 100.0))
            rows.append((c, datetime.datetime(1997, 3, 1), y / 100.0))
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "o_custkey BIGINT, o_orderdate TIMESTAMP, "
                      "o_totalprice DOUBLE") \
                .write.parquet(os.path.join(td, "orders.parquet"))
            for t in ("region", "nation", "customer", "supplier", "part",
                      "lineitem", "documents", "embeddings", "events"):
                src = os.path.join(sf_dir, f"{t}.parquet")
                dst = os.path.join(td, f"{t}.parquet")
                if os.path.exists(src) and not os.path.exists(dst):
                    os.symlink(src, dst)
            out = {r["arm"]: r for r in
                   CATALOG["cuped_adjusted_ab"].spark(spark, td).collect()}
        assert set(out) == {"A", "B"}
        assert out["A"]["theta_e6"] == 2_000_000
        assert out["A"]["rho2_e4"] == 10_000
        # raw means differ (the md5 arms see different covariate mixes)
        assert out["A"]["mean_post_ce2"] != out["B"]["mean_post_ce2"]
        # adjusted means coincide: algebraically both equal
        # 5000 + 2*mean(x); allow 1 floor-ulp of slack
        assert abs(out["A"]["mean_adj_ce2"]
                   - out["B"]["mean_adj_ce2"]) <= 1


class TestMannKendallIdentities:
    """Definitional pins for mann_kendall_trend on synthetic series:
    a strictly increasing series maximizes S with p -> 0, a constant
    series is excluded (zero variance), and S/var18 match the
    closed-form brute force."""

    @staticmethod
    def _with_events(spark, sf_dir, rows, td):
        import os

        spark.createDataFrame(
            rows, "ts TIMESTAMP, user_id BIGINT, value DOUBLE") \
            .write.parquet(os.path.join(td, "events.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(sf_dir, f"{t}.parquet")
            dst = os.path.join(td, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)

    def test_monotone_series_and_constant_exclusion(self, spark, sf_dir):
        import datetime
        import math
        import tempfile

        from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

        rows = []
        # user 1: strictly increasing over 10 days -> S = C(10,2) = 45
        for d in range(10):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12), 1,
                         10.0 + 3.0 * d))
        # user 2: constant over 10 days -> var18 = 0 -> excluded
        for d in range(10):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12), 2, 5.0))
        # user 3: alternating up/down with ties -> brute-force check
        vals3 = [10.0, 20.0, 10.0, 30.0, 20.0, 20.0, 40.0, 10.0]
        for d, v in enumerate(vals3):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12), 3, v))
        with tempfile.TemporaryDirectory() as td:
            self._with_events(spark, sf_dir, rows, td)
            out = {r["user_id"]: r for r in
                   CATALOG["mann_kendall_trend"].spark(spark, td).collect()}
        assert set(out) == {1, 3}  # constant user excluded
        r1 = out[1]
        assert r1["s_stat"] == 45
        assert r1["var18"] == 10 * 9 * 25  # no ties
        z1 = 44.0 / math.sqrt(10 * 9 * 25 / 18.0)
        assert r1["z_e6"] == math.floor(z1 * 1e6)
        assert r1["p_cheb_e6"] == math.floor(1e6 / (z1 * z1))
        # user 3 brute force
        cents = [int(v * 100) for v in vals3]
        s3 = sum((c2 > c1) - (c2 < c1)
                 for i, c1 in enumerate(cents)
                 for c2 in cents[i + 1:])
        n = len(cents)
        from collections import Counter
        tie = sum(t * (t - 1) * (2 * t + 5)
                  for t in Counter(cents).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie
        r3 = out[3]
        assert r3["s_stat"] == s3
        assert r3["var18"] == var18


def test_isotonic_fit_properties(spark, sf_dir):
    """isotonic_monthly_revenue beyond oracle parity (which already
    proves PAV == minimax on real data at three SFs): the fitted
    sequence must be NON-DECREASING over the month index (compared by
    exact cross-multiplication, never doubles), and PAV must conserve
    weighted mass — sum(n_m * fitted_m) == sum of all cents — since
    each pooled block's fitted value is exactly its block mean."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from windowsession_using_kafka_flink_docker_spark.plans.relational import (
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
