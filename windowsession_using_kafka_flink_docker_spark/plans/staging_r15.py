"""STAGING for round 15 — drafted in round 14, NOT registered.

The r14 driver window is saturated (40 at-bound + 10 pinned = 50/50,
VERDICT r13), so no new catalog entries can certify before r15. These
drafts land the code + DuckDB oracles now, verified locally by
tests/test_staging_r15.py, and move behind ``@register`` the round the
window reopens (~4 free r15 slots, SURVEY §7.2 M6 c). This module is
deliberately NOT imported by plans/catalog.py — nothing here can
perturb a certified entry's fingerprint closure.

Drafted families (the M6 c candidates):

1. Session-window top-N — ``session_top2_per_user`` and
   ``session_top10_global``: sessionization re-aggregated over exact
   BIGINT cents (dodging the known sf0.1 half-cent ROUND tie,
   BASELINE.md round-13 close) ranked per-user / globally with
   deterministic tiebreaks. The global form uses orderBy+limit
   (TakeOrderedAndProject — no fact-scale single-partition sort).
2. Grouped time-series cross-correlation —
   ``event_type_crosscorr``: lag-0/1/2 Pearson cross-correlation
   between DAILY COUNT series of event-type pairs, the
   spend_autocorrelation discipline (exact BIGINT partials, one
   identical IEEE division, floor-scaled e4) extended from auto- to
   cross-correlation; counts (not cents) keep every partial far inside
   int64 at any scale.
3. Embedding-index persistence roundtrip —
   ``ivf_index_persist_roundtrip``: the IVF index (KB of centroids +
   cell-partitioned assignments) exported to parquet, re-imported into
   a fresh in-memory index, and probed with nprobe == n_cells; the
   result must equal BOTH the exact cosine scan and the fresh
   (never-persisted) index — the serving-restart contract at 100 TB:
   recovery re-reads the index, never retrains the quantizer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators import similarity as S
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

#: Gaps-and-islands sessionization over exact cents — the shared CTE
#: skeleton of the top-N oracles (sessionize_oracle_sql's islands logic
#: with BIGINT cents instead of ROUND(sum, 2), so ranking by sum can
#: never hit the engines' half-cent rounding split).
_SESS_CENTS_CTE = """
WITH flagged AS (
  SELECT user_id, ts AS _ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS _c, event_id AS _tb,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000 * 30
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, _ts, _c,
         SUM(_new) OVER (PARTITION BY user_id ORDER BY _ts, _tb
                         ROWS UNBOUNDED PRECEDING) AS _sid
  FROM flagged
),
sess AS (
  SELECT user_id, MIN(_ts) AS session_start,
         CAST(SUM(_c) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS event_count
  FROM islands GROUP BY user_id, _sid
)
"""


def _sessions_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 s fixed-gap sessions with EXACT cent sums — the Spark twin of
    ``_SESS_CENTS_CTE``'s ``sess`` table (same session_window semantics
    as operators/sessionize.py, re-aggregated because the public entry
    emits ROUND(double, 2) sums, which must not feed a ranking)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 seconds"))
        .agg(F.sum(cents).alias("sum_cents"),
             F.count(F.lit(1)).cast("long").alias("event_count"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                "sum_cents", "event_count")
    )


def session_top2_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-2 sessions by exact cent sum (ties: earlier session
    first). One sessionization shuffle on user_id, then the rank window
    reuses the same partitioning — no second exchange at scale."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("sum_cents"), F.asc("session_start"))
    return (_sessions_cents(spark, sf_dir)
            .withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= 2)
            .select("user_id", "rk", "session_start", "sum_cents",
                    "event_count"))


SESSION_TOP2_PER_USER_ORACLE = _SESS_CENTS_CTE + """
SELECT user_id, CAST(rk AS INTEGER) AS rk, session_start, sum_cents,
       event_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY sum_cents DESC, session_start) AS rk
  FROM sess)
WHERE rk <= 2
"""


def session_top10_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 sessions by exact cent sum (ties: user, start).
    orderBy + limit plans as TakeOrderedAndProject — per-partition
    top-10 then a 10-row merge, never a fact-scale single-partition
    sort; the 10-row rank window after the limit is free."""
    top = (_sessions_cents(spark, sf_dir)
           .orderBy(F.desc("sum_cents"), F.asc("user_id"),
                    F.asc("session_start"))
           .limit(10))
    w = Window.orderBy(F.desc("sum_cents"), F.asc("user_id"),
                       F.asc("session_start"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rk"),
        "user_id", "session_start", "sum_cents", "event_count")


SESSION_TOP10_GLOBAL_ORACLE = _SESS_CENTS_CTE + """
SELECT CAST(rk AS INTEGER) AS rk, user_id, session_start, sum_cents,
       event_count
FROM (
  SELECT *, row_number() OVER (ORDER BY sum_cents DESC, user_id,
                               session_start) AS rk
  FROM sess)
WHERE rk <= 10
"""


def event_type_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed event-type pairs' daily-count cross-correlation at lags
    0..2 (does today's a predict today+lag's b?). Bounded everywhere:
    the daily grid is |types| x |days| (never fact-sized), partials are
    exact BIGINTs (counts <= ~1e4/day, so m*saa <= ~1e14 — far inside
    int64), and both engines execute ONE identical IEEE
    floor(num / sqrt(d1 * d2) * 1e4)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint(eager=False))
    a = daily.select(F.col("event_type").alias("type_a"),
                     F.col("x").alias("xa"), F.col("y").alias("ya"))
    lags = a.select(
        "type_a", "xa", "ya",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("lag"))
    b = daily.select(F.col("event_type").alias("type_b"),
                     F.col("x").alias("xb"), F.col("y").alias("yb"))
    paired = (lags.join(b, (F.col("type_b") != F.col("type_a"))
                        & (F.col("xb") == F.col("xa") + F.col("lag")))
              .groupBy("type_a", "type_b", "lag")
              .agg(F.count(F.lit(1)).cast("long").alias("m"),
                   F.sum("ya").cast("long").alias("sa"),
                   F.sum("yb").cast("long").alias("sb"),
                   F.sum(F.col("ya") * F.col("ya")).cast("long")
                   .alias("saa"),
                   F.sum(F.col("yb") * F.col("yb")).cast("long")
                   .alias("sbb"),
                   F.sum(F.col("ya") * F.col("yb")).cast("long")
                   .alias("sab")))
    d1 = F.col("m") * F.col("saa") - F.col("sa") * F.col("sa")
    d2 = F.col("m") * F.col("sbb") - F.col("sb") * F.col("sb")
    num = F.col("m") * F.col("sab") - F.col("sa") * F.col("sb")
    return (paired
            .where((F.col("m") >= 8) & (d1 > 0) & (d2 > 0))
            .select("type_a", "type_b",
                    F.col("lag").cast("int").alias("lag"), "m",
                    F.floor(num.cast("double")
                            / F.sqrt(d1.cast("double") * d2.cast("double"))
                            * 10000).cast("long").alias("xcorr_e4")))


EVENT_TYPE_CROSSCORR_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
paired AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, k.lag AS lag,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(a.y) AS BIGINT) AS sa,
         CAST(SUM(b.y) AS BIGINT) AS sb,
         CAST(SUM(a.y * a.y) AS BIGINT) AS saa,
         CAST(SUM(b.y * b.y) AS BIGINT) AS sbb,
         CAST(SUM(a.y * b.y) AS BIGINT) AS sab
  FROM daily a
  JOIN (SELECT unnest([0, 1, 2]) AS lag) k ON TRUE
  JOIN daily b ON b.event_type <> a.event_type AND b.x = a.x + k.lag
  GROUP BY 1, 2, 3)
SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag, m,
       CAST(floor(
         CAST(m * sab - sa * sb AS DOUBLE)
         / sqrt(CAST(m * saa - sa * sa AS DOUBLE)
                * CAST(m * sbb - sb * sb AS DOUBLE))
         * 10000) AS BIGINT) AS xcorr_e4
FROM paired
WHERE m >= 8 AND m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
"""


def _index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic per-(app, corpus) export location outside the repo."""
    app = spark.sparkContext.applicationId
    leaf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join("/tmp/spark_graft_staging", app, f"ivf_{leaf}")


def ivf_export(index: "S.IvfIndex", spark: SparkSession, path: str) -> None:
    """Persist an IVF index: centroids as a tiny (cell, center) parquet,
    assignments PARTITIONED BY cell — the layout a 100 TB serving tier
    restores from (probes then prune to nprobe cell directories)."""
    centers = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(index.centers)],
        "cell INT, center ARRAY<DOUBLE>")
    centers.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centers"))
    (index.assigned.write.mode("overwrite").partitionBy("cell")
     .parquet(os.path.join(path, "assigned")))


def ivf_import(spark: SparkSession, path: str,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> "S.IvfIndex":
    """Rebuild a probe-ready IvfIndex from an export — no retraining."""
    rows = (spark.read.parquet(os.path.join(path, "centers"))
            .orderBy("cell").collect())
    centers = [list(r.center) for r in rows]
    assigned = spark.read.parquet(os.path.join(path, "assigned"))
    return S.IvfIndex(centers, assigned, id_col=id_col, vec_col=vec_col)


def ivf_index_persist_roundtrip(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Export -> import -> probe with nprobe == n_cells: the persisted
    index must reproduce BOTH the exact cosine scan (the
    ivf_recall_vs_exact identity) and the fresh never-persisted index,
    pair for pair. Emitted as one scalar row against a pinned oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, q, k=10).select("query_id", "match_id")

    fresh_index = S.ivf_build(emb, n_cells=16, seed=42)
    path = _index_dir(spark, sf_dir)
    ivf_export(fresh_index, spark, path)
    restored = ivf_import(spark, path)

    fresh = (S.ivf_cosine_topk(None, q, k=10, nprobe=16, index=fresh_index)
             .select("query_id", "match_id"))
    persisted = (S.ivf_cosine_topk(None, q, k=10, nprobe=16, index=restored)
                 .select("query_id", "match_id")
                 .withColumn("_hit", F.lit(1)))
    agree = fresh.join(persisted.drop("_hit"), ["query_id", "match_id"],
                       "left_semi").count()
    return (exact.join(persisted, ["query_id", "match_id"], "left")
            .agg(F.countDistinct("query_id").alias("n_queries"),
                 F.count(F.lit(1)).alias("exact_pairs"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
                 .alias("persisted_hits"))
            .withColumn("fresh_persisted_agree",
                        F.lit(agree).cast("long")))


IVF_INDEX_PERSIST_ROUNDTRIP_ORACLE = """
SELECT CAST(10 AS BIGINT) AS n_queries,
       CAST(100 AS BIGINT) AS exact_pairs,
       CAST(100 AS BIGINT) AS persisted_hits,
       CAST(100 AS BIGINT) AS fresh_persisted_agree
"""


#: name -> (spark_fn, oracle_sql, description, tags) — the exact shape
#: r15's @register calls will take; kept OUT of the catalog until then.
STAGED = {
    "session_top2_per_user": (
        session_top2_per_user, SESSION_TOP2_PER_USER_ORACLE,
        "Per-user top-2 sessions by EXACT cent sum (30 s fixed gap; "
        "ties break to the earlier session) — the session-window top-N "
        "pattern: one sessionization shuffle on user_id, rank window "
        "reusing the same partitioning. Cents (not ROUND(double,2)) "
        "feed the ranking so the engines' half-cent rounding split "
        "(BASELINE.md round-13 close) can never reorder it.",
        ("session", "window", "topn")),
    "session_top10_global": (
        session_top10_global, SESSION_TOP10_GLOBAL_ORACLE,
        "Global top-10 sessions by exact cent sum with a total "
        "deterministic order (sum desc, user, start) — orderBy+limit "
        "plans as TakeOrderedAndProject (per-partition top-k + 10-row "
        "merge), never a fact-scale single-partition sort.",
        ("session", "window", "topn")),
    "event_type_crosscorr": (
        event_type_crosscorr, EVENT_TYPE_CROSSCORR_ORACLE,
        "Directed event-type pairs' daily-count cross-correlation at "
        "lags 0..2 — spend_autocorrelation's exact-BIGINT/one-IEEE-"
        "division discipline extended from auto- to cross-correlation "
        "over the |types| x |days| grid; guards mirror ACF (m >= 8, "
        "positive variances).",
        ("analytics", "timeseries", "window")),
    "ivf_index_persist_roundtrip": (
        ivf_index_persist_roundtrip, IVF_INDEX_PERSIST_ROUNDTRIP_ORACLE,
        "IVF index exported to parquet (KB centroids + cell-partitioned "
        "assignments), re-imported, probed with nprobe == n_cells: must "
        "equal the exact cosine scan AND the fresh index pair-for-pair "
        "— the serving-restart contract (recovery re-reads the index, "
        "never retrains the quantizer).",
        ("llm", "similarity", "ann", "persistence")),
}
