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
   ``session_top10_global``: PROMOTED to plans/parity.py in r15 per
   PROMOTEPLAN (staging copies deleted).
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
4. Session-store maintenance — ``incremental_session_merge`` (new
   arrivals merge into a persisted session store at its per-user tail;
   history never re-sessionized) and ``late_event_session_repair``
   (late events re-sessionize only the users they touch). Both oracles
   are the full recompute: incremental must equal from-scratch.
5. Continuous dedup — ``incremental_neardup_probe``: the corpus
   MinHash-LSH index persisted (band tables partitioned by band_id,
   per-bucket counts, shingle store) and probed by a delta batch whose
   signatures alone are computed; combined-count bucket capping makes
   the result equal the from-scratch run restricted to delta-involving
   pairs, which is exactly what the oracle computes.
6. Index-backed BM25 serving — ``incremental_bm25_search``: the
   postings index (all tokens, partitioned by token-hash bucket)
   persisted from the corpus, delta batches appended as doc-only
   increments, queries scored from the index alone with
   partition-pruned postings reads (PartitionFilters: bucket IN
   (...)); oracle = from-scratch single-pass BM25 over all documents.
7. A registered-entry REWRITE queued for r15 —
   ``curation_pipeline_e2e``: LANDED in r15 (the registered entry in
   plans/curation.py is now the single-scan fused version).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators import similarity as S
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

# The session top-N pair (session_top2_per_user, session_top10_global)
# was PROMOTED to plans/parity.py in r15 per PROMOTEPLAN — the staging
# copies are deleted, not kept as shims.


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


#: appId -> private scratch root (created once per app, 0700).
_STAGING_ROOTS: dict[str, str] = {}


def _staging_root(spark: SparkSession) -> str:
    """Private per-app scratch root for staged index exports: a
    ``mkdtemp`` (mode 0700, unpredictable suffix) under
    ``spark.graft.staging.dir`` if configured, else ``spark.local.dir``,
    else the system temp dir — never a fixed world-writable path (r14
    ADVICE: a predictable shared-tmp location accumulates without bound
    across bench/test runs and is spoofable on multi-user hosts).
    Entries remove their export dir via :func:`_drop_export` as soon as
    the result is eagerly materialized."""
    app = spark.sparkContext.applicationId
    root = _STAGING_ROOTS.get(app)
    if root is None or not os.path.isdir(root):
        base = (spark.conf.get("spark.graft.staging.dir", None)
                or spark.sparkContext.getConf()
                .get("spark.local.dir", tempfile.gettempdir())
                .split(",")[0])
        os.makedirs(base, exist_ok=True)
        root = tempfile.mkdtemp(prefix=f"graft_stage_{app}_", dir=base)
        _STAGING_ROOTS[app] = root
    return root


def _drop_export(path: str) -> None:
    """Delete an index export once the entry's result is eagerly
    materialized (localCheckpoint) — the files are dead weight after."""
    shutil.rmtree(path, ignore_errors=True)


def _index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Per-(app, corpus) export location outside the repo."""
    leaf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_staging_root(spark), f"ivf_{leaf}")


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
    out = (exact.join(persisted, ["query_id", "match_id"], "left")
           .agg(F.countDistinct("query_id").alias("n_queries"),
                F.count(F.lit(1)).alias("exact_pairs"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
                .alias("persisted_hits"))
           .withColumn("fresh_persisted_agree",
                       F.lit(agree).cast("long"))
           .localCheckpoint(eager=True))  # 1 row — frees the export
    _drop_export(path)
    return out


IVF_INDEX_PERSIST_ROUNDTRIP_ORACLE = """
SELECT CAST(10 AS BIGINT) AS n_queries,
       CAST(100 AS BIGINT) AS exact_pairs,
       CAST(100 AS BIGINT) AS persisted_hits,
       CAST(100 AS BIGINT) AS fresh_persisted_agree
"""


# --------------------------------------------------------------------
# Session-store maintenance pair (drafted later in r14): the reference's
# session windows (flink_stream_task1.py:30-41's gap semantics; widened
# here to a 10-minute gap so multi-event sessions exist at every test
# SF — at sf0.001 no two same-user events are 30 s apart) taken to the
# 100 TB incremental world, where history is NEVER re-sessionized —
# new arrivals merge into a persisted session store, and late arrivals
# repair only the users they touch. Both carry the strongest oracle a
# maintenance operator can have: the incremental result must EQUAL the
# full recompute (gaps-and-islands over all events), so the oracle never
# mentions the cutoff / late split at all.

#: Full-session gaps-and-islands CTE (start, end = first/last EVENT ts,
#: exact BIGINT cents) — shared by both maintenance oracles.
_SESS_FULL_CTE = """
WITH flagged AS (
  SELECT user_id, ts AS _ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS _c, event_id AS _tb,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000 * 600
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
sess_full AS (
  SELECT user_id, MIN(_ts) AS session_start, MAX(_ts) AS session_end,
         CAST(SUM(_c) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS event_count
  FROM islands GROUP BY user_id, _sid
)
"""


# The primitives live in operators/session_store.py (shared with the
# streaming maintainer, which must not import the plans layer); the
# staging names below are the same objects — the Spark twins of
# ``_SESS_FULL_CTE``'s ``sess_full``. On r16 promotion the registered
# entries import them the same way.
from windowsession_using_kafka_flink_docker_spark.operators.session_store import (  # noqa: E402
    continuation_cutoff,
    merge_session_store,
    sessions_full as _sessions_full,
)


def incremental_session_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-side session-store maintenance: events before a cutoff are
    the persisted store (sessionized once, never revisited); events at or
    after it are the new arrivals. New arrivals are sessionized ALONE,
    then merged against the store tail: per user, only the store session
    with the latest end can extend (everything earlier is > gap from any
    new event by construction), and only the first new session can attach
    (the second is > gap past the first by sessionization). The merged
    row carries BIGINT-exact combined partials — the same
    merge-without-recompute discipline as the streaming maintainers
    (streaming/analytics_twins.py). Result must equal the full
    recompute, which is exactly what the oracle computes.

    The cutoff is derived so the merge is provably non-vacuous at every
    SF: the latest event that CONTINUES a session (has a same-user
    predecessor within the gap) — splitting there guarantees at least
    one straddling session. In production the cutoff is just the ingest
    high-water mark.

    Scale: the store is read only at its per-user tail (at 100 TB a
    time-partitioned store prunes to the last partition; here the tail
    row_number runs over the just-built store), the delta is one
    ingest's worth, and the merge join is tail-vs-head — two one-row-
    per-user frames."""
    ev = load_table(spark, sf_dir, "events")
    # Bounded driver-side scalar (one row — the scd.py:89 idiom): a
    # broadcast-crossJoin cutoff would re-run the lag-window pass inside
    # EACH side's materialization below and block ts pushdown into the
    # scan; as a literal it is one window pass total and both filters
    # push down (measured: 4.9 -> 2.8 s warm at sf0.1).
    cutoff = continuation_cutoff(ev)
    if cutoff is None:  # degenerate corpus: no continuation events at all
        return _sessions_full(ev)

    # The store IS a materialized artifact in this pattern — and the
    # merge consumes each side twice (tail/keep_store, head/keep_fresh),
    # so an un-materialized plan would re-sessionize both sides per
    # union branch (measured: 32 -> 14 s cold at sf0.1; with the scalar
    # cutoff above, 12.5 s cold / 2.8 s warm).
    store = _sessions_full(
        ev.where(F.col("ts") < F.lit(cutoff))).localCheckpoint()
    fresh = _sessions_full(
        ev.where(F.col("ts") >= F.lit(cutoff))).localCheckpoint()
    return merge_session_store(store, fresh)


INCREMENTAL_SESSION_MERGE_ORACLE = _SESS_FULL_CTE + """
SELECT user_id, session_start, session_end, sum_cents, event_count
FROM sess_full
"""

#: Deterministic late-arrival plant: every 19th event (offset 3) is
#: held back from the first sessionization pass and arrives late.
_LATE_MOD, _LATE_OFF = 19, 3


def late_event_session_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival session repair: the store was sessionized WITHOUT
    the late events (every 19th, planted deterministically so both
    engines agree on the split); when they arrive, only the users they
    touch are re-sessionized from their own events — a late event can
    extend a session, open a new one, or BRIDGE two store sessions into
    one, and per-user recompute is the only repair that handles all
    three. Untouched users' store rows are never read past the
    anti-join. Emits the per-user repair audit: late count, session
    count before/after, cents added (repaired minus store — equals the
    late events' own cents by conservation, which the oracle recomputes
    independently the same way).

    Scale: affected users are one ingest's distinct keys; their event
    history is fetched by a semi join (user-bucketed layouts prune it
    to the touched buckets); the store contributes only those users'
    rows. Nothing corpus-sized is re-sessionized."""
    ev = load_table(spark, sf_dir, "events")
    is_late = F.col("event_id") % _LATE_MOD == _LATE_OFF
    late = ev.where(is_late)
    ontime = ev.where(~is_late)

    affected = late.select("user_id").distinct()
    store = _sessions_full(ontime)
    before = (store.join(affected, "user_id", "left_semi")
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("sessions_before"),
                   F.sum("sum_cents").alias("cents_before")))
    repaired = (_sessions_full(ev.join(affected, "user_id", "left_semi"))
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("sessions_after"),
                     F.sum("sum_cents").alias("cents_after")))
    late_counts = late.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("late_events"))
    return (late_counts
            .join(repaired, "user_id")
            .join(before, "user_id", "left")
            .select("user_id", "late_events",
                    F.coalesce(F.col("sessions_before"), F.lit(0))
                    .cast("long").alias("sessions_before"),
                    F.col("sessions_after").cast("long")
                    .alias("sessions_after"),
                    (F.col("cents_after")
                     - F.coalesce(F.col("cents_before"), F.lit(0)))
                    .cast("long").alias("cents_added")))


LATE_EVENT_SESSION_REPAIR_ORACLE = f"""
WITH ontime AS (
  SELECT * FROM events WHERE event_id % {_LATE_MOD} <> {_LATE_OFF}
),
late AS (
  SELECT * FROM events WHERE event_id % {_LATE_MOD} = {_LATE_OFF}
),
affected AS (SELECT DISTINCT user_id FROM late),
flagged_b AS (
  SELECT user_id, ts AS _ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS _c, event_id AS _tb,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000 * 600
              THEN 1 ELSE 0 END AS _new
  FROM ontime
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess_b AS (
  SELECT user_id,
         SUM(_new) OVER (PARTITION BY user_id ORDER BY _ts, _tb
                         ROWS UNBOUNDED PRECEDING) AS _sid, _c
  FROM flagged_b
),
before AS (
  SELECT user_id, CAST(COUNT(DISTINCT _sid) AS BIGINT) AS sessions_before,
         CAST(SUM(_c) AS BIGINT) AS cents_before
  FROM sess_b WHERE user_id IN (SELECT user_id FROM affected)
  GROUP BY user_id
),
flagged_a AS (
  SELECT user_id, ts AS _ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS _c, event_id AS _tb,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1000000 * 600
              THEN 1 ELSE 0 END AS _new
  FROM events
  WHERE user_id IN (SELECT user_id FROM affected)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess_a AS (
  SELECT user_id,
         SUM(_new) OVER (PARTITION BY user_id ORDER BY _ts, _tb
                         ROWS UNBOUNDED PRECEDING) AS _sid, _c
  FROM flagged_a
),
after AS (
  SELECT user_id, CAST(COUNT(DISTINCT _sid) AS BIGINT) AS sessions_after,
         CAST(SUM(_c) AS BIGINT) AS cents_after
  FROM sess_a GROUP BY user_id
)
SELECT l.user_id, l.late_events,
       COALESCE(b.sessions_before, 0) AS sessions_before,
       a.sessions_after,
       a.cents_after - COALESCE(b.cents_before, 0) AS cents_added
FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS late_events
      FROM late GROUP BY user_id) l
JOIN after a ON a.user_id = l.user_id
LEFT JOIN before b ON b.user_id = l.user_id
"""


# The curation_pipeline_e2e single-scan rewrite LANDED in r15: the
# registered entry in plans/curation.py now IS the fused version (one
# localCheckpointed corpus scan + checkpointed id-list boundaries); the
# staged draft and the REWRITES queue are deleted, and the entry's
# changed-fingerprint front-loads it into the r15 driver window.


# The quality_scores exact-e4 rewrite LANDED in r16: the registered
# entry in plans/llm_pipeline.py now IS the exact-int64 form (the
# .xxxx5 ROUND(x,4) boundary family the r15 sf0.1 sweep found is
# closed by construction); the staged draft and the REWRITES queue
# are deleted, and the entry's changed fingerprint front-loads it
# into the r16 driver window.


#: name -> (spark_fn, oracle_sql, description, tags) — the exact shape
#: r15's @register calls will take; kept OUT of the catalog until then.
STAGED = {
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
    "incremental_session_merge": (
        incremental_session_merge, INCREMENTAL_SESSION_MERGE_ORACLE,
        "Append-side session-store maintenance: new arrivals are "
        "sessionized alone and merged against the store's per-user tail "
        "(only the latest store session can extend; only the first new "
        "session can attach) with BIGINT-exact combined partials — the "
        "reference's session-gap semantics taken incremental (10-minute "
        "gap so every test SF has multi-event sessions), history "
        "never re-sessionized. Oracle: the full gaps-and-islands "
        "recompute; the cutoff must be invisible in the result.",
        ("session", "window", "incremental", "maintenance")),
    "late_event_session_repair": (
        late_event_session_repair, LATE_EVENT_SESSION_REPAIR_ORACLE,
        "Late-arrival session repair: re-sessionize ONLY the users a "
        "late batch touches (a late event can extend, open, or bridge "
        "store sessions); emit the per-user repair audit (late count, "
        "sessions before/after, cents added). Oracle replays the "
        "ontime/late split and both sessionizations closed-form.",
        ("session", "window", "incremental", "maintenance")),
}


# --------------------------------------------------------------------
# Continuous dedup (drafted late r14, targets r16): the dedup-side
# serving contract that pairs with the session-store maintenance family
# above. A crawl pipeline at 100 TB never re-hashes its corpus when a
# new batch arrives — it probes a PERSISTED MinHash-LSH index (band
# tables + per-bucket counts + shingle store) with just the delta's
# signatures. The entry proves: persisted-index probe == the
# from-scratch full-corpus run restricted to delta-involving pairs —
# including the bucket-cap semantics, which must combine index counts
# with delta counts to match the full run's pruning exactly.

_DELTA_MOD, _DELTA_OFF = 10, 7     # ~10% of docs arrive as the delta

# The index primitives live in operators/neardup_index.py (shared with
# the streaming near-dup index maintainer #26, which must not import
# the plans layer — the operators/session_store.py precedent); the
# staging names below are the same objects, with the single-export
# layout generalized to versioned inc=<n> increments (bm25_index.py
# discipline). Constants re-exported for the oracle and the tests.
from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (  # noqa: E402
    MH_BANDS as _MH_BANDS,
    MH_CAP as _MH_CAP,
    MH_HASHES as _MH_HASHES,
    MH_ROWS as _MH_ROWS,
    MH_THRESHOLD as _MH_THRESHOLD,
    neardup_index_append,
    neardup_index_probe,
)


def neardup_index_export(spark: SparkSession, corpus: DataFrame,
                         path: str) -> None:
    """Build the corpus near-dup index as increment 0 (see
    operators/neardup_index.py for the layout and guard contract)."""
    neardup_index_append(spark, corpus, path, inc=0)


def incremental_neardup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the corpus index (doc_id % 10 != 7), persist it, probe it
    with the delta (doc_id % 10 == 7): the result must equal the
    from-scratch full-corpus MinHash-LSH run restricted to pairs with
    at least one delta member — which is exactly what the oracle
    computes closed-form (same portable md5 pipeline, same combined
    bucket-cap arithmetic, same exact-Jaccard verification)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % _DELTA_MOD != _DELTA_OFF)
    delta = docs.where(F.col("doc_id") % _DELTA_MOD == _DELTA_OFF)
    leaf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_staging_root(spark), f"ndidx_{leaf}")
    neardup_index_export(spark, corpus, path)
    out = neardup_index_probe(spark, path, delta)  # eager checkpoint
    _drop_export(path)
    return out


def _nd_perm_values() -> str:
    from windowsession_using_kafka_flink_docker_spark.operators import dedup as D

    return ",\n    ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(D._perm_params(_MH_HASHES)))


def _nd_oracle() -> str:
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import _NORM_SQL

    # The full-corpus portable pipeline (identical CTE text to the
    # minhash_recall_vs_exact oracle through the verification step),
    # restricted to pairs with >= 1 delta member — closed-form proof
    # that the persisted-index probe equals from-scratch.
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, GREATEST(len(toks) - 2, 1) + 1),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])
           )
         ) AS sh
  FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents)
),
perms(j, a, b) AS (VALUES
    {_nd_perm_values()}
),
bh AS (
  SELECT doc_id,
         list_transform(sh, s ->
           ('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647) AS hs
  FROM docs),
ex AS (SELECT doc_id, unnest(hs) AS h FROM bh),
pm AS (
  SELECT doc_id, j, MIN((a * h + b) % 2147483647) AS m
  FROM ex CROSS JOIN perms GROUP BY doc_id, j),
sg AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM pm GROUP BY doc_id),
bd AS (
  SELECT doc_id, b,
         md5(array_to_string(
           list_transform(list_slice(sig, b*{_MH_ROWS} + 1, b*{_MH_ROWS} + {_MH_ROWS}),
                          x -> CAST(x AS VARCHAR)), ',')) AS bkey
  FROM sg CROSS JOIN (SELECT unnest(range({_MH_BANDS})) AS b)),
capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY b, bkey) AS _bsz FROM bd)
  WHERE _bsz <= {_MH_CAP}),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM capped x JOIN capped y ON x.b = y.b AND x.bkey = y.bkey
  WHERE x.doc_id < y.doc_id),
pairs AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(da.sh, db.sh)) AS i,
         len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)) AS u
  FROM cand c JOIN docs da ON da.doc_id = c.id_a
              JOIN docs db ON db.doc_id = c.id_b)
SELECT id_a, id_b,
       CASE WHEN u = 0 THEN 1.0 ELSE ROUND(i / u, 4) END AS jaccard,
       (id_a % {_DELTA_MOD} = {_DELTA_OFF})
         <> (id_b % {_DELTA_MOD} = {_DELTA_OFF}) AS is_cross
FROM pairs
WHERE (CASE WHEN u = 0 THEN 1.0 ELSE ROUND(i / u, 4) END) >= {_MH_THRESHOLD}
  AND (id_a % {_DELTA_MOD} = {_DELTA_OFF}
       OR id_b % {_DELTA_MOD} = {_DELTA_OFF})
"""


STAGED["incremental_neardup_probe"] = (
    incremental_neardup_probe, _nd_oracle(),
    "Continuous dedup: the corpus MinHash-LSH index persisted to "
    "parquet (band tables partitioned by band_id, per-bucket counts, "
    "shingle store), probed by a ~10% delta batch whose signatures "
    "alone are computed; the bucket cap combines index + delta counts "
    "so pruning matches a from-scratch run exactly. Oracle: the full "
    "portable md5 pipeline closed-form, restricted to delta-involving "
    "pairs — incremental must equal from-scratch, the dedup twin of "
    "incremental_session_merge.",
    ("llm", "dedup", "minhash", "incremental", "persistence"))


# --------------------------------------------------------------------
# Incremental text-retrieval serving (drafted late r14, targets r16):
# the third leg of the maintained-index family — session store (events),
# near-dup LSH index (dedup), and now the BM25 POSTINGS index (search).
# A serving tier never re-tokenizes its corpus per query OR per ingest:
# queries read only the query terms' postings (partition-pruned by a
# token-hash bucket), and a new document batch appends ITS OWN postings
# increment without touching the existing index. The entry proves:
# index built from the corpus + increment appended for the delta,
# queried from the INDEX ALONE, equals the from-scratch single-pass
# BM25 over all documents — which is exactly what the oracle computes.

_BM_DELTA_MOD, _BM_DELTA_OFF = 8, 5   # ~12.5% of docs arrive late
_BM_TERMS = ("merge", "window", "hash")
_BM_K = 10

# The index primitives live in operators/bm25_index.py (shared with the
# streaming BM25 index maintainer #25, which must not import the plans
# layer — the operators/session_store.py precedent); the staging names
# below are the same objects. Constants re-exported for the oracle and
# the tests.
from windowsession_using_kafka_flink_docker_spark.operators.bm25_index import (  # noqa: E402
    BM25_B as _BM_B,
    BM25_BUCKETS as _BM_BUCKETS,
    BM25_K1 as _BM_K1,
    bm25_index_append,
    bm25_index_export,
    increments as _bm25_increments,
)
from windowsession_using_kafka_flink_docker_spark.operators.bm25_index import (  # noqa: E402
    bm25_from_index as _bm25_from_index_impl,
)


def bm25_from_index(spark: SparkSession, path: str,
                    terms: tuple[str, ...] = _BM_TERMS,
                    k: int = _BM_K) -> DataFrame:
    """operators/bm25_index.py:bm25_from_index with this entry's query
    terms and k as defaults (see that module for the pruning contract
    and the torn-index guard)."""
    return _bm25_from_index_impl(spark, path, terms, k)


def incremental_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus index (doc_id % 8 != 5) built and persisted, the delta's
    increment appended doc-only, then the query scored from the merged
    index — must equal the from-scratch BM25 over all documents."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % _BM_DELTA_MOD != _BM_DELTA_OFF)
    delta = docs.where(F.col("doc_id") % _BM_DELTA_MOD == _BM_DELTA_OFF)
    leaf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_staging_root(spark), f"bm25_{leaf}")
    bm25_index_export(spark, corpus, path)
    bm25_index_append(spark, path, delta)
    out = bm25_from_index(spark, path).localCheckpoint(eager=True)  # k rows
    _drop_export(path)
    return out


def _bm25_oracle() -> str:
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import _NORM_SQL

    terms = ", ".join(f"'{t}'" for t in _BM_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id, len(t) AS dl, t
  FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents)
),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, dl, s AS tok, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS s FROM base)
  WHERE s IN ({terms})
  GROUP BY 1, 2, 3
),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id,
         SUM( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * ({_BM_K1} + 1) / (tf.tf + {_BM_K1} * (1 - {_BM_B} + {_BM_B} * tf.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dft USING (tok) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, ROUND(s, 4) AS bm25
FROM scored
ORDER BY ROUND(s, 4) DESC, doc_id
LIMIT {_BM_K}
"""


STAGED["incremental_bm25_search"] = (
    incremental_bm25_search, _bm25_oracle(),
    "Index-backed BM25 serving: the postings index (ALL tokens, "
    "partitioned by token-hash bucket) persisted from the corpus, a "
    "~12.5% delta batch appended as its own doc-only increment (corpus "
    "never re-tokenized), then query {merge, window, hash} scored from "
    "the INDEX ALONE — postings reads prune to <= |q| bucket "
    "directories, no document text touched at query time. Oracle: the "
    "from-scratch single-pass BM25 over all documents; the increment "
    "must be invisible in the result. Third leg of the maintained-"
    "index family (session store, LSH near-dup index, BM25 postings).",
    ("llm", "text", "retrieval", "incremental", "persistence"))


# --------------------------------------------------------------------
# Drafted r16, targets r17+ (the two standing SURVEY 2.89 candidates,
# slot-limited since r12): isotonic regression via bounded-domain PAV,
# and the semantic RRF hybrid-search leg (the embeddings<->documents id
# alignment exists: vec_id == doc_id, verified 1:1 at every SF).


def isotonic_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (non-decreasing) regression of mean order price over the
    absolute month index, fit by Pool-Adjacent-Violators on EXACT
    integer partials.

    Scale shape: the heavy lift — per-month (sum_cents, count) — is one
    distributed exact BIGINT aggregation over the fact table; PAV then
    runs on the DRIVER over the collected per-month partials, a
    BOUNDED-DOMAIN collect (months in the data span, ~84 at any SF —
    the IVF-training-sample discipline: the collect is bounded by the
    domain, never by the data). Pooling compares block means by integer
    CROSS-MULTIPLICATION (prev.s * cur.c >= cur.s * prev.c — positive
    denominators), so no IEEE division anywhere; fitted values are
    emitted as REDUCED exact rationals (num/gcd, den/gcd), which makes
    the output representation-independent and engine-identical.

    Oracle: the minimax characterization fitted(k) = max_{i<=k}
    min_{j>=k} avg(y[i..j]) — a closed-form SQL equivalent of PAV over
    prefix sums, with every min/max decided by HUGEINT
    cross-multiplication and the same gcd reduction canonicalizing tied
    representatives. (At 100 TB the cross-products exceed int64 —
    DuckDB computes them in HUGEINT here; a Spark-side SQL variant
    would use DECIMAL(38,0), but the shipped plan needs no cross-
    products at all: the driver PAV is arbitrary-precision Python.)"""
    from math import gcd

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    month = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1) \
        .cast("long")
    per = (orders.groupBy(month.alias("month_idx"))
           .agg(F.sum(cents).alias("s"),
                F.count(F.lit(1)).cast("long").alias("c"))
           .orderBy("month_idx").collect())  # bounded: |months in span|
    blocks: list[list] = []  # [months, sum_cents, count]
    for r in per:
        cur = [[r.month_idx], r.s, r.c]
        # pool while the previous block's mean >= this one's (exact
        # cross-multiplied comparison; merging on equality is value-
        # neutral — the pooled mean equals both)
        while blocks and blocks[-1][1] * cur[2] >= cur[1] * blocks[-1][2]:
            prev = blocks.pop()
            cur = [prev[0] + cur[0], prev[1] + cur[1], prev[2] + cur[2]]
        blocks.append(cur)
    n_by_month = {r.month_idx: r.c for r in per}
    rows = []
    for months, s, c in blocks:
        g = gcd(s, c)
        for m in months:
            rows.append((m, n_by_month[m], s // g, c // g))
    return spark.createDataFrame(
        rows, "month_idx BIGINT, n_orders BIGINT, "
              "fitted_num BIGINT, fitted_den BIGINT")


ISOTONIC_MONTHLY_REVENUE_ORACLE = """
WITH per AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
pre AS (
  SELECT m, row_number() OVER (ORDER BY m) AS r,
         SUM(s) OVER (ORDER BY m) AS ps,
         SUM(c) OVER (ORDER BY m) AS pc
  FROM per
),
ranges AS (
  SELECT i.r AS ri, j.r AS rj,
         CAST(j.ps - COALESCE(ip.ps, 0) AS HUGEINT) AS num,
         CAST(j.pc - COALESCE(ip.pc, 0) AS HUGEINT) AS den
  FROM pre i
  JOIN pre j ON i.r <= j.r
  LEFT JOIN pre ip ON ip.r = i.r - 1
),
minj AS (
  -- for each start i and position k in [i..]: the minimum over j >= k
  -- of avg(i..j), decided by exact cross-multiplication; equal-valued
  -- representatives collapse after gcd reduction
  SELECT DISTINCT r1.ri, k.r AS k,
         CAST(r1.num // gcd(r1.num, r1.den) AS BIGINT) AS num,
         CAST(r1.den // gcd(r1.num, r1.den) AS BIGINT) AS den
  FROM ranges r1 JOIN pre k ON r1.ri <= k.r AND r1.rj >= k.r
  WHERE NOT EXISTS (
    SELECT 1 FROM ranges r2
    WHERE r2.ri = r1.ri AND r2.rj >= k.r
      AND r2.num * r1.den < r1.num * r2.den)
),
fitted AS (
  -- minimax: fitted(k) = max over i <= k of minj(i, k)
  SELECT DISTINCT mj.k, mj.num, mj.den
  FROM minj mj
  WHERE NOT EXISTS (
    SELECT 1 FROM minj m2
    WHERE m2.k = mj.k
      AND CAST(m2.num AS HUGEINT) * mj.den > CAST(mj.num AS HUGEINT) * m2.den)
)
SELECT p.m AS month_idx, per.c AS n_orders, f.num AS fitted_num,
       f.den AS fitted_den
FROM fitted f JOIN pre p ON p.r = f.k JOIN per ON per.m = p.m
"""

STAGED["isotonic_monthly_revenue"] = (
    isotonic_monthly_revenue, ISOTONIC_MONTHLY_REVENUE_ORACLE,
    "Isotonic regression (non-decreasing mean order price over the "
    "month index) via Pool-Adjacent-Violators on exact BIGINT-cents "
    "partials: one distributed aggregation, then driver PAV over the "
    "bounded month domain with integer cross-multiplied comparisons; "
    "fitted values emitted as gcd-reduced exact rationals. Oracle: the "
    "minimax characterization max_i min_j avg(i..j) closed-form in "
    "SQL with HUGEINT cross-products — PAV == minimax is the "
    "engine-agreement proof.",
    ("analytics", "regression", "exact"))


_SEM_QUERY_VEC = 0   # the query document (vec_id == doc_id alignment)
_SEM_TERMS = ("spark", "stream", "join")


def semantic_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical+SEMANTIC hybrid search — the production RRF shape
    (rrf_hybrid_search fuses two lexical legs; this adds the embedding
    leg the testdata's vec_id == doc_id alignment enables): the BM25
    top-50 for the query terms fuses with the exact-cosine top-50
    around the query document's embedding via reciprocal rank,
    score = sum 1/(60 + rank).

    Determinism: both legs rank by their ROUND(score, 4) with doc_id
    tiebreaks (the entries' established engine-stable recipe); the
    fused score adds at most two 1/(60+rank) doubles in a fixed order
    (bm25 first), so both engines compute the identical IEEE value.
    Scale: the semantic leg broadcasts ONE query vector and scores
    corpus-scan-side (cosine_topk's plan — the corpus never shuffles);
    both legs are 50 rows after their own cuts, so the fusion join is
    broadcast-sized and the final top-10 is a TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    w_b = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    from windowsession_using_kafka_flink_docker_spark.operators import (
        text_analysis as T,
    )
    bm25 = (T.bm25_topk(docs, _SEM_TERMS, k=50)
            .select("doc_id", "bm25")
            .withColumn("r_bm25", F.row_number().over(w_b).cast("long"))
            .select("doc_id", "r_bm25"))
    sem = (S.cosine_topk(emb, emb.where(F.col("vec_id") == _SEM_QUERY_VEC),
                         k=50)
           .select(F.col("match_id").alias("doc_id"),
                   F.col("rnk").cast("long").alias("r_sem")))
    fused = (bm25.join(sem, "doc_id", "full_outer")
             .select("doc_id", "r_bm25", "r_sem",
                     (F.coalesce(1.0 / (60 + F.col("r_bm25")), F.lit(0.0))
                      + F.coalesce(1.0 / (60 + F.col("r_sem")),
                                   F.lit(0.0))).alias("rrf")))
    w_f = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (fused
            .withColumn("fused_rank",
                        F.row_number().over(w_f).cast("long"))
            .where(F.col("fused_rank") <= 10)
            .select("doc_id", "r_bm25", "r_sem",
                    F.floor(F.col("rrf") * 1000000000).cast("long")
                    .alias("rrf_e9"),
                    "fused_rank"))


def _semantic_rrf_oracle() -> str:
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        _NORM_SQL,
    )

    terms = ", ".join(f"'{t}'" for t in _SEM_TERMS)
    return f"""
WITH base AS (
  SELECT doc_id, len(t) AS dl, t
  FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents)
),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, dl, s AS tok, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS s FROM base)
  WHERE s IN ({terms})
  GROUP BY 1, 2, 3
),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id,
         SUM( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)) ) AS s
  FROM tf JOIN dft USING (tok) CROSS JOIN stats
  GROUP BY doc_id
),
bm25_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY ROUND(s, 4) DESC, doc_id)
         AS r_bm25
  FROM scored
  QUALIFY r_bm25 <= 50
),
sem AS (
  SELECT c.vec_id AS doc_id,
         ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qv), 4) AS cosine
  FROM embeddings c,
       (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {_SEM_QUERY_VEC}) q
  WHERE c.vec_id <> {_SEM_QUERY_VEC}
),
sem_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_sem
  FROM sem
  QUALIFY r_sem <= 50
),
fused AS (
  SELECT COALESCE(b.doc_id, s.doc_id) AS doc_id, b.r_bm25, s.r_sem,
         COALESCE(1.0 / (60 + b.r_bm25), 0.0)
           + COALESCE(1.0 / (60 + s.r_sem), 0.0) AS rrf
  FROM bm25_rank b FULL OUTER JOIN sem_rank s USING (doc_id)
)
SELECT doc_id, r_bm25, r_sem,
       CAST(floor(rrf * 1000000000) AS BIGINT) AS rrf_e9,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= 10
"""


STAGED["semantic_rrf_hybrid_search"] = (
    semantic_rrf_hybrid_search, _semantic_rrf_oracle(),
    "Lexical+semantic hybrid search via reciprocal-rank fusion: BM25 "
    "top-50 for {spark, stream, join} fused with the exact-cosine "
    "top-50 around the query document's embedding (vec_id == doc_id "
    "alignment), score = sum 1/(60 + rank) added in fixed order. The "
    "semantic leg broadcasts one query vector and scores scan-side "
    "(the corpus never shuffles); the fusion is a 50x50 broadcast "
    "join and the top-10 a TakeOrderedAndProject.",
    ("llm", "retrieval", "similarity", "topk"))


# --------------------------------------------------------------------
# REWRITES queue: the 7-entry exact-e2 session-family rewrite (drafted
# r16) LANDED in r17 — operators/sessionize.py:_aggregate and
# sessionize_oracle_sql now derive both presented doubles from the
# exact BIGINT cents sum (sign-correct half-up: the avg CASE keeps the
# integer-division operands nonnegative, where Spark's truncating
# ``div`` equals DuckDB's flooring ``//`` — the r16 ADVICE item on
# negative sums), parity.py's two alert HAVING strings moved to
# SUM(_c)/100.0, and the streaming twins inherit through
# streaming/pipeline.py's shared projection. The EIGHTH rewrite — the
# same tie class through the CAPPED sessionizer — LANDED next (r18
# window): operators/capped_sessionize.py now derives both presented
# doubles from the BIGINT cents sum (sharing sessionize's
# _AVG_CENTS_EXPR) and computes the segment index in exact BIGINT
# microseconds (r16 ADVICE: the double quotient could misround within
# ~8e-9 of a cap multiple); its streaming twin streaming/stateful.py
# moved in the same commit to BIGINT-cents state (both the
# applyInPandasWithState fn and the transformWithStateInPandas
# processor), keeping the stream==batch pins exact.

REWRITES: dict = {}


# --------------------------------------------------------------------
# NINTH queued rewrite — the bm25_topk / bm25_from_index duplicate-
# query-term UNIFICATION (SURVEY 2.105 finding 7, deferred
# r15→r16→r17 on slot arithmetic) — LANDED in the r18 window:
# operators/text_analysis.py:bm25_topk now weights a repeated query
# term by QUERY MULTIPLICITY (qf) over an HONEST per-doc df (one df
# count per distinct term), the contract bm25_from_index adopted in
# r17. On distinct-term queries — every registered call site,
# including `bm25_search` and `rrf_hybrid_search` — the scores are
# bit-identical (qf = 1 and 1.0*x == x in IEEE), so the landing is
# value-neutral at certification; the staged bm25_topk_unified draft
# and the bm25_search REWRITES reservation are deleted.
