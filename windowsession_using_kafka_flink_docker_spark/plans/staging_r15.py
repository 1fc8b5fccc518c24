"""STAGING — drafts not yet registered (window-slot discipline).

Drafted code + DuckDB oracles land here, verified locally by
tests/test_staging_r15.py, and move behind ``@register`` the round the
driver window has free slots (tools/promote_staging.py does the
arithmetic). This module is deliberately NOT imported by
plans/catalog.py — nothing here can perturb a certified entry's
fingerprint closure.

Promotion history:

- r15: ``session_top2_per_user`` / ``session_top10_global`` ->
  plans/parity.py; the ``curation_pipeline_e2e`` single-scan rewrite
  landed in plans/curation.py.
- r16: the ``quality_scores`` exact-e4 rewrite landed in
  plans/llm_pipeline.py.
- r17: the 7-entry exact-e2 session-family rewrite landed in
  operators/sessionize.py + plans/parity.py (streaming twins inherit
  through streaming/pipeline.py).
- r18 window: the ``capped_sessionization`` exact-e2 rewrite landed in
  operators/capped_sessionize.py (streaming twin streaming/stateful.py
  moved to BIGINT-cents state in the same commit); the ``bm25_topk``
  qf-unification landed in operators/text_analysis.py (value-neutral
  on distinct-term queries, so no rewrite slot was consumed); and ALL
  EIGHT remaining drafts promoted — ``event_type_crosscorr`` +
  ``isotonic_monthly_revenue`` -> plans/relational.py,
  ``incremental_session_merge`` + ``late_event_session_repair`` ->
  plans/parity.py, ``ivf_index_persist_roundtrip`` +
  ``incremental_neardup_probe`` + ``incremental_bm25_search`` +
  ``semantic_rrf_hybrid_search`` -> plans/llm_pipeline.py (shared
  helpers to operators/scratch.py and operators/similarity.py; the
  staleness-bound relaxation 4 -> 5 opened the slots for the last
  two). Draft tests moved to tests/test_maintenance_entries.py,
  tests/test_analytics.py and tests/test_text_ops.py.

Current drafts (drafted in the r18 window, target r19 — ~36 free
slots after the staleness relaxation):

1. ``hll_ndv_by_event_type`` — portable HyperLogLog NDV registers over
   a deterministic md5-derived 60-bit hash, the MERGEABLE distinct
   sketch the KMV family lacks (KMV audits set algebra; HLL is the
   production register-merge shape: per-bucket MAX is a map-side
   partial combine, so 1000 executors merge 512-register states, never
   rows). Raw estimator, exactness discipline: the harmonic
   denominator is an exact BIGINT sum of two-powers, ONE IEEE division
   against a single precomputed constant, integer e4 error.
2. ``token_budget_packing`` — greedy sequential packing of documents
   into fixed-token-budget training sequences, the
   sequence-construction step every LLM data pipeline runs between
   curation and tokenization. Inherently stateful (a running
   accumulator RESETS at each bin boundary — not a prefix sum), so
   batch Spark needs ``applyInPandas`` per shard; the oracle is a
   DuckDB recursive CTE computing the identical fold.

New drafts register here as ``STAGED[name] = (spark_fn, oracle_sql,
description, tags)`` (the exact shape the promotion round's @register
call takes) and registered-entry rewrites as ``REWRITES[name] =
(spark_fn, oracle_sql)``; tests/test_staging_r15.py gates both
automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

#: name -> (spark_fn, oracle_sql, description, tags) — kept OUT of the
#: catalog until a window has free slots.
STAGED: dict = {}


# --------------------------------------------------------------------
# HyperLogLog NDV (drafted r18 window, targets r19). The register
# pipeline lives in operators/hll.py (portable-hash discipline,
# integer-only rho, exact BIGINT harmonic denominator, ONE IEEE
# division, RAW estimator with the register fill count emitted so the
# consumer applies linear counting downstream — see that module's
# docstring) — shared with the streaming register maintainer #27
# (streaming/analytics_twins.py IncrementalHllMaintainer), so
# stream == batch is one code path. Constants re-exported for the
# oracle and the tests.

from windowsession_using_kafka_flink_docker_spark.operators.hll import (  # noqa: E402
    HLL_C as _HLL_C,
    HLL_EMPTY_TERM as _HLL_EMPTY_TERM,
    HLL_M as _HLL_M,
    HLL_RMAX as _HLL_RMAX,
    hll_fold,
    hll_registers,
)


def hll_ndv_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: exact COUNT(DISTINCT) beside the
    512-register HLL raw estimate and register fill count.

    Scale shape: ONE scan computes (bucket, rho) per row; the register
    build is a (type, bucket)-keyed MAX — partial-aggregated map-side,
    so executors ship 512-row register states, not rows (the whole
    point of HLL at 100 TB: the sketch is mergeable by per-register
    max, unlike exact distinct whose shuffle carries every key). The
    estimate folds the registers per type (<= |types| x 512 rows).
    The exact count rides the same scan for the audit columns."""
    ev = load_table(spark, sf_dir, "events")
    folded = hll_fold(hll_registers(ev))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n_exact")))
    return (exact.join(folded, "event_type")
            .select("event_type", "n_exact", "filled_buckets",
                    "ndv_hll_raw"))


HLL_NDV_BY_EVENT_TYPE_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
b AS (
  SELECT event_type, h % {_HLL_M} AS bkt, h // {_HLL_M} AS w FROM h
),
regs AS (
  SELECT event_type, bkt,
         MAX(CASE WHEN w = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin(w)) END) AS r
  FROM b GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         SUM(1::BIGINT << ({_HLL_RMAX} - r))::BIGINT AS dobs,
         CAST(COUNT(*) AS BIGINT) AS nb
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type, nb AS filled_buckets,
         CAST(floor({_HLL_C!r} / CAST(dobs + ({_HLL_M} - nb)
              * {_HLL_EMPTY_TERM} AS DOUBLE)) AS BIGINT) AS ndv_hll_raw
  FROM per
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT x.event_type, x.n_exact, e.filled_buckets, e.ndv_hll_raw
FROM exact x JOIN est e USING (event_type)
"""

STAGED["hll_ndv_by_event_type"] = (
    hll_ndv_by_event_type, HLL_NDV_BY_EVENT_TYPE_ORACLE,
    "Per-event-type distinct users via 512-register HyperLogLog over "
    "the portable md5 hash, audited against the exact COUNT(DISTINCT). "
    "The register build is a (type, bucket) MAX — map-side combinable, "
    "so executors merge 512-row sketch states instead of shuffling "
    "keys (the mergeable-NDV shape the KMV family's set-algebra "
    "audits don't cover); rho uses integer/string ops only (length of "
    "bin(w), no log2), the harmonic denominator is an exact BIGINT "
    "two-power sum, and the raw estimate is ONE IEEE division by a "
    "shared precomputed constant, floor()ed identically on both "
    "engines. Emits the exact register fill count so consumers apply "
    "the small-range linear-counting correction downstream (ln's "
    "last-ulp is engine-dependent, so it stays out of the pinned "
    "columns; the accuracy test applies it in Python).",
    ("analytics", "sketch", "distinct", "exact"))


# --------------------------------------------------------------------
# Token-budget document packing (drafted r18 window, targets r19): the
# training-sequence construction step between curation and
# tokenization. PROMOTION-DAY NOTE: the registered entry must join
# tests/test_plan_quality.py's sanctioned-Python list (the fold is a
# deliberate applyInPandas stage, the capped-sessionize class — the
# generic no-Python gate would flag it otherwise). Greedy sequential fold per shard: docs in doc_id order
# accumulate into the current bin until the next doc would exceed the
# budget, which RESETS the accumulator — not a prefix sum, so the
# declarative API cannot express it (the capped-sessionize precedent);
# batch Spark runs the fold in applyInPandas per shard, and the oracle
# is a DuckDB recursive CTE computing the identical fold in lockstep
# across shards. Oversized docs (> budget) isolate into their own bin
# by the same rule, never split.

# The greedy fold lives in operators/packing.py (shared with the
# streaming bins maintainer #28, which must not import the plans
# layer); constants re-exported for the oracle and the tests.
from windowsession_using_kafka_flink_docker_spark.operators.packing import (  # noqa: E402
    PACK_BUDGET as _PACK_BUDGET,
    PACK_SHARDS as _PACK_SHARDS,
    bins_from_packed,
    pack_documents,
)


def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into training sequences of <= 2048 whitespace
    tokens, 16-way sharded by doc_id for parallelism (at 100 TB the
    shard count scales with the cluster; each shard's fold is O(docs
    in shard) in one Arrow-batched pass, and the per-bin aggregation
    that follows is map-side combinable). Emits one row per bin:
    (shard, bin_id, n_docs, bin_tokens, first_doc, last_doc)."""
    docs = load_table(spark, sf_dir, "documents")
    return bins_from_packed(pack_documents(docs))


def _packing_oracle() -> str:
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        _TOKC_SQL,
    )

    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, CAST({_TOKC_SQL} AS BIGINT) AS toks,
         doc_id % {_PACK_SHARDS} AS shard,
         row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
folded AS (
  SELECT shard, rn, doc_id, toks, 0::BIGINT AS bin_id, toks AS cum
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.toks,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN f.bin_id + 1 ELSE f.bin_id END,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN d.toks ELSE f.cum + d.toks END
  FROM folded f JOIN docs d ON d.shard = f.shard AND d.rn = f.rn + 1
)
SELECT shard, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM folded
GROUP BY 1, 2
"""


STAGED["token_budget_packing"] = (
    token_budget_packing, _packing_oracle(),
    "Greedy sequential packing of documents into <= 2048-token "
    "training sequences, 16-way sharded by doc_id — the sequence-"
    "construction step between curation and tokenization. The running "
    "accumulator RESETS at each bin boundary (not a prefix sum), so "
    "the fold runs in applyInPandas per shard (one Arrow pass, the "
    "capped-sessionize class of semantics); oversized docs isolate "
    "into their own bin by the same rule. Oracle: a DuckDB recursive "
    "CTE computing the identical fold across shards in lockstep; the "
    "per-bin aggregation after the fold is map-side combinable.",
    ("llm", "text", "stateful", "packing"))

# --------------------------------------------------------------------
# Late-doc packing repair (drafted r18 window, targets r19): the
# repair leg of the packing family — the late_event_session_repair
# symmetry applied to training-sequence bins. The streaming maintainer
# #28 REJECTS out-of-order docs loudly (a late doc belongs inside a
# closed bin); this batch entry is what the operator of that pipeline
# runs to fold the rejects in: re-pack ONLY the shards the late batch
# touches (per-shard recompute — bins are shard-local, so nothing
# corpus-wide moves), emit the per-shard repair audit. Oracle: both
# packings replayed closed-form (the recursive-CTE fold twice,
# restricted to affected shards).

#: Deterministic late plant: every 23rd doc (offset 7) arrives late.
_PACK_LATE_MOD, _PACK_LATE_OFF = 23, 7


def late_doc_packing_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-affected-shard repair audit: late doc count, bin count
    before/after the repack, and token mass added (equals the late
    docs' own token sum by conservation — packing repartitions tokens
    into bins, never creates or loses them).

    Scale: affected shards are the late batch's distinct shards; each
    repack is one shard-local Arrow fold over that shard's docs
    (fetched by a semi join on the shard key — shard-partitioned
    layouts prune the scan); untouched shards' bins are never read
    past the semi join."""
    from windowsession_using_kafka_flink_docker_spark.operators.packing import (
        bins_from_packed,
        pack_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_late = F.col("doc_id") % _PACK_LATE_MOD == _PACK_LATE_OFF
    late = docs.where(is_late)
    ontime = docs.where(~is_late)

    affected = (late.select((F.col("doc_id") % _PACK_SHARDS)
                            .alias("shard")).distinct())
    before = (bins_from_packed(pack_documents(ontime))
              .join(affected, "shard", "left_semi")
              .groupBy("shard")
              .agg(F.count(F.lit(1)).alias("bins_before"),
                   F.sum("bin_tokens").alias("tokens_before")))
    docs_aff = docs.where((F.col("doc_id") % _PACK_SHARDS)
                          .isin([r.shard for r in affected.collect()]))
    after = (bins_from_packed(pack_documents(docs_aff))
             .groupBy("shard")
             .agg(F.count(F.lit(1)).alias("bins_after"),
                  F.sum("bin_tokens").alias("tokens_after")))
    late_counts = (late.groupBy((F.col("doc_id") % _PACK_SHARDS)
                                .alias("shard"))
                   .agg(F.count(F.lit(1)).cast("long").alias("late_docs")))
    return (late_counts
            .join(after, "shard")
            .join(before, "shard", "left")
            .select("shard", "late_docs",
                    F.coalesce(F.col("bins_before"), F.lit(0))
                    .cast("long").alias("bins_before"),
                    F.col("bins_after").cast("long").alias("bins_after"),
                    (F.col("tokens_after")
                     - F.coalesce(F.col("tokens_before"), F.lit(0)))
                    .cast("long").alias("tokens_added")))


def _packing_repair_oracle() -> str:
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        _TOKC_SQL,
    )

    fold = """
  SELECT doc_id, CAST({tokc} AS BIGINT) AS toks,
         doc_id % {shards} AS shard,
         row_number() OVER (PARTITION BY doc_id % {shards}
                            ORDER BY doc_id) AS rn
  FROM {src}
  WHERE doc_id % {shards} IN (SELECT shard FROM affected)
"""
    return f"""
WITH RECURSIVE affected AS (
  SELECT DISTINCT doc_id % {_PACK_SHARDS} AS shard FROM documents
  WHERE doc_id % {_PACK_LATE_MOD} = {_PACK_LATE_OFF}
),
docs_b AS ({fold.format(tokc=_TOKC_SQL, shards=_PACK_SHARDS,
                        src=f'''(SELECT * FROM documents
           WHERE doc_id % {_PACK_LATE_MOD} <> {_PACK_LATE_OFF})''')}),
folded_b AS (
  SELECT shard, rn, toks, 0::BIGINT AS bin_id, toks AS cum
  FROM docs_b WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.toks,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN f.bin_id + 1 ELSE f.bin_id END,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN d.toks ELSE f.cum + d.toks END
  FROM folded_b f JOIN docs_b d ON d.shard = f.shard AND d.rn = f.rn + 1
),
before AS (
  SELECT shard, CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS bins_before,
         CAST(SUM(toks) AS BIGINT) AS tokens_before
  FROM folded_b GROUP BY shard
),
docs_a AS ({fold.format(tokc=_TOKC_SQL, shards=_PACK_SHARDS,
                        src='documents')}),
folded_a AS (
  SELECT shard, rn, toks, 0::BIGINT AS bin_id, toks AS cum
  FROM docs_a WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.toks,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN f.bin_id + 1 ELSE f.bin_id END,
         CASE WHEN f.cum + d.toks > {_PACK_BUDGET}
              THEN d.toks ELSE f.cum + d.toks END
  FROM folded_a f JOIN docs_a d ON d.shard = f.shard AND d.rn = f.rn + 1
),
after AS (
  SELECT shard, CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS bins_after,
         CAST(SUM(toks) AS BIGINT) AS tokens_after
  FROM folded_a GROUP BY shard
),
late AS (
  SELECT doc_id % {_PACK_SHARDS} AS shard,
         CAST(COUNT(*) AS BIGINT) AS late_docs
  FROM documents
  WHERE doc_id % {_PACK_LATE_MOD} = {_PACK_LATE_OFF}
  GROUP BY 1
)
SELECT l.shard, l.late_docs,
       COALESCE(b.bins_before, 0) AS bins_before,
       a.bins_after,
       a.tokens_after - COALESCE(b.tokens_before, 0) AS tokens_added
FROM late l
JOIN after a ON a.shard = l.shard
LEFT JOIN before b ON b.shard = l.shard
"""


STAGED["late_doc_packing_repair"] = (
    late_doc_packing_repair, _packing_repair_oracle(),
    "Late-doc packing repair: re-pack ONLY the shards a late batch "
    "touches (bins are shard-local, so the repair is a per-shard "
    "Arrow fold over that shard's docs — nothing corpus-wide moves; "
    "untouched shards' bins are never read past the semi join) and "
    "emit the per-shard audit (late count, bins before/after, token "
    "mass added — equal to the late docs' own tokens by "
    "conservation). The batch repair leg for the docs the streaming "
    "bins maintainer (#28) rejects as out-of-order. Oracle: both "
    "packings replayed closed-form via the recursive-CTE fold, "
    "restricted to affected shards.",
    ("llm", "text", "stateful", "packing", "incremental"))


# --------------------------------------------------------------------
# Corpus snapshot diff (drafted r18 window, targets r19): dataset
# versioning for training corpora — the audit a pipeline runs between
# two corpus snapshots before retraining ("what changed since the
# last crawl?"). Deterministic two-version plant over the one
# documents table: v1 excludes every 13th doc (offset 5 — those are
# ADDED in v2), v2 excludes every 19th (offset 11 — REMOVED) and
# rewrites every 17th's text (offset 2 — CHANGED, detected by content
# hash, never by text comparison). Full outer join on doc_id, md5
# content compare, unchanged rows dropped.

_DIFF_ADD_MOD, _DIFF_ADD_OFF = 13, 5     # in v2 only
_DIFF_DEL_MOD, _DIFF_DEL_OFF = 19, 11    # in v1 only
_DIFF_EDIT_MOD, _DIFF_EDIT_OFF = 17, 2   # text rewritten in v2
_DIFF_EDIT_SUFFIX = " [rev2]"


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per non-identical doc across the two snapshots:
    (doc_id, change in {'added','removed','changed'}).

    Scale: both sides reduce to (doc_id, md5) before the join — a
    16-byte hash per doc, never the text; on a doc_id-bucketed layout
    the full outer join co-locates with ZERO exchanges (the bucketed-
    sessionization escape hatch applies verbatim), and added/removed
    detection is the join's null pattern, not an anti-join pass. A doc
    edited AND re-added keeps one class per doc by construction
    (classes come from id presence + hash inequality)."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = (docs.where(F.col("doc_id") % _DIFF_ADD_MOD != _DIFF_ADD_OFF)
          .select("doc_id", F.md5("text").alias("_h1")))
    edited = F.when(F.col("doc_id") % _DIFF_EDIT_MOD == _DIFF_EDIT_OFF,
                    F.concat(F.col("text"), F.lit(_DIFF_EDIT_SUFFIX))
                    ).otherwise(F.col("text"))
    v2 = (docs.where(F.col("doc_id") % _DIFF_DEL_MOD != _DIFF_DEL_OFF)
          .select("doc_id", F.md5(edited).alias("_h2")))
    joined = v1.join(v2, "doc_id", "full_outer")
    change = (F.when(F.col("_h1").isNull(), F.lit("added"))
              .when(F.col("_h2").isNull(), F.lit("removed"))
              .when(F.col("_h1") != F.col("_h2"), F.lit("changed")))
    return (joined.select("doc_id", change.alias("change"))
            .where(F.col("change").isNotNull()))


CORPUS_SNAPSHOT_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT doc_id, md5(text) AS h1 FROM documents
  WHERE doc_id % {_DIFF_ADD_MOD} <> {_DIFF_ADD_OFF}
),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_DIFF_EDIT_MOD} = {_DIFF_EDIT_OFF}
                  THEN text || '{_DIFF_EDIT_SUFFIX}' ELSE text END) AS h2
  FROM documents
  WHERE doc_id % {_DIFF_DEL_MOD} <> {_DIFF_DEL_OFF}
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'changed' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE (CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'changed' END) IS NOT NULL
"""

STAGED["corpus_snapshot_diff"] = (
    corpus_snapshot_diff, CORPUS_SNAPSHOT_DIFF_ORACLE,
    "Dataset-versioning diff between two corpus snapshots: one row "
    "per added/removed/changed doc, change detected by md5 content "
    "hash (both sides reduce to (doc_id, hash) before the full outer "
    "join — 16 bytes per doc, never the text; a doc_id-bucketed "
    "layout co-locates the join with zero exchanges). The audit a "
    "training pipeline runs between crawls before retraining; "
    "deterministic two-version plant over the documents table "
    "(every 13th added, every 19th removed, every 17th edited).",
    ("llm", "curation", "versioning", "dedup"))


#: Registered-entry rewrites queued for a future window: name ->
#: (spark_fn, oracle_sql). Landing day replaces the registered entry's
#: body/oracle and clears the queue slot.
REWRITES: dict = {}
