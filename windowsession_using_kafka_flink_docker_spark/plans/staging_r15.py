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
  on distinct-term queries, so no rewrite slot was consumed); and SIX
  drafts promoted — ``event_type_crosscorr`` -> plans/relational.py,
  ``incremental_session_merge`` + ``late_event_session_repair`` ->
  plans/parity.py, ``ivf_index_persist_roundtrip`` +
  ``incremental_neardup_probe`` + ``incremental_bm25_search`` ->
  plans/llm_pipeline.py (shared helpers to operators/scratch.py and
  operators/similarity.py).

Remaining drafts (r16-drafted, target r19 — the two standing SURVEY
2.89 candidates, slot-limited since r12): isotonic regression via
bounded-domain PAV, and the semantic RRF hybrid-search leg (the
embeddings<->documents id alignment exists: vec_id == doc_id, verified
1:1 at every SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators import similarity as S
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

#: name -> (spark_fn, oracle_sql, description, tags) — the exact shape
#: the promotion round's @register calls will take; kept OUT of the
#: catalog until then.
STAGED: dict = {}


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


#: Registered-entry rewrites queued for a future window (empty — the
#: exact-e2 session family landed r17, capped_sessionization and the
#: bm25_topk qf-unification landed in the r18 window; see the module
#: docstring for the history).
REWRITES: dict = {}
