"""Data-curation queries for LLM training pipelines: boilerplate removal,
Gopher-style quality gating, deterministic stratified sampling, int8
embedding quantization.

These extend the north-star surface (SURVEY.md §2.11) with the curation
passes that sit between raw crawl and training shards in production
pipelines (CCNet-style repeated-span removal, Gopher's rule-based quality
filters, per-language mixture sampling, storage-side vector quantization).
Every query is a pure DataFrame plan with a DuckDB oracle; float outputs
are rounded on both sides, digests are md5 (identical hex in both
engines).

Scale notes per query are on the registrations; the common discipline:
shuffles carry hashes/ids, never document payloads, and every
data-dependent small set (the boilerplate list) is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.catalog import register
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

# --------------------------------------------------------------------------
# Boilerplate sentence removal (CCNet-style repeated-span dedup)
# --------------------------------------------------------------------------

#: A sentence appearing in at least this many documents is boilerplate.
BOILERPLATE_MIN_DOCS = 10

#: The synthetic corpus is one period-free word soup per document, so the
#: catalog query PLANTS deterministic boilerplate footers (the
#: embedding_neardups / pii_redaction non-vacuity lesson): every 3rd doc
#: gets a "subscribe" footer, every 4th a "rights" footer — deterministic
#: functions of doc_id in BOTH engines, so removal is provable.
_FOOTER_SUBSCRIBE = "subscribe to our newsletter today"
_FOOTER_RIGHTS = "all rights reserved 2024"

_PLANT_SQL = (
    "text"
    f" || CASE WHEN doc_id % 3 = 0 THEN '. {_FOOTER_SUBSCRIBE}' ELSE '' END"
    f" || CASE WHEN doc_id % 4 = 0 THEN '. {_FOOTER_RIGHTS}' ELSE '' END"
)


def _planted_text() -> F.Column:
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(f". {_FOOTER_SUBSCRIBE}")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit(f". {_FOOTER_RIGHTS}")).otherwise(F.lit("")),
    )


def boilerplate_removal(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_docs: int = BOILERPLATE_MIN_DOCS) -> DataFrame:
    """Remove sentences that repeat across >= ``min_docs`` documents
    (subscription footers, legal lines — the CCNet repeated-span pass).

    Returns (doc_id, n_sentences, n_removed, clean_digest) where
    clean_digest is md5 of the kept sentences rejoined in original order.

    Scale design: sentences explode once with their md5; document frequency
    and the anti-join both run on the 32-hex hash, so the two shuffles
    carry (doc_id, pos, hash) — never the sentence text twice; the
    boilerplate list (sentences with df >= min_docs) is tiny by definition
    and broadcasts.
    """
    sents = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias("_pos", "_s"),
        )
        .withColumn("_h", F.md5(F.col("_s")))
    )
    boiler = (
        sents.groupBy("_h")
        .agg(F.count_distinct("_id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_h")
    )
    kept = sents.join(F.broadcast(boiler), "_h", "left_anti")
    n_total = sents.groupBy("_id").agg(F.count("*").alias("n_sentences"))
    clean = (
        kept.groupBy("_id")
        .agg(
            F.count("*").alias("_n_kept"),
            F.md5(
                F.concat_ws(
                    ". ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                        lambda x: x["_s"],
                    ),
                )
            ).alias("clean_digest"),
        )
    )
    return (
        n_total.join(clean, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_sentences",
            (F.col("n_sentences") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .alias("n_removed"),
            # a doc that was ALL boilerplate keeps the digest of ""
            F.coalesce(F.col("clean_digest"), F.md5(F.lit(""))).alias("clean_digest"),
        )
    )


@register(
    "boilerplate_removal",
    oracle=f"""
WITH planted AS (
  SELECT doc_id, {_PLANT_SQL} AS text
  FROM documents
),
sents AS (
  SELECT doc_id, u['pos'] AS pos, u['sent'] AS sent, md5(u['sent']) AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(text, '. '),
                                 (s, i) -> {{'pos': i, 'sent': s}})) AS u
    FROM planted
  )
),
boiler AS (
  SELECT h FROM sents GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
),
kept AS (
  SELECT * FROM sents WHERE h NOT IN (SELECT h FROM boiler)
),
totals AS (
  SELECT doc_id, COUNT(*) AS n_sentences FROM sents GROUP BY doc_id
),
clean AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(sent, '. ' ORDER BY pos)) AS clean_digest
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_sentences,
       t.n_sentences - COALESCE(c.n_kept, 0) AS n_removed,
       COALESCE(c.clean_digest, md5('')) AS clean_digest
FROM totals t LEFT JOIN clean c ON t.doc_id = c.doc_id
""",
    description="CCNet-style boilerplate removal: sentences repeating "
                "across >= 10 docs (planted subscribe/rights footers — "
                "non-vacuous by construction) are stripped; df counting "
                "and the anti-join run on sentence md5, the boilerplate "
                "list broadcasts",
    bench=True,
    tags=("llm", "curation", "dedup"),
)
def boilerplate_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _planted_text().alias("text")
    )
    return boilerplate_removal(docs)


# --------------------------------------------------------------------------
# Gopher-style rule-based quality gate
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "gopher_quality_flags",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(w) AS n_words,
         ROUND(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 4) AS mean_word_len,
         ROUND(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0 / len(w), 4) AS alpha_frac,
         ROUND(len(list_filter(w, x -> x = '#' OR x = '...')) * 1.0 / len(w), 4) AS symbol_ratio,
         len(list_distinct(list_filter(w, x -> list_contains({list(_STOPWORDS)!r}, lower(x))))) AS n_stopwords
  FROM toks
)
SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
       alpha_frac, symbol_ratio, CAST(n_stopwords AS BIGINT) AS n_stopwords,
       (n_words BETWEEN 50 AND 100000)
         AND (mean_word_len BETWEEN 3 AND 10)
         AND (alpha_frac > 0.8)
         AND (symbol_ratio < 0.1)
         AND (n_stopwords >= 2) AS keep
FROM m
""",
    description="Gopher-style rule-based quality gate: word count in "
                "[50, 100k], mean word length in [3, 10], alpha-word "
                "fraction > 0.8, symbol ratio < 0.1, >= 2 distinct "
                "stopwords. Pure scan-side expressions — zero shuffle; "
                "the per-document cost is O(tokens)",
    tags=("llm", "curation", "quality"),
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("w")
    )
    n = F.size("w")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = toks.select(
        "doc_id", "lang",
        n.cast("long").alias("n_words"),
        F.round(
            F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)) / n, 4
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]"))) / n, 4
        ).alias("alpha_frac"),
        F.round(
            F.size(F.filter("w", lambda x: (x == "#") | (x == "..."))) / n, 4
        ).alias("symbol_ratio"),
        F.size(
            F.array_distinct(
                F.filter("w", lambda x: F.array_contains(stop_arr, F.lower(x)))
            )
        ).cast("long").alias("n_stopwords"),
    )
    return m.select(
        "*",
        (
            F.col("n_words").between(50, 100_000)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("alpha_frac") > 0.8)
            & (F.col("symbol_ratio") < 0.1)
            & (F.col("n_stopwords") >= 2)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# Deterministic per-language stratified sampling (mixture weights)
# --------------------------------------------------------------------------

#: Per-language sampling rates (the training-mixture knob); en is the
#: majority class and is downsampled hardest.
SAMPLE_RATES = {"en": 0.5, "zh": 1.0, "es": 0.8, "fr": 0.8, "de": 0.8}

#: Unknown languages default to this rate.
DEFAULT_RATE = 0.25


def _hex_threshold(rate: float) -> str:
    """8-hex-digit threshold such that a uniform md5 prefix is < threshold
    with probability ``rate``. Comparing lowercase hex strings is monotone
    in the underlying 32-bit value, so the SAME string comparison works in
    any engine with md5 — no hex-to-int support needed."""
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def stratified_sample(docs: DataFrame, rates: dict[str, float] = None,
                      default_rate: float = DEFAULT_RATE,
                      id_col: str = "doc_id", strat_col: str = "lang") -> DataFrame:
    """Deterministic hash-based stratified sample: keep a row iff the first
    8 hex chars of md5(id) fall below the stratum's threshold.

    Content-hash sampling (never ``rand()``): the same document set is
    selected on every run, every engine, every retry — reproducible
    training mixtures, and downstream joins on the sample are stable.
    Scan-side filter, zero shuffle; at 100 TB this is a pushed-down
    predicate over the id column only.
    """
    rates = SAMPLE_RATES if rates is None else rates
    thresh = F.lit(_hex_threshold(default_rate))
    for lang, rate in rates.items():
        thresh = F.when(F.col(strat_col) == lang, F.lit(_hex_threshold(rate))).otherwise(thresh)
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return docs.where(u < thresh).select(id_col, strat_col)


@register(
    "stratified_sample",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang
        {' '.join(f"WHEN '{lang}' THEN '{_hex_threshold(r)}'" for lang, r in SAMPLE_RATES.items())}
        ELSE '{_hex_threshold(DEFAULT_RATE)}'
      END
""",
    description="Deterministic per-language stratified sampling via md5 "
                "prefix thresholds (training-mixture weights): identical "
                "selection on every run/engine/retry, zero shuffle, "
                "filter pushes to the scan",
    tags=("llm", "curation", "sampling"),
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Int8 embedding quantization (storage-side compression)
# --------------------------------------------------------------------------

@register(
    "embedding_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, scale,
         CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e, x -> CAST(round(x / scale, 0) AS BIGINT))
         END AS qv,
         e
  FROM s
)
SELECT vec_id,
       ROUND(scale, 6) AS scale_r,
       CAST(list_sum(qv) AS BIGINT) AS q_checksum,
       ROUND(list_max(list_transform(list_zip(e, qv),
                                     p -> abs(p[1] - p[2] * scale))), 4) AS max_abs_err
FROM q
""",
    description="Int8 symmetric max-abs quantization of the embedding "
                "column (4x storage cut for ANN candidate sets): per-"
                "vector scale = max|x|/127, q = round(x/scale). Pure "
                "scan-side array expressions; the reconstruction-error "
                "bound (<= scale/2) is asserted by pytest",
    tags=("llm", "embedding", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    s = emb.select(
        "vec_id", e.alias("e"),
        (F.array_max(F.transform(e, F.abs)) / 127.0).alias("scale"),
    )
    q = s.withColumn(
        "qv",
        F.when(
            F.col("scale") == 0,
            F.transform("e", lambda x: F.lit(0).cast("long")),
        ).otherwise(
            F.transform("e", lambda x: F.round(x / F.col("scale"), 0).cast("long"))
        ),
    )
    err = F.array_max(
        F.zip_with("e", "qv", lambda x, qq: F.abs(x - qq * F.col("scale")))
    )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_checksum"),
        F.round(err, 4).alias("max_abs_err"),
    )
