"""Text-analysis column expressions for large-scale training-data pipelines.

All pure JVM-side expressions (no Python in the hot path): tokenization,
language-ID heuristic, quality scoring, document fingerprinting. Each helper
returns a Column so callers compose them into declarative plans; the paired
DuckDB oracle SQL strings live in ``plans/llm_pipeline.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).alias("token_count")


def subword_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: count maximal runs of letters, runs of
    digits, and individual punctuation marks — the pre-tokenization split
    every BPE/WordPiece pipeline applies before merges, so it upper-bounds
    whitespace tokens and tracks real tokenizer counts far better on
    punctuated/code-mixed text. Pure regexp_extract_all, no UDF."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


def normalized_text(col: str | Column) -> Column:
    """Canonical form: lowercase, strip non-alphanumerics, collapse spaces."""
    t = F.lower(_c(col))
    t = F.regexp_replace(t, r"[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, r" +", " ")
    return F.trim(t)


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted unique
    token bag of the normalized text. Collapses permutation/duplication
    near-dups — the classic shuffle-resistant key for exact-ish dedup."""
    toks = F.split(normalized_text(col), " ")
    bag = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return F.md5(bag)


def char_ratio(col: str | Column, pattern: str) -> Column:
    """Fraction of characters matching a regex character class."""
    t = _c(col)
    n = F.length(t)
    matched = n - F.length(F.regexp_replace(t, pattern, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(matched / n)


#: Tiny per-language stopword markers for the heuristic language ID.
_LANG_MARKERS = (
    ("de", r"(?i)\b(der|die|und|das|nicht|ein|ist)\b"),
    ("es", r"(?i)\b(el|la|los|las|que|una|es)\b"),
    ("fr", r"(?i)\b(le|les|des|une|est|avec|pour)\b"),
)


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: CJK char ratio → zh; else the language whose
    stopword markers appear most (>=2 hits); default en. Deterministic and
    SQL-expressible — an n-gram model would slot in behind the same column
    contract."""
    t = _c(col)
    cjk = char_ratio(t, r"[\x{4e00}-\x{9fff}]")
    counts = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in _LANG_MARKERS}
    best = F.greatest(*counts.values())
    expr = F.when(cjk > 0.3, F.lit("zh"))
    for lang, _ in _LANG_MARKERS:
        expr = expr.when((best >= 2) & (counts[lang] == best), F.lit(lang))
    return expr.otherwise(F.lit("en"))


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics:
    length band, alphabetic ratio, punctuation ratio, mean word length.
    The standard pre-filter shape for web-scale corpus cleaning."""
    t = _c(col)
    n = F.length(t)
    alpha_ratio = char_ratio(t, r"[A-Za-z]")
    punct_ratio = char_ratio(t, r"[^\w\s]")
    toks = token_count(t)
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(n / toks)
    length_band = (
        F.when(n < 20, F.lit(0.0))
        .when(n < 100, F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    word_band = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (0.3 * length_band + 0.3 * alpha_ratio +
             0.2 * (1 - F.least(punct_ratio * 5, F.lit(1.0))) + 0.2 * word_band)
    return F.round(score, 4)


def bm25_topk(docs, query_terms: tuple[str, ...], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """BM25 full-text retrieval: top-k documents for a bag of query terms
    (Robertson/Sparck Jones probabilistic idf variant: ln(1 + (N-df+.5)/(df+.5))).

    Scale shape: ONE pass over the text computes a narrow per-doc frame
    (doc length + one term-frequency int per query term, via higher-order
    `filter` over the token array — no corpus-wide explode, no shuffle),
    eagerly materialized with localCheckpoint. The plan needs that frame
    in three branches (corpus stats, per-term document frequencies, the
    scored rows); Spark has no common-subplan reuse across join branches,
    so without the checkpoint each branch would re-run the regex
    normalization scan — the dominant cost. Materializing per-doc stats
    once is also what a production BM25 index build does. Corpus stats
    (N, avgdl) and per-term df are single-row / |query|-row frames that
    broadcast; the final top-k is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heap + driver merge of k rows,
    no global sort). Eager — see _EAGER in tests/test_plan_quality.py.

    Duplicate query terms weight their contribution by QUERY MULTIPLICITY
    (qf) over an HONEST per-doc df — one df count per distinct term
    (SURVEY 2.105 finding 7; the unified contract shared with
    operators/bm25_index.py:bm25_from_index). On distinct-term queries
    the scores are bit-identical to the pre-unification form (qf = 1 and
    1.0*x == x in IEEE); the old behavior on duplicates both
    double-weighted the contribution AND double-counted df, distorting
    idf — neither set semantics nor qf weighting.
    """
    from collections import Counter

    from pyspark.sql import functions as F

    qf = Counter(query_terms)
    terms = tuple(qf)
    toks_df = docs.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("_toks"),
    )
    def _tf(term: str):
        # term frequency WITHOUT a higher-order function: HOF lambdas run
        # interpreted per element; array_remove is a codegen'd collection
        # expression, so |toks| - |toks \ {term}| costs one vectorized pass
        return F.size("_toks") - F.size(F.array_remove("_toks", term))

    perdoc = toks_df.select(
        id_col,
        F.size("_toks").alias("_dl"),
        *[_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    ).localCheckpoint(eager=True)
    stats = perdoc.agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl"))
    tf = (
        perdoc.select(
            id_col,
            "_dl",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(t).alias("_tok"),
                        F.col(f"_tf_{i}").alias("_tf"),
                        F.lit(float(qf[t])).alias("_qf"),
                    )
                    for i, t in enumerate(terms)
                ])
            ).alias("_e"),
        )
        .select(id_col, "_dl", F.col("_e._tok").alias("_tok"),
                F.col("_e._tf").alias("_tf"), F.col("_e._qf").alias("_qf"))
        .where(F.col("_tf") > 0)
    )
    dft = tf.groupBy("_tok").agg(F.count("*").alias("_df"))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
    tf_part = (F.col("_tf") * (k1 + 1.0)) / (
        F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dft), "_tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(F.col("_qf") * idf * tf_part).alias("_s"))
    )
    # Rank by the ROUNDED score: avgdl is a float mean whose summation
    # order differs between engines, so two docs near-tied at the rank-k
    # boundary could be ordered differently by the raw last-ulp score.
    # Rounding first (then id as tiebreak) makes the top-k deterministic
    # across Spark and the DuckDB oracle.
    return (
        scored.select(id_col, F.round("_s", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def tfidf_topk(docs, query_terms: tuple[str, ...], k: int = 10,
               text_col: str = "text", id_col: str = "doc_id"):
    """Classic TF-IDF retrieval: top-k documents scoring
    ``sum_t tf(t,d) * ln(N/df(t))`` for a bag of query terms — the
    pre-BM25 baseline next to :func:`bm25_topk`, same scale shape (one
    localCheckpointed per-doc stats pass, broadcast df frame,
    TakeOrderedAndProject top-k; see bm25_topk's docstring for why).
    Rank by the ROUNDED score then id so near-ties at the k boundary
    resolve identically in both engines."""
    from pyspark.sql import functions as F

    toks_df = docs.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("_toks"),
    )

    def _tf(term: str):
        return F.size("_toks") - F.size(F.array_remove("_toks", term))

    perdoc = toks_df.select(
        id_col,
        *[_tf(t).alias(f"_tf_{i}") for i, t in enumerate(query_terms)],
    ).localCheckpoint(eager=True)
    n_docs = perdoc.agg(F.count("*").alias("_n"))
    tf = (
        perdoc.select(
            id_col,
            F.explode(
                F.array(*[
                    F.struct(F.lit(t).alias("_tok"),
                             F.col(f"_tf_{i}").alias("_tf"))
                    for i, t in enumerate(query_terms)
                ])
            ).alias("_e"),
        )
        .select(id_col, F.col("_e._tok").alias("_tok"), F.col("_e._tf").alias("_tf"))
        .where(F.col("_tf") > 0)
    )
    dft = tf.groupBy("_tok").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(dft), "_tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col)
        .agg(F.sum(F.col("_tf") * F.log(F.col("_n") / F.col("_df"))).alias("_s"))
    )
    return (
        scored.select(id_col, F.round("_s", 4).alias("tfidf"))
        .orderBy(F.desc("tfidf"), id_col)
        .limit(k)
    )
