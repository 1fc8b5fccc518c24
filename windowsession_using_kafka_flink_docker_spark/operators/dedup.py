"""Deduplication operators: exact, fingerprint, MinHash+LSH, SimHash.

Scale design: every variant is a pure DataFrame plan.

- exact/fingerprint: one hash-groupBy shuffle keyed on the digest — the
  digest (not the document) is the shuffle key, so 100 TB of text shuffles
  only (key, id) pairs after map-side projection.
- MinHash+LSH: signatures are computed scan-side with higher-order array
  expressions (no Python); candidate generation is an equi-join on
  (band_id, band_hash) — the classic banding scheme, so the cross-product
  never materializes. Hot buckets (boilerplate shingles) are the skew risk
  at scale; AQE skew-join handles moderate skew, and ``max_bucket_size``
  drops degenerate buckets exactly like production LSH pipelines do.
- SimHash: 64-bit signature via per-bit majority vote over token hashes,
  expressed as array aggregates; near-dup = small Hamming distance within
  LSH-style bucket on signature prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic seeds for the MinHash permutation family (a*h+b mod p).
# p = 2^31-1 keeps a*h + b < 2^62 — no int64 overflow inside the JVM
# expression (a, h < p).
_MERSENNE_P = (1 << 31) - 1


def _perm_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs derived from a seeded LCG (no RNG import
    so results are stable across Python versions)."""
    params = []
    x = seed
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (_MERSENNE_P - 1)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE_P
        params.append((a, b))
    return params


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 digest; keeps the smallest id as the
    canonical representative. Returns (keep_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles_expr(text_col: str, k: int = 5) -> F.Column:
    """Distinct character k-shingles of the normalized text, as an array
    column — built with sequence/transform so it runs inside codegen."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    norm = normalized_text(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, k)))


def word_shingles_expr(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of the normalized text (array<string>).

    Word shingles are the right unit for documents: character shingles of
    natural text collide on common substrings, which degenerates LSH
    buckets and inverted indexes at scale; word n-grams keep bucket sizes
    near-uniform.
    """
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    toks = F.split(normalized_text(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def minhash_signature(shingles: F.Column, num_hashes: int = 64, seed: int = 42) -> F.Column:
    """MinHash signature (array<bigint>) over a shingle array: base-hash each
    shingle once with xxhash64, then n universal-hash permutations, min per
    permutation."""
    base = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)
    sigs = [
        F.array_min(F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % _MERSENNE_P))
        for a, b in _perm_params(num_hashes, seed)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, num_hashes: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5, unit: str = "word",
                      max_bucket_size: int = 1000) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= jaccard_threshold. Candidate recall is governed by the
    (bands, rows-per-band) S-curve; verification makes precision exact.
    """
    rows = num_hashes // bands
    sh = word_shingles_expr(text_col, k) if unit == "word" else shingles_expr(text_col, k)
    docs = df.select(
        F.col(id_col).alias("_id"),
        sh.alias("_sh"),
    ).persist()  # signatures + verification both read this; compute shingles once

    # Slim banding table: (id, band_id, band_hash) only — candidate
    # generation never carries shingle arrays through the shuffle.
    sig = minhash_signature(F.col("_sh"), num_hashes)
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(F.slice(sig, b * rows + 1, rows).cast("string")).alias("band_hash"),
        )
        for b in range(bands)
    ])
    banded = (
        docs.select("_id", F.explode(band_cols).alias("bh"))
        .select("_id", "bh.band_id", "bh.band_hash")
        .persist()
    )

    # Drop degenerate buckets (e.g., boilerplate collisions) before the
    # self-join — at 100 TB a single mega-bucket would otherwise quadratically
    # dominate the stage.
    big_buckets = (
        banded.groupBy("band_id", "band_hash").count()
        .where(F.col("count") > max_bucket_size)
        .select("band_id", "band_hash", F.lit(True).alias("_skip"))
    )
    pruned = (
        banded.join(F.broadcast(big_buckets), ["band_id", "band_hash"], "left")
        .where(F.col("_skip").isNull())
    )

    cand = (
        pruned.alias("a")
        .join(pruned.alias("b"), ["band_id", "band_hash"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Fetch shingle arrays only for surviving candidates.
    verified = (
        cand.join(docs.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a")
        .join(docs.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return (
        verified.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, jaccard_threshold: float = 0.5,
                        unit: str = "word") -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked on a shared-shingle
    prefix to avoid the full cross join: a pair can only reach threshold t
    if it shares at least one of the first few shingles under a canonical
    ordering (prefix filtering, cf. set-similarity join literature).

    With ``prefix_tokens`` sized from the threshold this is exact for
    pairs at/above threshold; here we keep the blocking simple — any
    shared shingle — which is a superset (always exact recall), pruned
    cheaply by distinct shingle join + groupBy.
    """
    sh = word_shingles_expr(text_col, k) if unit == "word" else shingles_expr(text_col, k)
    docs = df.select(F.col(id_col).alias("_id"), sh.alias("_sh"))
    # Inverted index: (shingle, id); pairs sharing >= 1 shingle are candidates.
    inv = docs.select("_id", F.explode("_sh").alias("s"))
    pairs = (
        inv.alias("a").join(inv.alias("b"), "s")
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sized = docs.select(F.col("_id"), F.size("_sh").alias("n"))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        pairs.join(sized.select(F.col("_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sized.select(F.col("_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def token_hashes_expr(text_col: str) -> F.Column:
    """xxhash64 of each distinct normalized token, as array<long>."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    toks = F.array_distinct(F.split(normalized_text(text_col), " "))
    return F.transform(toks, lambda t: F.xxhash64(t))


def simhash_expr(hashes_col: F.Column, bits: int = 64) -> F.Column:
    """64-bit SimHash as a bigint from a precomputed token-hash array:
    per-bit majority vote, assembled with shift/or. Pure JVM expressions;
    the Python loop only builds the (fixed-size) expression tree."""
    def _vote(b: int) -> F.Column:
        # closure (not default-arg): pyspark binds every lambda param as a
        # Column, so the merge lambda must have exactly (acc, h).
        return F.aggregate(
            hashes_col,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for b in range(bits):
        vote = _vote(b)
        sig = sig.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    signature chunks (a pair within Hamming distance 3 of a 64-bit hash
    must agree exactly on at least one of 4 chunks — pigeonhole)."""
    docs = (
        df.select(F.col(id_col).alias("_id"), token_hashes_expr(text_col).alias("_h"))
        .select("_id", simhash_expr(F.col("_h")).alias("_sig"))
    )
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk_id"),
                 F.shiftright(F.col("_sig"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
        for c in range(4)
    ])
    blocked = docs.select("_id", "_sig", F.explode(chunks).alias("c")).select(
        "_id", "_sig", "c.chunk_id", "c.chunk")
    a = blocked.select("chunk_id", "chunk", F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    b = blocked.select("chunk_id", "chunk", F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
