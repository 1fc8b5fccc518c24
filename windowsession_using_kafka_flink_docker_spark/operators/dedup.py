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

from pyspark.sql import DataFrame, Window
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


def eager_filled_persist(df: DataFrame) -> DataFrame:
    """Materialization barrier for a frame with CONCURRENT consumers:
    ``persist()`` (MEMORY_AND_DISK — spills instead of OOMing) followed by
    a synchronous fill, so consumers planned as concurrently-submitted
    broadcast/shuffle builds can never race past an unfilled cache and
    re-run the producing pipeline (the r17 bug: 2-4x duplicated signature
    chains per query).

    Versus ``localCheckpoint(eager=True)``: the checkpoint truncates
    lineage — an executor loss after it FAILS the job instead of
    recomputing (spot nodes, dynamic allocation) — and its blocks are
    pinned until ContextCleaner GC; the filled persist keeps lineage,
    spills under pressure, and the caller unpersists deterministically.
    The ``count()`` scans every partition of the cached plan, so the
    fill is complete, not partial. The r18 measurements picked the
    mechanism per site: the basket stage (plans/relational.py) uses this
    helper (its frames are re-read across queries), while the dedup
    mid-frames above keep the checkpoint — columnar cache encode/decode
    across their 3-4 same-plan consumer scans measured 8-14% of query
    wall at sf0.1, more than the checkpoint's caveats cost locally (the
    tradeoffs are stated at each site)."""
    df = df.persist()
    df.count()
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 digest; keeps the smallest id as the
    canonical representative. Returns (keep_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def tokens_expr(text_col: str) -> F.Column:
    """Whitespace tokens of the normalized text (array<string>).

    ALWAYS materialize this as its own column before building shingles from
    it: normalization is two regexp_replace passes over the whole document,
    and the shingle builders reference the token array once per n-gram
    position — inlined, the normalization would re-run per shingle (the
    expression-blowup class of bug; higher-order lambdas sit outside
    codegen's common-subexpression elimination)."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    return F.split(normalized_text(text_col), " ")


def char_shingles_from_norm(norm: F.Column, k: int = 5) -> F.Column:
    """Distinct character k-shingles from a *materialized* normalized-text
    column."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, k)))


def shingles_expr(text_col: str, k: int = 5) -> F.Column:
    """Distinct character k-shingles of the normalized text. Convenience
    form for small inputs/tests — hot paths should stage
    ``normalized_text`` as a column and call
    :func:`char_shingles_from_norm` (see :func:`tokens_expr` note)."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    return char_shingles_from_norm(normalized_text(text_col), k)


def word_shingles_from_tokens(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles (array<string>) from a *materialized*
    token-array column.

    Word shingles are the right unit for documents: character shingles of
    natural text collide on common substrings, which degenerates LSH
    buckets and inverted indexes at scale; word n-grams keep bucket sizes
    near-uniform.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    # try_element_at (not element_at): documents shorter than n tokens index
    # past the end, which raises under Spark 4 ANSI mode; try_element_at
    # yields NULL and concat_ws skips it — the same semantics as the DuckDB
    # oracle's out-of-bounds list index.
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def word_shingles_expr(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles straight from text. Convenience form for small
    inputs/tests — hot paths should materialize :func:`tokens_expr` as a
    column first and call :func:`word_shingles_from_tokens` (see the
    evaluation-cost note there)."""
    return word_shingles_from_tokens(tokens_expr(text_col), n)


def base_hashes_expr(shingles: F.Column) -> F.Column:
    """xxhash64 of each shingle, folded into the Mersenne field
    (array<bigint>). Materialize this as its own column *before* feeding it
    to :func:`minhash_signature` — the signature references it ``num_hashes``
    times, and an inlined expression would be re-evaluated per permutation
    (higher-order lambdas sit outside whole-stage codegen's subexpression
    elimination)."""
    return F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)


def base_hashes_md5_expr(shingles: F.Column) -> F.Column:
    """Engine-portable base hash: 32-bit md5 prefix folded into the
    Mersenne field. Slower than xxhash64 (the production default) but
    bit-replayable in DuckDB as
    ``('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647`` — the same
    md5-position playbook as the KMV/CMS/Bloom audits, which is what lets
    the driver hash-check a *measured* LSH recall instead of trusting an
    asserted one (see plans/llm_pipeline.py minhash_recall_vs_exact)."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 8),
                         16, 10).cast("long") % _MERSENNE_P)


def minhash_signature(base: F.Column, num_hashes: int = 64, seed: int = 42) -> F.Column:
    """MinHash signature (array<bigint>) over a *pre-hashed* shingle array
    (see :func:`base_hashes_expr`): n universal-hash permutations
    (a*h+b mod p), min per permutation."""
    sigs = [
        F.array_min(F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % _MERSENNE_P))
        for a, b in _perm_params(num_hashes, seed)
    ]
    return F.array(*sigs)


def _staged_shingles(df: DataFrame, text_col: str, id_col: str, k: int,
                     unit: str) -> DataFrame:
    """(_id, _sh) with tokenization materialized in its own projection so
    the two regexp_replace normalization passes run once per document, not
    once per shingle (CollapseProject keeps a non-cheap alias that is
    referenced more than once)."""
    if unit == "word":
        toks = df.select(F.col(id_col).alias("_id"), tokens_expr(text_col).alias("_t"))
        return toks.select("_id", word_shingles_from_tokens(F.col("_t"), k).alias("_sh"))
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    norm = df.select(F.col(id_col).alias("_id"), normalized_text(text_col).alias("_n"))
    return norm.select("_id", char_shingles_from_norm(F.col("_n"), k).alias("_sh"))


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, unit: str = "word") -> DataFrame:
    """PERSISTED (_id, _sh) shingle frame — the shared tokenize+shingle
    stage of a dedup pipeline. MinHash-LSH and the exact ngram-Jaccard
    ssjoin consume the *same* word-3-shingle table; in production this is
    materialized once per corpus and reused across every near-dup pass, so
    builders accept it pre-built (see the ``shingles=`` parameter). Caller
    owns the persist (unpersist when done — the plans layer memoizes one
    per (app, sf))."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # Repartition first: shingle cost is per-document CPU, so parallelism
    # must track cores, not input file count.
    return _staged_shingles(
        df.repartition(n_part, F.col(id_col)), text_col, id_col, k, unit
    ).persist()



def minhash_signature_udf(num_hashes: int = 64, seed: int = 42):
    """Arrow-batched MinHash signature — bit-for-bit equal to
    :func:`minhash_signature` (pinned in tests/test_dedup_similarity.py)
    but one vectorized (perms x shingles) numpy matrix per document
    instead of ``num_hashes`` interpreted array_min/transform folds —
    the same 2x win the SimHash signature got. No overflow: base hashes
    and ``a`` live in the Mersenne field (< 2^31), so a*h + b < 2^62
    fits int64 exactly as the expression form's JVM longs do."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = _perm_params(num_hashes, seed)
    a = np.array([p_[0] for p_ in params], dtype=np.int64)[:, None]
    b = np.array([p_[1] for p_ in params], dtype=np.int64)[:, None]

    def _sig(base_lists):
        out = []
        for hl in base_lists:
            h = np.asarray(hl, dtype=np.int64)
            if h.size == 0:
                # array_min over empty transform -> NULL per permutation;
                # mirror the expression form with None entries
                out.append([None] * num_hashes)
                continue
            mins = ((a * h[None, :] + b) % _MERSENNE_P).min(axis=1)
            out.append(mins.tolist())
        return pd.Series(out)

    _sig.__annotations__ = {"base_lists": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "array<long>")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, num_hashes: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5, unit: str = "word",
                      max_bucket_size: int = 1000,
                      shingles: DataFrame | None = None,
                      portable: bool = False) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= jaccard_threshold. Candidate recall is governed by the
    (bands, rows-per-band) S-curve; verification makes precision exact.

    ``portable=True`` swaps the xxhash64 base/band hashes for md5-derived
    ones so the ENTIRE pipeline (signatures, banding, bucket cap,
    candidates, verification) replays bit-identically in DuckDB — the
    audit mode behind the driver-hashed recall row. Same algorithm, same
    permutation family, same S-curve; only the (uniform) base hash
    differs, so the measured recall is representative of the production
    xxhash path.
    """
    rows = num_hashes // bands
    owns_shingles = shingles is None
    # signatures + verification both read the shingle frame; compute once
    docs = shingle_table(df, text_col, id_col, k, unit) if owns_shingles else shingles

    # Evaluation discipline (the difference between O(perms) and
    # O(perms * bands) per row): `_base` and `_sig` are materialized as
    # real columns in *separate* projections. CollapseProject leaves a
    # non-cheap alias alone when it is referenced more than once, so the
    # base hashes are computed once (not once per permutation) and the
    # signature once (not once per band struct).
    base_fn = base_hashes_md5_expr if portable else base_hashes_expr
    sig_df = (
        docs.select("_id", base_fn(F.col("_sh")).alias("_base"))
        .select("_id",
                minhash_signature_udf(num_hashes)(F.col("_base"))
                .alias("_sig"))
    )

    def _band_hash(b: int) -> F.Column:
        sl = F.slice(F.col("_sig"), b * rows + 1, rows)
        if portable:
            # md5 over the comma-joined signature slice — DuckDB:
            # md5(array_to_string(list_slice(sig, lo, hi), ','))
            return F.md5(F.array_join(
                F.transform(sl, lambda x: x.cast("string")), ",")
                .cast("binary"))
        return F.xxhash64(sl.cast("string"))

    # Slim banding table: (id, band_id, band_hash) only — candidate
    # generation never carries shingle or signature arrays through the
    # shuffle.
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            _band_hash(b).alias("band_hash"),
        )
        for b in range(bands)
    ])
    # EAGER materialization, not a lazy persist (r17): the banding table
    # has four consumers in one plan (the big-bucket count build and both
    # self-join sides, each planned as a concurrently-submitted
    # broadcast/shuffle build), and a lazy persist lets those concurrent
    # builds RACE past the unfilled cache — the whole signature pipeline
    # (shingle hash + 64-permutation MinHash UDF + banding) was measured
    # running 4x per query at sf0.1 (4 stages x 5.6-13.7 s executor time
    # apiece). Mechanism tradeoff (r18, measured): the filled-persist
    # barrier used elsewhere (see eager_filled_persist) costs this table
    # +14% query wall at sf0.1 (1.92 -> 2.18 s full-bench A/B; columnar
    # encode/decode of the 4-consumer scan dominates), so the checkpoint
    # stays. Scale caveats, stated: lineage is truncated (an executor
    # loss after the checkpoint fails the job instead of recomputing) and
    # blocks are pinned until ContextCleaner GC — measured 0.8 MB at
    # sf0.1 (~8 GB/PB of corpus, spread across executors, short-lived:
    # released when the result frame below is collected). On clusters
    # where lineage-loss matters (spot nodes), swap this line for
    # eager_filled_persist — semantics are pinned identical
    # (test_banding_checkpoint_is_deterministic).
    banded = (
        sig_df.select("_id", F.explode(band_cols).alias("bh"))
        .select("_id", "bh.band_id", "bh.band_hash")
        .localCheckpoint(eager=True)
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
    result = (
        verified.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Materialize the (small) pair set so the heavyweight intermediates can
    # be unpersisted now. localCheckpoint (not persist): its blocks are
    # released by the ContextCleaner when the frame is garbage-collected,
    # so repeated builder calls in a long-lived session don't accumulate
    # cached blocks the caller never knew it had to unpersist.
    result = result.localCheckpoint(eager=True)
    if owns_shingles:
        docs.unpersist()
    return result


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, jaccard_threshold: float = 0.5,
                        unit: str = "word",
                        shingles: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via *prefix filtering* (the
    standard set-similarity-join scheme): order each document's shingles by
    ascending global document frequency and index only the first
    ``|S| - ceil(t*|S|) + 1`` of them — any pair with Jaccard >= t must
    share at least one prefix shingle under a common total order
    (pigeonhole), so recall is exact while boilerplate shingles (high df)
    are pushed out of the index.

    Scale: the inverted index holds only prefix entries, and those are the
    *rarest* shingles of each document, so bucket sizes stay near-uniform —
    no quadratic mega-bucket on a common 3-gram, unlike a naive
    any-shared-shingle self-join. One extra groupBy(shingle) for the df
    table is the price, exactly as in production ssjoin pipelines.
    Verification computes exact Jaccard on the full shingle sets, so output
    equals the all-pairs semantics (the oracle needn't model the blocking).
    """
    owns_shingles = shingles is None
    base = shingle_table(df, text_col, id_col, k, unit) if owns_shingles else shingles
    # Shingles hashed to bigints once: every downstream compare (df counts,
    # prefix index, verification intersect) runs on fixed-width ints, never
    # re-touching document strings. xxhash64 collisions would perturb a
    # Jaccard by ~2^-64 per shingle pair — far below the rounded output
    # precision (and the oracle gate would catch any realized collision).
    # Eager checkpoint, not lazy persist (r17): the hashed-shingle frame
    # has three consumers in one plan (the inverted index and BOTH
    # verify-side broadcast builds), and the concurrently-submitted
    # broadcast builds raced past the unfilled cache, re-running the
    # shingle hash per consumer — same fix and evidence as
    # minhash_lsh_pairs' banding table (measured 2.16 -> 1.91 s median
    # at sf0.1 with the duplicate scan-side recompute gone). r18 measured
    # the eager_filled_persist alternative in a same-JVM 3-way A/B:
    # checkpoint 2.28 s vs docs-persist 2.42 s vs docs+prefix persists
    # 2.53 s median — columnar cache encode/decode of the shingle arrays
    # loses to row-block checkpoints here, so the checkpoint stays (see
    # the banding-table comment for the stated lineage/GC tradeoff).
    docs = (
        base.select("_id", F.transform("_sh", lambda s: F.xxhash64(s)).alias("_sh"))
        .localCheckpoint(eager=True)
    )
    sized = docs.select("_id", F.col("_sh").alias("_sh_full"), F.size("_sh").alias("_n"))
    inv = docs.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("s"))

    # Global document frequency per shingle; ascending df is the canonical
    # order (rarest first), ties broken by the shingle hash so the order is
    # total and engine-independent.
    freq = inv.groupBy("s").agg(F.count("*").alias("_df"))
    from pyspark.sql import Window
    w = Window.partitionBy("_id").orderBy("_df", "s")
    # Prefix-chain duplication, examined r18 and left to exchange reuse:
    # when the planner BROADCASTS one candidate self-join side (small
    # inputs, e.g. sf0.01), the whole prefix chain (explode -> df
    # aggregate -> freq join -> window) executes once per side — the
    # BroadcastExchange wrapper defeats reuse. In the shuffle regime
    # (sf0.1 and up — the 100 TB shape) the two sides share ONE exchange
    # (reuse fires on identical subtrees; stage-table verified), so a
    # materialization barrier here only costs: same-JVM 3-way A/B at
    # sf0.1 measured 2.28 s (no barrier) vs 2.53 s (persisted prefix).
    # The duplicate only exists where it is cheap; the barrier would tax
    # the regime that matters.
    prefix = (
        inv.join(freq, "s")
        .withColumn("_rn", F.row_number().over(w))
        # prefix length L = |S| - ceil(t*|S|) + 1
        .where(F.col("_rn") <= F.col("_n") - F.ceil(F.lit(jaccard_threshold) * F.col("_n")) + 1)
        .select("s", "_id", "_n")
    )
    t = F.lit(jaccard_threshold)
    cand = (
        prefix.alias("a").join(prefix.alias("b"), "s")
        .where(
            (F.col("a._id") < F.col("b._id"))
            # Length filter: Jaccard >= t forces t*|Sa| <= |Sb| <= |Sa|/t —
            # prunes size-mismatched candidates before the verify join.
            & (F.col("b._n") >= F.ceil(t * F.col("a._n")))
            & (F.col("a._n") >= F.ceil(t * F.col("b._n")))
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cand.join(sized.select(F.col("_id").alias("id_a"), F.col("_sh_full").alias("_sa"),
                               F.col("_n").alias("na")), "id_a")
        .join(sized.select(F.col("_id").alias("id_b"), F.col("_sh_full").alias("_sb"),
                           F.col("_n").alias("nb")), "id_b")
    )
    result = (
        verified.withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(F.col("_inter") / (F.col("na") + F.col("nb") - F.col("_inter")), 4),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    result = result.localCheckpoint(eager=True)  # see minhash_lsh_pairs note
    if owns_shingles:
        base.unpersist()
    return result


def token_hashes_expr(text_col: str) -> F.Column:
    """xxhash64 of each distinct normalized token, as array<long>."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    toks = F.array_distinct(F.split(normalized_text(text_col), " "))
    return F.transform(toks, lambda t: F.xxhash64(t))


def token_hashes_md5_expr(text_col: str) -> F.Column:
    """Engine-portable 60-bit token hash (15-hex md5 prefix) as
    array<long> — DuckDB: ``('0x' || substr(md5(t), 1, 15))::BIGINT``.
    The audit-mode counterpart of :func:`token_hashes_expr` (see
    :func:`base_hashes_md5_expr` for why md5)."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import normalized_text
    toks = F.array_distinct(F.split(normalized_text(text_col), " "))
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 15),
                         16, 10).cast("long"))


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



def simhash_signature_udf(bits: int = 64):
    """Arrow-batched signature computation — bit-for-bit equal to
    :func:`simhash_expr` (pinned in tests/test_dedup_similarity.py) but
    one vectorized numpy pass per document instead of 64 interpreted
    HOF folds over the token array (the fold form measured ~2.5 s of
    simhash_neardups' 3.8 s at sf0.1; dense per-doc bit math is exactly
    the sanctioned similarity-scoring shape). Arithmetic notes: hashes
    are viewed as uint64 so `(h >> b) & 1` reads the same two's-
    complement bit the JVM's sign-extending shiftright reads, and the
    final assembly wraps back to a signed long exactly like
    shiftleft(1, 63)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(bits, dtype=np.uint64)

    def _sig(hash_lists):
        out = np.zeros(len(hash_lists), dtype=np.int64)
        for i, hl in enumerate(hash_lists):
            h = np.asarray(hl, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                continue
            ones = ((h[:, None] >> shifts[None, :])
                    & np.uint64(1)).sum(axis=0, dtype=np.int64)
            mask = (2 * ones - h.size) > 0
            sig = (mask.astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    # real class objects (not strings): the module's
    # `from __future__ import annotations` would otherwise leave
    # pyspark's type-hint inference with unresolvable 'pd.Series' text
    _sig.__annotations__ = {"hash_lists": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "long")


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, max_bucket_size: int = 10_000,
                      portable: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on signature
    chunks (a pair within Hamming distance 3 must agree exactly on at
    least one of 4 chunks — pigeonhole).

    ``max_bucket_size`` drops degenerate chunk buckets (e.g., the
    all-zeros chunk that short/boilerplate docs converge to) before the
    self-join — the same cap MinHash banding applies, so no single bucket
    can go quadratic at 100 TB.

    ``portable=True`` switches to 60-bit md5-derived token hashes (and
    4 x 15-bit chunks) so the whole pipeline replays bit-identically in
    DuckDB — the audit mode behind the driver-hashed recall row
    (plans/llm_pipeline.py simhash_recall_vs_exact). Production default
    stays xxhash64/64-bit.
    """
    bits = 60 if portable else 64
    chunk_bits = bits // 4
    chunk_mask = (1 << chunk_bits) - 1
    tok_fn = token_hashes_md5_expr if portable else token_hashes_expr
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = (
        df.repartition(n_part, F.col(id_col))
        .select(F.col(id_col).alias("_id"), tok_fn(text_col).alias("_h"))
        .select("_id",
                simhash_signature_udf(bits)(F.col("_h")).alias("_sig"))
    )
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk_id"),
                 F.shiftright(F.col("_sig"), c * chunk_bits)
                 .bitwiseAND(F.lit(chunk_mask)).alias("chunk"))
        for c in range(4)
    ])
    # Eager checkpoint, not lazy persist: three consumers (bucket-count
    # build + both self-join sides) race past an unfilled cache and re-run
    # the SimHash signature UDF per consumer — same fix, evidence, and
    # r18 checkpoint-vs-filled-persist tradeoff as minhash_lsh_pairs'
    # banding table (persist measured +12% query wall at sf0.1, 2.28 ->
    # 2.56 s full-bench A/B; checkpoint blocks measured 0.2 MB at sf0.1,
    # GC-released once `result` below is collected).
    blocked = docs.select("_id", "_sig", F.explode(chunks).alias("c")).select(
        "_id", "_sig", "c.chunk_id", "c.chunk").localCheckpoint(eager=True)
    big_buckets = (
        blocked.groupBy("chunk_id", "chunk").count()
        .where(F.col("count") > max_bucket_size)
        .select("chunk_id", "chunk", F.lit(True).alias("_skip"))
    )
    pruned = (
        blocked.join(F.broadcast(big_buckets), ["chunk_id", "chunk"], "left")
        .where(F.col("_skip").isNull())
        .drop("_skip")
    )
    a = pruned.select("chunk_id", "chunk", F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    b = pruned.select("chunk_id", "chunk", F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    result = (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    result = result.localCheckpoint(eager=True)  # see minhash_lsh_pairs note
    return result


def sorted_neighborhood_pairs_ranged(
        base: DataFrame, w: int = 3, num_ranges: int = 8) -> DataFrame:
    """The 100 TB rendering of sorted-neighborhood blocking: the global
    sort order comes from ``repartitionByRange`` + a per-partition rank,
    with each partition's last ``w`` rows replicated as GHOST rows into
    the next partition — so no single-partition global window exists
    anywhere in the plan (the catalog entry's ``row_number() OVER
    (ORDER BY ...)`` is the honest small-data rendering this replaces).

    ``base`` must carry (doc_id, nt, toks). Pair coverage argument: a
    global-order adjacent pair (i, i+j), j <= w, either falls inside one
    range partition (both real rows, same pid) or crosses a boundary —
    in which case row i is within the last w of its partition and is
    replicated as a ghost with a non-positive rank into the next, where
    it pairs with that partition's first rows. Ghost-ghost pairs are
    excluded (the right side must be real) because those pairs were
    already emitted by the previous partition. Equality with the
    windowed form is pinned by test_dedup_similarity.py.
    """
    ranged = (base.repartitionByRange(num_ranges, "nt", "doc_id")
              .withColumn("pid", F.spark_partition_id()))
    wp = Window.partitionBy("pid").orderBy("nt", "doc_id")
    ranked = ranged.withColumn("rn", F.row_number().over(wp))
    pmax = ranked.groupBy("pid").agg(F.max("rn").alias("max_rn"))
    # last w rows of partition p become ghosts of partition p+1 with
    # ranks shifted to (rn - max_rn) in (-w, 0] — i.e. just before row 1
    ghosts = (ranked.join(F.broadcast(pmax), "pid")
              .where(F.col("rn") > F.col("max_rn") - w)
              .select((F.col("pid") + 1).alias("pid"),
                      (F.col("rn") - F.col("max_rn")).alias("rn"),
                      "doc_id", "toks", F.lit(True).alias("is_ghost")))
    real = ranked.select("pid", "rn", "doc_id", "toks",
                         F.lit(False).alias("is_ghost"))
    allrows = real.unionByName(ghosts)
    left = allrows.select(
        "pid", F.col("doc_id").alias("ia"), F.col("toks").alias("ta"),
        F.explode(F.array(*[F.col("rn") + j for j in range(1, w + 1)]))
        .alias("rn"))
    right = real.select("pid", "rn", F.col("doc_id").alias("ib"),
                        F.col("toks").alias("tb"))
    pairs = left.join(right, ["pid", "rn"])
    ninter = F.size(F.array_intersect("ta", "tb"))
    jacc = F.round(
        ninter.cast("double") / (F.size("ta") + F.size("tb") - ninter), 4)
    return (pairs.select(F.least("ia", "ib").alias("id_a"),
                         F.greatest("ia", "ib").alias("id_b"),
                         jacc.alias("jaccard"))
            .where(F.col("jaccard") >= 0.5))


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      threshold: float = 0.8, unit: str = "word",
                      shingles: DataFrame | None = None) -> DataFrame:
    """Asymmetric containment near-dups: pairs where the smaller
    document's shingle set is mostly INSIDE the larger's —
    ``|A ∩ B| / |A| >= threshold`` with ``|A| <= |B|`` — the
    quote/boilerplate-inclusion detector symmetric Jaccard misses (a
    100-word quote inside a 10k-word page has Jaccard ~ 0.01 but
    containment ~ 1.0).

    Exact recall by the containment prefix filter: if
    ``|A ∩ B| >= ceil(t*|A|)`` then at least one of A's first
    ``|A| - ceil(t*|A|) + 1`` shingles under the global
    rarest-first (document frequency) order is in B — so only the
    CONTAINED side is prefix-indexed, joined against the container
    side's full inverted index; rare-shingle prefixes keep the join
    keys off the hot boilerplate grams. Verification computes exact
    containment on the full shingle sets, so output equals all-pairs
    semantics and the oracle needn't model the blocking. Equal-size
    pairs are canonicalized to (smaller id contained) so mirror rows
    can't double-report.
    """
    owns = shingles is None
    base = shingle_table(df, text_col, id_col, k, unit) if owns else shingles
    # Eager checkpoint, not lazy persist — same racing-broadcast-consumer
    # fix (r17) and same r18 checkpoint-vs-persist measurement as
    # ngram_jaccard_pairs (see the comment there).
    docs = (
        base.select("_id", F.transform("_sh", lambda s: F.xxhash64(s)).alias("_sh"))
        .localCheckpoint(eager=True)
    )
    sized = docs.select("_id", F.col("_sh").alias("_sh_full"),
                        F.size("_sh").alias("_n"))
    inv = docs.select("_id", F.size("_sh").alias("_n"),
                      F.explode("_sh").alias("s"))
    freq = inv.groupBy("s").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "s")
    t = F.lit(threshold)
    prefix = (
        inv.join(freq, "s")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn")
               <= F.col("_n") - F.ceil(t * F.col("_n")) + 1)
        .select("s", F.col("_id").alias("id_a"), F.col("_n").alias("na"))
    )
    full = inv.select("s", F.col("_id").alias("id_b"),
                      F.col("_n").alias("nb"))
    cand = (
        prefix.join(full, "s")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("nb") >= F.ceil(t * F.col("na")))
            & ((F.col("na") < F.col("nb"))
               | ((F.col("na") == F.col("nb"))
                  & (F.col("id_a") < F.col("id_b"))))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cand.join(sized.select(F.col("_id").alias("id_a"),
                               F.col("_sh_full").alias("_sa"),
                               F.col("_n").alias("na")), "id_a")
        .join(sized.select(F.col("_id").alias("id_b"),
                           F.col("_sh_full").alias("_sb")), "id_b")
    )
    result = (
        verified
        .withColumn("containment",
                    F.round(F.size(F.array_intersect("_sa", "_sb"))
                            / F.col("na"), 4))
        .where(F.col("containment") >= threshold)
        .select(F.col("id_a").alias("contained_id"),
                F.col("id_b").alias("container_id"), "containment")
    )
    result = result.localCheckpoint(eager=True)  # see minhash_lsh_pairs note
    if owns:
        base.unpersist()
    return result
