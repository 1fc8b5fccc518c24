"""Bloom-filter pre-join (runtime-filter) — declarative, broadcastable.

Spark's own runtime bloom filters (``bloom_filter_agg`` /
``might_contain``) are internal expressions the optimizer injects for
shuffle-join pruning; they are not registered for user SQL, and more
importantly the CHOICE to prune is the optimizer's. This module makes the
runtime-filter story explicit as a first-class operator pair, built
entirely from registered expressions so the whole thing stays inside
whole-stage codegen:

- :func:`bloom_build` aggregates the build side's keys into an m-bit
  bitmap: per key, ``k`` positions from independently-seeded xxhash64;
  positions group into 64-bit words via ``bit_or`` (a map-side-combinable
  aggregate), and the <= m/64 (word_index, word) rows assemble into ONE
  map row — a few KB however large the build side's row count, since the
  bitmap size is fixed up front.
- :func:`bloom_probe` broadcast-crossJoins that single row onto the fact
  side and keeps rows whose k bits are all set — a scan-side filter that
  runs BEFORE the join shuffle, which is the whole point at 100 TB: the
  shuffle carries only probable matches, and false positives (the bitmap
  is lossy by design) are removed by the exact join that follows, so the
  composed result is bit-identical to the plain join BY CONSTRUCTION.

Sizing: with n build keys, m bits and k=2 hashes the false-positive rate
is ~(1 - e^(-2n/m))^2; the default m = 2^17 holds ~30k keys at ~13% fpp
(16 KB broadcast). Production would scale m with the build-side count —
the map stays KBs up to m = 2^24.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bitmap size in bits (power of two keeps pmod cheap) and the xxhash64
#: seeds of the k hash functions.
BLOOM_BITS = 1 << 17
BLOOM_SEEDS = (42, 43)


def bloom_build(keys: DataFrame, key_col: str,
                m_bits: int = BLOOM_BITS,
                seeds: tuple[int, ...] = BLOOM_SEEDS) -> DataFrame:
    """ONE-row DataFrame with column ``bloom``: map<int, bigint> from
    64-bit word index to word, covering every key's k bit positions."""
    pos = keys.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits)).alias("p")
        for s in seeds
    ])).alias("p"))
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    # Collision-proof output name: the probe crossJoins this column
    # onto an arbitrary caller frame (round-13 review finding).
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "bits")))
        ).alias("__bloom_bits")
    )


def bloom_probe(fact: DataFrame, key_col: str, bloom: DataFrame,
                m_bits: int = BLOOM_BITS,
                seeds: tuple[int, ...] = BLOOM_SEEDS) -> DataFrame:
    """Filter ``fact`` to rows whose key might be in the build set: all k
    bloom bits set. Broadcasts the 1-row bitmap; the test is pure
    codegen'd expressions on the scan side, ahead of any join shuffle."""
    if "__bloom_bits" in fact.columns:
        raise ValueError("fact frame already has a __bloom_bits column")
    probed = fact.crossJoin(F.broadcast(bloom))
    cond = None
    for s in seeds:
        # Backtick-quoted key (review finding: dotted/spaced column
        # names must bind like they do through F.col everywhere else)
        # and an INT seed literal — xxhash64 hashes arguments by TYPE,
        # and the build side hashes the seed as F.lit(int), an INT.
        p = f"pmod(xxhash64(`{key_col}`, {s}), {m_bits})"
        hit = F.expr(
            f"(coalesce(element_at(__bloom_bits, CAST({p} DIV 64 AS INT)), 0L)"
            f" & shiftleft(1L, CAST({p} % 64 AS INT))) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    return probed.where(cond).drop("__bloom_bits")
