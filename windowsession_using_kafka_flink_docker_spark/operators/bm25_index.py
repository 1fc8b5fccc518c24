"""Persisted BM25 postings-index primitives — build, versioned-increment
append, and index-only query. Shared by the staged
``incremental_bm25_search`` catalog entry (plans/staging_r15.py, r16
promotion queue) and the streaming BM25 index maintainer
(streaming/bm25_index.py, maintainer #25). Lives in operators/ so the
runtime maintainer never imports the plans layer (the
operators/session_store.py precedent).

Layout — the serving contract at 100 TB:

- ``<path>/postings/inc=<n>/bucket=<b>/*.parquet`` — the inverted index
  over ALL tokens, (doc_id, tok, tf), partitioned by a token-hash
  bucket so a \\|q\\|-term query prunes to <= \\|q\\| directories per
  increment and reads NO document text;
- ``<path>/doclens/inc=<n>/*.parquet`` — (doc_id, dl) for corpus stats.

Every ingest is its OWN ``inc=<n>`` increment in BOTH components, each
directory carrying its own ``_SUCCESS`` commit marker — never a bare
``mode('append')`` into shared directories (r14 ADVICE: two non-atomic
appends let an interrupted ingest leave postings landed but doclens
stale while a top-level guard still passes, silently mis-scoring every
query). The reader requires the postings/doclens increment SETS to
match and every increment to be committed. Overwrite per inc id makes a
re-driven increment replay-idempotent — the streaming maintainer keys
increments on batch_id, the same idempotence-by-version discipline as
streaming/analytics_twins.py's ``_VersionedState``.

Reference anchor: the reference keeps no search index (its jobs are
session windows, flink_stream_task1.py:30-41); this is part of the
commissioned LLM-pipeline extension surface (SURVEY.md §2.11) — the
text-retrieval leg of the maintained-index family (session store,
near-dup LSH index, BM25 postings).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Token-hash partition fanout of the postings table.
BM25_BUCKETS = 32
#: BM25 score hyperparameters (match operators/text_analysis.py:bm25_topk).
BM25_K1, BM25_B = 1.2, 0.75


def bm25_postings(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a document frame: postings = (doc_id,
    tok, tf, bucket) over ALL tokens — the real inverted index, with a
    token-hash bucket as the partition key so a |q|-term query prunes
    to <= |q| directories; doclens = (doc_id, dl)."""
    from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import (
        normalized_text,
    )

    base = docs.select(
        "doc_id", F.split(normalized_text("text"), " ").alias("_t"))
    doclens = base.select("doc_id", F.size("_t").alias("dl"))
    postings = (base.select("doc_id", F.explode("_t").alias("tok"))
                .groupBy("doc_id", "tok")
                .agg(F.count(F.lit(1)).cast("long").alias("tf"))
                .withColumn("bucket",
                            F.pmod(F.hash("tok"), F.lit(BM25_BUCKETS))))
    return postings, doclens


def _write_increment(postings: DataFrame, doclens: DataFrame,
                     path: str, inc: int) -> None:
    """One increment = its own ``inc=<n>`` directory under BOTH
    components, each with its own ``_SUCCESS`` marker (module
    docstring has the torn-append argument)."""
    inc_leaf = f"inc={inc:05d}"
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "postings", inc_leaf)))
    (doclens.write.mode("overwrite")
     .parquet(os.path.join(path, "doclens", inc_leaf)))


def increments(path: str, comp: str) -> list[str]:
    """Sorted ``inc=<n>`` leaf names present under a component."""
    d = os.path.join(path, comp)
    if not os.path.isdir(d):
        return []
    return sorted(x for x in os.listdir(d) if x.startswith("inc="))


def bm25_index_export(spark: SparkSession, docs: DataFrame,
                      path: str) -> None:
    """Build and persist the postings index for a corpus (increment 0)."""
    postings, doclens = bm25_postings(docs)
    _write_increment(postings, doclens, path, 0)


def bm25_index_append(spark: SparkSession, path: str, delta: DataFrame,
                      inc: int | None = None) -> None:
    """Append a new document batch's OWN postings to the index as a
    fresh versioned increment — the existing corpus is never
    re-tokenized (doc_ids are unique across batches, so increments are
    disjoint). Pass ``inc`` explicitly to make a replayed ingest
    idempotent (the streaming maintainer passes its batch_id); default
    is one past the newest committed increment."""
    if inc is None:
        incs = increments(path, "postings")
        inc = 1 + max((int(x.split("=")[1]) for x in incs), default=-1)
    postings, doclens = bm25_postings(delta)
    _write_increment(postings, doclens, path, inc)


def check_index_committed(path: str) -> list[str]:
    """Torn-index guard: EVERY increment must be committed in BOTH
    components — the postings and doclens increment sets must match
    exactly and each ``inc=<n>`` directory must carry its ``_SUCCESS``
    marker, so an ingest interrupted between the two writes (or
    mid-write) is detected instead of silently mis-scoring. Returns
    the committed increment leaves."""
    p_incs, d_incs = increments(path, "postings"), increments(path, "doclens")
    if not p_incs or p_incs != d_incs:
        raise ValueError(
            f"bm25 index under {path} has mismatched increments "
            f"(postings={p_incs}, doclens={d_incs}) — an export or "
            "append was interrupted between components; re-drive the "
            "increment before querying")
    for comp in ("postings", "doclens"):
        for x in p_incs:
            if not os.path.exists(os.path.join(path, comp, x, "_SUCCESS")):
                raise ValueError(
                    f"bm25 index under {path} is missing the commit "
                    f"marker for {comp}/{x} — the increment write was "
                    "interrupted; re-drive it before querying")
    return p_incs


#: Compaction always folds into the fixed first increment id. Batch 0
#: is committed long before a later compaction runs, so no replayed
#: batch can ever overwrite the compacted increment (Structured
#: Streaming only re-delivers the single newest uncommitted batch).
_COMPACT_TARGET = "inc=00000"
_COMPACT_TMP = "compact_tmp"  # does not start with "inc=": never listed


def compact_index(spark: SparkSession, path: str) -> int:
    """Fold all increments EXCEPT THE NEWEST into one — the
    read-amplification control: every query lists and reads all
    increments, so a long-running stream (one increment per batch)
    linearly inflates the postings scan until compaction runs. Run at
    quiescence (the maintain-job-restart moment, like the session
    store's dead-letter drain). Returns the number of increments
    folded (0 = nothing to do).

    The newest increment is deliberately left alone: it is the only
    one a crash-replayed micro-batch can overwrite (committed batches
    never re-deliver), and folding it would double its documents when
    the replay re-appended them.

    Crash-safe by construction, same fail-closed discipline as the
    reader guard: the folded union is written to a ``compact_tmp``
    component pair first (committed via ``_SUCCESS``); only then are
    the folded ``inc=`` dirs deleted and the tmp pair renamed to
    ``inc=00000`` (postings first). Every crash point re-enters: a
    half-written tmp is discarded and the untouched increments still
    guard-pass; a committed tmp resumes the delete+rename; a
    mid-rename crash leaves the components mismatched — queries fail
    closed until the next compact call finishes the second rename."""
    tmp_p = os.path.join(path, "postings", _COMPACT_TMP)
    tmp_d = os.path.join(path, "doclens", _COMPACT_TMP)

    def _committed(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    if _committed(tmp_d) and not os.path.isdir(tmp_p):
        # crash between the two renames: postings/inc=00000 is the
        # already-renamed tmp; finish the doclens half only.
        _finish_compaction(path, tmp_p, tmp_d)
        return 0
    if _committed(tmp_p) and _committed(tmp_d):
        n = max(len(increments(path, "postings")) - 1, 0)  # best effort
        _finish_compaction(path, tmp_p, tmp_d)
        return n
    # half-written tmp from an interrupted build: discard and restart
    for t in (tmp_p, tmp_d):
        if os.path.isdir(t):
            shutil.rmtree(t)

    incs = check_index_committed(path)
    folded = incs[:-1]
    if not folded or folded == [_COMPACT_TARGET]:
        return 0
    postings = (spark.read
                .option("basePath", os.path.join(path, "postings"))
                .parquet(*[os.path.join(path, "postings", x)
                           for x in folded])
                .drop("inc"))
    doclens = (spark.read
               .option("basePath", os.path.join(path, "doclens"))
               .parquet(*[os.path.join(path, "doclens", x)
                          for x in folded])
               .drop("inc"))
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(tmp_p))
    doclens.write.mode("overwrite").parquet(tmp_d)
    _finish_compaction(path, tmp_p, tmp_d)
    return len(folded)


def _finish_compaction(path: str, tmp_p: str, tmp_d: str) -> None:
    """Delete every folded increment (all but the newest) and rename
    the committed tmp pair into ``inc=00000`` — postings first, so a
    mid-rename crash is detectable (mismatched components fail closed)
    and the next call completes only the missing half."""
    for comp, tmp in (("postings", tmp_p), ("doclens", tmp_d)):
        if not os.path.isdir(tmp):
            continue  # this half already renamed by a prior attempt
        incs = increments(path, comp)
        newest = incs[-1] if incs else None
        for leaf in incs:
            if leaf != newest:
                shutil.rmtree(os.path.join(path, comp, leaf))
        os.rename(tmp, os.path.join(path, comp, _COMPACT_TARGET))


def bm25_from_index(spark: SparkSession, path: str,
                    terms: tuple[str, ...], k: int) -> DataFrame:
    """Score a query FROM THE INDEX ALONE — no document text is read.
    The postings scan filters on the partition column ``bucket`` (<=
    |terms| directories survive pruning per increment) and then on
    ``tok``; corpus stats (N, avgdl) aggregate the narrow doclens
    frame (a serving tier keeps them precomputed); df/idf come from
    the pruned postings. Same score expression + ROUND(.,4)-then-id
    ordering as operators/text_analysis.py:bm25_topk. Runs the
    torn-index guard first (:func:`check_index_committed`)."""
    incs = check_index_committed(path)
    # bucket ids for the query terms, computed with the SAME hash the
    # writer used (one tiny Spark job; |terms| rows)
    buckets = [r.b for r in spark.createDataFrame(
        [(t,) for t in terms], "tok STRING")
        .select(F.pmod(F.hash("tok"), F.lit(BM25_BUCKETS)).alias("b"))
        .collect()]

    # basePath = the component root, so `inc` and `bucket` are both
    # discovered partition columns and the bucket filter still prunes
    # to <= |terms| directories PER increment.
    postings = (spark.read.option("basePath", os.path.join(path, "postings"))
                .parquet(*[os.path.join(path, "postings", x) for x in incs])
                .where(F.col("bucket").isin(buckets))
                .where(F.col("tok").isin(list(terms)))
                .drop("inc"))
    doclens = (spark.read.option("basePath", os.path.join(path, "doclens"))
               .parquet(*[os.path.join(path, "doclens", x) for x in incs])
               .drop("inc"))
    stats = doclens.agg(F.count(F.lit(1)).alias("_n"),
                        F.avg("dl").alias("_avgdl"))
    dft = postings.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("_df"))
    idf = F.log(F.lit(1.0)
                + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
    tf_part = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B
                                 + BM25_B * F.col("dl") / F.col("_avgdl")))
    scored = (postings.join(doclens, "doc_id")
              .join(F.broadcast(dft), "tok")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.sum(idf * tf_part).alias("_s")))
    return (scored.select("doc_id", F.round("_s", 4).alias("bm25"))
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(k))
