"""Maintainer #26 — the streaming NEAR-DUP LSH INDEX.

Continuous dedup as a maintained index, completing the family: #24
keeps the session table (events), #25 the BM25 postings index (search),
and this maintainer the MinHash-LSH near-dup index (dedup) — the crawl
pipeline's "have we seen this before?" loop. Each document micro-batch
is first PROBED against everything ingested so far (emitting its
near-dup pairs: cross pairs against the index plus pairs within the
batch), then APPENDED to the index as its own versioned increment —
the corpus is never re-hashed.

The emitted pairs are themselves maintained state: a ``pairs``
component, one ``inc=<batch_id>`` increment per batch, so
``current_pairs()`` is the continuously-maintained near-dup pair table
(the union of every batch's findings — exactly the pairs a
from-scratch run over all ingested documents would emit, because every
pair has a latest member whose batch probed it; 1-batch vs N-batch
invariance asserted in tests/test_neardup_index_stream.py). One honest
caveat: the bucket cap is evaluated at PROBE time (index counts so far
plus the batch's own), so a bucket that only overflows after LATER
ingests keeps the pairs its earlier batches already emitted, where a
from-scratch run would have pruned them — the cap is a cost control,
not a semantic contract, and below it the two views coincide exactly.

Replay-idempotence has a subtlety the other maintainers lack: a
crash-replayed batch finds ITS OWN increment already in the index. The
probe therefore takes ``before_inc=batch_id`` — only increments
strictly below the replayed batch are visible, so the recomputed pairs
(and the cap arithmetic) are bit-identical to the first delivery, and
the pair/index increments are overwritten in place. An append
interrupted between the four components (pairs, bands, counts,
shingles) is caught by the mismatched-increment guard and healed by
the redelivery.

Reference anchor: the reference has no dedup surface
(flink_stream_task1.py is session windows); this is the commissioned
LLM-pipeline extension (SURVEY.md §2.11) taken incremental. Scale: per
batch the work is shingling ONE ingest, a band join against
band-partitioned directories pruned by the bucket-cap ledger, and
id-join shingle fetches for surviving candidates only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (
    _COMPONENTS,
    increments,
    neardup_index_append,
    neardup_index_probe,
)
from windowsession_using_kafka_flink_docker_spark.operators.versioned_index import (
    compact_components,
)

_PAIRS_SCHEMA = ("id_a BIGINT, id_b BIGINT, jaccard DOUBLE, "
                 "is_cross BOOLEAN")


class IncrementalNearDupIndexMaintainer:
    """Probe-then-append continuous dedup over a document stream.
    ``current_pairs()`` equals the from-scratch near-dup pairs over
    every ingested document (stream==batch)."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 compact_every: int | None = None):
        """``compact_every=N`` folds the index whenever the increment
        count reaches N, INSIDE the foreachBatch thread right after the
        append — quiescent by construction (that thread is the only
        writer). Replay stays exact: the fold excludes the just-written
        newest increment, and a replayed batch's ``before_inc=batch_id``
        probe sees the folded ``inc=00000`` — a value-identical view of
        'every increment strictly below me', since the fold only unions
        rows and the bucket-cap ledger SUMs per-increment counts.
        None keeps the restart-only compaction (r15 VERDICT item 5)."""
        self.spark = spark
        self.index_dir = index_dir
        self.compact_every = compact_every

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._guard(batch_id)
        if batch_df.isEmpty():
            return
        from windowsession_using_kafka_flink_docker_spark.operators import (
            dedup as D,
        )
        from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (
            portable_bands,
            portable_signatures,
        )

        # ONE shingle/minhash/band pipeline per batch, shared by the
        # probe and the append (r15 review finding: building them
        # independently paid the dominant per-batch cost twice).
        shingles = D.shingle_table(batch_df)
        try:
            bands = portable_bands(portable_signatures(shingles)) \
                .localCheckpoint()
            # Probe BEFORE appending, against increments strictly below
            # this batch id — on first delivery that is "everything so
            # far"; on a crash replay it excludes the batch's own landed
            # increment, reproducing the first delivery's view exactly.
            pairs = neardup_index_probe(self.spark, self.index_dir,
                                        batch_df, before_inc=batch_id,
                                        shingles=shingles, bands=bands)
            (pairs.write.mode("overwrite")
             .parquet(os.path.join(self.index_dir, "pairs",
                                   f"inc={batch_id:05d}")))
            neardup_index_append(self.spark, batch_df, self.index_dir,
                                 inc=batch_id, shingles=shingles,
                                 bands=bands)
        finally:
            shingles.unpersist()
        self._maybe_compact()

    def _maybe_compact(self) -> None:
        if self.compact_every and len(
                increments(self.index_dir, "bands")) \
                >= self.compact_every:
            folded = self.compact()
            if folded:
                print(f"neardup_index: compacted {folded} increment(s) "
                      f"(compact_every={self.compact_every})")

    def _guard(self, batch_id: int) -> None:
        """The _VersionedState lifecycle guard, index-shaped (r15
        review finding): a RESET checkpoint against a kept index dir
        restarts batch ids at 0, probing an artificially empty
        before_inc=0 view (missing every cross pair) and overwriting
        inc=00000 — which after a compaction holds the folded FULL
        history. Fail fast; a replay of the newest batch still passes."""
        incs = increments(self.index_dir, "bands")
        if incs and int(incs[-1].split("=")[1]) > batch_id:
            raise ValueError(
                f"index_dir {self.index_dir} already holds increment "
                f"{incs[-1]} > incoming batch_id {batch_id}; "
                "checkpoint_dir and index_dir must be reset together")

    def committed_increments(self) -> list[str]:
        """Committed increments across ALL components including pairs
        (fail-closed on any mismatch — one shared guard
        implementation, operators/versioned_index.py)."""
        from windowsession_using_kafka_flink_docker_spark.operators.versioned_index import (
            check_components_committed,
        )

        return check_components_committed(
            self.index_dir, (*_COMPONENTS, "pairs"), "near-dup")

    def current_pairs(self) -> DataFrame:
        """The maintained near-dup pair table (union of every batch's
        probe findings), empty-frame-safe before the first batch."""
        incs = self.committed_increments()
        if not incs:
            return self.spark.createDataFrame([], _PAIRS_SCHEMA)
        return (self.spark.read
                .option("basePath", os.path.join(self.index_dir, "pairs"))
                .parquet(*[os.path.join(self.index_dir, "pairs", x)
                           for x in incs])
                .drop("inc"))

    def probe(self, delta: DataFrame) -> DataFrame:
        """Serve an ad-hoc dedup query against the full index (no
        append) — 'would these documents be near-dups of the corpus?'"""
        return neardup_index_probe(self.spark, self.index_dir, delta)

    def compact(self) -> int:
        """Fold all increments but the newest into one, across ALL
        FOUR components — bands / bucket_counts / shingles AND the
        pairs results, kept in lockstep so the mismatched-set guard
        stays meaningful (run while the stream is stopped, the
        job-restart moment). Folding preserves every read: band and
        shingle rows union, per-increment bucket counts still SUM to
        the same ledger, and current_pairs() is a union either way.
        The newest increment stays un-folded because a crash-replayed
        batch may overwrite it. Returns the number folded."""
        return compact_components(
            self.spark, self.index_dir,
            {**_COMPONENTS, "pairs": ()}, "near-dup")


def streaming_neardup_index_maintenance(
        docs: DataFrame, maintainer: IncrementalNearDupIndexMaintainer,
        checkpoint_dir: str) -> StreamingQuery:
    return (docs.writeStream
            .queryName("neardup_index_maintenance")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(maintainer.process_batch)
            .start())
