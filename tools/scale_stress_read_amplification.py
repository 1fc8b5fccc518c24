#!/usr/bin/env python
"""Read-amplification curve for the versioned serving indexes (r16,
VERDICT item 5): how does the pruned BM25 search degrade as the
increment count grows to ~100, and how much does compaction recover?

The r15 addendum measured 10 increments (1.25x); the prediction was
LINEAR growth dominated by directory listing + per-increment parquet
footers rather than data volume. This tool measures the whole curve:
the documents table is appended as N single-increment batches
(round-robin by doc_id so content volume is constant across the
curve), the warm search (min of 3) is sampled at checkpoints, then the
index is compacted and the search re-sampled.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
        python tools/scale_stress_read_amplification.py

Prints one JSON line:
    {"n_docs": ..., "search_sec_at": {"1": s, "10": s, "25": s,
     "50": s, "100": s}, "compact_sec": s, "folded": n,
     "search_sec_after_compact": s}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

N_INCREMENTS = int(os.environ.get("IDX_READAMP_INCREMENTS", "100"))
CHECKPOINTS = (1, 10, 25, 50, 100)
TERMS = ("merge", "window", "hash")


def _warm_search(spark, idx, k=10, runs=3) -> float:
    from windowsession_using_kafka_flink_docker_spark.operators.bm25_index import (
        bm25_from_index,
    )

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        bm25_from_index(spark, idx, TERMS, k).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _warm_probe(spark, idx, delta, runs=3) -> float:
    from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (
        neardup_index_probe,
    )

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        neardup_index_probe(spark, idx, delta).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("scale-stress-read-amplification")
    from windowsession_using_kafka_flink_docker_spark.operators.bm25_index import (
        bm25_index_append,
        compact_index,
    )
    from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (
        _COMPONENTS as _ND_COMPONENTS,
    )
    from windowsession_using_kafka_flink_docker_spark.operators.neardup_index import (
        neardup_index_append,
    )
    from windowsession_using_kafka_flink_docker_spark.operators.versioned_index import (
        compact_components,
    )

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").localCheckpoint())
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="idx_readamp_")
    idx = os.path.join(root, "bm25")
    out: dict = {"n_docs": n_docs, "sf_dir": sf_dir,
                 "search_sec_at": {}, "probe_sec_at": {}}
    try:
        for i in range(N_INCREMENTS):
            bm25_index_append(
                spark, idx,
                docs.where(F.pmod("doc_id", F.lit(N_INCREMENTS)) == i),
                inc=i)
            if (i + 1) in CHECKPOINTS:
                out["search_sec_at"][str(i + 1)] = _warm_search(spark, idx)
        t0 = time.perf_counter()
        out["folded"] = compact_index(spark, idx)
        out["compact_sec"] = round(time.perf_counter() - t0, 3)
        out["search_sec_after_compact"] = _warm_search(spark, idx)

        # The near-dup twin: append-only increments (no per-batch probe
        # — this isolates READ amplification), then the ad-hoc probe of
        # a fixed ~1% delta timed at the same checkpoints. The pairs
        # component is maintainer-side state, so the fold here covers
        # the three probe-path components.
        nd = os.path.join(root, "neardup")
        delta = docs.where(F.pmod("doc_id", F.lit(97)) == 0) \
            .localCheckpoint()
        for i in range(N_INCREMENTS):
            neardup_index_append(
                spark,
                docs.where(F.pmod("doc_id", F.lit(N_INCREMENTS)) == i),
                nd, inc=i)
            if (i + 1) in CHECKPOINTS:
                out["probe_sec_at"][str(i + 1)] = _warm_probe(
                    spark, nd, delta)
        t0 = time.perf_counter()
        out["nd_folded"] = compact_components(
            spark, nd, _ND_COMPONENTS, "near-dup")
        out["nd_compact_sec"] = round(time.perf_counter() - t0, 3)
        out["probe_sec_after_compact"] = _warm_probe(spark, nd, delta)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
