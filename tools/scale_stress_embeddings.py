#!/usr/bin/env python
"""Reproducible scale-up stress for the embedding/vector family.

Builds a synthetic vector corpus of N_VARIANTS planted near-dup variants
per vector of $SPARK_GRAFT_SF_DIR's embeddings table (variant 0 = the
original; variant v = the original positively scaled by (1 + v/100), so
cosine within a family is exactly 1.0 and the TRUE pair set is closed-form:
n_base * C(V, 2)). Times each stage and measures recall against that
closed form plus ANN recall vs the exact scan. Prints one JSON line; the
SCALING.md "embedding family" table comes from this script.

    python tools/scale_stress_embeddings.py [--variants 10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.operators import similarity as S
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/scale_stress_emb")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("scale-stress-embeddings")
    base = load_table(spark, args.sf_dir, "embeddings")
    n_base = base.count()
    big = (
        base.crossJoin(spark.range(args.variants).withColumnRenamed("id", "_v"))
        .select(
            (F.col("vec_id") + F.col("_v") * 1_000_000).alias("vec_id"),
            F.expr("transform(embedding, x -> CAST(x * (1.0 + _v / 100.0) AS FLOAT))")
            .alias("embedding"),
            "label",
        )
    )
    path = os.path.join(args.workdir, "embeddings.parquet")
    big.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)

    out: dict[str, float | int] = {
        "n_vectors": corpus.count(),
        "variants": args.variants,
        "true_pairs": n_base * math.comb(args.variants, 2),
    }

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out[name] = fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)

    # 1) near-dup pair mining: LSH-blocked + exact verify. Recall vs the
    # closed-form true pair count (families share sign patterns exactly,
    # so blocking provably cannot lose a pair — found == true is the
    # correctness bar, and the time is the scale measurement).
    timed("neardup_pairs", lambda: S.embedding_near_dups(corpus).count())
    out["neardup_recall"] = (
        round(out["neardup_pairs"] / out["true_pairs"], 5)
        if out["true_pairs"] else None
    )

    # 2) exact brute-force top-10 for 10 queries (the baseline the ANN
    # variants are judged against; corpus never shuffles, queries
    # broadcast).
    queries = corpus.where(F.col("vec_id") < 10)
    exact = None

    def _exact():
        nonlocal exact
        exact = {(r.query_id, r.match_id)
                 for r in S.cosine_topk(corpus, queries, k=10).collect()}
        return len(exact)

    timed("exact_topk_pairs", _exact)

    # 3) IVF: one-time build (sample-train quantizer + cell assignment),
    # then the serving-path probe at nprobe=4/16.
    index = None

    def _build():
        nonlocal index
        index = S.ivf_build(corpus, n_cells=16, seed=42)
        return index.assigned.count()

    timed("ivf_build_rows", _build)

    ivf_hits = None

    def _probe():
        nonlocal ivf_hits
        got = {(r.query_id, r.match_id)
               for r in S.ivf_cosine_topk(None, queries, k=10, nprobe=4,
                                          index=index).collect()}
        ivf_hits = len(got & exact)
        return ivf_hits

    timed("ivf_probe_hits", _probe)
    out["ivf_recall_at_10"] = round(ivf_hits / len(exact), 4)

    # 4) multi-table sign-LSH top-10 (OR-amplification) and its recall.
    mt_hits = None

    def _multi():
        nonlocal mt_hits
        got = {(r.query_id, r.match_id)
               for r in S.multitable_signlsh_topk(corpus, queries,
                                                  dim=64, k=10).collect()}
        mt_hits = len(got & exact)
        return mt_hits

    timed("multitable_hits", _multi)
    out["multitable_recall_at_10"] = round(mt_hits / len(exact), 4)

    # 5) product quantization: build (train + encode once), then the
    # ADC-scan + rerank probe.
    pq_index = None

    def _pq_build():
        nonlocal pq_index
        pq_index = S.pq_build(corpus, dim=64)
        return pq_index.encoded.count()

    timed("pq_build_rows", _pq_build)

    pq_hits = None

    def _pq_probe():
        nonlocal pq_hits
        got = {(r.query_id, r.match_id)
               for r in S.pq_adc_topk(corpus, queries, pq_index,
                                      k=10, rerank=50).collect()}
        pq_hits = len(got & exact)
        return pq_hits

    timed("pq_probe_hits", _pq_probe)
    out["pq_recall_at_10"] = round(pq_hits / len(exact), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
