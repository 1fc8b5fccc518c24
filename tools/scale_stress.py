#!/usr/bin/env python
"""Reproducible 10x scale-up stress for the dedup/retrieval family.

Builds a synthetic corpus of N_VARIANTS near-dup variants per document of
$SPARK_GRAFT_SF_DIR's documents table (variant 0 = the original; others
append a distinguishing token, so every family is a true near-dup clique),
then times the pipeline stages and prints one JSON line. The SCALING.md
"Measured 10x scale-up" table comes from this script.

    python tools/scale_stress.py [--variants 10] [--workdir /tmp/scale_stress]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.operators import dedup as D
from windowsession_using_kafka_flink_docker_spark.operators.cluster import neardup_clusters
from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import bm25_topk
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/scale_stress")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("scale-stress")
    base = load_table(spark, args.sf_dir, "documents")
    big = (
        base.crossJoin(spark.range(args.variants).withColumnRenamed("id", "_v"))
        .select(
            (F.col("doc_id") + F.col("_v") * 1_000_000).alias("doc_id"),
            F.when(F.col("_v") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" variant"), F.col("_v")))
            .alias("text"),
            "lang", "source", "n_chars",
        )
    )
    path = os.path.join(args.workdir, "documents.parquet")
    big.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    out: dict[str, float | int] = {"n_docs": docs.count(), "variants": args.variants}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        val = fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)
        out[name] = val

    sh = None
    def _shingles():
        nonlocal sh
        sh = D.shingle_table(docs)
        return sh.count()
    timed("shingle_table", _shingles)
    pairs = None
    def _ngram():
        nonlocal pairs
        pairs = D.ngram_jaccard_pairs(docs, shingles=sh)
        return pairs.count()
    timed("ngram_pairs", _ngram)
    timed("minhash_pairs", lambda: D.minhash_lsh_pairs(docs, shingles=sh).count())
    timed("simhash_pairs", lambda: D.simhash_near_dups(docs).count())
    timed("cluster_canonical",
          lambda: neardup_clusters(docs, pairs).where("is_canonical").count())
    timed("bm25_topk", lambda: len(bm25_topk(docs, ("spark", "stream", "join")).collect()))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
