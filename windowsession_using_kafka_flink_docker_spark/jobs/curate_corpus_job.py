"""End-to-end corpus curation job: the LLM-data-pipeline operators chained
the way a production pretraining-data run chains them.

    documents
      -> exact dedup (md5 canonical)                 operators/dedup.py
      -> near-dup clustering (ngram-Jaccard pairs ->
         connected components, keep one per cluster) operators/cluster.py
      -> decontamination vs the held-out eval split
         (hash_split semantics)                      plans/curation.py
      -> sequence packing report                     plans/curation.py
      -> partitioned parquet write (by lang)         sources/writer.py

No stage invents new semantics: each is the same operator the catalog
verifies against its DuckDB oracle; this job only composes them. Batch job
(spark-submit or direct); the per-stage counts print as one JSON line for
scripting.

Reference parity note: the reference has no batch surface at all — this is
extension territory (SURVEY.md §2.11) driven by the north-star brief.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark import get_spark
from windowsession_using_kafka_flink_docker_spark.operators import dedup as D
from windowsession_using_kafka_flink_docker_spark.operators.cluster import neardup_clusters
from windowsession_using_kafka_flink_docker_spark.plans.curation import (
    decontaminate,
    pack_sequences,
)
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
from windowsession_using_kafka_flink_docker_spark.sources.writer import write_partitioned


def curate(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Run the full curation chain; returns per-stage counts."""
    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # 1. exact dedup: keep the canonical (min-id) doc of each digest group
    keep_exact = D.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    docs1 = docs.join(keep_exact, "doc_id", "left_semi")
    n_exact = docs1.count()

    # 2. near-dup clustering: ngram-Jaccard pairs -> connected components;
    #    keep one doc per cluster (the component-min canonical)
    pairs = D.ngram_jaccard_pairs(docs1)
    clusters = neardup_clusters(docs1, pairs)
    keep_near = clusters.where("is_canonical").select("doc_id")
    docs2 = docs1.join(keep_near, "doc_id", "left_semi")
    n_near = docs2.count()

    # 3. decontamination against the deterministic eval split (the same
    #    md5-prefix split hash_split_train_test verifies): train docs
    #    sharing any 8-gram with an eval doc are dropped
    is_eval = F.substring(F.md5(F.col("text").cast("binary")), 1, 1).isin(
        "0", "1", "2", "3")
    train = docs2.where(~is_eval)
    eval_docs = docs2.where(is_eval)
    decon = decontaminate(train, eval_docs)
    keep_clean = decon.where(~F.col("contaminated")).select("doc_id")
    docs3 = train.join(keep_clean, "doc_id", "left_semi")
    n_clean = docs3.count()

    # 4. packing report: fixed-token-budget training sequences
    packed = pack_sequences(docs3)
    n_sequences = packed.select("lang", "shard", "seq_id").distinct().count()

    # 5. write the curated corpus partitioned by lang (size-aware writer:
    #    hot partition values split across parallel writers)
    write_partitioned(docs3, out_dir, ["lang"])

    return {
        "input_docs": n_in,
        "after_exact_dedup": n_exact,
        "after_neardup_clusters": n_near,
        "train_after_decontamination": n_clean,
        "eval_docs": eval_docs.count(),
        "packed_sequences": n_sequences,
        "out_dir": out_dir,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/curated_corpus")
    args = ap.parse_args()
    spark = get_spark("curate-corpus-job")
    print(json.dumps(curate(spark, args.sf_dir, args.out)))


if __name__ == "__main__":
    main()
