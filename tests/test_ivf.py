"""IVF ANN: probe-all must equal the exact scan; partial probes must keep
usable recall; candidates must come only from probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_cosine_topk,
)
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


def _pairs(df):
    return {(r.query_id, r.match_id) for r in df.collect()}


def test_probe_all_equals_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, q, k=10)
    ivf = ivf_cosine_topk(emb, q, k=10, n_cells=8, nprobe=8)
    got = sorted(tuple(r) for r in ivf.collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want


def test_partial_probe_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = _pairs(cosine_topk(emb, q, k=10))
    approx = _pairs(ivf_cosine_topk(emb, q, k=10, n_cells=16, nprobe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@10 {recall:.2f}"


def test_every_vector_in_exactly_one_cell(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centers, assigned = ivf_assign(emb, n_cells=8)
    assert len(centers) == 8
    n = emb.count()
    assert assigned.count() == n
    assert assigned.where(F.col("cell").between(0, 7)).count() == n
