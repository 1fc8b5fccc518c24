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


class TestProductQuantization:
    """PQ: planted exact copies must encode identically and rank first;
    ADC + rerank must keep usable recall on the organic corpus."""

    def test_planted_copy_identical_codes_and_rank1(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.operators.similarity import (
            pq_adc_topk, pq_build)

        emb = load_table(spark, sf_dir, "embeddings")
        planted = (
            emb.where(F.col("vec_id") < 3)
            .select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                F.expr("transform(embedding, x -> CAST(x * 2.0 AS FLOAT))")
                .alias("embedding"),
                "label",
            )
        )
        corpus = emb.unionByName(planted)
        index = pq_build(corpus, dim=64)
        # a positively-scaled copy unit-normalizes to the same vector ->
        # identical per-subspace codes
        codes = {r.vec_id: tuple(r.codes) for r in
                 index.encoded.where(
                     (F.col("vec_id") < 3) | (F.col("vec_id") >= 1_000_000)
                 ).collect()}
        for i in range(3):
            assert codes[i] == codes[i + 1_000_000]
        # and the exact rerank puts it at rank 1 with cosine 1.0
        top = pq_adc_topk(corpus, corpus.where(F.col("vec_id") < 3),
                          index, k=1).collect()
        by_q = {r.query_id: r for r in top}
        for i in range(3):
            assert by_q[i].match_id == i + 1_000_000
            assert by_q[i].cosine == 1.0
        index.unpersist()

    def test_organic_recall_floor(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.operators.similarity import (
            pq_adc_topk, pq_build)

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 10)
        exact = _pairs(cosine_topk(emb, q, k=10))
        index = pq_build(emb, dim=64)
        approx = _pairs(pq_adc_topk(emb, q, index, k=10, rerank=50))
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"PQ recall@10 {recall:.2f}"
        index.unpersist()

    def test_rerank_all_equals_exact(self, spark, sf_dir):
        """With rerank >= corpus size the shortlist is everything and the
        exact re-rank must reproduce the exact scan identically."""
        from windowsession_using_kafka_flink_docker_spark.operators.similarity import (
            pq_adc_topk, pq_build)

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 10)
        n = emb.count()
        index = pq_build(emb, dim=64)
        got = sorted(tuple(r) for r in
                     pq_adc_topk(emb, q, index, k=10, rerank=n).collect())
        want = sorted(tuple(r) for r in cosine_topk(emb, q, k=10).collect())
        assert got == want
        index.unpersist()
