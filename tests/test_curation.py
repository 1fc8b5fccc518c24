"""Data-curation operator tests: boilerplate removal must restore the
pre-plant text exactly, quality flags must be internally consistent,
sampling must be deterministic with rates honored, quantization must meet
its reconstruction-error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
from windowsession_using_kafka_flink_docker_spark.plans.curation import (
    DEFAULT_RATE,
    SAMPLE_RATES,
    _hex_threshold,
    boilerplate_removal,
)
from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table


class TestBoilerplateRemoval:
    def test_removal_restores_original_text(self, spark, sf_dir):
        """The catalog query plants footers then strips them: for EVERY
        doc the cleaned digest must equal md5 of the original (period-free)
        text, and n_removed must equal the number of planted footers."""
        out = {r.doc_id: r for r in
               CATALOG["boilerplate_removal"].spark(spark, sf_dir).collect()}
        orig = {r.doc_id: r.digest for r in
                load_table(spark, sf_dir, "documents")
                .select("doc_id", F.md5("text").alias("digest")).collect()}
        assert set(out) == set(orig)
        for doc_id, r in out.items():
            want_removed = (doc_id % 3 == 0) + (doc_id % 4 == 0)
            assert r.n_removed == want_removed, (doc_id, r)
            assert r.clean_digest == orig[doc_id], doc_id
        assert sum(r.n_removed for r in out.values()) > 0  # non-vacuous

    def test_rare_sentences_survive(self, spark):
        """A sentence unique to few docs must NOT be stripped; one shared
        by >= min_docs must."""
        docs = spark.createDataFrame(
            [(i, f"unique content {i}. subscribe now") for i in range(12)]
            + [(100, "only here. rare footer")],
            "doc_id BIGINT, text STRING",
        )
        out = {r.doc_id: r for r in
               boilerplate_removal(docs, min_docs=10).collect()}
        assert all(out[i].n_removed == 1 for i in range(12))  # footer stripped
        assert out[100].n_removed == 0                        # rare kept


class TestGopherQualityFlags:
    def test_flags_internally_consistent(self, spark, sf_dir):
        rows = CATALOG["gopher_quality_flags"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            want = (50 <= r.n_words <= 100_000 and 3 <= r.mean_word_len <= 10
                    and r.alpha_frac > 0.8 and r.symbol_ratio < 0.1
                    and r.n_stopwords >= 2)
            assert r.keep == want, r
            assert 0 <= r.alpha_frac <= 1 and 0 <= r.symbol_ratio <= 1

    def test_gate_discriminates(self, spark):
        """A clean paragraph passes; word-soup without stopwords and a
        too-short doc fail."""
        docs = spark.createDataFrame(
            [(1, "the quality of the data pipeline depends on careful "
                 "filtering and honest measurement of every heuristic "
                 "that we apply to the corpus before training starts " * 3),
             (2, "zz " * 60),          # no stopwords, mean len 2
             (3, "short doc")],         # 2 words
            "doc_id BIGINT, text STRING",
        ).withColumn("lang", F.lit("en"))
        # the registered builder reads from parquet; assert the gate's
        # component expressions directly on the literal frame
        toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("w"))
        n = F.size("w")
        got = {r.doc_id: r for r in toks.select(
            "doc_id", n.alias("n_words"),
            (F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)) / n).alias("mwl"),
        ).collect()}
        assert got[1].n_words >= 50 and 3 <= got[1].mwl <= 10
        assert got[2].mwl < 3
        assert got[3].n_words < 50


class TestStratifiedSample:
    def test_deterministic_and_rates_honored(self, spark, sf_dir):
        a = CATALOG["stratified_sample"].spark(spark, sf_dir).collect()
        b = CATALOG["stratified_sample"].spark(spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # same set, always
        docs = load_table(spark, sf_dir, "documents")
        totals = {r.lang: r.n for r in
                  docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        kept: dict[str, int] = {}
        for r in a:
            kept[r.lang] = kept.get(r.lang, 0) + 1
        for lang, total in totals.items():
            rate = SAMPLE_RATES.get(lang, DEFAULT_RATE)
            got = kept.get(lang, 0) / total
            # binomial tolerance on small strata
            assert abs(got - rate) < 0.2, (lang, got, rate, total)

    def test_threshold_hex_monotone(self):
        assert _hex_threshold(0.0) == "00000000"
        assert _hex_threshold(1.0) == "ffffffff"
        assert _hex_threshold(0.25) < _hex_threshold(0.5) < _hex_threshold(0.9)


class TestEmbeddingQuantization:
    def test_reconstruction_error_bound(self, spark, sf_dir):
        """Symmetric max-abs int8: |x - q*scale| <= scale/2 everywhere
        (round-to-nearest), and the checksum pins the quantized values."""
        rows = CATALOG["embedding_quantize_int8"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.scale_r >= 0
            # max_abs_err is rounded to 4; allow that rounding as slack
            assert r.max_abs_err <= r.scale_r / 2 + 5e-4, r

    def test_zero_vector_safe(self, spark):
        from windowsession_using_kafka_flink_docker_spark.plans.curation import (
            embedding_quantize_int8,
        )
        # the registered builder reads parquet; exercise the zero-vector
        # edge through the same expressions on a literal frame
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.25])],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        e = F.transform("embedding", lambda x: x.cast("double"))
        s = df.select(
            "vec_id", e.alias("e"),
            (F.array_max(F.transform(e, F.abs)) / 127.0).alias("scale"),
        )
        q = s.withColumn(
            "qv",
            F.when(F.col("scale") == 0,
                   F.transform("e", lambda x: F.lit(0).cast("long")))
            .otherwise(F.transform("e", lambda x: F.round(x / F.col("scale"), 0).cast("long"))),
        ).collect()
        z = [r for r in q if r.vec_id == 1][0]
        assert z.qv == [0, 0, 0, 0] and z.scale == 0.0
        nz = [r for r in q if r.vec_id == 2][0]
        assert max(abs(v) for v in nz.qv) == 127
