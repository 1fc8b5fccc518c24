"""Winnowing fingerprints: ANSI-mode edge docs must not crash, the
winnowing guarantee must hold, and the pair op must find planted overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def test_edge_docs_no_crash_under_ansi(spark):
    """Empty, symbol-only, CJK-only, and shorter-than-k docs all normalize
    to tiny/empty strings — historically the element_at/sequence crash
    class under Spark 4 ANSI mode."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "!!! ???"), (3, "你好世界"),
         (4, "tiny"), (5, "exactly8"), (6, "a decently long english document "
                                           "with plenty of characters")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in winnow_fingerprints(docs).collect()}
    assert rows[1].fp == [] and rows[1].n_grams == 0
    assert rows[2].fp == [] and rows[3].fp == []
    assert rows[4].fp == []            # 4 chars < k=8
    assert len(rows[5].fp) == 1        # exactly one gram -> one fingerprint
    assert rows[6].n_grams > 0 and 0 < len(rows[6].fp) < rows[6].n_grams


def test_shared_substring_yields_shared_fingerprint(spark):
    """The winnowing guarantee: a shared substring of length >= k + w - 1
    (= 11 normalized chars here) produces at least one shared fingerprint."""
    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(1, "PREFIX AAA " + shared + " SUFFIX ONE"),
         (2, "totally different opening " + shared + " and closing words"),
         (3, "no overlap here at all, completely unrelated content xyz")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in winnow_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_selection_density(spark, sf_dir):
    """Winnowing keeps roughly 2/(w+1) of grams (before dedup) — assert the
    fingerprint count is a small fraction of the gram count, which is the
    whole scale argument for indexing fingerprints instead of grams."""
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
    agg = (
        winnow_fingerprints(load_table(spark, sf_dir, "documents"))
        .agg(F.sum("n_grams").alias("g"), F.sum(F.size("fp")).alias("f"))
        .collect()[0]
    )
    assert 0 < agg.f < 0.6 * agg.g


class TestVectorizedMinima:
    """winnow_minima_udf must equal the pure-expression window-minima
    form on the real corpus and on degenerate gram arrays."""

    def test_matches_expression_form_on_corpus(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from windowsession_using_kafka_flink_docker_spark.operators import (
            winnow as W,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents")
        fps = W.winnow_fingerprints(docs)  # UDF form
        # recompute the gram stage and apply the expression form
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        normed = docs.repartition(n_part, F.col("doc_id")).select(
            "doc_id", W._norm_expr(F.col("text")).alias("_t"))
        k = W.DEFAULT_K
        grams = normed.select(
            "doc_id",
            F.when(
                F.length("_t") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length("_t") - k + 1),
                    lambda i: F.md5(
                        F.substr(F.col("_t"), i, F.lit(k)).cast("binary")),
                ),
            ).otherwise(F.array().cast("array<string>")).alias("_g"))
        ref = grams.select(
            "doc_id", W.winnow_minima_expr(F.col("_g")).alias("fp_ref"))
        diff = (fps.join(ref, "doc_id")
                .where(F.expr("fp IS DISTINCT FROM fp_ref")).count())
        assert diff == 0

    def test_degenerate_gram_arrays(self, spark):
        from pyspark.sql import functions as F

        from windowsession_using_kafka_flink_docker_spark.operators import (
            winnow as W,
        )

        rows = spark.createDataFrame(
            [(1, []), (2, ["bb"]), (3, ["bb", "aa"]),
             (4, ["dd", "cc", "bb", "aa", "ee", "aa"])],
            "doc_id BIGINT, _g ARRAY<STRING>")
        both = rows.select(
            "doc_id",
            W.winnow_minima_expr(F.col("_g")).alias("ref"),
            W.winnow_minima_udf()(F.col("_g")).alias("got")).collect()
        for r in both:
            assert list(r.ref) == list(r.got), r.doc_id
