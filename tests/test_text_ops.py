"""Heavy hitters + PII redaction: semantics on constructed inputs (the
oracle-parity sweep covers engine parity; these pin the behavior itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
    _PII_EMAIL,
    _PII_IP,
    _PII_PHONE,
)


def test_pii_patterns_redact_and_count(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or root@a.co, dial +44 (20) 7946-0958, "
             "from 192.168.0.1 and 10.255.255.255"),
         (2, "no pii here, just words and the number 42")],
        "doc_id long, t string",
    )
    red = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"),
                         _PII_IP, "<IP>"),
        _PII_PHONE, "<PHONE>")
    rows = {r.doc_id: r for r in df.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0))).alias("e"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0))).alias("p"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_IP), F.lit(0))).alias("i"),
        red.alias("r"),
    ).collect()}
    assert (rows[1].e, rows[1].p, rows[1].i) == (2, 1, 2)
    for tag in ("<EMAIL>", "<PHONE>", "<IP>"):
        assert tag in rows[1].r
    assert "@" not in rows[1].r and "192.168" not in rows[1].r
    assert (rows[2].e, rows[2].p, rows[2].i) == (0, 0, 0)
    assert rows[2].r == "no pii here, just words and the number 42"


def test_heavy_hitters_order_and_cut(spark, sf_dir):
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
    rows = CATALOG["heavy_hitter_tokens"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50  # sf0.001's synthetic vocab is < 50 tokens
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.token for r in rows)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The sketch's contract is RANK accuracy, not value accuracy: each
    approximate quantile must lie between the exact quantiles at q ± 2%
    (tail values can differ a lot in value space on small groups even when
    the rank is nearly exact)."""
    from windowsession_using_kafka_flink_docker_spark.plans.relational import (
        approx_percentiles,
    )
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    qs = [0.5, 0.9, 0.99]
    approx = {r.event_type: [r.p50, r.p90, r.p99]
              for r in approx_percentiles(spark, sf_dir).collect()}
    lo_hi = {
        r.event_type: (r.lo, r.hi)
        for r in load_table(spark, sf_dir, "events").groupBy("event_type")
        .agg(F.expr(f"percentile(value, array({','.join(str(max(q - 0.02, 0)) for q in qs)}))").alias("lo"),
             F.expr(f"percentile(value, array({','.join(str(min(q + 0.02, 1)) for q in qs)}))").alias("hi"))
        .collect()
    }
    assert set(approx) == set(lo_hi)
    for et, pcts in approx.items():
        lo, hi = lo_hi[et]
        for a, l, h in zip(pcts, lo, hi):
            assert l <= a <= h, (et, a, l, h)


def test_token_freq_edge_docs(spark):
    """The shared tokenize+count stage must survive the degenerate docs
    the verify recipe calls out: empty text, CJK-only (normalizes to
    nothing under the ascii tokenizer), and a single token — no crash,
    no phantom empty-string token."""
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        token_freq_from_docs,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "漢字テキストのみ"), (3, "one"), (4, "a b a")],
        "doc_id BIGINT, text STRING")
    freq = {r.token: r.n for r in token_freq_from_docs(docs).collect()}
    assert "" not in freq
    assert freq == {"one": 1, "a": 2, "b": 1}


class TestBpeTokenizerTrain:
    """BPE training (plans/llm_pipeline.py bpe_tokenizer_train): the
    distributed merge loop must equal a direct single-process reference
    implementation of classic word-level BPE — same pre-tokenization,
    same tie-break (count desc, pair lexical), same greedy
    left-to-right non-overlapping merge application — on the real
    corpus AND on hypothesis-generated word-frequency tables."""

    @staticmethod
    def _reference_bpe(word_freq: dict, n_merges: int) -> list:
        """Plain-Python classic BPE over a (word -> freq) table."""
        words = {"(" + ")(".join(list(w)) + ")(_)": f
                 for w, f in word_freq.items()}
        merges = []
        for step in range(1, n_merges + 1):
            pc: dict = {}
            for s, f in words.items():
                toks = s[1:-1].split(")(")
                for a, b in zip(toks, toks[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + f
            if not pc:
                break
            (l, r), c = sorted(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
            merges.append((step, l, r, l + r, c))
            nxt: dict = {}
            for s, f in words.items():
                nxt[s.replace(f"({l})({r})", f"({l}{r})")] = (
                    nxt.get(s.replace(f"({l})({r})", f"({l}{r})"), 0) + f)
            words = nxt
        return merges

    def test_matches_reference_on_corpus(self, spark, sf_dir):
        from collections import Counter

        from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import (
            normalized_text,
        )
        from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
        from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
            BPE_MERGES,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

        texts = [r[0] for r in load_table(spark, sf_dir, "documents")
                 .select(normalized_text("text")).collect()]
        freq = Counter(w for t in texts for w in t.split(" ") if w)
        want = self._reference_bpe(dict(freq), BPE_MERGES)
        got = sorted(
            (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in CATALOG["bpe_tokenizer_train"].spark(spark, sf_dir)
            .collect())
        assert got == want

    def test_hypothesis_word_tables(self, spark, tmp_path):
        """Random small word-frequency tables, including merge-overlap
        traps (runs like 'aaaa' where greedy non-overlap matters and
        words that collapse onto each other after a merge)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
            BPE_MERGES,
            bpe_tokenizer_train,
        )

        word = st.text(alphabet="abc", min_size=1, max_size=6)
        table = st.dictionaries(word, st.integers(1, 9),
                                min_size=1, max_size=8)

        @settings(max_examples=10, deadline=None)
        @given(table)
        def check(word_freq):
            # materialize a tiny corpus: each word repeated freq times
            text = " ".join(w for w, f in sorted(word_freq.items())
                            for _ in range(f))
            import os
            import uuid

            d = os.path.join(str(tmp_path), uuid.uuid4().hex)
            spark.createDataFrame(
                [(0, text, "en", "web")],
                "doc_id LONG, text STRING, lang STRING, source STRING",
            ).write.parquet(os.path.join(d, "documents.parquet"))
            got = sorted(
                (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
                for r in bpe_tokenizer_train(spark, d).collect())
            assert got == self._reference_bpe(word_freq, BPE_MERGES)

        check()


def test_bm25_duplicate_term_unification(spark, sf_dir):
    """The unified duplicate-query-term contract (SURVEY 2.105 finding
    7), LIVE in operators/text_analysis.py:bm25_topk since the
    r18-window landing: on a DUPLICATE-term query the batch scorer and
    the index scorer agree (the divergence the unification closed —
    qf-multiplicity weighting over an honest per-distinct-term df), and
    the qf weighting is real (duplicate and distinct top-10 differ)."""
    import shutil
    import tempfile

    import windowsession_using_kafka_flink_docker_spark.operators.bm25_index as B
    import windowsession_using_kafka_flink_docker_spark.operators.text_analysis as T
    from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    distinct = ("spark", "stream", "join")
    dup = ("spark", "spark", "stream", "join")

    def rows(df):
        return [(r.doc_id, r.bm25) for r in df.collect()]

    idx = tempfile.mkdtemp(prefix="bm25_unify_")
    try:
        B.bm25_index_export(spark, docs, idx)
        got_idx = rows(B.bm25_from_index(spark, idx, dup, 10))
        got_batch = rows(T.bm25_topk(docs, dup, k=10))
        assert got_idx == got_batch, "index vs unified batch on duplicates"
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    # the qf weighting is real: the duplicated query ranks by
    # 2*contrib(spark) + contrib(stream) + contrib(join) — distinct
    # and duplicate top-10 must differ unless spark's contribution is
    # degenerate, which it is not at these SFs
    assert rows(T.bm25_topk(docs, distinct, k=10)) != got_batch


def test_semantic_rrf_plan_shape_and_fusion(spark, sf_dir):
    """semantic_rrf_hybrid_search's scale promises: no cartesian
    product, no Python stage (the cosine leg is a broadcast of ONE
    query vector, never a corpus shuffle); and the fusion is
    non-trivial — the top-10 must contain a doc ranked by only one of
    the two legs (the whole point of RRF)."""
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        semantic_rrf_hybrid_search,
    )

    df = semantic_rrf_hybrid_search(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("extended")
    p = df._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    got = df.collect()
    assert len(got) == 10
    assert any(r.r_bm25 is None or r.r_sem is None for r in got)
