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
