"""Bigram-LM quality scoring: exact cross-engine check of the smoothed
per-document log-probability against a DuckDB mirror, plus the behavioral
property the filter exists for (in-distribution text scores better than
out-of-distribution noise)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.lm import score_documents, train_bigram_lm

SF = "/root/testdata/sf0.001"
K = 0.5


def _score_sql() -> str:
    return rf"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PAT}') AS t
            FROM documents
        ),
        grams AS (
            -- list_zip pads to the longer list; the padded tail pair is
            -- (last, NULL) and tokens are never NULL, so filter it out
            SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
                SELECT doc_id, unnest(list_zip(t, t[2:])) AS p FROM toks
            ) WHERE p[2] IS NOT NULL
        ),
        uni AS (
            SELECT w1 AS w, COUNT(*) AS c1 FROM (
                SELECT doc_id, unnest(t) AS w1 FROM toks
            ) GROUP BY 1
        ),
        bi AS (
            SELECT w1, w2, COUNT(*) AS c2 FROM grams GROUP BY 1, 2
        ),
        v AS (SELECT COUNT(*) AS v FROM uni)
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               AVG(ln(COALESCE(b.c2, 0) + {K})
                   - ln(COALESCE(u.c1, 0) + {K} * v.v)) AS avg_logprob
        FROM grams g
        LEFT JOIN bi b USING (w1, w2)
        LEFT JOIN uni u ON g.w1 = u.w
        CROSS JOIN v
        GROUP BY g.doc_id
    """


def test_scores_match_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    uni, bi = train_bigram_lm(docs)
    got = {
        r.doc_id: r
        for r in score_documents(docs, uni, bi, k=K).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {r[0]: r for r in con.execute(_score_sql()).fetchall()}
    assert set(got) >= set(want)
    for doc_id, (_, n, avg) in want.items():
        assert got[doc_id].n_bigrams == n
        assert got[doc_id].avg_logprob == pytest.approx(avg, abs=1e-9)
    # docs absent from the mirror have <2 tokens -> NULL score, kept
    for doc_id, r in got.items():
        if doc_id not in want:
            assert r.avg_logprob is None and r.n_bigrams == 0


def test_in_distribution_scores_better_than_noise(spark):
    corpus = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    uni, bi = train_bigram_lm(corpus)
    # a document made of the corpus's most frequent bigram (strongly
    # in-distribution) vs unseen-token noise of similar length; the
    # synthetic corpus itself is near-uniform word salad, so an average
    # REAL document is not a reliable high-probability probe
    top = bi.orderBy(F.desc("c2"), "w1", "w2").first()
    fluent = " ".join([top.w1, top.w2] * 40)
    noise = " ".join(f"zqxv{i} qxzv" for i in range(40))
    probe = spark.createDataFrame(
        [(1, fluent), (2, noise)], "doc_id LONG, text STRING"
    )
    s = {
        r.doc_id: r.avg_logprob
        for r in score_documents(probe, uni, bi, k=K).collect()
    }
    assert s[1] > s[2]


def test_short_docs_and_invalid_k(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, "")], "doc_id LONG, text STRING"
    )
    uni, bi = train_bigram_lm(docs)
    out = {r.doc_id: r for r in score_documents(docs, uni, bi).collect()}
    assert out[1].n_bigrams == 0 and out[1].avg_logprob is None
    assert out[2].n_bigrams == 0
    with pytest.raises(ValueError):
        score_documents(docs, uni, bi, k=0)


def test_training_plan_is_partial_aggregated(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    uni, bi = train_bigram_lm(docs)
    for frame in (uni, bi):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan or "partial" in plan.lower()
        assert "CartesianProduct" not in plan
