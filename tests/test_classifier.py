"""Hashing-trick linear scorer: bit-exact DuckDB mirror (the md5-derived
weights are multiples of 2^-31, so sums are exact in doubles regardless
of order), derived-vs-table path equivalence, token-less-document
contract, and the zero-shuffle plan claim for the derived path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.classifier import (
    N_BUCKETS,
    derived_weight,
    score_hashed_linear,
    score_hashed_linear_sql,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_scores_exactly_match_duckdb(spark):
    got = {
        r.doc_id: (r.n_tokens, r.activation, r.score)
        for r in score_hashed_linear(_docs(spark)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {
        d: (n, a, s)
        for d, n, a, s in con.execute(
            f"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '{WORD_PAT}') AS t
                FROM documents
            )
            {score_hashed_linear_sql()}
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0], d
        # the ACTIVATION is bit-exact (weights are multiples of 2^-31, so
        # sums are order-independent-exact); the sigmoid goes through
        # libm exp, which is last-ulp engine-dependent
        assert got[d][1] == want[d][1], (d, got[d], want[d])
        assert got[d][2] == pytest.approx(want[d][2], abs=1e-12), d


def test_tokenless_document_scores_null(spark):
    docs = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   "), (4, None)],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in score_hashed_linear(docs).collect()}
    assert got[1].n_tokens > 0 and got[1].score is not None
    assert 0.0 < got[1].score < 1.0
    for d in (2, 3):
        assert got[d].n_tokens == 0 and got[d].score is None, d
    # null text: no tokens, no evidence
    assert got[4].score is None


def test_weight_table_path_matches_derived_path(spark):
    """Materializing the derived weights as an explicit (bucket, weight)
    table and scoring through the broadcast-join path must reproduce the
    inline path exactly — the proof the external-trainer seam computes
    the same model."""
    docs = _docs(spark).limit(50)
    wtab = spark.range(N_BUCKETS).select(
        F.col("id").cast("bigint").alias("bucket"),
        derived_weight(F.col("id")).alias("weight"),
    )
    inline = {
        r.doc_id: (r.n_tokens, r.activation, r.score)
        for r in score_hashed_linear(docs).collect()
    }
    joined = {
        r.doc_id: (r.n_tokens, r.activation, r.score)
        for r in score_hashed_linear(docs, weights=wtab).collect()
    }
    assert inline == joined


def test_absent_buckets_weigh_zero(spark):
    """A weight table that covers NO bucket scores every document at
    sigmoid(bias) — the unseen-feature convention."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id LONG, text STRING"
    )
    empty = spark.createDataFrame([], "bucket BIGINT, weight DOUBLE")
    got = score_hashed_linear(docs, weights=empty, bias=0.0).first()
    assert got.n_tokens == 3
    assert got.score == pytest.approx(0.5, abs=1e-12)


def test_derived_path_plan_is_shuffle_free(spark):
    """The inline-weight path must be a pure projection on the scan — no
    Exchange, no join, no Python UDF (the shape that scores 100 TB at
    scan bandwidth)."""
    plan = (
        score_hashed_linear(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
