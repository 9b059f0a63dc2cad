"""Corpus data card: exact DuckDB mirror over the real corpus, hand
fixture semantics (cross-slice dup attribution, empty docs, shares sum
to 1), and plan shape (one scan, partial aggregation)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ts_etl_spark.operators.datacard import (
    corpus_data_card,
    corpus_data_card_sql,
)

SF = "/root/testdata/sf0.01"


def test_duckdb_mirror_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(map(tuple, corpus_data_card(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(corpus_data_card_sql()).fetchall()))
    assert got == want and len(got) > 0


def test_hand_fixture_semantics(spark):
    text_ok = (
        "a perfectly ordinary informative document containing plenty of "
        "plain readable words for the quality gate to accept happily"
    )
    rows = [
        (1, text_ok, "en", "sA"),
        (2, text_ok, "en", "sB"),   # cross-slice exact dup (larger id flags)
        (3, "tiny", "en", "sA"),    # fails quality
        (4, "", "de", "sA"),        # empty: zero tokens, fails quality
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    card = {
        (r.source, r.lang): r
        for r in corpus_data_card(docs, group_cols=("source", "lang")).collect()
    }
    assert card[("sA", "en")].n_docs == 2
    assert card[("sA", "en")].exact_dup_rate == 0.0  # doc 1 is the keeper
    assert card[("sB", "en")].exact_dup_rate == 1.0  # doc 2 flagged, cross-slice
    assert card[("sA", "de")].n_ws_tokens == 0
    assert card[("sA", "de")].quality_rate == 0.0
    assert card[("sA", "en")].quality_rate == 0.5  # doc 1 passes, doc 3 fails
    assert abs(sum(r.doc_share for r in card.values()) - 1.0) < 1e-9


def test_single_scan_partial_agg_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        corpus_data_card(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") <= 2  # slice agg + 1-row total
    assert "CartesianProduct" not in plan
    assert "partial_" in plan or "HashAggregate" in plan


def test_top_ngrams_hand_fixture(spark):
    from ts_etl_spark.operators.datacard import top_ngrams

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    top = [tuple(r) for r in top_ngrams(docs, n=2, k=3).collect()]
    # "the cat" occurs in docs 1 and 2 (2 occurrences, 2 docs) — rank 1;
    # every other bigram occurs once, so ties order alphabetically
    assert top[0] == ("the cat", 2, 2)
    assert top[1:] == [("a dog", 1, 1), ("cat ran", 1, 1)]


def test_top_ngrams_mirror_and_by_docs(spark):
    import duckdb

    from ts_etl_spark.operators.datacard import top_ngrams, top_ngrams_sql

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    for by in ("occurrences", "docs"):
        got = [tuple(r) for r in top_ngrams(docs, n=3, k=25, by=by).collect()]
        want = [
            (g, int(o), int(d))
            for g, o, d in con.execute(
                top_ngrams_sql(n=3, k=25, by=by)
            ).fetchall()
        ]
        assert got == want and len(got) == 25


def test_top_ngrams_validation(spark):
    import pytest as _pytest

    from ts_etl_spark.operators.datacard import top_ngrams

    docs = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    with _pytest.raises(ValueError, match="by must be"):
        top_ngrams(docs, by="nope")
    with _pytest.raises(ValueError, match="n and k"):
        top_ngrams(docs, n=0)
