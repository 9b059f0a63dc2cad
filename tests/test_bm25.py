"""BM25 sparse retrieval (operators/bm25.py) — differential correctness
against an independent pure-Python scorer, two-phase top-k exactness,
edge cases, and the plan shapes that keep it linear at 100 TB."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ts_etl_spark.operators.bm25 import (
    B,
    BM25_QUERIES,
    K1,
    SALT_BUCKETS,
    WORD_PAT,
    bm25_oracle_sql,
    bm25_stats,
    bm25_topk,
)
from ts_etl_spark.plans.audit import count_nodes, num_exchanges, plan_str


def _py_bm25(rows, queries, top_k):
    """Independent reference: plain-Python Okapi BM25 over (doc_id, text)
    rows — no shared code with the Spark plan beyond the constants."""
    pat = re.compile(WORD_PAT)
    toks = {d: pat.findall((t or "").lower()) for d, t in rows}
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    out = {}
    for q_id, q in queries.items():
        terms = sorted(set(q.split()))
        df = {
            t: sum(1 for ws in toks.values() if t in ws) for t in terms
        }
        scores = []
        for d, ws in toks.items():
            c = Counter(ws)
            s = 0.0
            for t in terms:
                if c[t] == 0 or df[t] == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                tf = c[t]
                s += idf * (tf * (K1 + 1.0)) / (
                    tf + K1 * ((1.0 - B) + B * (len(ws) / avgdl))
                )
            if s > 0.0:
                scores.append((round(s, 6), d))
        scores.sort(key=lambda x: (-x[0], x[1]))
        out[q_id] = [(d, s) for s, d in scores[:top_k]]
    return out


def test_bm25_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    expected = _py_bm25(rows, BM25_QUERIES, top_k=5)
    got = bm25_topk(docs).orderBy("q_id", "rn").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["doc_id"], r["score"]))
    assert set(by_q) == set(expected)
    for q_id in expected:
        assert by_q[q_id] == [
            (d, pytest.approx(s, abs=1.5e-6)) for d, s in expected[q_id]
        ], f"query {q_id}"


def test_two_phase_topk_equals_single_phase(spark):
    """The salted phase-1 prune must not change the exact top-k: compare
    against a direct single-window ranking of the same summed scores.
    Run deeper than the salt multiple (top_k=40 > SALT_BUCKETS) so a
    bucket-starvation bug (a bucket holding >top_k true winners) would
    surface."""
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    top_k = 40
    assert top_k > SALT_BUCKETS
    got = {
        (r["q_id"], r["rn"]): (r["doc_id"], r["score"])
        for r in bm25_topk(docs, top_k=top_k).collect()
    }
    # single-phase truth: rank ALL scored docs with one window
    stats = bm25_stats(docs)
    all_scored = bm25_topk(docs, stats=stats, top_k=10**9)
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), "doc_id")
    truth = {
        (r["q_id"], r["rn"]): (r["doc_id"], r["score"])
        for r in all_scored.select(
            "q_id", "doc_id", "score",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= top_k).collect()
    }
    assert got == truth


def test_rare_term_outranks_common(spark):
    """'dup' is the corpus's one rare term (df ≈ 5%): every doc in query
    1's ('dup scan') top-5 must actually contain 'dup' — idf dominating
    is the point of BM25, and a df/idf mix-up would surface here."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    top = bm25_topk(docs).filter("q_id = 1").collect()
    assert len(top) == 5
    ids = [r["doc_id"] for r in top]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(ids)).collect()
    }
    pat = re.compile(WORD_PAT)
    for d in ids:
        assert "dup" in pat.findall(texts[d].lower()), f"doc {d}"


def test_unmatched_terms_and_queries(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # a query mixing live terms with a term absent from the corpus ranks
    # by the live terms alone; an all-absent query emits no rows
    qs = {7: "hash zzzzunseen", 8: "qqqmissing zzzzunseen"}
    got = bm25_topk(docs, queries=qs).collect()
    assert {r["q_id"] for r in got} == {7}
    live = bm25_topk(docs, queries={7: "hash"}).collect()
    assert sorted((r["doc_id"], r["score"]) for r in got) == sorted(
        (r["doc_id"], r["score"]) for r in live
    )


def test_all_unmatched_returns_empty_frame(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = bm25_topk(docs, queries={0: "qqqmissing"})
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "q_id", "doc_id", "score", "rn",
    ]


def test_null_text_counts_toward_avgdl(spark):
    """NULL text coalesces to dl = 0 on BOTH engines (Spark size(NULL)
    is -1 — the exact bug the coalesce guards): a corpus with a null doc
    must score like one with an explicitly empty doc."""
    base = [(0, "hash join hash"), (1, "join table"), (2, "hash scan")]
    with_null = spark.createDataFrame(
        base + [(3, None)], "doc_id long, text string"
    )
    with_empty = spark.createDataFrame(
        base + [(3, "")], "doc_id long, text string"
    )
    a = sorted(map(tuple, bm25_topk(with_null, queries={0: "hash"}).collect()))
    b = sorted(map(tuple, bm25_topk(with_empty, queries={0: "hash"}).collect()))
    assert a == b and len(a) == 2


def test_empty_corpus_raises(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_stats(docs)


def test_bm25_plan_shape(spark):
    """No Python UDF; the query/idf side broadcasts; the whole retrieval
    stays within a fixed exchange budget (tf aggregate, per-(q,doc) sum,
    the two top-k windows) — no corpus-squared joins anywhere."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    stats = bm25_stats(docs)
    df = bm25_topk(docs, stats=stats)
    p = plan_str(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert count_nodes(df, "BroadcastHashJoin") >= 1, p
    assert num_exchanges(df) <= 6, p


def test_oracle_sql_duckdb_bit_match(spark):
    """The in-repo differential: DuckDB runs the oracle twin and every
    (q_id, doc_id, score, rn) cell matches the Spark result EXACTLY —
    the same comparison the driver's correctness gate performs."""
    duckdb = pytest.importorskip("duckdb")
    got = sorted(
        map(tuple, bm25_topk(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        ).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{SF_SMOKE}/documents.parquet')"
    )
    exp = sorted(
        (int(q), int(d), float(s), int(r))
        for q, d, s, r in con.execute(bm25_oracle_sql()).fetchall()
    )
    assert got == exp
