"""Document embedding: exact parity with a pure-Python reference of the
hashed-BoW derivation, unit norm, determinism, similarity structure, the
pluggable-embedder seam, and composition with the similarity surface."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.embedding import DEFAULT_DIM, embed_documents

SF = "/root/testdata/sf0.001"


def _py_embed(text: str, dim: int) -> list[float] | None:
    vec = [0] * dim
    for w in re.findall(WORD_PAT, text.lower()):
        h = hashlib.md5(f"emb#{w}".encode()).hexdigest()
        bucket = int(h[:8], 16) % dim
        sign = 1 if int(h[8], 16) % 2 == 0 else -1
        vec[bucket] += sign
    # same expression order as the Spark side: sum of squares in index
    # order, then one division per element
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    n = math.sqrt(acc)
    if n == 0:
        return None
    return [float(x) / n for x in vec]


def test_matches_pure_python_reference_exactly(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(25)
    )
    got = {r.doc_id: r.embedding for r in embed_documents(docs).collect()}
    for r in docs.collect():
        want = _py_embed(r.text, DEFAULT_DIM)
        assert got[r.doc_id] == want, r.doc_id  # bit-exact, not approx


def test_norm_null_contract_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "some real words in here"), (2, ""), (3, None)],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r.embedding for r in embed_documents(docs).collect()}
    assert out[2] is None and out[3] is None
    assert sum(x * x for x in out[1]) == pytest.approx(1.0, abs=1e-12)
    # partition-independent
    again = {
        r.doc_id: r.embedding
        for r in embed_documents(docs.repartition(7)).collect()
    }
    assert again == out
    with pytest.raises(ValueError, match="dim"):
        embed_documents(docs, dim=1)


def test_similarity_structure(spark):
    """Lexically-overlapping documents embed closer than disjoint ones —
    the property that makes the hashed BoW a usable ANN baseline."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "completely different vocabulary nothing shared whatsoever"),
        ],
        "doc_id LONG, text STRING",
    )
    e = {r.doc_id: r.embedding for r in embed_documents(docs).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(e[1], e[2]) > 0.7 > cos(e[1], e[3])


def test_pluggable_embedder_seam(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")

    def fake(df):
        return df.select("doc_id", F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))

    out = embed_documents(docs, embedder=fake).first()
    assert out.embedding == [1.0, 0.0]

    def broken(df):
        return df.select("doc_id")

    with pytest.raises(ValueError, match="missing columns"):
        embed_documents(docs, embedder=broken)


def test_composes_with_similarity_surface(spark):
    """documents -> embed -> brute-force cosine top-k: the full
    text-to-ANN path using only this engine's operators."""
    from ts_etl_spark.operators.similarity import brute_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    emb = embed_documents(docs).filter(F.col("embedding").isNotNull())
    vecs = emb.select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").alias("v"),
        F.lit(1.0).alias("nrm"),  # unit-normalized by construction
    )
    q = vecs.limit(3).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    top = brute_topk(vecs, q, top_k=5).collect()
    assert len(top) == 15
    assert all(-1.0001 <= r.cosine <= 1.0001 for r in top)


def test_plan_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = (
        embed_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_embdoc_arm_mirrors_embed_documents(spark, sf_smoke):
    """Round-11 gate: the embdoc arm of embed_topk is exactly
    embed_documents' output exploded — one row per (doc, component),
    dim rows per embedded doc, values the rounded components."""
    from ts_etl_spark.operators.embedding import DEFAULT_DIM, embed_documents
    from ts_etl_spark.operators.similarity import q_embed_topk
    from ts_etl_spark.sources.tables import load_table

    arm = (
        q_embed_topk(spark, sf_smoke)
        .filter("op = 'embdoc'")
        .collect()
    )
    direct = {
        r.doc_id: r.embedding
        for r in embed_documents(
            load_table(spark, sf_smoke, "documents")
        ).collect()
        if r.embedding is not None
    }
    assert len(arm) == len(direct) * DEFAULT_DIM
    for r in arm[:200]:
        assert r.cosine == round(direct[r.q_id][r.neighbor_id], 6)
        assert r.rn == r.neighbor_id + 1
