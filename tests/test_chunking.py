"""Chunking: exact reconstruction, overlap contract, keep-every-row, and
the shuffle-free plan the operator exists for."""

from __future__ import annotations

import pytest

from ts_etl_spark.operators.chunking import chunk_documents

SF = "/root/testdata/sf0.001"
CHUNK, OVERLAP = 300, 50


def test_chunks_reconstruct_documents_exactly(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    chunks = chunk_documents(docs, CHUNK, OVERLAP).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    stride = CHUNK - OVERLAP
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        # stable ids and offsets
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert [r.char_start for r in rows] == [
            i * stride for i in range(len(rows))
        ]
        # dropping each chunk's overlap prefix reconstructs the text
        rebuilt = rows[0].chunk + "".join(
            r.chunk[OVERLAP:] for r in rows[1:]
        )
        assert rebuilt == texts[doc_id]
        # every chunk except the last is exactly CHUNK chars, and
        # consecutive chunks agree on their shared overlap
        for a, b in zip(rows, rows[1:]):
            assert len(a.chunk) == CHUNK
            assert a.chunk[-OVERLAP:] == b.chunk[:OVERLAP]


def test_empty_and_null_documents_keep_one_row(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "abc")], "doc_id LONG, text STRING"
    )
    rows = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in chunk_documents(docs, 10, 2).collect()
    }
    assert rows == {(1, 0): "", (2, 0): "", (3, 0): "abc"}


def test_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 100, overlap=100)


def test_plan_has_no_shuffle_or_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        chunk_documents(docs, CHUNK, OVERLAP)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode fan-out
    assert "EvalPython" not in plan
