"""Incremental substring gate: exact equivalence to one-shot
mask_winnowed_spans over the union (the semantic_dedup_incremental proof
pattern), batch-boundary independence, crash-window replay idempotence,
and end-to-end ingest wiring."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.substrings import mask_winnowed_spans
from ts_etl_spark.streaming.ingest import ingest_batch, substring_gate

K, W, M = 4, 6, 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _rand_words(rng, n):
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def _one_shot(spark, rows, ids):
    out = mask_winnowed_spans(_docs(spark, rows), k=K, w=W, min_docs=M)
    return {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in out.collect()
        if r.doc_id in ids
    }


def _gate(spark, rows, path):
    persisted = []
    masked, delta = substring_gate(
        spark, _docs(spark, rows), path, k=K, w=W, min_docs=M,
        persisted=persisted,
    )
    got = {r.doc_id: (r.text, r.n_tokens_removed) for r in masked.collect()}
    delta_rows = [(r.doc_id, r.fp) for r in delta.collect()]
    for df in persisted:
        df.unpersist()
    return got, delta_rows


@pytest.fixture()
def corpus_rows():
    rng = random.Random(13)
    shared = _rand_words(rng, 12)  # >= w + k - 1 = 9 tokens: guaranteed
    return shared, [
        (1, f"{_rand_words(rng, 10)} {shared}"),
        (2, _rand_words(rng, 20)),
    ], rng


def test_gate_equals_one_shot_over_union(spark, tmp_path, corpus_rows):
    shared, batch1, rng = corpus_rows
    path = str(tmp_path / "win_index")
    _, delta1 = _gate(spark, batch1, path)
    spark.createDataFrame(
        delta1, "doc_id LONG, fp LONG"
    ).write.mode("append").parquet(path)

    batch2 = [
        (10, f"{shared} {_rand_words(rng, 7)}"),  # shares the run with doc 1
        (11, _rand_words(rng, 15)),  # novel
        (12, "tiny"),  # sub-k
    ]
    got, _ = _gate(spark, batch2, path)
    want = _one_shot(spark, batch1 + batch2, {10, 11, 12})
    assert got == want
    assert got[10][1] > 0, "cross-ingest repeated span masked"
    assert got[11][1] == 0 and got[12][1] == 0


def test_gate_first_batch_equals_one_shot(spark, tmp_path):
    """Empty index: the gate IS the one-shot masking of the batch."""
    rng = random.Random(29)
    shared = _rand_words(rng, 11)
    rows = [
        (1, f"{shared} {_rand_words(rng, 6)}"),
        (2, f"{_rand_words(rng, 5)} {shared}"),
        (3, _rand_words(rng, 18)),
    ]
    got, delta = _gate(spark, rows, str(tmp_path / "idx"))
    assert got == _one_shot(spark, rows, {1, 2, 3})
    assert got[1][1] > 0 and got[2][1] > 0
    assert {d for d, _ in delta} == {1, 2, 3}, "delta covers every winnowed doc"


def test_crash_window_replay_idempotent(spark, tmp_path, corpus_rows):
    """Index delta landed, corpus append didn't: re-gating the same batch
    yields identical masking and an empty delta."""
    shared, batch1, rng = corpus_rows
    path = str(tmp_path / "win_index")
    got1, delta1 = _gate(spark, batch1, path)
    spark.createDataFrame(
        delta1, "doc_id LONG, fp LONG"
    ).write.mode("append").parquet(path)  # ...crash here
    got2, delta2 = _gate(spark, batch1, path)
    assert got2 == got1, "replay masking identical (fp set union)"
    assert delta2 == [], "replayed delta no-ops"


def test_ingest_batch_with_substring_gate(spark, tmp_path):
    """End-to-end: boilerplate repeated across two ingests is attenuated
    in the second batch's stored documents (module defaults need a >= 32
    token shared run), and replay leaves corpus + index unchanged. Large
    unique regions keep the docs below the MinHash near-dup threshold
    even unmasked, so the assertion tests the SUBSTRING gate, not the
    near-dup gate (guarantee-based, not seed-based)."""
    rng = random.Random(41)
    boiler = _rand_words(rng, 40)
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    b1 = _docs(spark, [(1, f"{boiler} {_rand_words(rng, 80)}")])
    b2 = _docs(spark, [(2, f"{_rand_words(rng, 80)} {boiler}")])
    ingest_batch(spark, b1, corpus_path, win_index_path=win_path)
    ingest_batch(spark, b2, corpus_path, win_index_path=win_path)
    stored = {r.doc_id: r.text for r in spark.read.parquet(corpus_path).collect()}
    assert set(stored) == {1, 2}
    # batch 1 saw no prior fps -> stored intact (lowercased canonical form)
    assert len(stored[1].split()) == 120
    # batch 2's shared run attenuated before storage: the winnow
    # guarantee flags >= one full 8-token span; unique text survives
    n2 = len(stored[2].split())
    assert 80 <= n2 <= 112
    ingest_batch(spark, b2, corpus_path, win_index_path=win_path)  # replay
    stored2 = {r.doc_id: r.text for r in spark.read.parquet(corpus_path).collect()}
    idx = spark.read.parquet(win_path)
    assert stored2 == stored
    assert idx.groupBy("doc_id").count().filter(F.col("doc_id") == 2).count() == 1
