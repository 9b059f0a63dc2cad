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


@pytest.mark.slow
def test_ingest_all_three_gates_compose(spark, tmp_path):
    """The full gate stack in one ingest flow — substring gate first
    (text rewrite), then fingerprint/MinHash incremental dedup, then the
    semantic gate — each case landing at its documented gate across two
    batches. Two interplay contracts this test pins down:

    - a full-document duplicate drops at the PRE-mask exact layer
      (round 9): the raw batch is fingerprint-checked against the
      corpus BEFORE the substring gate rewrites text, so byte-identical
      re-submissions never reach masking at all (see
      test_long_duplicate_drops_exact_premask for why post-mask
      verdicts alone are not enough);
    - the hashed-BoW embedding seam makes LONG documents look alike
      (counts over 64 dims concentrate: the two 120-token docs here
      measure cosine 0.9953 under the pinned seed), so the composed
      flow pins the semantic threshold at 0.999: only true bag-equal
      paraphrases (cosine exactly 1.0) drop — the deterministic
      contract a fake-embedding test can assert. A real embedding model
      does not saturate this way; the threshold is a property of the
      test seam, not of the gate."""
    from ts_etl_spark.operators.embedding import embed_documents
    from ts_etl_spark.operators.similarity import (
        as_double,
        norm,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as SF

    rng = random.Random(53)
    boiler = _rand_words(rng, 40)
    uniq1 = _rand_words(rng, 80)
    uniq2 = _rand_words(rng, 80)
    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    A_PARA = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    idx_path = str(tmp_path / "sem_idx")
    cents_path = str(tmp_path / "cents")

    seed_docs = _docs(
        spark, [(i, f"seed doc {i} w{i} w{i+1}") for i in range(10)]
    )
    v = as_double(SF.col("embedding"))
    seed_vecs = (
        embed_documents(seed_docs)
        .filter(SF.col("embedding").isNotNull())
        .select(SF.col("doc_id").alias("vec_id"), v.alias("v"), norm(v).alias("nrm"))
    )
    train_ivf_centroids(seed_vecs, k=3, seed=7, max_iter=2).write.parquet(
        cents_path
    )

    kw = dict(
        win_index_path=win_path,
        sem_index_path=idx_path,
        sem_cents_path=cents_path,
        sem_threshold=0.999,
    )
    b1 = _docs(spark, [(1, f"{boiler} {uniq1}"), (2, A)])
    ingest_batch(spark, b1, corpus_path, **kw)
    b2 = _docs(
        spark,
        [
            (10, f"{uniq2} {boiler}"),  # boilerplate: attenuated, kept
            (11, f"{boiler} {uniq1}"),  # full copy of 1 -> masked, then near-dup drop
            (12, A_PARA),  # bag-equal paraphrase of 2 -> semantic gate
            (13, "totally novel words about entirely different topics here now"),
        ],
    )
    ingest_batch(spark, b2, corpus_path, **kw)
    stored = {r.doc_id: r.text for r in spark.read.parquet(corpus_path).collect()}
    assert set(stored) == {1, 2, 10, 13}, (
        "duplicate 11 and paraphrase 12 dropped; boiler doc 10 and novel 13 kept"
    )
    n10 = len(stored[10].split())
    assert 80 <= n10 <= 112, "doc 10's cross-batch boilerplate attenuated"
    # semantic index records vectors SEEN among semantic-gate arrivals
    sem_ids = {r.vec_id for r in spark.read.parquet(idx_path).collect()}
    assert 12 in sem_ids, "dropped paraphrase indexed as future dominator"
    assert 11 not in sem_ids, "near-dup-dropped doc never reached the semantic gate"


def test_long_duplicate_drops_exact_premask(spark, tmp_path):
    """Round-9 regression (r8 ADVICE, high): a byte-identical
    re-submission of a LONG stored document must drop even though
    substring masking would gut it below the MinHash threshold — at
    module defaults (k=8, w=25, min_docs=2) a full duplicate of a
    240-token doc shares every winnow fingerprint with its stored
    original, so every selected span flags and the masked copy measures
    3-gram Jaccard ~0.35 vs the original, under JACCARD_THRESHOLD=0.4.
    Before the pre-mask exact gate, that mangled copy was re-admitted.
    Also pins: a case-variant duplicate drops too (the canonical
    fingerprint is case/whitespace-normalized and unflagged originals
    are stored byte-identical), and exact-dropped docs contribute no
    winnow-index rows (re-crawls cannot inflate repetition counts)."""
    rng = random.Random(97)
    text = _rand_words(rng, 240)
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    ingest_batch(
        spark, _docs(spark, [(1, text)]), corpus_path,
        win_index_path=win_path,
    )
    ingest_batch(
        spark,
        _docs(spark, [(11, text), (12, text.upper())]),
        corpus_path,
        win_index_path=win_path,
    )
    stored = {r.doc_id: r.text for r in spark.read.parquet(corpus_path).collect()}
    assert set(stored) == {1}, "byte- and case-variant duplicates dropped"
    assert stored[1] == text, "unflagged original stored byte-identical"
    idx_ids = {
        r.doc_id for r in spark.read.parquet(win_path).select("doc_id").collect()
    }
    assert idx_ids == {1}, "exact-dropped duplicates left no index rows"


@pytest.mark.slow
def test_recrawl_new_id_of_masked_doc_drops(spark, tmp_path):
    """Round-10 regression (r9 ADVICE, medium): a NEW-doc_id re-crawl of a
    document that was MASKED at its own ingest must drop. Pre-fix, the
    re-crawl's ingest-1 fingerprints sat in the winnow index, so every
    selected span of the re-crawl counted ≥2 distinct docs and it
    re-masked MORE aggressively than the stored copy — missing the exact
    layer (texts differ) and, for long docs, the MinHash layer (the
    fully-masked copy measures Jaccard below threshold against the
    partially-masked stored text) — and was re-admitted. The
    original-fingerprint index catches it at the pre-mask gate."""
    rng = random.Random(71)
    boiler = _rand_words(rng, 40)
    orig2 = f"{_rand_words(rng, 200)} {boiler}"
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    ingest_batch(
        spark, _docs(spark, [(1, f"{boiler} {_rand_words(rng, 200)}")]),
        corpus_path, win_index_path=win_path,
    )
    ingest_batch(
        spark, _docs(spark, [(2, orig2)]), corpus_path,
        win_index_path=win_path,
    )
    stored = {r.doc_id: r.text for r in spark.read.parquet(corpus_path).collect()}
    assert set(stored) == {1, 2}
    assert len(stored[2].split()) < 240, "doc 2 stored masked (precondition)"
    # re-crawl of doc 2's ORIGINAL text under a brand-new id
    ingest_batch(
        spark, _docs(spark, [(30, orig2)]), corpus_path,
        win_index_path=win_path,
    )
    stored2 = {r.doc_id for r in spark.read.parquet(corpus_path).collect()}
    assert stored2 == {1, 2}, "new-id re-crawl of a masked doc re-admitted"
    idx_ids = {
        r.doc_id for r in spark.read.parquet(win_path).select("doc_id").collect()
    }
    assert 30 not in idx_ids, "pre-dropped re-crawl left winnow index rows"


@pytest.mark.slow
def test_recrawl_of_later_gate_dropped_doc_drops(spark, tmp_path):
    """A document dropped at the MinHash layer is still a gate ENTRANT:
    its original fingerprint is indexed, so a new-id copy of the same
    text pre-drops instead of replaying the (masking-divergent) path."""
    rng = random.Random(83)
    words = _rand_words(rng, 240).split()
    base = " ".join(words)
    # every 8th word mutated: longest shared run = 7 tokens < WINNOW_K=8,
    # so the substring gate flags NOTHING, while 3-gram Jaccard stays
    # ~0.45 > JACCARD_THRESHOLD=0.4 — the doc reaches and drops at the
    # MinHash layer unmasked
    mutated = list(words)
    for i in range(0, len(mutated), 8):
        mutated[i] = f"x{i}"
    neardup = " ".join(mutated)
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    ingest_batch(
        spark, _docs(spark, [(1, base)]), corpus_path, win_index_path=win_path
    )
    ingest_batch(
        spark, _docs(spark, [(2, neardup)]), corpus_path,
        win_index_path=win_path,
    )
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1}, (
        "near-dup dropped (precondition)"
    )
    ingest_batch(
        spark, _docs(spark, [(20, neardup)]), corpus_path,
        win_index_path=win_path,
    )
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1}, (
        "new-id copy of a near-dup-dropped doc re-admitted"
    )


def test_fp_index_bootstraps_from_preexisting_corpus(spark, tmp_path):
    """Adopting the substring gate on a corpus built WITHOUT it: the
    original-fingerprint index seeds from stored corpus text, so
    byte-identical re-submissions of stored docs still pre-drop on the
    very first gated batch (the pre-index probe semantics)."""
    rng = random.Random(59)
    text = _rand_words(rng, 240)
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    ingest_batch(spark, _docs(spark, [(1, text)]), corpus_path)  # no gate
    ingest_batch(
        spark,
        _docs(spark, [(10, text), (11, _rand_words(rng, 30))]),
        corpus_path,
        win_index_path=win_path,
    )
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {
        1,
        11,
    }, "stored duplicate pre-dropped via bootstrap; novel doc kept"


@pytest.mark.slow
def test_fp_index_crash_window_replay_converges(spark, tmp_path):
    """The fp delta lands strictly AFTER the corpus append. Simulate a
    crash in that window (corpus grown, fp index not) by rolling the fp
    index back to its pre-batch file set, then replay: the corpus must
    not double-ingest, and the replayed delta must converge the index
    (a subsequent new-id re-crawl pre-drops)."""
    import os

    from ts_etl_spark.streaming.ingest import orig_fp_index_path

    rng = random.Random(67)
    boiler = _rand_words(rng, 40)
    orig2 = f"{_rand_words(rng, 200)} {boiler}"
    corpus_path = str(tmp_path / "corpus")
    win_path = str(tmp_path / "win")
    fp_path = orig_fp_index_path(win_path)
    ingest_batch(
        spark, _docs(spark, [(1, f"{boiler} {_rand_words(rng, 200)}")]),
        corpus_path, win_index_path=win_path,
    )
    before = set(os.listdir(fp_path))
    batch2 = _docs(spark, [(2, orig2)])
    ingest_batch(spark, batch2, corpus_path, win_index_path=win_path)
    for name in set(os.listdir(fp_path)) - before:  # ...crash here
        os.remove(os.path.join(fp_path, name))
    ingest_batch(spark, batch2, corpus_path, win_index_path=win_path)  # replay
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus_path).collect()
    ) == [1, 2], "replay double-ingested or lost the batch"
    ingest_batch(
        spark, _docs(spark, [(30, orig2)]), corpus_path,
        win_index_path=win_path,
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus_path).collect()
    ) == [1, 2], "index did not converge: post-replay re-crawl re-admitted"


@pytest.mark.slow
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
    # batch 1 saw no prior fps -> unflagged, stored byte-identical
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
