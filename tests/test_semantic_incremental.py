"""Incremental SemDeDup: equivalence with one-shot semantic_dedup over
the union, multi-batch convergence, and the ingest semantic gate
(paraphrase drops, NULL-embedding tolerance, replay/crash idempotence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.similarity import (
    BLOCK_CENTROIDS,
    SEMDEDUP_THRESHOLD,
    _vectors,
    ivf_assign,
    semantic_dedup,
    semantic_dedup_incremental,
)
from ts_etl_spark.streaming.ingest import ingest_batch, semantic_gate

SF = "/root/testdata/sf0.01"


def _seed_cents(vecs):
    return vecs.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + BLOCK_CENTROIDS)
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )


def test_incremental_equals_one_shot_over_union(spark):
    """A batch deduped against the assigned corpus gets EXACTLY the
    verdicts the one-shot semantic_dedup over corpus ∪ batch gives its
    rows — and the corpus rows' one-shot verdicts don't depend on the
    batch (ingest-order ids), so recuration is never needed."""
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        corpus = vecs.filter(F.col("vec_id") < 250)
        batch = vecs.filter(F.col("vec_id") >= 250)
        corpus_assigned = ivf_assign(corpus, cents, n_assign=1)
        got = sorted(
            map(
                tuple,
                semantic_dedup_incremental(
                    batch, corpus_assigned, cents
                ).collect(),
            )
        )
        union_rows = semantic_dedup(vecs, cents).collect()
        want_batch = sorted(tuple(r) for r in union_rows if r.vec_id >= 250)
        assert got == want_batch and len(got) > 0
        assert any(not r[2] for r in got), "non-vacuous: some batch row drops"
        corpus_only = sorted(
            map(tuple, semantic_dedup(corpus, cents).collect())
        )
        want_corpus = sorted(tuple(r) for r in union_rows if r.vec_id < 250)
        assert corpus_only == want_corpus
    finally:
        vecs.unpersist()


def test_sequential_batches_converge_to_one_shot(spark):
    """Ingesting in increments — advancing the assigned index with ALL of
    each round's rows (kept and dropped; dropped vectors remain future
    dominators under the one-shot policy) — reproduces the one-shot
    verdicts for every row regardless of batch boundaries."""
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        splits = [
            vecs.filter(F.col("vec_id") < 200),
            vecs.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 350)),
            vecs.filter(F.col("vec_id") >= 350),
        ]
        assigned = ivf_assign(splits[0], cents, n_assign=1)
        got = [
            tuple(r)
            for r in semantic_dedup(splits[0], cents).collect()
        ]
        for part in splits[1:]:
            got += [
                tuple(r)
                for r in semantic_dedup_incremental(
                    part, assigned, cents
                ).collect()
            ]
            assigned = assigned.unionByName(
                ivf_assign(part, cents, n_assign=1)
            ).persist()
        want = sorted(map(tuple, semantic_dedup(vecs, cents).collect()))
        assert sorted(got) == want
    finally:
        vecs.unpersist()


# --- the ingest semantic gate -------------------------------------------

DOC_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
#: same bag of words as DOC_A reordered — identical hashed-BoW embedding,
#: a paraphrase the fingerprint/MinHash layer (which sees shingle sets)
#: can miss but the embedding layer cannot
DOC_A_PARA = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
DOC_B = "table chair lamp desk shelf couch rug curtain mirror clock"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


@pytest.fixture()
def sem_paths(spark, tmp_path):
    """(sem_index_path, sem_cents_path) with centroids trained offline on
    the document-embedding space — the production setup."""
    from ts_etl_spark.operators.embedding import embed_documents
    from ts_etl_spark.operators.similarity import (
        as_double,
        norm,
        train_ivf_centroids,
    )

    seed_docs = _docs(
        spark, [(i, f"seed doc {i} word{i} word{i+1} word{i+2}") for i in range(20)]
    )
    v = as_double(F.col("embedding"))
    vecs = (
        embed_documents(seed_docs)
        .filter(F.col("embedding").isNotNull())
        .select(F.col("doc_id").alias("vec_id"), v.alias("v"), norm(v).alias("nrm"))
    )
    cents = train_ivf_centroids(vecs, k=4, seed=7, max_iter=2)
    cents_path = str(tmp_path / "sem_cents")
    cents.write.parquet(cents_path)
    return str(tmp_path / "sem_index"), cents_path


def test_gate_drops_paraphrase_keeps_novel_and_null(spark, tmp_path, sem_paths):
    sem_index_path, cents_path = sem_paths
    docs = _docs(
        spark,
        [(1, DOC_A), (2, DOC_A_PARA), (3, DOC_B), (4, "...")],  # 4: no tokens
    )
    survivors, delta = semantic_gate(spark, docs, sem_index_path, cents_path, 0.8)
    ids = {r.doc_id for r in survivors.collect()}
    assert ids == {1, 3, 4}, "paraphrase dropped; novel + token-less kept"
    delta_rows = delta.collect()
    assert {r.vec_id for r in delta_rows} == {1, 2, 3}, (
        "index delta = every embedded vector SEEN (dropped 2 included as a "
        "future dominator); token-less 4 has no vector"
    )
    assert all(r.cell is not None and r.nrm > 0 for r in delta_rows)


@pytest.mark.slow
def test_ingest_with_semantic_gate_replay_idempotent(spark, tmp_path, sem_paths):
    sem_index_path, cents_path = sem_paths
    corpus_path = str(tmp_path / "corpus")
    batch = _docs(spark, [(1, DOC_A), (2, DOC_A_PARA), (3, DOC_B)])
    kw = dict(sem_index_path=sem_index_path, sem_cents_path=cents_path,
              sem_threshold=0.8)
    ingest_batch(spark, batch, corpus_path, **kw)
    corpus1 = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())
    index1 = sorted(r.vec_id for r in spark.read.parquet(sem_index_path).collect())
    assert corpus1 == [1, 3], "paraphrase (2) semantically dropped"
    assert index1 == [1, 2, 3], "index records vectors SEEN, corpus docs KEPT"
    ingest_batch(spark, batch, corpus_path, **kw)  # replay
    corpus2 = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())
    index2 = sorted(r.vec_id for r in spark.read.parquet(sem_index_path).collect())
    assert corpus2 == corpus1 and index2 == index1


@pytest.mark.slow
def test_crash_between_index_and_corpus_append_replays_cleanly(
    spark, tmp_path, sem_paths
):
    """Simulate the documented crash window: the index delta landed but
    the corpus append didn't. Re-running the batch must produce the same
    corpus/index as an uninterrupted run — no lost or duplicated rows."""
    sem_index_path, cents_path = sem_paths
    corpus_path = str(tmp_path / "corpus")
    batch = _docs(spark, [(1, DOC_A), (2, DOC_A_PARA), (3, DOC_B)])
    survivors, delta = semantic_gate(spark, batch, sem_index_path, cents_path, 0.8)
    delta.write.mode("append").parquet(sem_index_path)  # ...crash here
    ingest_batch(
        spark, batch, corpus_path,
        sem_index_path=sem_index_path, sem_cents_path=cents_path,
        sem_threshold=0.8,
    )
    corpus = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())
    index = sorted(r.vec_id for r in spark.read.parquet(sem_index_path).collect())
    assert corpus == [1, 3]
    assert index == [1, 2, 3], "anti-join makes the delta replay a no-op"


def test_gate_rejects_out_of_order_batch_ids(spark, tmp_path, sem_paths):
    """An out-of-order batch (ids below already-indexed foreign ids)
    breaks smaller-id domination silently — the gate must raise instead.
    Crash REPLAY of the same ids stays legal (covered above)."""
    sem_index_path, cents_path = sem_paths
    first = _docs(spark, [(10, DOC_A), (11, DOC_B)])
    _, delta = semantic_gate(spark, first, sem_index_path, cents_path, 0.8)
    delta.write.mode("append").parquet(sem_index_path)
    late = _docs(spark, [(5, DOC_A_PARA)])  # id below the indexed 10/11
    with pytest.raises(ValueError, match="ingest order"):
        survivors, _ = semantic_gate(spark, late, sem_index_path, cents_path, 0.8)


def test_sem_paths_must_come_together(spark, tmp_path):
    with pytest.raises(ValueError, match="together"):
        ingest_batch(
            spark,
            _docs(spark, [(1, DOC_A)]),
            str(tmp_path / "c"),
            sem_index_path=str(tmp_path / "i"),
        )


def test_semantic_gate_refuses_missing_threshold(spark, tmp_path, sem_paths):
    """Round-12 enforcement of the round-11 soak finding: enabling the
    semantic gate without an explicit threshold silently reproduces the
    measured corpus collapse (the generic default sits ~2 sigma above
    the hashed-BoW noise floor) — refused loudly at BOTH entries."""
    from ts_etl_spark.streaming.ingest import IngestConfig

    sem_index_path, cents_path = sem_paths
    with pytest.raises(ValueError, match="sem_threshold"):
        IngestConfig(sem_index_path=sem_index_path, sem_cents_path=cents_path)
    with pytest.raises(ValueError, match="calibrated to your embedder"):
        semantic_gate(
            spark, _docs(spark, [(1, DOC_A)]), sem_index_path, cents_path
        )
