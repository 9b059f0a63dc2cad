"""Persisted IVF-PQ serving index (round 15): the dense-retrieval twin
of the BM25 lexicon tests.

The driver gate (the ``q_id = -4`` row of ``embed_ann_ivf``) asserts
frame-exactness + replay idempotence + coverage on the real embeddings;
these tests pin the protocol properties underneath:

- a multi-batch-built index serves EXACTLY what the in-session
  ``ivf_pq_topk`` composition computes over the same model;
- replays no-op, out-of-order batch ids refuse, a second model
  generation over live codes refuses;
- the probed-cell partition pruning is real (a corrupted parquet file
  in an unprobed cell never trips a query — the bucketed-postings
  behavioral proof) and structural (PartitionFilters);
- the coverage probe catches ghost batches both ways (totals vs corpus,
  totals vs codes);
- qdrift flags a planted distribution shift and stays quiet in
  distribution;
- per-cell compaction preserves served results and restores
  files-per-cell.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.similarity import (
    ivf_pq_topk,
    norm,
    pq_encode,
)
from ts_etl_spark.streaming.ann_index import (
    ANN_BOOTSTRAP_ID,
    ANN_QDRIFT_SCHEMA,
    ANN_QDRIFT_THRESHOLD,
    ANN_TOTALS_SCHEMA,
    AnnIndexDriftError,
    _ann_model,
    ann_index_paths,
    ann_topk_from_index,
    bootstrap_ann_index,
    rebuild_ann_index,
    train_ann_model,
    update_ann_index,
    verify_ann_index,
)

D = 8


def _vec_frame(spark, rows):
    df = spark.createDataFrame(rows, "vec_id LONG, v ARRAY<DOUBLE>")
    return df.select("vec_id", "v", norm(F.col("v")).alias("nrm"))


def _rows(n, seed=3, lo=-1.0, hi=1.0, start=0):
    import random

    rng = random.Random(seed)
    return [
        (start + i, [round(rng.uniform(lo, hi), 3) for _ in range(D)])
        for i in range(n)
    ]


def _queries(vecs, n=4):
    return vecs.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def idx(tmp_path):
    return str(tmp_path / "ann_index")


def _build_multi_batch(spark, idx, rows, splits=(30, 55)):
    """Bootstrap on rows[:splits[0]], then one update per remaining
    slice — the adoption-then-stream shape."""
    s0 = splits[0]
    assert bootstrap_ann_index(spark, _vec_frame(spark, rows[:s0]), idx)
    prev = s0
    for bid, end in enumerate(list(splits[1:]) + [len(rows)], start=1):
        update_ann_index(spark, _vec_frame(spark, rows[prev:end]), idx, bid)
        prev = end


@pytest.mark.slow
def test_multi_batch_index_serves_frame_exact(spark, idx):
    rows = _rows(80)
    _build_multi_batch(spark, idx, rows)
    vecs = _vec_frame(spark, rows)
    q = _queries(vecs)
    served = ann_topk_from_index(spark, idx, vecs, q)
    # the in-session composition over the SAME persisted model: encode
    # the whole corpus against the committed codebooks and route with
    # the committed centroids
    _gen, cents, cbs, _nc, m = _ann_model(spark, idx)
    enc = pq_encode(vecs.filter(F.col("v").isNotNull()), cbs, m=m)
    expected = ivf_pq_topk(vecs, enc, cbs, cents, q)
    assert served.count() > 0
    assert _frames_equal(served, expected)


def test_replay_noop_and_out_of_order_refuses(spark, idx):
    rows = _rows(60)
    _build_multi_batch(spark, idx, rows, splits=(30, 45))
    p = ann_index_paths(idx)
    before_codes = spark.read.parquet(p["codes"]).distinct().count()
    before_tot = (
        spark.read.schema(ANN_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .count()
    )
    # replay of the LAST folded batch: a no-op
    update_ann_index(spark, _vec_frame(spark, rows[45:]), idx, 2)
    assert spark.read.parquet(p["codes"]).distinct().count() == before_codes
    assert (
        spark.read.schema(ANN_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .count()
        == before_tot
    )
    # an out-of-order id (restarted sequence) refuses loudly
    with pytest.raises(RuntimeError, match="out-of-order"):
        update_ann_index(spark, _vec_frame(spark, rows[30:45]), idx, 1)


def test_missing_model_and_second_generation_refuse(spark, idx):
    rows = _rows(20)
    vecs = _vec_frame(spark, rows)
    with pytest.raises(ValueError, match="no ANN index model"):
        ann_topk_from_index(spark, idx, vecs, _queries(vecs))
    with pytest.raises(ValueError, match="no ANN index model"):
        update_ann_index(spark, vecs, idx, 1)
    assert bootstrap_ann_index(spark, vecs, idx)
    # re-bootstrap: adoption is idempotent, not an error
    assert not bootstrap_ann_index(spark, vecs, idx)
    # retraining over live codes would orphan them — refuse
    with pytest.raises(RuntimeError, match="rebuild_ann_index"):
        train_ann_model(spark, vecs, idx)


@pytest.mark.slow
def test_empty_and_all_null_batches_record_presence(spark, idx):
    rows = _rows(20)
    assert bootstrap_ann_index(spark, _vec_frame(spark, rows), idx)
    nulls = spark.createDataFrame(
        [(100, None), (101, None)], "vec_id LONG, v ARRAY<DOUBLE>"
    ).select("vec_id", "v", F.lit(None).cast("double").alias("nrm"))
    update_ann_index(spark, nulls, idx, 1)
    p = ann_index_paths(idx)
    tot = {
        int(r["batch_id"]): (int(r["n_docs"]), int(r["n_vecs"]))
        for r in spark.read.schema(ANN_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .collect()
    }
    assert tot[1] == (2, 0)  # presence recorded, nothing encoded
    assert tot[ANN_BOOTSTRAP_ID] == (20, 20)
    # an empty frame that would be a fresh bootstrap stays a no-op
    empty = spark.createDataFrame([], "vec_id LONG, v ARRAY<DOUBLE>").select(
        "vec_id", "v", F.lit(None).cast("double").alias("nrm")
    )
    update_ann_index(spark, empty, idx, 2)
    assert (
        spark.read.schema(ANN_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .filter(F.col("batch_id") == 2)
        .first()["n_docs"]
        == 0
    )


@pytest.mark.slow
def test_probed_cell_pruning_structural_and_behavioral(spark, idx):
    rows = _rows(80)
    _build_multi_batch(spark, idx, rows)
    vecs = _vec_frame(spark, rows)
    q = _queries(vecs, n=2)
    # which cells does this query set probe?
    from ts_etl_spark.operators.similarity import IVF_NPROBE, ivf_assign

    _gen, cents, _cbs, n_cells, _m = _ann_model(spark, idx)
    probed = {
        int(r["cell"])
        for r in ivf_assign(
            q.select(
                F.col("q_id").alias("vec_id"),
                F.col("qv").alias("v"),
                F.col("qn").alias("nrm"),
            ),
            cents,
            n_assign=IVF_NPROBE,
        ).collect()
    }
    p = ann_index_paths(idx)
    unprobed = [
        c
        for c in range(n_cells)
        if c not in probed
        and os.path.isdir(f"{p['codes']}/cell={c}")
    ]
    assert unprobed, "test needs at least one populated unprobed cell"
    # structural: the probed cells appear as PLANNING-time partition
    # filters on the codes scan
    served = ann_topk_from_index(spark, idx, vecs, q)
    plan = served._sc._jvm.PythonSQLUtils.explainString(
        served._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan
    # behavioral: a corrupted parquet file in an UNPROBED cell is never
    # opened by the query (the bucketed-postings proof shape) — if the
    # scan listed/scheduled it, the query would throw
    victim = f"{p['codes']}/cell={unprobed[0]}/part-corrupt.parquet"
    with open(victim, "w") as fh:
        fh.write("this is not parquet")
    try:
        assert served.count() > 0
        again = ann_topk_from_index(spark, idx, vecs, q)
        assert again.count() > 0
    finally:
        os.remove(victim)


def test_verify_catches_ghosts_both_ways(spark, idx, tmp_path):
    rows = _rows(40)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(40)], "doc_id LONG, text STRING"
    ).write.parquet(corpus)
    assert bootstrap_ann_index(spark, _vec_frame(spark, rows), idx)
    assert verify_ann_index(spark, corpus, idx) == (40, 40)
    with pytest.raises(ValueError, match="missing path is not an empty"):
        verify_ann_index(spark, str(tmp_path / "nope"), idx)
    # ghost batch: totals committed, corpus append never landed
    p = ann_index_paths(idx)
    spark.createDataFrame(
        [(5, 5, 99)], ANN_TOTALS_SCHEMA
    ).write.mode("append").parquet(p["totals"])
    with pytest.raises(AnnIndexDriftError) as ei:
        verify_ann_index(spark, corpus, idx)
    assert ei.value.idx_docs == 45 and ei.value.corpus_n == 40
    # the internal probe: totals' n_vecs now also disagrees with codes
    assert ei.value.idx_vecs == 45 and ei.value.code_rows == 40


def test_qdrift_flags_planted_shift_and_stays_quiet(spark, idx):
    rows = _rows(40)
    assert bootstrap_ann_index(spark, _vec_frame(spark, rows), idx)
    # in-distribution batch: same generator, new ids — quiet
    update_ann_index(
        spark, _vec_frame(spark, _rows(15, seed=9, start=100)), idx, 1
    )
    # planted shift: vectors far outside the trained cube — flagged
    update_ann_index(
        spark,
        _vec_frame(spark, _rows(15, seed=11, lo=9.0, hi=11.0, start=200)),
        idx,
        2,
    )
    p = ann_index_paths(idx)
    qd = {
        b: spark.read.schema(ANN_QDRIFT_SCHEMA)
        .parquet(f"{p['qdrift']}/batch={b}")
        .first()
        for b in (1, 2)
    }
    assert not qd[1]["flagged"], f"in-distribution flagged: {qd[1]}"
    assert qd[2]["flagged"], f"planted shift not flagged: {qd[2]}"
    assert qd[2]["mean_rel_err"] > ANN_QDRIFT_THRESHOLD


@pytest.mark.slow
def test_per_cell_compaction_preserves_results(spark, idx):
    from ts_etl_spark.streaming.ingest import compact_bucketed_state_table

    rows = _rows(90)
    _build_multi_batch(spark, idx, rows, splits=(30, 50, 70))
    vecs = _vec_frame(spark, rows)
    q = _queries(vecs)
    before = ann_topk_from_index(spark, idx, vecs, q).collect()
    p = ann_index_paths(idx)
    n = compact_bucketed_state_table(
        spark, p["codes"], partition_prefix="cell="
    )
    assert n >= 1
    # one file per populated cell after compaction
    for name in os.listdir(p["codes"]):
        if name.startswith("cell="):
            files = [
                f
                for f in os.listdir(f"{p['codes']}/{name}")
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (name, files)
    after = ann_topk_from_index(spark, idx, vecs, q).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


@pytest.mark.slow
def test_rebuild_refuses_missing_corpus_and_rederives(spark, idx, tmp_path):
    with pytest.raises(ValueError, match="refusing to delete"):
        rebuild_ann_index(spark, str(tmp_path / "nope"), idx)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} {'x' * (i % 7)}") for i in range(30)],
        "doc_id LONG, text STRING",
    ).write.parquet(corpus)
    rebuild_ann_index(spark, corpus, idx)
    assert verify_ann_index(spark, corpus, idx) == (30, 30)
    # rebuild over an existing index drops and re-derives cleanly
    rebuild_ann_index(spark, corpus, idx)
    assert verify_ann_index(spark, corpus, idx) == (30, 30)


@pytest.mark.slow
def test_qdrift_retrain_loop_closes(spark, idx, tmp_path):
    """The drift→retrain loop END TO END, on the real text→embedding
    path: a shape-shifted batch (single-token "spike" docs, whose
    hashed-BoW embeddings are one-hot axes instead of the training
    corpus's spread bags — a vocabulary swap alone does NOT shift a
    hashed embedding distribution) flags qdrift against the stale
    generation; the operator remedy ``run_ann_rebuild`` retrains on the
    CURRENT corpus (spikes included); the next batch from the SAME
    shifted distribution folds quiet, the coverage probe passes, and
    serving is frame-exact against an in-session composition over the
    NEW generation's model."""
    import random

    from ts_etl_spark.cli import run_ann_rebuild
    from ts_etl_spark.streaming.ann_index import doc_vectors

    rng = random.Random(5)
    corpus = str(tmp_path / "corpus")
    base = _docs(spark, range(40))
    base.write.mode("append").parquet(corpus)
    assert bootstrap_ann_index(spark, doc_vectors(base), idx)

    # the shifted distribution: each doc one token repeated — its
    # embedding is a one-hot; reuse ONE token pool across both shifted
    # batches (the shift persists, as a real drift does)
    pool = [f"zq{rng.randrange(10**6)}x" for _ in range(12)]

    def shifted(ids, seed):
        r = random.Random(seed)
        rows = [(i, " ".join([r.choice(pool)] * 16)) for i in ids]
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    b1 = shifted(range(100, 115), seed=1)
    b1.write.mode("append").parquet(corpus)
    update_ann_index(spark, doc_vectors(b1), idx, 1)
    p = ann_index_paths(idx)

    def qrow(b):
        return (
            spark.read.schema(ANN_QDRIFT_SCHEMA)
            .parquet(f"{p['qdrift']}/batch={b}")
            .first()
        )

    flagged = qrow(1)
    assert flagged["flagged"] and flagged["gen"] == 0, dict(
        flagged.asDict()
    )

    # remedy: retrain on the current corpus (CLI path, shared session)
    run_ann_rebuild(corpus, idx, spark=spark)
    assert verify_ann_index(spark, corpus, idx) == (55, 55)

    b2 = shifted(range(200, 215), seed=2)
    b2.write.mode("append").parquet(corpus)
    update_ann_index(spark, doc_vectors(b2), idx, 1)
    quiet = qrow(1)
    assert not quiet["flagged"], dict(quiet.asDict())
    assert quiet["mean_rel_err"] < flagged["mean_rel_err"]
    assert verify_ann_index(spark, corpus, idx) == (70, 70)

    # served results over the retrained generation stay frame-exact
    # vs the in-session composition on the same model
    vecs = doc_vectors(spark.read.parquet(corpus)).persist()
    q = _queries(vecs)
    served = ann_topk_from_index(spark, idx, vecs, q)
    _gen, mcents, mcbs, _nc, m = _ann_model(spark, idx)
    enc = pq_encode(vecs.filter(F.col("v").isNotNull()), mcbs, m=m)
    expected = ivf_pq_topk(vecs, enc, mcbs, mcents, q)
    assert _frames_equal(served, expected)
    vecs.unpersist()


@pytest.mark.slow
def test_token_less_corpus_adoption_defers_then_covers(spark, tmp_path):
    """A pre-existing corpus with documents but no embeddable one must
    not wedge ingest (review finding, round 15: the bootstrap ran the
    trainer on an all-NULL frame and crashed BEFORE the corpus append —
    permanently, since every retry re-entered the same fold). The
    bootstrap now DEFERS; the first embeddable batch trains and folds
    the deferred history, so the coverage probe still counts every
    document — and the bootstrap fold's ``batch=-1`` qdrift dir is a
    NUMERIC tag to the telemetry readers (the ``isdigit`` misfiling,
    same review)."""
    from ts_etl_spark.cli import run_drift_report
    from ts_etl_spark.streaming.ingest import (
        IngestConfig,
        committed_batch_dirs,
        ingest_batch,
    )

    corpus_path = str(tmp_path / "corpus")
    idx = str(tmp_path / "ann")
    drift = str(tmp_path / "drift")
    cfg = IngestConfig(ann_index_path=idx, drift_path=drift)
    p = ann_index_paths(idx)

    tokenless = spark.createDataFrame(
        [(i, "?!... --- !!!" + "." * i) for i in range(6)],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, tokenless, corpus_path, cfg, batch_id=1)
    from ts_etl_spark.fs import path_exists

    # nothing trained, nothing recorded — and crucially, no crash
    assert not path_exists(spark, p["totals"])
    assert spark.read.parquet(corpus_path).count() == 6

    embeddable = _docs(spark, range(100, 108))
    ingest_batch(spark, embeddable, corpus_path, cfg, batch_id=2)
    # coverage counts the deferred token-less history (6 docs, 0 vecs)
    assert verify_ann_index(spark, corpus_path, idx) == (14, 14)
    tot = (
        spark.read.schema(ANN_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .collect()
    )
    by_bid = {int(r.batch_id): (int(r.n_docs), int(r.n_vecs)) for r in tot}
    assert by_bid[ANN_BOOTSTRAP_ID] == (6, 0)
    assert by_bid[2] == (8, 8)

    # the bootstrap's batch=-1 telemetry dir sorts as a NUMBER
    tags = [t for t, _ in committed_batch_dirs(spark, p["qdrift"])]
    assert tags == ["-1", "2"]
    report = run_drift_report(ann_index_path=idx, spark=spark)
    assert set(report["ann"]) == {-1, 2}  # int keys, sortable
    assert sorted(report["ann"]) == [-1, 2]


# --------------------------------------------------------------------------
# deployment integration: ingest fold, compact-state probe, drift-report
# --------------------------------------------------------------------------

_W = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)


def _docs(spark, ids, seed=0):
    import random

    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(_W) for _ in range(20)) + f" d{i}")
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


@pytest.mark.slow
def test_ingest_batch_maintains_serving_index(spark, tmp_path):
    """The ann_index_path config: per-batch folds through the embedder
    seam, adoption bootstrap on a pre-existing corpus, coverage probe
    green after multiple batches, and the served ranking answered from
    persisted state matches the from-scratch in-session composition."""
    from ts_etl_spark.streaming.ann_index import doc_vectors
    from ts_etl_spark.streaming.ingest import IngestConfig, ingest_batch

    corpus_path = str(tmp_path / "corpus")
    idx = str(tmp_path / "ann")
    # pre-existing corpus BEFORE adoption — the bootstrap must cover it
    _docs(spark, range(10), seed=1).write.parquet(corpus_path)
    cfg = IngestConfig(ann_index_path=idx)
    ingest_batch(spark, _docs(spark, range(100, 110), seed=2),
                 corpus_path, cfg, batch_id=1)
    ingest_batch(spark, _docs(spark, range(200, 210), seed=3),
                 corpus_path, cfg, batch_id=2)
    assert verify_ann_index(spark, corpus_path, idx) == (30, 30)
    # an explicit batch_id is required (replay detection is keyed on it)
    with pytest.raises(ValueError, match="explicit, unique batch_id"):
        ingest_batch(spark, _docs(spark, [300]), corpus_path, cfg)
    # served result == in-session composition over the persisted model
    corpus_docs = spark.read.parquet(corpus_path).select("doc_id", "text")
    vecs = doc_vectors(corpus_docs)
    q = _queries(vecs.filter(F.col("vec_id") >= 100), n=103)
    served = ann_topk_from_index(spark, idx, vecs, q)
    _gen, cents, cbs, _nc, m = _ann_model(spark, idx)
    enc = pq_encode(vecs.filter(F.col("v").isNotNull()), cbs, m=m)
    expected = ivf_pq_topk(vecs, enc, cbs, cents, q)
    assert served.count() > 0
    assert _frames_equal(served, expected)


@pytest.mark.slow
def test_compact_state_compacts_and_probes_serving_index(spark, tmp_path):
    """compact-state over a deployment with the ANN index: codes
    compact per cell, model/totals flat, the coverage probe passes
    clean, a planted ghost raises AnnIndexDriftError, and
    auto_rebuild_ann repairs it under the lease."""
    from ts_etl_spark.streaming.ingest import (
        IngestConfig,
        compact_ingest_state,
        ingest_batch,
    )

    corpus_path = str(tmp_path / "corpus")
    idx = str(tmp_path / "ann")
    cfg = IngestConfig(ann_index_path=idx)
    for bid in range(3):
        ingest_batch(
            spark,
            _docs(spark, range(bid * 10, bid * 10 + 6), seed=bid),
            corpus_path,
            cfg,
            batch_id=bid,
        )
    p = ann_index_paths(idx)
    out = compact_ingest_state(
        spark, corpus_path=corpus_path, ann_index_path=idx
    )
    assert p["codes"] in out and p["totals"] in out
    # one file per populated cell after the per-cell swap
    for name in os.listdir(p["codes"]):
        if name.startswith("cell="):
            files = [
                f
                for f in os.listdir(f"{p['codes']}/{name}")
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (name, files)
    assert verify_ann_index(spark, corpus_path, idx)
    # planted ghost: totals row whose batch never reached the corpus
    spark.createDataFrame(
        [(3, 3, 99)], ANN_TOTALS_SCHEMA
    ).write.mode("append").parquet(p["totals"])
    with pytest.raises(AnnIndexDriftError):
        compact_ingest_state(
            spark, corpus_path=corpus_path, ann_index_path=idx
        )
    # auto-rebuild requires the lease (the bm25 race contract)
    with pytest.raises(ValueError, match="auto_rebuild_ann requires"):
        compact_ingest_state(
            spark,
            corpus_path=corpus_path,
            ann_index_path=idx,
            auto_rebuild_ann=True,
        )
    out = compact_ingest_state(
        spark,
        corpus_path=corpus_path,
        ann_index_path=idx,
        auto_rebuild_ann=True,
        lease_path=str(tmp_path / "lease"),
    )
    assert out[idx] == -1  # the rebuild marker
    assert verify_ann_index(spark, corpus_path, idx)


@pytest.mark.slow
def test_drift_report_ann_rows_and_single_job_reads(
    spark, tmp_path, capsys
):
    """drift-report --ann surfaces the qdrift rows (a planted
    out-of-distribution batch FLAGGED, in-distribution quiet), and the
    round-15 single-read refactor holds: the whole report runs a
    BOUNDED number of Spark jobs regardless of batch count (was one+
    per batch dir)."""
    from ts_etl_spark import cli
    from ts_etl_spark.streaming.ingest import IngestConfig, ingest_batch

    corpus_path = str(tmp_path / "corpus")
    idx = str(tmp_path / "ann")
    drift = str(tmp_path / "drift")
    hh = str(tmp_path / "hh")
    cfg = IngestConfig(ann_index_path=idx, drift_path=drift, hh_path=hh)
    n_batches = 6
    for bid in range(n_batches):
        ingest_batch(
            spark,
            _docs(spark, range(bid * 10, bid * 10 + 5), seed=bid),
            corpus_path,
            cfg,
            batch_id=bid,
        )
    # plant codebook drift: a batch whose embeddings the trained
    # codebooks cannot represent (one giant repeated token — a single
    # massive bucket count, nothing like the training distribution)
    shifted = spark.createDataFrame(
        [(900 + i, ("zzz " * 400) + f"unique{i}") for i in range(4)],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, shifted, corpus_path, cfg, batch_id=n_batches)

    sc = spark.sparkContext
    group = "drift-report-jobcount"
    sc.setJobGroup(group, "bounded-read assertion")
    try:
        report = cli.run_drift_report(
            drift_path=drift, hh_path=hh, ann_index_path=idx, spark=spark
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    njobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert njobs <= 8, f"drift-report ran {njobs} jobs for 7 batch dirs"
    out = capsys.readouterr().out
    assert ("ann", n_batches) in report["flagged"]
    assert report["ann"][n_batches][3] is True
    assert all(
        not report["ann"][b][3] for b in report["ann"] if b != n_batches
    )
    assert f"ann batch={n_batches}" in out and "FLAGGED" in out
    # --last bounds the ann rows like every other table
    report2 = cli.run_drift_report(
        ann_index_path=idx, last=2, spark=spark
    )
    assert set(report2["ann"]) == {n_batches - 1, n_batches}


@pytest.mark.slow
def test_ann_index_gate_row_on_real_data_and_falsifiable(spark):
    """The q_id = -4 arm's evidence on the real sf0.001 embeddings —
    all booleans TRUE with the registered entry's own seed quantizer —
    and FALSIFIABILITY of the frame-equality boolean: comparing the
    index-served ranking against the UNROUTED brute-force ranking must
    flip annidx_exact_ok to False (the served ranking is routed, so the
    frames genuinely differ)."""
    import ts_etl_spark.operators.similarity as S

    sfd = "/root/testdata/sf0.001"
    vecs = S._vectors(spark, sfd).persist()
    try:
        cents = vecs.filter(
            (F.col("vec_id") >= 100)
            & (F.col("vec_id") < 100 + S.IVF_CENTROIDS)
        ).select(
            F.col("vec_id").alias("c_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        q = vecs.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        nn = vecs.filter(F.col("v").isNotNull())
        cb = S.pq_train(nn)
        enc = S.pq_encode(nn, cb).persist()
        res = S.ivf_pq_topk(vecs, enc, cb, cents, q).persist()
        try:
            n_codes, k_meas, x_ok, r_ok, c_ok = S._ann_index_gate_row(
                spark, vecs, q, cents, cb, res
            )
            assert n_codes == nn.count()
            assert k_meas == S.TOP_K
            assert x_ok and r_ok and c_ok
            bad = S.brute_topk(vecs, q)
            _, _, x_bad, _, _ = S._ann_index_gate_row(
                spark, vecs, q, cents, cb, bad
            )
            assert not x_bad, "unrouted reference must trip frame equality"
        finally:
            res.unpersist()
            enc.unpersist()
    finally:
        vecs.unpersist()
