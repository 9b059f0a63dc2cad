"""Ingest-state compaction (round 11): per-batch appends leave one file
set per micro-batch in every state table, so after thousands of batches
the per-batch cost stops being batch-linear (file listing + footer reads
grow with BATCH COUNT). ``compact_ingest_state`` rewrites each table
under an ATTESTED roll-forward swap; these tests pin content
preservation, the attestation abort, both crash windows, the
ingest-side recovery hook, and the CLI surface."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.fs import count_files
from ts_etl_spark.streaming.ingest import (
    IngestConfig,
    _compact_staging,
    compact_ingest_state,
    compact_state_table,
    dedup_index_paths,
    ingest_batch,
    ingest_state_dirs,
    recover_state_compaction,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _rand_words(rng, n):
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def _snapshot(spark, d):
    return sorted(tuple(str(x) for x in r) for r in spark.read.parquet(d).collect())


@pytest.fixture()
def deployment(spark, tmp_path):
    """A four-batch full-stack deployment (dedup index + substring gate;
    the semantic gate needs trained centroids and adds nothing to the
    compaction surface beyond one more single-table dir)."""
    rng = random.Random(31)
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    win = str(tmp_path / "win")
    cfg = IngestConfig(dedup_index_path=idx, win_index_path=win)
    boiler = _rand_words(rng, 40)
    for k in range(4):
        ingest_batch(
            spark,
            _docs(
                spark,
                [
                    (100 * (k + 1) + j, f"{_rand_words(rng, 50)} {boiler}")
                    for j in range(3)
                ],
            ),
            corpus,
            cfg,
            batch_id=k,
        )
    return corpus, idx, win, cfg


def test_compaction_preserves_content_and_shrinks_files(
    spark, deployment, tmp_path
):
    corpus, idx, win, cfg = deployment
    dirs = ingest_state_dirs(corpus, idx, win)
    before = {d: _snapshot(spark, d) for d in dirs}
    counts = {d: count_files(spark, d) for d in dirs}
    # appends really accumulated: at least one table has one file set
    # per batch (seen appends every batch)
    assert counts[dedup_index_paths(idx)["seen"]] >= 4
    out = compact_ingest_state(
        spark, corpus_path=corpus, dedup_index_path=idx, win_index_path=win
    )
    assert set(out) == set(dirs)
    for d in dirs:
        assert count_files(spark, d) == out[d] == 1  # tiny data -> 1 file
        assert _snapshot(spark, d) == before[d], f"{d} content changed"
        assert not os.path.exists(_compact_staging(d)), "staging left behind"
    # the deployment still ingests and judges correctly post-compaction:
    # a replay of batch 0's first doc must drop at the exact layer
    first_id = 100
    ingest_batch(
        spark,
        _docs(spark, [(first_id, before[corpus][0][1])]),
        corpus,
        cfg,
        batch_id=99,
    )
    assert _snapshot(spark, corpus) == before[corpus]


def test_attestation_failure_aborts_and_keeps_live(
    spark, deployment, monkeypatch
):
    """A rewrite that loses a row must abort BEFORE the swap: live table
    untouched, staging discarded, loud error."""
    import ts_etl_spark.pipelines.maintenance as maint

    corpus, idx, win, _ = deployment
    seen = dedup_index_paths(idx)["seen"]
    before = _snapshot(spark, seen)

    real = maint.compact_parquet

    def lossy(spark_, path, out_path, target):
        n = real(spark_, path, out_path, target)
        # corrupt the staged copy: rewrite it minus one row
        df = spark_.read.parquet(out_path).orderBy("doc_id").limit(
            len(before) - 1
        ).localCheckpoint(eager=True)
        df.write.mode("overwrite").parquet(out_path)
        return n

    monkeypatch.setattr(maint, "compact_parquet", lossy)
    with pytest.raises(RuntimeError, match="attestation failed"):
        compact_state_table(spark, seen)
    assert _snapshot(spark, seen) == before, "live table was touched"
    assert not os.path.exists(_compact_staging(seen)), "staging not discarded"


def test_crash_roll_forward_restores_table(spark, deployment):
    """Crash window between live-delete and rename: the committed
    staging rolls FORWARD (it was attested equal before the delete)."""
    from ts_etl_spark.fs import delete_dir
    from ts_etl_spark.pipelines.maintenance import compact_parquet

    corpus, idx, win, _ = deployment
    lens = dedup_index_paths(idx)["lens"]
    before = _snapshot(spark, lens)
    staged = _compact_staging(lens)
    compact_parquet(spark, lens, staged, 128 * 1024 * 1024)
    delete_dir(spark, lens)  # the simulated crash point
    recover_state_compaction(spark, lens)
    assert _snapshot(spark, lens) == before
    assert not os.path.exists(staged)


def test_crash_rollback_discards_stale_staging(spark, deployment):
    """Crash window before the swap (live still present): the staging is
    stale — discarded, live authoritative."""
    from ts_etl_spark.pipelines.maintenance import compact_parquet

    corpus, idx, win, _ = deployment
    fp = dedup_index_paths(idx)["fp"]
    before = _snapshot(spark, fp)
    staged = _compact_staging(fp)
    compact_parquet(spark, fp, staged, 128 * 1024 * 1024)
    recover_state_compaction(spark, fp)
    assert not os.path.exists(staged)
    assert _snapshot(spark, fp) == before


def test_ingest_batch_recovers_interrupted_compaction(spark, deployment):
    """The per-batch recovery hook: an ingest arriving after a crashed
    swap (table missing, staging committed) proceeds instead of dying
    with PATH_NOT_FOUND — and judges identically."""
    from ts_etl_spark.fs import delete_dir
    from ts_etl_spark.pipelines.maintenance import compact_parquet

    corpus, idx, win, cfg = deployment
    bands = dedup_index_paths(idx)["bands"]
    before = _snapshot(spark, bands)
    staged = _compact_staging(bands)
    compact_parquet(spark, bands, staged, 128 * 1024 * 1024)
    delete_dir(spark, bands)
    # next batch must self-heal, then ingest normally
    ingest_batch(
        spark,
        _docs(spark, [(9000, "totally novel words that match nothing")]),
        corpus,
        cfg,
        batch_id=50,
    )
    assert 9000 in {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert set(_snapshot(spark, bands)) >= set(before), "bands lost rows"


def test_compact_state_cli_roundtrip(spark, deployment):
    import ts_etl_spark.cli as cli

    corpus, idx, win, _ = deployment
    out = cli.run_compact_state(
        corpus_path=corpus, dedup_index_path=idx, spark=spark
    )
    # corpus + the five index tables; win not passed -> not compacted
    assert len(out) == 6
    assert all(n == 1 for n in out.values())


def test_missing_table_refused_and_absent_paths_skipped(spark, tmp_path):
    with pytest.raises(ValueError, match="no state table"):
        compact_state_table(spark, str(tmp_path / "nope"))
    assert compact_ingest_state(
        spark, dedup_index_path=str(tmp_path / "idx_absent")
    ) == {}


def test_crash_between_renames_rolls_forward(spark, deployment):
    """Round-11 review fix: the swap is rename-aside, not delete-based
    (a recursive delete is non-atomic — a crash mid-delete would leave a
    SUBSET of rows that recovery then treats as authoritative). Crash
    window between the two renames: old aside dir present, live missing,
    staging committed -> roll forward, drop the aside dir."""
    from ts_etl_spark.fs import rename_dir
    from ts_etl_spark.pipelines.maintenance import compact_parquet
    from ts_etl_spark.streaming.ingest import _compact_old

    corpus, idx, win, _ = deployment
    sets = dedup_index_paths(idx)["sets"]
    before = _snapshot(spark, sets)
    staged = _compact_staging(sets)
    old = _compact_old(sets)
    compact_parquet(spark, sets, staged, 128 * 1024 * 1024)
    rename_dir(spark, sets, old)  # simulated crash after the aside rename
    recover_state_compaction(spark, sets)
    assert _snapshot(spark, sets) == before
    assert not os.path.exists(staged) and not os.path.exists(old)


def test_crash_after_swap_drops_aside_dir(spark, deployment):
    """Crash window after the swap, before the aside delete: both live
    (the new compacted table) and the aside dir present -> recovery
    drops the aside dir and leaves live alone."""
    from ts_etl_spark.fs import rename_dir
    from ts_etl_spark.pipelines.maintenance import compact_parquet
    from ts_etl_spark.streaming.ingest import _compact_old

    corpus, idx, win, _ = deployment
    lens = dedup_index_paths(idx)["lens"]
    before = _snapshot(spark, lens)
    staged = _compact_staging(lens)
    old = _compact_old(lens)
    compact_parquet(spark, lens, staged, 128 * 1024 * 1024)
    rename_dir(spark, lens, old)
    rename_dir(spark, staged, lens)  # swap done; crash before delete(old)
    recover_state_compaction(spark, lens)
    assert _snapshot(spark, lens) == before
    assert not os.path.exists(old)


def test_torn_table_refuses_compaction(spark, deployment):
    """Round-11 review fix: compacting a table WITHOUT its _SUCCESS
    marker would stamp a fresh marker via the staging write and launder
    a torn write (e.g. a crashed orig-fp bootstrap) into a
    committed-looking table — refused loudly instead."""
    corpus, idx, win, _ = deployment
    fp = dedup_index_paths(idx)["fp"]
    os.remove(f"{fp}/_SUCCESS")
    with pytest.raises(ValueError, match="no _SUCCESS marker"):
        compact_state_table(spark, fp)


def test_disabled_success_markers_refused(spark, deployment):
    """Round-11 review fix: with marksuccessfuljobs=false the whole
    _SUCCESS-gated state machine (generations, bootstrap commit checks,
    torn-table refusal) silently degrades — ingest and compaction refuse
    the configuration loudly."""
    corpus, idx, win, cfg = deployment
    hconf = spark._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    hconf.set(key, "false")
    try:
        with pytest.raises(ValueError, match="marksuccessfuljobs"):
            compact_ingest_state(spark, corpus_path=corpus)
        with pytest.raises(ValueError, match="marksuccessfuljobs"):
            ingest_batch(
                spark,
                _docs(spark, [(99_000, "words here")]),
                corpus,
                cfg,
            )
    finally:
        hconf.set(key, "true")


def test_cli_ingest_compact_after(spark, tmp_path):
    """--compact-after: the drain is followed by the attested compaction
    while the process still holds the single-writer role — the next
    drain starts from 1 file per state table."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ts_etl_spark.cli as cli

    rng = random.Random(17)
    landing = tmp_path / "landing"
    landing.mkdir()
    now = _time.time()
    for k in range(3):
        rows = [(100 * (k + 1) + j, _rand_words(rng, 30)) for j in range(4)]
        p = str(landing / f"b{k}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            p,
        )
        os.utime(p, (now - 90 + 30 * k, now - 90 + 30 * k))
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    out = cli.run_ingest(
        str(landing),
        corpus,
        str(tmp_path / "ckpt"),
        dedup_index_path=idx,
        compact_after=True,
        spark=spark,
    )
    assert out["corpus_docs"] == 12
    for d in ingest_state_dirs(corpus, idx):
        assert count_files(spark, d) == 1, d


def test_one_torn_table_does_not_block_the_rest(spark, deployment):
    """Round-11 second review pass: compact_ingest_state attempts every
    table and raises ONE summary error at the end — a torn table must
    not leave the rest of the deployment uncompacted or silently hide
    which tables did compact."""
    corpus, idx, win, _ = deployment
    fp = dedup_index_paths(idx)["fp"]
    os.remove(f"{fp}/_SUCCESS")
    with pytest.raises(RuntimeError, match="no _SUCCESS") as ei:
        compact_ingest_state(
            spark, corpus_path=corpus, dedup_index_path=idx, win_index_path=win
        )
    assert "compacted successfully" in str(ei.value)
    # everything except fp really did compact
    for d in ingest_state_dirs(corpus, idx, win):
        if d != fp:
            assert count_files(spark, d) == 1, d


def test_seen_admit_on_attemptless_index_says_nothing_wedged(spark, tmp_path):
    """An index whose seen table records no attempts cannot wedge — the
    refusal must say that, not 'exceeds max (None)'."""
    from ts_etl_spark.streaming.ingest import admit_seen_ids

    idx = str(tmp_path / "idx")
    p = dedup_index_paths(idx)
    empty = spark.createDataFrame([], "doc_id LONG")
    empty.selectExpr("CAST(doc_id AS STRING) AS fp").write.parquet(p["fp"])
    empty.write.parquet(p["seen"])
    with pytest.raises(ValueError, match="records no attempts"):
        admit_seen_ids(spark, idx, [1])


@pytest.mark.parametrize("crash_after", [0, 1, 2, 3, 4])
def test_every_protocol_interruption_point_recovers(
    spark, deployment, crash_after
):
    """The full crash matrix: execute the REAL protocol steps up to each
    interruption point (0 = after the staging write, 1 = after the
    attest, 2 = after the rename-aside, 3 = after the rename-in,
    4 = after the old-dir delete, i.e. completed), then recover — the
    table content must equal the original and no sibling dirs remain,
    whichever instruction the crash followed. Guards future edits to
    the protocol ordering."""
    from ts_etl_spark.fs import delete_dir, rename_dir
    from ts_etl_spark.pipelines.maintenance import (
        compact_parquet,
        table_content_hash,
    )
    from ts_etl_spark.streaming.ingest import _compact_old

    corpus, idx, win, _ = deployment
    lens = dedup_index_paths(idx)["lens"]
    before = _snapshot(spark, lens)
    staged, old = _compact_staging(lens), _compact_old(lens)

    compact_parquet(spark, lens, staged, 128 * 1024 * 1024)          # step 0
    if crash_after >= 1:
        assert table_content_hash(
            spark.read.parquet(lens)
        ) == table_content_hash(spark.read.parquet(staged))          # step 1
    if crash_after >= 2:
        rename_dir(spark, lens, old)                                 # step 2
    if crash_after >= 3:
        rename_dir(spark, staged, lens)                              # step 3
    if crash_after >= 4:
        delete_dir(spark, old)                                       # step 4

    recover_state_compaction(spark, lens)
    assert _snapshot(spark, lens) == before, f"content lost at {crash_after}"
    assert not os.path.exists(staged) and not os.path.exists(old)
    # and the recovered table is still compactable + ingestible
    assert compact_state_table(spark, lens) == 1
    assert _snapshot(spark, lens) == before


def test_repeated_cycles_stay_stable(spark, deployment):
    """Compaction is idempotent and composes with further ingests:
    compact -> compact (no-op rewrite) -> ingest -> compact, content
    tracked exactly throughout."""
    corpus, idx, win, cfg = deployment
    dirs = ingest_state_dirs(corpus, idx, win)
    compact_ingest_state(
        spark, corpus_path=corpus, dedup_index_path=idx, win_index_path=win
    )
    snap1 = {d: _snapshot(spark, d) for d in dirs}
    compact_ingest_state(
        spark, corpus_path=corpus, dedup_index_path=idx, win_index_path=win
    )
    assert {d: _snapshot(spark, d) for d in dirs} == snap1, "second pass changed content"
    ingest_batch(
        spark,
        _docs(spark, [(10_000, "fresh words after maintenance cycle")]),
        corpus,
        cfg,
        batch_id=77,
    )
    out = compact_ingest_state(
        spark, corpus_path=corpus, dedup_index_path=idx, win_index_path=win
    )
    assert all(n == 1 for n in out.values())
    assert 10_000 in {r.doc_id for r in spark.read.parquet(corpus).collect()}
