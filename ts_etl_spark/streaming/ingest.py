"""Continuous corpus ingestion: a landing directory of document files
streams through incremental dedup into a persisted, growing corpus.

Each micro-batch runs ``operators.dedup.dedup_incremental`` against the
corpus-so-far via ``foreachBatch`` (the integration point for batch-only
constructs inside a stream), appending only surviving documents. The
batch-side equivalence proof (``tests/test_incremental.py``) transfers:
the streamed corpus converges to exactly what one-shot recuration of all
input would keep.

Failure semantics: checkpointing makes batch replay possible, and the
operator makes replay IDEMPOTENT — a replayed batch's documents already in
the corpus drop in the exact layer (same canonical fingerprint ⇒
``exact_corpus``), so the corpus never double-ingests. That self-healing
property is why production dedup-on-ingest pipelines key on content
fingerprints rather than offsets.

Scale notes: the per-batch cost is linear in the batch. Every gate's
corpus-side state can be MATERIALIZED and appended per batch, so no
gate pays a corpus re-scan at scale:

- ``dedup_index_path`` (round 10) persists dedup_incremental's three
  corpus-side relations — (doc_id, fp) fingerprints, (doc_id, band, bh)
  LSH bands, (doc_id, shs) shingle sets — plus the ``seen`` attempts
  listing (out-of-order guard) and the ``lens`` document-length table
  (drift baseline), so the exact/near layers never re-derive their
  state from corpus text;
- ``win_index_path`` persists the substring gate's winnow fingerprints
  plus the pre-mask original-fingerprint index at
  ``orig_fp_index_path(win_index_path)``;
- ``sem_index_path`` persists the semantic gate's embedding index.

With the dedup index on, the only remaining per-batch corpus touch is
the id-column-only ghost projection (column-pruned, no text read); the
drift monitor's baseline comes from the persisted length-HDR registers
when ``len_hdr_path`` is configured (O(≤960) rows — round 15), else
the index's materialized lens table. Without any of it, each gate
derives its corpus-side state per batch — fine for small corpora."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.fs import delete_dir, list_subdirs, path_exists
from ts_etl_spark.localrel import local_rows
from ts_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    canonical_fingerprint,
    dedup_incremental,
    minhash_bands,
    shingle_sets,
)
from ts_etl_spark.operators.drift import psi_drift, psi_drift_hist
from ts_etl_spark.operators.sketches import (
    HDR_PHIS,
    cm_estimate,
    cm_registers,
    hdr_merge,
    hdr_quantile_estimates,
    hdr_registers,
    hll_estimate,
    hll_merge,
    hll_registers,
)

DOCS_SCHEMA = "doc_id LONG, text STRING"

STATS_SCHEMA = "bucket STRING, rho INT"

#: persisted HDR length-histogram generation: registers + the batch id
#: that produced the generation (constant per generation — the replay
#: detector for the SUM-merge, see update_length_histogram)
LEN_HDR_SCHEMA = "bucket INT, n BIGINT, batch_id BIGINT"

#: incremental BM25 lexicon (update_bm25_lexicon): per-batch postings,
#: term document frequencies and corpus totals, append-only +
#: sum/distinct-on-read — additive across batches because every corpus
#: document belongs to exactly one batch
LEX_POSTINGS_SCHEMA = "term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, batch_id BIGINT"
LEX_TERMS_SCHEMA = "term STRING, df BIGINT, batch_id BIGINT"
LEX_TOTALS_SCHEMA = "n_docs BIGINT, sum_dl BIGINT, batch_id BIGINT"

#: the postings table is hive-partitioned BY TERM HASH BUCKET
#: (``tbucket=<n>`` directories, round 14). Round 13's per-batch term
#: range-clustering gave footer min/max pruning, but vanilla Spark
#: schedules a scan task per FILE and only skips row groups inside it —
#: after thousands of batches a query still lists and opens every
#: batch's files. Directory partitioning moves the pruning to PLANNING
#: time: a query term hashes to exactly one of LEX_POSTINGS_BUCKETS
#: directories and the scan never schedules a task outside it,
#: regardless of batch count or min/max distribution luck. Within each
#: bucket, files stay term-sorted (row-group pruning inside the bucket)
#: and compaction rewrites PER BUCKET (``compact_bucketed_state_table``)
#: so files-per-bucket returns to ~1. 32 buckets suit the test corpora;
#: a 100 TB deployment raises it (buckets only bound the per-query scan
#: fraction at 1/B — more buckets, finer pruning, same layout).
LEX_POSTINGS_BUCKETS = 32
#: partition column appended to LEX_POSTINGS_SCHEMA on read (its values
#: come from the directory names)
LEX_POSTINGS_READ_SCHEMA = LEX_POSTINGS_SCHEMA + ", tbucket INT"


def term_bucket(term: str) -> int:
    """Driver-side twin of the postings bucket expression — the
    engine-portable md5 fold (``classifier._hash8`` with prefix
    ``pb#``) mod LEX_POSTINGS_BUCKETS, so a reader can turn query terms
    into partition filters without a Spark job. Keep in lockstep with
    ``_term_bucket_col``."""
    import hashlib

    h = hashlib.md5(f"pb#{term}".encode("utf-8")).hexdigest()[:8]
    return int(h, 16) % LEX_POSTINGS_BUCKETS


def _term_bucket_col():
    """The Spark-side bucket expression (see ``term_bucket``)."""
    from ts_etl_spark.operators.classifier import _hash8

    return (
        _hash8("pb#", F.col("term")) % LEX_POSTINGS_BUCKETS
    ).cast("int")


def bm25_lexicon_paths(base: str) -> dict[str, str]:
    """The three append-only tables of a BM25 lexicon deployment:
    ``postings/`` (term, doc_id, tf, dl — the inverted index a query
    probes), ``terms/`` (per-batch term df) and ``totals/`` (per-batch
    n_docs + sum_dl; ALSO the per-batch presence/commit marker — always
    written last)."""
    return {
        "postings": f"{base}/postings",
        "terms": f"{base}/terms",
        "totals": f"{base}/totals",
    }

#: materialized semantic index: every KEPT document's embedding with its
#: 1-assign cell — appended per ingest, never recomputed from the corpus
SEM_INDEX_SCHEMA = "vec_id LONG, cell INT, v ARRAY<DOUBLE>, nrm DOUBLE"
#: offline-trained coarse quantizer (train_ivf_centroids output written
#: to parquet) — fixed across ingests so cells stay comparable
SEM_CENTS_SCHEMA = "c_id INT, cv ARRAY<DOUBLE>, cn DOUBLE"


def _sem_index(spark: SparkSession, path: str) -> DataFrame:
    if path_exists(spark, path):
        return spark.read.schema(SEM_INDEX_SCHEMA).parquet(path)
    return local_rows(spark, [], SEM_INDEX_SCHEMA)


def semantic_gate(
    spark: SparkSession,
    docs: DataFrame,
    sem_index_path: str,
    sem_cents_path: str,
    threshold: float | None = None,
    persisted: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Paraphrase-level dedup of a batch of documents against the
    materialized semantic index — the embedding-layer sibling of
    ``dedup_incremental`` (which sees only fingerprint/MinHash surface
    duplicates). Embeds the batch (``embed_documents``; swap the seam for
    a real model in production), runs ``semantic_dedup_incremental``
    against the index at ``sem_index_path`` with the offline-trained
    centroids at ``sem_cents_path``, and returns
    ``(survivors, index_delta)``:

    - ``survivors`` — the input docs minus semantic drops (documents with
      a NULL embedding carry no evidence and always survive);
    - ``index_delta`` — EVERY embedded batch vector's (vec_id, cell, v,
      nrm) row, kept AND dropped (the dominated-by-smaller-id policy
      needs dropped vectors as future dominators — see
      ``semantic_dedup_incremental`` — so the index records vectors SEEN,
      while the corpus records documents KEPT), ANTI-JOINED against the
      existing index so appending it is idempotent under batch replay (a
      crash between the index append and the corpus append re-derives the
      same delta, which no-ops).

    Caller appends ``index_delta`` to the index path BEFORE appending
    survivors to the corpus (see ``ingest_batch`` ordering rationale).
    Like ``dedup_incremental``, intermediate frames this function persists
    are handed to ``persisted`` for release after materialization.

    ENFORCES the ingest-order id contract ``semantic_dedup_incremental``
    assumes (new ids above every previously-seen id): a batch vector
    whose vec_id is ≤ the index's max seen id and is NOT itself already
    indexed (indexed ids re-appear under crash replay, which stays
    legal) arrived out of order — the earlier-landed larger-id vectors
    were judged without it, so strict smaller-id domination would
    silently miss duplicates; the gate raises instead. One max() on the
    skinny index scan plus one filtered anti-join probe per batch.

    ``threshold`` is REQUIRED (round 12): the generic
    ``SEMDEDUP_THRESHOLD`` default is calibrated for the driver's
    embeddings table, and the round-11 sf0.1 soak MEASURED it
    collapsing a 25k-doc corpus under this gate's hashed-BoW embedder
    (unrelated documents already score cosine noise ≈ 1/√dim = 0.125
    plus any shared-boilerplate offset, so 0.38 sits low enough that
    every cell accumulates a dominator). Pass ≈0.8 for hashed-BoW
    (drops bag-equal paraphrases, survives unrelated docs at any
    corpus size), or a value calibrated to your embedder."""
    from ts_etl_spark.operators.embedding import embed_documents
    from ts_etl_spark.operators.similarity import (
        as_double,
        norm,
        semantic_dedup_incremental,
    )

    if threshold is None:
        raise ValueError(
            "the semantic gate requires an explicit threshold: the "
            "generic SEMDEDUP_THRESHOLD default was measured collapsing "
            "a 25k-doc corpus under the hashed-BoW embedder (cosine "
            "noise floor ~ 1/sqrt(dim) + boilerplate offset) — pass "
            "~0.8 for hashed-BoW, or a value calibrated to your embedder"
        )
    cents = spark.read.schema(SEM_CENTS_SCHEMA).parquet(sem_cents_path)
    v = as_double(F.col("embedding"))
    vecs = (
        embed_documents(docs)
        .filter(F.col("embedding").isNotNull())
        .select(
            F.col("doc_id").alias("vec_id"), v.alias("v"), norm(v).alias("nrm")
        )
        .persist()
    )
    # register the cache BEFORE the contract check so a rejected batch
    # never leaks it (a long-lived service catches the ValueError per
    # batch and continues); callers without a release list get an
    # explicit unpersist on the raise path
    if persisted is not None:
        persisted.append(vecs)
    index = _sem_index(spark, sem_index_path)
    max_seen = index.agg(F.max("vec_id")).first()[0]
    if max_seen is not None:
        stale = (
            vecs.select("vec_id")
            .filter(F.col("vec_id") <= max_seen)
            .join(index.select("vec_id"), "vec_id", "left_anti")
            .first()
        )
        if stale is not None:
            if persisted is None:
                vecs.unpersist()
            raise ValueError(
                f"batch vec_id {stale[0]} is <= the semantic index's max "
                f"seen id {max_seen} and not a replay of an indexed id: "
                "genuinely-new ids must exceed all previously-ingested ids "
                "(ingest order) — smaller-id domination misses duplicates "
                "otherwise"
            )
    prov = semantic_dedup_incremental(vecs, index, cents, threshold).persist()
    if persisted is not None:
        persisted.append(prov)
    drop_ids = prov.filter(~F.col("kept")).select(
        F.col("vec_id").alias("doc_id")
    )
    survivors = docs.join(drop_ids, "doc_id", "left_anti")
    index_delta = (
        prov.select("vec_id", F.col("cell").cast("int").alias("cell"))
        .join(vecs, "vec_id")
        .select("vec_id", "cell", "v", "nrm")
        .join(index.select("vec_id"), "vec_id", "left_anti")
    )
    return survivors, index_delta


#: materialized winnow-fingerprint index: every SEEN document's selected
#: fingerprints (original text, pre-masking) — appended per ingest
WIN_INDEX_SCHEMA = "doc_id LONG, fp LONG"

#: materialized canonical-fingerprint index over ORIGINAL (pre-mask) text
#: of every document that ever entered the substring gate, plus the
#: stored (post-gate) text of everything appended to the corpus — the
#: pre-mask exact gate probes THIS instead of re-deriving fingerprints
#: from the whole corpus each micro-batch (one skinny probe per batch).
#: Lives at ``<win_index_path>_origfp``; the two indexes are one logical
#: unit of substring-gate state and are always maintained together.
ORIG_FP_SCHEMA = "fp STRING"


def _win_index(spark: SparkSession, path: str) -> DataFrame:
    if path_exists(spark, path):
        return spark.read.schema(WIN_INDEX_SCHEMA).parquet(path)
    return local_rows(spark, [], WIN_INDEX_SCHEMA)


#: materialized corpus-side relations of ``dedup_incremental`` — the
#: production shape its docstring promises: the per-batch dedup cost is
#: linear in the BATCH once these exist, because the corpus TEXT is
#: never re-scanned or re-shingled. Three sibling tables under one base
#: directory, all keyed by doc_id and appended per batch from the kept
#: documents' STORED text (the exact text the corpus append lands):
DEDUP_FP_SCHEMA = "doc_id LONG, fp STRING"
DEDUP_BANDS_SCHEMA = "doc_id LONG, band INT, bh BIGINT"
DEDUP_SETS_SCHEMA = "doc_id LONG, shs ARRAY<STRING>"
#: stored-text document lengths of KEPT docs — the drift monitor's
#: baseline, so per-batch PSI never re-scans corpus text
DEDUP_LENS_SCHEMA = "doc_id LONG, v BIGINT"
#: every doc_id that ever ENTERED ingest (kept, dropped, or mid-crash):
#: the membership listing the out-of-order guard consults. Appended
#: FIRST each batch, so it is always a superset of every other table —
#: fp/bands/sets hold KEPT docs only, which is why they cannot serve as
#: the guard (a replay of a batch that DROPPED a low id would look
#: out-of-order against them and wedge the stream).
DEDUP_SEEN_SCHEMA = "doc_id LONG"
#: note: sub-3-token documents produce NO sets/bands rows (shingle_sets
#: filters them) but kept docs always get an fp row.


def dedup_index_paths(base: str) -> dict[str, str]:
    """The five table locations under a dedup-index base directory."""
    return {k: f"{base}/{k}" for k in ("fp", "bands", "sets", "seen", "lens")}


def _require_success_markers(spark: SparkSession) -> None:
    """The ingest state machine is _SUCCESS-gated end to end (stats
    generations, heavy-hitter batch dirs, the orig-fp bootstrap commit
    check, compaction's torn-table refusal). A deployment that disables
    the marker (``mapreduce.fileoutputcommitter.marksuccessfuljobs=
    false``, a common object-store tuning) would silently DEGRADE those
    checks — e.g. the orig-fp bootstrap would destructively re-run every
    batch, erasing fingerprint deltas the corpus cannot regenerate — so
    it is refused loudly at every ingest/maintenance entry instead."""
    v = spark._jsc.hadoopConfiguration().get(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", "true"
    )
    if str(v).strip().lower() == "false":
        raise ValueError(
            "mapreduce.fileoutputcommitter.marksuccessfuljobs=false: the "
            "ingest state machine requires _SUCCESS markers (generation "
            "commits, bootstrap commit checks, compaction torn-table "
            "refusal) — re-enable the marker for ingest and state "
            "maintenance sessions"
        )


def stored_doclen(c=None):
    """Stored-text document length — THE length definition shared by the
    drift monitor's text-scan baseline, the lens bootstrap, and the
    per-batch lens delta. One definition on purpose: the lens table is a
    valid drift baseline only because all three sites compute the exact
    same value. Cast to long so the written parquet physically matches
    ``DEDUP_LENS_SCHEMA``'s BIGINT on every reader (``F.length`` is
    IntegerType; relying on read-time widening is Spark-4-only)."""
    c = F.col("text") if c is None else c
    return F.length(F.coalesce(c, F.lit(""))).cast("long")


def _dedup_index(
    spark: SparkSession, base: str, corpus: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Read (bootstrapping if absent) the materialized dedup index:
    ``(fp, bands, sets, seen, lens)``.

    Bootstrap derives all FIVE relations from the stored corpus in one
    pass — the one-time cost of adopting the index on a pre-existing
    corpus; thereafter every batch only appends. (``seen`` can only seed
    from corpus ids — attempts DROPPED before the index existed are
    unknowable, so their ids would be rejected as out-of-order if
    re-submitted; acceptable under the ingest-order contract.) Write
    order: seen, lens, sets, bands, then fp LAST — the fp table's
    existence marks the bootstrap complete (single-writer assumption,
    same as the other ingest state), so a crash mid-bootstrap
    re-bootstraps instead of serving a torn index. Tables added AFTER
    an index was materialized (a layout upgrade: an older index carries
    fp/bands/sets but no seen/lens) are BACKFILLED individually from the
    corpus on first read, so adopting a new engine version never wedges
    an existing ingest."""
    p = dedup_index_paths(base)
    if not path_exists(spark, p["fp"]):
        # fresh (or torn-bootstrap) index: derive everything
        missing = ["seen", "lens", "sets", "bands", "fp"]
    else:
        # committed index from an older layout: backfill what it lacks
        missing = [
            k
            for k in ("seen", "lens", "sets", "bands")
            if not path_exists(spark, p[k])
        ]
    if missing:
        sets = (
            shingle_sets(corpus).persist()
            if "sets" in missing or "bands" in missing
            else None
        )
        try:
            if "seen" in missing:
                corpus.select("doc_id").write.mode("overwrite").parquet(
                    p["seen"]
                )
            if "lens" in missing:
                corpus.select("doc_id", stored_doclen().alias("v")).write.mode(
                    "overwrite"
                ).parquet(p["lens"])
            if "sets" in missing:
                sets.write.mode("overwrite").parquet(p["sets"])
            if "bands" in missing:
                minhash_bands(sets).write.mode("overwrite").parquet(p["bands"])
            if "fp" in missing:
                corpus.select(
                    "doc_id", canonical_fingerprint().alias("fp")
                ).write.mode("overwrite").parquet(p["fp"])
        finally:
            if sets is not None:
                sets.unpersist()
    return (
        spark.read.schema(DEDUP_FP_SCHEMA).parquet(p["fp"]),
        spark.read.schema(DEDUP_BANDS_SCHEMA).parquet(p["bands"]),
        spark.read.schema(DEDUP_SETS_SCHEMA).parquet(p["sets"]),
        spark.read.schema(DEDUP_SEEN_SCHEMA).parquet(p["seen"]),
        spark.read.schema(DEDUP_LENS_SCHEMA).parquet(p["lens"]),
    )


def admit_seen_ids(
    spark: SparkSession, base: str, ids: list[int]
) -> int:
    """Append known-attempted doc_ids to a committed dedup index's
    ``seen`` table — the documented escape hatch for the one wedge the
    index layout cannot avoid: ``seen`` bootstraps from corpus ids only,
    so a legal re-delivery of an id that was DROPPED before the index
    existed fails the out-of-order guard forever (its attempt is
    unknowable from the stored corpus). An operator who knows those ids
    were genuinely attempted admits them here and the stream resumes; no
    manual parquet surgery. Idempotent (anti-joined against the current
    table) and constrained to ids BELOW the current max attempted —
    the only ids the guard can wedge on. Admitting an id ABOVE the max
    would RAISE ``max_attempted`` and turn every never-attempted id
    under it into a new wedge (the unwedging tool must never brick the
    stream), so those are refused: a genuinely-new high id needs no
    escape hatch — ingest it normally. Within its domain the operation
    only RELAXES the guard: it grants no dedup-layer state, so a
    re-delivered doc is still judged against fp/bands/sets as usual.
    Returns the number of ids actually appended. Refuses an
    uninitialized index (nothing is wedged if nothing exists) and
    non-integer ids (schema safety)."""
    p = dedup_index_paths(base)
    if not path_exists(spark, p["fp"]) or not path_exists(spark, p["seen"]):
        raise ValueError(
            f"no committed dedup index at {base!r} (fp/seen missing) — "
            "admit ids only into an index a stream is actually wedged on"
        )
    if not ids:
        return 0
    bad = [i for i in ids if not isinstance(i, int) or isinstance(i, bool)]
    if bad:
        raise ValueError(f"doc_ids must be integers; got {bad[:5]!r}")
    seen = spark.read.schema(DEDUP_SEEN_SCHEMA).parquet(p["seen"])
    max_attempted = seen.agg(F.max("doc_id")).first()[0]
    if max_attempted is None:
        # an initialized index over an EMPTY corpus has no attempts at
        # all — nothing can be wedged, so nothing needs admitting (and
        # "exceeds max (None)" would be a nonsensical refusal message)
        raise ValueError(
            f"the dedup index at {base!r} records no attempts yet — "
            "nothing is wedged; ingest new documents normally"
        )
    too_high = [i for i in sorted(set(ids)) if i > max_attempted]
    if too_high:
        raise ValueError(
            f"doc_ids {too_high[:5]!r} exceed the index's max attempted "
            f"id ({max_attempted}); the escape hatch only admits ids the "
            "out-of-order guard can wedge on (below the max) — admitting "
            "a higher id would raise the max and wedge every "
            "never-attempted id under it. Ingest new high ids normally."
        )
    delta = (
        local_rows(spark, [(i,) for i in sorted(set(ids))], DEDUP_SEEN_SCHEMA)
        .join(seen, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    n = delta.count()
    if n:
        delta.write.mode("append").parquet(p["seen"])
    delta.unpersist()
    return n


# --------------------------------------------------------------------------
# Single-writer lease (round 12)
#
# Every crash-safety analysis in this module (index append ordering,
# compaction recovery, telemetry rollup) assumes ONE writer per state
# deployment. That was a documented assumption with zero enforcement: a
# second concurrent ingest or maintenance pass on the same paths — an
# operator error, a stuck cron overlapping a manual run — could
# interleave appends and swap steps and corrupt state SILENTLY. The
# lease converts that into a loud refusal: one control file holding
# {owner, heartbeat ts}; writers acquire at entry (exclusive create
# when absent; refresh when theirs; STEAL only past the TTL — a crashed
# writer must not wedge the deployment forever) and refuse a fresh
# foreign lease. Best-effort BY DESIGN: the steal path is
# check-then-write (object stores lack compare-and-swap on overwrite),
# so two writers racing a just-expired lease can still both proceed —
# this is an operator-error tripwire, not a distributed lock; the TTL
# must exceed the longest batch + maintenance pass so a live writer's
# heartbeat never looks stale.
# --------------------------------------------------------------------------

INGEST_LEASE_TTL_S = 600.0


class IngestLeaseError(RuntimeError):
    """Another writer holds (or stole) the single-writer lease. ALWAYS
    fatal to the current pass — continuing would interleave two
    writers' mutations, the exact corruption the lease exists to
    prevent — so per-table failure aggregation
    (``compact_ingest_state``) must never swallow it as an ordinary
    table failure (review finding, round 14). Subclasses RuntimeError
    so existing handlers/tests keep matching."""

#: stable per-process owner token (host + pid + random suffix so a pid
#: reuse after a crash never impersonates the dead holder)
_LEASE_OWNER: str | None = None


def _process_lease_owner() -> str:
    global _LEASE_OWNER
    if _LEASE_OWNER is None:
        import os
        import socket
        import uuid

        _LEASE_OWNER = (
            f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:8]}"
        )
    return _LEASE_OWNER


def acquire_ingest_lease(
    spark: SparkSession,
    lease_path: str,
    owner: str | None = None,
    ttl_s: float = INGEST_LEASE_TTL_S,
) -> str:
    """Acquire (or refresh) the single-writer lease at ``lease_path``;
    returns the owner token. Raises RuntimeError when another writer
    holds a lease younger than ``ttl_s`` — the loud refusal that
    replaces silent state corruption (see the lease block above)."""
    import json
    import time

    from ts_etl_spark.fs import read_text_file, write_text_file

    owner = owner or _process_lease_owner()
    now = time.time()
    record = json.dumps({"owner": owner, "ts": now})
    if path_exists(spark, lease_path):
        try:
            doc = json.loads(read_text_file(spark, lease_path))
        except (ValueError, OSError):
            doc = {}  # torn/garbled lease file: treat as stale, take it
        if not isinstance(doc, dict):
            doc = {}  # valid JSON but not a lease record — same treatment
        held_by = doc.get("owner")
        age = now - float(doc.get("ts", 0.0))
        if held_by not in (None, owner) and age < ttl_s:
            raise IngestLeaseError(
                f"ingest state at {lease_path!r} is leased by "
                f"{held_by!r} ({age:.0f}s ago, ttl {ttl_s:.0f}s): a second "
                "concurrent writer would corrupt single-writer state — "
                "stop the other ingest/maintenance run, or wait out the "
                "TTL if it crashed"
            )
        write_text_file(spark, lease_path, record)  # refresh or steal
    else:
        write_text_file(spark, lease_path, record)
    return owner


def release_ingest_lease(
    spark: SparkSession, lease_path: str, owner: str | None = None
) -> None:
    """Release the lease if (and only if) ``owner`` still holds it — a
    writer that lost its lease to a TTL steal must not delete the new
    holder's record."""
    import json

    from ts_etl_spark.fs import read_text_file

    owner = owner or _process_lease_owner()
    if not path_exists(spark, lease_path):
        return
    try:
        doc = json.loads(read_text_file(spark, lease_path))
    except (ValueError, OSError):
        return
    if isinstance(doc, dict) and doc.get("owner") == owner:
        delete_dir(spark, lease_path)


# --------------------------------------------------------------------------
# Ingest-state compaction (round 11; manifest commit round 12)
#
# Every micro-batch APPENDS one file set to each state table (the five
# dedup-index tables, the winnow/orig-fp/semantic indexes, the corpus
# itself). Appends are the right write path — but after thousands of
# batches each table is thousands of tiny files, and per-batch cost
# stops being "linear in the batch": file listing + footer reads grow
# with BATCH COUNT (the classic lake small-files pathology, the very
# overhead the materialized index exists to avoid). Compaction restores
# the file count without changing one row, under a crash-safe,
# ATTESTED, manifest-committed swap (the Delta/Iceberg shape reduced to
# one control file — safe by construction on object stores, where
# directory renames are per-file copy+delete and NOT atomic):
#
#   1. rewrite the table into a sibling staging dir
#      (``compact_parquet`` — copy-on-write, _SUCCESS on commit);
#   2. attest content equality (``table_content_hash`` live == staged —
#      order/partition-independent, so the repartition cannot hide a
#      lost or duplicated row); abort + delete staging on mismatch;
#   3. PUT the MANIFEST — one sibling control file listing the staged
#      data-file names (+ the attestation hash, for audit). A one-file
#      create+close is a single-object PUT, atomic on every store; the
#      manifest's existence IS the commit point. Staged file names
#      carry the write job's UUID, so they cannot collide with the live
#      generation's names (asserted anyway before the PUT).
#   4. move each manifest-listed file from staging into the live dir
#      (per-file rename — atomic per file on POSIX/HDFS; on an object
#      store each move is one copy+delete whose every torn state the
#      manifest repairs, see recovery below);
#   5. delete the live dir's data files NOT in the manifest (the old
#      generation; ``_SUCCESS`` is spared — the table was committed
#      before the swap and stays committed throughout);
#   6. delete the staging dir;  7. delete the manifest.
#
# The live DIRECTORY is never renamed or deleted — only redundant files
# inside it are, each one individually recoverable:
# - before step 3, the live table is untouched and the staging is
#   discardable (it was attested EQUAL, so discarding loses nothing);
# - from step 3 on, the manifest pins the exact target file set, and
#   staging ∪ live always covers it: recovery moves any still-staged
#   listed file in (deleting the staging copy instead when a torn
#   copy+delete left the file in BOTH places), then deletes unlisted
#   live data files, then the staging and the manifest — pure roll-
#   forward, idempotent at every interruption point, zero row loss.
# A reader DURING steps 4-5 could see old+new rows at once — state
# maintenance runs in the single-writer window like every other state
# mutation here, and every ingest entry point runs recovery before
# reading, so a crashed swap is never read half-done.
#
# Torn tables REFUSE to compact: a live dir without its _SUCCESS marker
# is an uncommitted/partial write (e.g. a crashed orig-fp bootstrap),
# and rewriting it through staging would stamp a fresh _SUCCESS and
# launder the torn state into a committed-looking table. Hive-style
# partitioned layouts (visible subdirectories) are refused too — the
# round-robin rewrite would destroy the partition pruning they exist
# for. A stale staging dir WITHOUT a manifest is always discarded: the
# manifest is the only roll-forward evidence, so a deliberately-deleted
# table can never be resurrected by leftover staging litter.
# --------------------------------------------------------------------------


def _compact_sibling(table_dir: str, prefix: str) -> str:
    """Sibling location ``<parent>/<prefix><name>`` for a state-table
    swap artifact (NOT nested under the table — readers glob the table
    dir). Preserves the leading slash for root-level tables:
    ``/corpus`` → ``/_compact_corpus``, never a CWD-relative path."""
    base, sep, name = table_dir.rstrip("/").rpartition("/")
    return f"{base}{sep}{prefix}{name}" if sep else f"{prefix}{name}"


def _compact_staging(table_dir: str) -> str:
    """Sibling staging DIRECTORY for a state-table rewrite."""
    return _compact_sibling(table_dir, "_compact_")


def _compact_manifest(table_dir: str) -> str:
    """Sibling manifest FILE — the swap's single-object commit point."""
    return _compact_sibling(table_dir, "_compact_manifest_")


def _apply_compact_manifest(
    spark: SparkSession, table_dir: str, names: list[str]
) -> None:
    """Steps 4-5 of the protocol (and the recovery roll-forward): bring
    the live dir to exactly the manifest's data-file set, moving from
    staging what is not yet live and deleting what the manifest does
    not list. Idempotent — every branch re-checks current state."""
    from ts_etl_spark.fs import (
        list_data_files,
        mkdirs,
        rename_dir,
    )

    staged = _compact_staging(table_dir)
    if not path_exists(spark, table_dir):
        # only reachable if an operator removed the live dir mid-swap;
        # the manifest is explicit commit evidence, so reconstruct
        mkdirs(spark, table_dir)
    live_now = set(list_data_files(spark, table_dir))
    for name in names:
        in_live = name in live_now
        in_staged = path_exists(spark, f"{staged}/{name}")
        if in_staged and in_live:
            # torn object-store rename: the copy landed, the delete
            # didn't — the live copy is authoritative, drop the source
            delete_dir(spark, f"{staged}/{name}")
        elif in_staged:
            rename_dir(spark, f"{staged}/{name}", f"{table_dir}/{name}")
        elif not in_live:
            raise RuntimeError(
                f"compaction manifest for {table_dir!r} lists {name!r} "
                "but the file exists in neither the staging nor the live "
                "dir — state was mutated outside the swap protocol; "
                "refusing to guess (restore the file or remove the "
                "manifest after auditing)"
            )
    listed = set(names)
    for name in list_data_files(spark, table_dir):
        if name not in listed:
            delete_dir(spark, f"{table_dir}/{name}")
    if not path_exists(spark, f"{table_dir}/_SUCCESS") and path_exists(
        spark, f"{staged}/_SUCCESS"
    ):
        # normally the live marker survives the whole swap (only data
        # files are touched); restore it from staging if an operator
        # removed the live dir mid-swap
        rename_dir(spark, f"{staged}/_SUCCESS", f"{table_dir}/_SUCCESS")


def recover_state_compaction(spark: SparkSession, table_dir: str) -> None:
    """Complete (or discard) a compaction interrupted by a crash — see
    the protocol block above. A manifest rolls the swap FORWARD (the
    staged rewrite was attested equal before the manifest PUT); a
    staging dir without one is pre-commit litter and is discarded. No-op
    when neither exists (two existence probes)."""
    import json

    from ts_etl_spark.fs import read_text_file

    staged = _compact_staging(table_dir)
    manifest = _compact_manifest(table_dir)
    if path_exists(spark, manifest):
        names = _read_manifest(spark, manifest)
        if names is not None:
            _apply_compact_manifest(spark, table_dir, names)
            # same-session cache drop as the commit path: the roll-
            # forward renamed files under the table
            spark.catalog.refreshByPath(table_dir)
        # a TORN manifest (None) means the PUT itself crashed, so the
        # swap never started — live is authoritative either way
        delete_dir(spark, staged)
        delete_dir(spark, manifest)
    elif path_exists(spark, staged):
        delete_dir(spark, staged)  # pre-commit staging — live wins


def _read_manifest(spark: SparkSession, manifest: str) -> list[str] | None:
    """The manifest's file list, or None when the file is torn/garbled.
    A single create+close is one atomic PUT on object stores, but a
    POSIX crash mid-write can leave partial bytes; a torn manifest
    proves the commit PUT never completed, so callers treat it exactly
    like no manifest (live authoritative) instead of wedging every
    subsequent recovery on a JSON error."""
    import json

    from ts_etl_spark.fs import read_text_file

    try:
        doc = json.loads(read_text_file(spark, manifest))
        files = doc["files"]
        if isinstance(files, list) and all(isinstance(f, str) for f in files):
            return files
    except (ValueError, KeyError, TypeError, OSError):
        pass
    return None


def compact_state_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int | None = None,
    cluster_by: str | None = None,
) -> int:
    """Compact ONE state table in place under the attested
    manifest-commit protocol; returns the output file count. Refuses a
    missing table, a TORN one (no _SUCCESS), and a hive-partitioned
    layout (see the protocol block). ``cluster_by`` preserves a
    key-clustered file layout through the rewrite (see
    ``compact_parquet``)."""
    _require_success_markers(spark)
    recover_state_compaction(spark, table_dir)
    if not path_exists(spark, table_dir):
        raise ValueError(f"no state table at {table_dir!r}")
    return _compact_recovered_table(
        spark, table_dir, target_file_bytes, cluster_by
    )


def compact_bucketed_state_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int | None = None,
    cluster_by: str | None = None,
    partition_prefix: str = "tbucket=",
    heartbeat=None,
) -> int:
    """Compact a HASH-BUCKET-partitioned state table (the BM25 postings
    layout: ``<table>/tbucket=<n>/part-*.parquet``) by running the full
    attested manifest-commit protocol PER BUCKET DIRECTORY — each
    bucket is a flat file set, so the existing swap machinery applies
    unchanged with the ``_SUCCESS`` check redirected to the table root
    (partition appends commit at job level; only the root carries the
    marker). Returns the total output file count across buckets.

    Per-bucket staging/manifest artifacts are siblings INSIDE the table
    dir (``_compact_tbucket=<n>`` / ``_compact_manifest_tbucket=<n>``),
    hidden from readers by the underscore prefix; a crash at any point
    either discards pre-commit staging or rolls forward on the next
    pass (each bucket runs its own recovery first), and a reader
    between the crash and that pass sees at worst old+new duplicate
    rows — which this table's readers collapse by DISTINCT (the
    torn-append contract). Keeps the bucket count: compaction restores
    files-per-bucket, never re-buckets; ``cluster_by`` (the term sort)
    preserves row-group pruning inside each bucket."""
    _require_success_markers(spark)
    from ts_etl_spark.fs import list_subdirs

    if not path_exists(spark, table_dir):
        raise ValueError(f"no state table at {table_dir!r}")
    if not path_exists(spark, f"{table_dir}/_SUCCESS"):
        raise ValueError(
            f"state table at {table_dir!r} has no _SUCCESS marker — a "
            "torn/uncommitted write; compacting it would launder the "
            "torn state (re-run the owning bootstrap/ingest first)"
        )
    n = 0
    for name in sorted(list_subdirs(spark, table_dir)):
        if not name.startswith(partition_prefix):
            continue
        if heartbeat is not None:
            # the bucketed table compacts as up-to-B sequential swap
            # passes — refresh the caller's lease per bucket so the
            # whole pass never outlives the TTL mid-swap (the same
            # per-table discipline compact_ingest_state applies)
            heartbeat()
        sub = f"{table_dir}/{name}"
        recover_state_compaction(spark, sub)
        n += _compact_recovered_table(
            spark, sub, target_file_bytes, cluster_by, success_dir=table_dir
        )
    return n


def _compact_recovered_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int | None = None,
    cluster_by: str | None = None,
    success_dir: str | None = None,
) -> int:
    """The compaction body, assuming recovery already ran and the table
    exists (``compact_ingest_state`` calls this directly so each table
    pays ONE recovery pass, not two). ``success_dir``: where the
    ``_SUCCESS`` marker lives when ``table_dir`` is one PARTITION of a
    committed table (``compact_bucketed_state_table`` passes the table
    root — partition writes commit at job level, so only the root
    carries a marker)."""
    import json

    from ts_etl_spark.fs import list_data_files, list_subdirs, write_text_file
    from ts_etl_spark.pipelines.maintenance import (
        DEFAULT_TARGET_FILE_BYTES,
        compact_parquet,
        table_content_hash,
    )

    if not path_exists(spark, f"{success_dir or table_dir}/_SUCCESS"):
        raise ValueError(
            f"state table at {table_dir!r} has no _SUCCESS marker — a "
            "torn/uncommitted write; compacting it would stamp a fresh "
            "marker and launder the torn state into a committed-looking "
            "table (re-run the owning bootstrap/ingest first)"
        )
    part_dirs = [d for d in list_subdirs(spark, table_dir) if d[0] not in "_."]
    if part_dirs:
        raise ValueError(
            f"state table at {table_dir!r} has a partitioned layout "
            f"({part_dirs[:3]!r}...) — the round-robin rewrite would "
            "destroy it; compact bucketed state via "
            "compact_bucketed_state_table, other partitioned tables via "
            "table_sink with partition_by"
        )
    staged = _compact_staging(table_dir)
    n = compact_parquet(
        spark,
        table_dir,
        staged,
        target_file_bytes or DEFAULT_TARGET_FILE_BYTES,
        cluster_by=cluster_by,
    )
    live_h = table_content_hash(spark.read.parquet(table_dir))
    staged_h = table_content_hash(spark.read.parquet(staged))
    if live_h != staged_h:
        delete_dir(spark, staged)
        raise RuntimeError(
            f"compaction attestation failed for {table_dir!r}: "
            f"live hash {live_h} != staged hash {staged_h}; staging "
            "discarded, live table untouched"
        )
    names = list_data_files(spark, staged)
    collisions = set(names) & set(list_data_files(spark, table_dir))
    if collisions:
        # unreachable with UUID part names; refuse pre-commit if it ever
        # happens rather than let step 5 delete a just-moved file
        delete_dir(spark, staged)
        raise RuntimeError(
            f"staged file names collide with live ones at {table_dir!r}: "
            f"{sorted(collisions)[:3]!r}; staging discarded"
        )
    # THE commit point: one single-object PUT (see the protocol block)
    write_text_file(
        spark,
        _compact_manifest(table_dir),
        json.dumps({"table": table_dir, "hash": staged_h, "files": names}),
    )
    _apply_compact_manifest(spark, table_dir, names)
    delete_dir(spark, staged)
    delete_dir(spark, _compact_manifest(table_dir))
    # the swap replaced files via FS renames, which Spark's session
    # caches never observe (unlike DataFrame writes): drop any cached
    # file listing / cached relation over the table so SAME-SESSION
    # readers re-resolve instead of chasing deleted part files. A
    # DataFrame object created before the swap still holds its baked
    # file index — readers re-plan between drains by contract (the
    # round-15 soak caught exactly that misuse).
    spark.catalog.refreshByPath(table_dir)
    return n


def ingest_state_dirs(
    corpus_path: str | None = None,
    dedup_index_path: str | None = None,
    win_index_path: str | None = None,
    sem_index_path: str | None = None,
    bm25_lexicon_path: str | None = None,
    ann_index_path: str | None = None,
) -> list[str]:
    """Every append-accumulating state directory of an ingest deployment
    with the given paths configured — the compaction (and recovery)
    unit list. Deliberately EXCLUDES the telemetry paths: the stats and
    heavy-hitter registers are generationed/batch-dir state with their
    own pruning, and the drift log is batch=<id> partitioned (a
    round-robin rewrite would destroy its partition layout) — their
    retention story is ``prune_ingest_telemetry`` (drift prune +
    heavy-hitter rollup), not compaction."""
    dirs: list[str] = []
    if corpus_path is not None:
        dirs.append(corpus_path)
    if dedup_index_path is not None:
        dirs.extend(dedup_index_paths(dedup_index_path).values())
    if win_index_path is not None:
        dirs.append(win_index_path)
        dirs.append(orig_fp_index_path(win_index_path))
    if sem_index_path is not None:
        dirs.append(sem_index_path)
    if bm25_lexicon_path is not None:
        # append-only + sum-on-read: per-batch file sets accumulate like
        # the dedup index's, and the attested rewrite preserves rows
        # (the reader's DISTINCT semantics are unaffected)
        dirs.extend(bm25_lexicon_paths(bm25_lexicon_path).values())
    if ann_index_path is not None:
        from ts_etl_spark.streaming.ann_index import ann_index_paths

        # everything but qdrift (batch=<id> telemetry — retention, not
        # compaction, is its story); the cell-partitioned codes table
        # compacts per cell directory (compact_ingest_state routes it
        # through compact_bucketed_state_table)
        p = ann_index_paths(ann_index_path)
        dirs.extend(
            p[t] for t in ("cents", "codebooks", "meta", "codes", "totals")
        )
    return dirs


def compact_ingest_state(
    spark: SparkSession,
    corpus_path: str | None = None,
    dedup_index_path: str | None = None,
    win_index_path: str | None = None,
    sem_index_path: str | None = None,
    target_file_bytes: int | None = None,
    lease_path: str | None = None,
    lease_ttl_s: float = INGEST_LEASE_TTL_S,
    bm25_lexicon_path: str | None = None,
    auto_rebuild_bm25: bool = False,
    ann_index_path: str | None = None,
    auto_rebuild_ann: bool = False,
) -> dict[str, int]:
    """Compact every existing state table of an ingest deployment (the
    maintenance pass a production stream schedules between drains);
    returns {table_dir: output_file_count}. Tables whose path does not
    exist yet are skipped — a deployment without the semantic gate has
    no sem index to compact. Run BETWEEN drains (single-writer).

    One table's refusal (a torn table, a failed attestation) must not
    leave the REST of the deployment uncompacted: every table is
    attempted, and failures raise ONE RuntimeError at the end naming
    both the failed tables and the ones that did compact — so a partial
    maintenance pass is loud but never silently partial.

    ``lease_path``: pass the deployment's lease file (the one its
    ingests use) to refuse loudly if a drain is live — acquired for the
    pass, REFRESHED between tables (a multi-hour compaction over
    thousands of batches at real scale must not outlive the TTL
    mid-swap and become stealable; size the TTL to the longest
    single-table rewrite, not the whole pass), released after.

    When BOTH ``corpus_path`` and ``bm25_lexicon_path`` are given and
    the lexicon exists, the pass also runs the ghost-batch invariant
    probe (``verify_bm25_lexicon``): a count mismatch raises
    ``Bm25LexiconDriftError`` AFTER the compaction work completes —
    previously that state was invisible until someone noticed skewed
    idf. NOTE the probe detects the INVARIANT violation, not its
    cause: a drain that crashed after the lexicon fold but before the
    corpus append shows the same one-batch mismatch while its pending
    checkpoint replay would repair it for free — if a stream is
    mid-recovery, restart it first and re-probe before reaching for a
    rebuild. (A rebuild in that window is still SAFE, not just
    wasteful: the replay folds the batch into the rebuilt lexicon like
    any new batch, converging to the same state.)

    ``auto_rebuild_bm25``: on drift, re-derive the lexicon from the
    corpus INSIDE this pass — under the SAME held lease, so no drain
    can slip between the probe and the rebuild (re-acquiring after
    release would open exactly that race) — then re-probe; the
    returned dict records the rebuild as ``{bm25_lexicon_path: -1}``.
    Requires ``lease_path``: an unleased probe racing a live drain
    reads the routine fold-before-corpus-append window as drift and a
    rebuild from the pre-append corpus would then permanently drop the
    in-flight batch (the abandoned-checkpoint case, manufactured).

    ``ann_index_path`` (round 15): the persisted vector serving index
    compacts alongside — its cell-partitioned codes table per CELL
    directory (``compact_bucketed_state_table``, the postings shape),
    the skinny model/totals tables flat — and with ``corpus_path``
    given the pass also runs its coverage/ghost probe
    (``verify_ann_index``: index doc count == corpus count AND codes
    count == recorded encode count). ``auto_rebuild_ann`` mirrors
    ``auto_rebuild_bm25`` (same held-lease requirement, same ``-1``
    rebuild marker). When BOTH retrieval stacks drift, the BM25 error
    raises first and names the ANN drift; fix, re-run, and the ANN
    probe gets its own raise."""
    _require_success_markers(spark)
    if auto_rebuild_bm25 and lease_path is None:
        raise ValueError(
            "auto_rebuild_bm25 requires lease_path: an unleased "
            "probe+rebuild racing a live drain can drop its in-flight "
            "batch from the lexicon (see docstring)"
        )
    if auto_rebuild_ann and lease_path is None:
        raise ValueError(
            "auto_rebuild_ann requires lease_path: an unleased "
            "probe+rebuild racing a live drain can drop its in-flight "
            "batch from the serving index (see docstring)"
        )
    if lease_path is not None:
        acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
    out: dict[str, int] = {}
    failures: dict[str, str] = {}
    drift: tuple[int, int] | None = None
    ann_drift = None
    postings_dir = (
        bm25_lexicon_paths(bm25_lexicon_path)["postings"]
        if bm25_lexicon_path is not None
        else None
    )
    ann_codes_dir = None
    if ann_index_path is not None:
        from ts_etl_spark.streaming.ann_index import ann_index_paths

        ann_codes_dir = ann_index_paths(ann_index_path)["codes"]

    def _bucket_heartbeat() -> None:
        # per-bucket refresh for the postings table's sequential swaps.
        # A transient FS/JVM hiccup on the refresh must not abort the
        # remaining buckets (the CLI heartbeat thread tolerates the
        # same); a lease-contention IngestLeaseError stays fatal — a
        # second live writer means stop NOW.
        import sys as _sys

        try:
            acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
        except IngestLeaseError:
            raise
        except Exception as exc:  # noqa: BLE001 — keep compacting
            print(
                f"compact-state: lease refresh failed ({exc}); "
                "continuing",
                file=_sys.stderr,
            )
    try:
        for d in ingest_state_dirs(
            corpus_path, dedup_index_path, win_index_path, sem_index_path,
            bm25_lexicon_path, ann_index_path,
        ):
            if lease_path is not None:
                # heartbeat: each table's rewrite restarts the TTL clock
                acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
            recover_state_compaction(spark, d)
            if not path_exists(spark, d):
                continue
            try:
                if d == ann_codes_dir:
                    # the ANN codes table is always cell-partitioned —
                    # compact per cell directory, preserving the
                    # planning-time probed-cell pruning and the in-cell
                    # vec_id clustering
                    out[d] = compact_bucketed_state_table(
                        spark,
                        d,
                        target_file_bytes,
                        cluster_by="vec_id",
                        partition_prefix="cell=",
                        heartbeat=(
                            _bucket_heartbeat
                            if lease_path is not None
                            else None
                        ),
                    )
                elif d == postings_dir and not _postings_layout_is_flat(
                    spark, d
                ):
                    # the bucketed postings layout compacts PER BUCKET
                    # directory, preserving both the planning-time
                    # partition pruning and the in-bucket term sort; a
                    # legacy flat layout (pre-round-14) still takes the
                    # unpartitioned path below with term clustering
                    out[d] = compact_bucketed_state_table(
                        spark,
                        d,
                        target_file_bytes,
                        cluster_by="term",
                        heartbeat=(
                            _bucket_heartbeat
                            if lease_path is not None
                            else None
                        ),
                    )
                else:
                    out[d] = _compact_recovered_table(
                        spark,
                        d,
                        target_file_bytes,
                        # a legacy flat postings table's term clustering
                        # is what its footer pruning runs on — a
                        # round-robin rewrite would silently revert it
                        cluster_by="term" if d == postings_dir else None,
                    )
            except IngestLeaseError:
                # a lease steal is NOT a per-table failure: a second
                # live writer means every further mutation risks
                # interleaving — abort the whole pass loudly
                raise
            except (ValueError, RuntimeError, OSError) as exc:
                # OSError: a filesystem-refused rename (fs.rename_dir) is a
                # per-table failure like any other — it must not abort the
                # remaining tables' maintenance
                failures[d] = str(exc)
        if (
            corpus_path is not None
            and bm25_lexicon_path is not None
            and path_exists(
                spark, bm25_lexicon_paths(bm25_lexicon_path)["totals"]
            )
        ):
            if lease_path is not None:
                # the probe (two count scans) and especially the rebuild
                # (a full lexicon re-derive) run after the LAST per-table
                # heartbeat — restart the TTL clock first or a long
                # rebuild becomes stealable mid-refold, the exact window
                # the held-lease requirement exists to close
                acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
            lex_n, corpus_n = verify_bm25_lexicon(
                spark, corpus_path, bm25_lexicon_path
            )
            if lex_n != corpus_n and auto_rebuild_bm25:
                # under the held lease — see the docstring's race note
                if lease_path is not None:
                    acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
                rebuild_bm25_lexicon(spark, corpus_path, bm25_lexicon_path)
                lex_n, corpus_n = verify_bm25_lexicon(
                    spark, corpus_path, bm25_lexicon_path
                )
                out[bm25_lexicon_path] = -1  # the rebuild marker
            if lex_n != corpus_n:
                drift = (lex_n, corpus_n)
        if corpus_path is not None and ann_index_path is not None:
            from ts_etl_spark.streaming.ann_index import (
                AnnIndexDriftError,
                ann_index_paths,
                rebuild_ann_index,
                verify_ann_index,
            )

            if path_exists(
                spark, ann_index_paths(ann_index_path)["totals"]
            ):
                if lease_path is not None:
                    # same TTL-clock restart as the bm25 probe: the
                    # probe is cheap but an auto rebuild is a full
                    # corpus re-embed+re-encode
                    acquire_ingest_lease(
                        spark, lease_path, ttl_s=lease_ttl_s
                    )
                try:
                    verify_ann_index(spark, corpus_path, ann_index_path)
                except AnnIndexDriftError as exc:
                    if auto_rebuild_ann:
                        # under the SAME held lease — the bm25 race note
                        if lease_path is not None:
                            acquire_ingest_lease(
                                spark, lease_path, ttl_s=lease_ttl_s
                            )
                        rebuild_ann_index(
                            spark, corpus_path, ann_index_path
                        )
                        verify_ann_index(
                            spark, corpus_path, ann_index_path
                        )
                        out[ann_index_path] = -1  # the rebuild marker
                    else:
                        ann_drift = exc
    finally:
        if lease_path is not None:
            release_ingest_lease(spark, lease_path)
    if failures:
        raise RuntimeError(
            f"compaction failed for {len(failures)} state table(s): "
            + "; ".join(f"{d!r}: {m}" for d, m in failures.items())
            + (
                f" — {len(out)} other table(s) compacted successfully: "
                + ", ".join(sorted(out))
                if out
                else ""
            )
            + (
                # one error path must not mask the other: the ghost-batch
                # probe's finding rides along when table failures win the
                # raise (the drift is still remediable via bm25-rebuild)
                f"; ADDITIONALLY the BM25 ghost-batch probe detected "
                f"drift (lexicon records {drift[0]} docs, corpus holds "
                f"{drift[1]}) — run bm25-rebuild after fixing the above"
                if drift is not None
                else ""
            )
            + (
                f"; ADDITIONALLY the ANN coverage probe detected drift "
                f"({ann_drift}) — run ann-rebuild after fixing the above"
                if ann_drift is not None
                else ""
            )
        )
    if drift is not None:
        # chain the ANN drift (if any) so neither finding is masked
        raise Bm25LexiconDriftError(
            bm25_lexicon_path, *drift, compacted=out
        ) from ann_drift
    if ann_drift is not None:
        ann_drift.compacted = dict(out)
        raise ann_drift
    return out


# --------------------------------------------------------------------------
# Telemetry retention (round 12)
#
# The drift log and the attempt heavy-hitter registers are deliberately
# EXCLUDED from state compaction (per-batch partition layout is their
# idempotence mechanism — a round-robin rewrite would destroy it), but
# they accumulate one directory per micro-batch forever: after tens of
# thousands of batches the telemetry paths hold tens of thousands of
# tiny dirs even though each is bounded. Retention bounds them:
#
# - drift log: per-batch PSI rows have no cross-batch aggregate meaning,
#   so batches older than the horizon are simply PRUNED.
# - heavy hitters: count-min merges by SUM, so old batches ROLL UP into
#   one consolidated ``batch=rollup`` directory — lifetime attempt
#   counts survive, bounded at depth×width rows. The rollup commits
#   under the same manifest protocol as state compaction (the manifest
#   additionally lists the CONSUMED batch dirs, deleted only after the
#   staged merge is committed), so a crash at any point either discards
#   an uncommitted staging or rolls forward with no lost or
#   double-counted batch. ``heavyhitter_estimate`` runs the roll-forward
#   before reading so a crashed pass is never summed half-done.
#
# HORIZON CONTRACT: the horizon (in batch ids) must comfortably exceed
# the stream's maximum replay depth. A replayed batch whose dir was
# already rolled up re-creates the dir and would be rolled up AGAIN —
# the bounded per-batch overcount trade the stats sketch documents,
# acceptable for telemetry, but not something to invite by pruning
# right behind the checkpoint.
# --------------------------------------------------------------------------

HH_ROLLUP_DIR = "batch=rollup"


def _numeric_batch_dirs(spark: SparkSession, path: str) -> list[tuple[int, str]]:
    """(id, name) of every ``batch=<int>`` subdirectory, ascending by id."""
    out = []
    for name in list_subdirs(spark, path):
        if name.startswith("batch=") and name[6:].isdigit():
            out.append((int(name[6:]), name))
    return sorted(out)


def recover_hh_rollup(spark: SparkSession, hh_path: str) -> None:
    """Roll forward (or discard) a heavy-hitter retention pass
    interrupted by a crash. The rollup manifest pins both the staged
    merged-register files and the CONSUMED batch dirs whose counts the
    merge absorbed, so the roll-forward is exact and idempotent:
    apply the staged files to ``batch=rollup``, delete exactly the
    consumed dirs, drop the staging and the manifest. A staging without
    a manifest is pre-commit litter and is discarded. No-op otherwise."""
    import json

    from ts_etl_spark.fs import read_text_file

    rollup = f"{hh_path}/{HH_ROLLUP_DIR}"
    staged = _compact_staging(rollup)
    manifest = _compact_manifest(rollup)
    if path_exists(spark, manifest):
        files = _read_manifest(spark, manifest)
        if files is not None:
            doc = json.loads(read_text_file(spark, manifest))
            _apply_compact_manifest(spark, rollup, files)
            for name in doc.get("consumed", []):
                delete_dir(spark, f"{hh_path}/{name}")
        # torn manifest: the commit PUT never completed — the victims
        # are intact and the staging is discardable, same as no manifest
        delete_dir(spark, staged)
        delete_dir(spark, manifest)
    elif path_exists(spark, staged):
        delete_dir(spark, staged)


def prune_ingest_telemetry(
    spark: SparkSession,
    drift_path: str | None = None,
    hh_path: str | None = None,
    horizon: int = 1000,
    lease_path: str | None = None,
    lease_ttl_s: float = INGEST_LEASE_TTL_S,
) -> dict[str, int]:
    """Bound the per-batch telemetry paths (see the retention block
    above): prune drift-log batches older than ``horizon`` ids behind
    the newest, and roll heavy-hitter batches that old into the
    consolidated ``batch=rollup`` registers (sum-merge — lifetime
    counts preserved). Returns {path: batch_dirs_removed}. Run between
    drains (single-writer; pass the deployment's ``lease_path`` to
    enforce that), e.g. ``compact-state --telemetry-horizon``; the
    horizon must exceed the stream's maximum replay depth."""
    import json

    from ts_etl_spark.fs import list_data_files, write_text_file

    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    _require_success_markers(spark)
    if lease_path is not None:
        acquire_ingest_lease(spark, lease_path, ttl_s=lease_ttl_s)
    try:
        return _prune_telemetry_body(spark, drift_path, hh_path, horizon)
    finally:
        if lease_path is not None:
            release_ingest_lease(spark, lease_path)


def _prune_telemetry_body(
    spark: SparkSession,
    drift_path: str | None,
    hh_path: str | None,
    horizon: int,
) -> dict[str, int]:
    import json

    from ts_etl_spark.fs import list_data_files, write_text_file

    out: dict[str, int] = {}
    if drift_path is not None:
        # the PSI log and its length-quantile sibling share the same
        # per-batch-no-aggregate-meaning retention: plain prune
        for p in (drift_path, length_drift_path(drift_path)):
            if not path_exists(spark, p):
                continue
            dirs = _numeric_batch_dirs(spark, p)
            victims = (
                [n for i, n in dirs if i <= dirs[-1][0] - horizon]
                if dirs
                else []
            )
            for name in victims:
                delete_dir(spark, f"{p}/{name}")
            out[p] = len(victims)
    if hh_path is not None and path_exists(spark, hh_path):
        recover_hh_rollup(spark, hh_path)
        dirs = _numeric_batch_dirs(spark, hh_path)
        cutoff = dirs[-1][0] - horizon if dirs else None
        removed = 0
        committed_victims = []
        for i, name in dirs:
            if cutoff is None or i > cutoff:
                continue
            if path_exists(spark, f"{hh_path}/{name}/_SUCCESS"):
                committed_victims.append(name)
            else:
                # torn write below the horizon: a replay can no longer
                # rewrite it and readers already skip it — plain garbage
                delete_dir(spark, f"{hh_path}/{name}")
                removed += 1
        if committed_victims:
            rollup = f"{hh_path}/{HH_ROLLUP_DIR}"
            sources = [f"{hh_path}/{n}" for n in committed_victims]
            if path_exists(spark, f"{rollup}/_SUCCESS"):
                sources.append(rollup)
            merged = (
                spark.read.schema(CM_SCHEMA)
                .parquet(*sources)
                .groupBy("d", "slot")
                .agg(F.sum("c").alias("c"))
            )
            rows = merged.collect()  # <= depth x width rows by construction
            staged = _compact_staging(rollup)
            # ONE-slice local relation (localrel rationale): the bounded
            # driver-built rows scan as one task and land as one file —
            # no repartition(1)/coalesce(1) step at all. (Applies to the
            # register/telemetry writes below too.)
            local_rows(spark, rows, CM_SCHEMA).write.mode(
                "overwrite"
            ).parquet(staged)
            write_text_file(
                spark,
                _compact_manifest(rollup),
                json.dumps(
                    {
                        "table": rollup,
                        "files": list_data_files(spark, staged),
                        "consumed": committed_victims,
                    }
                ),
            )
            # the commit point; the shared roll-forward completes the pass
            recover_hh_rollup(spark, hh_path)
            removed += len(committed_victims)
        out[hh_path] = removed
    return out


def orig_fp_index_path(win_index_path: str) -> str:
    """Canonical location of the original-text fingerprint index that
    rides alongside a winnow index (derived, so callers configure ONE
    path for the substring-gate state)."""
    return f"{win_index_path}_origfp"


def _orig_fp_index(
    spark: SparkSession, path: str, corpus: DataFrame
) -> DataFrame:
    """Read (bootstrapping if absent) the original-fingerprint index.

    Bootstrap seeds the index from the STORED corpus text — exactly the
    fingerprint set the pre-mask gate derived from the corpus on every
    batch before the index existed, so adopting the index on a
    pre-existing corpus preserves those semantics from the first batch.
    Originals of documents masked BEFORE the index existed are
    unrecoverable (the corpus keeps only masked text); their new-doc_id
    re-crawl protection starts with the first post-index ingest.

    A directory counts as a committed bootstrap only when its _SUCCESS
    marker exists: a crash mid-bootstrap leaves a partial (or empty)
    directory, and trusting it would permanently seed a WEAKER pre-mask
    gate for every pre-existing corpus doc whose fingerprint the torn
    write dropped. The multi-table dedup index solves the same problem
    with fp-written-last ordering; this single-table bootstrap re-runs
    (mode=overwrite — idempotent, the corpus is unchanged) until the
    marker lands."""
    if not path_exists(spark, f"{path}/_SUCCESS"):
        corpus.select(canonical_fingerprint().alias("fp")).distinct().write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.schema(ORIG_FP_SCHEMA).parquet(path)


def substring_gate(
    spark: SparkSession,
    docs: DataFrame,
    win_index_path: str,
    k: int | None = None,
    w: int | None = None,
    min_docs: int | None = None,
    persisted: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental winnowed-substring masking of a batch against the
    materialized fingerprint index — the substring-layer sibling of
    ``semantic_gate``: license boilerplate and chrome repeated across
    ingests is attenuated AT INGEST TIME instead of waiting for a full
    recuration. Returns ``(masked, index_delta)``:

    - ``masked`` — the batch with ``text`` REWRITTEN through
      ``operators.substrings.mask_winnowed_spans`` semantics over
      seen ∪ batch (plus ``n_tokens_removed``): a selected span masks
      iff its fingerprint occurs in ≥ ``min_docs`` distinct documents
      among everything ever ingested plus this batch. Fingerprint
      occurrence is a pure SET union — no id-ordering contract is even
      needed (unlike the semantic gate's smaller-id domination), and the
      result equals the one-shot ``mask_winnowed_spans`` over the union
      restricted to batch rows EXACTLY (tested).
    - ``index_delta`` — the batch's (doc_id, fp) selected fingerprints
      of the ORIGINAL text, anti-joined by doc_id against the existing
      index so appending it is idempotent under crash replay (the
      ``semantic_gate`` contract: append the delta BEFORE the corpus
      append).

    Scale shape: winnowing the batch is the linear winnow plan; the
    verdict is one groupBy over the skinny (doc, fp) union — the index
    grows with selected fingerprints (~2/(w+1) of the token stream),
    and at real scale the groupBy prunes to the batch's fingerprints
    via a semi-join (small-batch case) or partial aggregation."""
    from ts_etl_spark.operators.substrings import (
        MIN_DOCS,
        WINNOW_K,
        WINNOW_W,
        _rebuild_masked,
        repeated_fingerprints,
        winnow_fingerprints,
    )

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    min_docs = MIN_DOCS if min_docs is None else min_docs
    index = _win_index(spark, win_index_path)
    bfps = winnow_fingerprints(docs, k, w).persist()
    if persisted is not None:
        persisted.append(bfps)
    union_fps = index.unionByName(bfps.select("doc_id", "fp"))
    rep = repeated_fingerprints(union_fps, min_docs)
    # batch spans flagged by UNION-wide repetition, rebuilt through the
    # one-shot path's shared mask (same covered-token rule)
    flagged = (
        bfps.join(rep.select("fp"), "fp")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("__flagged"))
    )
    masked = _rebuild_masked(docs, flagged, k, "text", "doc_id", "__clean")
    masked = masked.select(
        *[c for c in docs.columns if c != "text"],
        F.col("__clean").alias("text"),
        "n_tokens_removed",
    )
    # no distinct on the anti-join's build side: duplicate keys there
    # cannot change anti-join semantics, and the aggregate would rescan
    # the ever-growing index every micro-batch for nothing
    index_delta = (
        bfps.select("doc_id", "fp")
        .distinct()
        .join(index.select("doc_id"), "doc_id", "left_anti")
    )
    return masked, index_delta


def _corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    # existence via the Hadoop FileSystem API — os.path would silently
    # report an hdfs:// or s3a:// corpus as absent
    if path_exists(spark, corpus_path):
        return spark.read.schema(DOCS_SCHEMA).parquet(corpus_path)
    return local_rows(spark, [], DOCS_SCHEMA)


def _stats_generations(spark: SparkSession, stats_path: str) -> list[int]:
    """COMMITTED register-table generations under ``stats_path``, ascending.
    A generation counts only once its ``_SUCCESS`` marker exists, so a
    crash mid-write leaves a partial directory that every reader ignores."""
    gens = []
    for name in list_subdirs(spark, stats_path):
        if name.startswith("v") and name[1:].isdigit():
            n = int(name[1:])
            if path_exists(spark, f"{stats_path}/v{n}/_SUCCESS"):
                gens.append(n)
    return sorted(gens)


def _latest_stats(spark: SparkSession, stats_path: str) -> tuple[DataFrame | None, int]:
    gens = _stats_generations(spark, stats_path)
    if not gens:
        return None, 0
    latest = gens[-1]
    return (
        spark.read.schema(STATS_SCHEMA).parquet(f"{stats_path}/v{latest}"),
        latest,
    )


def update_corpus_stats(
    spark: SparkSession, new_docs: DataFrame, stats_path: str
) -> None:
    """Fold a batch's canonical-fingerprint HLL registers into the
    persisted register table at ``stats_path`` — the mergeable-sketch
    pattern from ``operators.sketches``: corpus-lifetime distinct counts
    maintained by max-merging ≤2^p rows per ingest, never by re-scanning
    history. The merged table is register-count bounded (256 rows), so
    materializing it through the driver for the copy-on-write swap is a
    bounded scalar transfer, same class as the CLI summary collects.

    Crash safety: the state is GENERATIONED (``v<N>`` subdirectories, a
    generation valid only once its ``_SUCCESS`` marker commits). An update
    reads the latest committed generation and writes the merge as a NEW
    one — never an in-place overwrite, so a crash mid-write can only lose
    the in-flight generation, not the corpus-lifetime sketch. Generations
    older than the previous one are pruned after a successful commit."""
    batch_regs = hll_registers(
        new_docs.select(canonical_fingerprint().alias("fp")), "fp"
    )
    old, latest = _latest_stats(spark, stats_path)
    merged = batch_regs if old is None else hll_merge(old, batch_regs)
    rows = merged.collect()  # <= 2^p = 256 rows by construction
    local_rows(spark, rows, STATS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{stats_path}/v{latest + 1}")
    # keep the immediately-previous generation as the recovery point; prune
    # everything older (an append that later fails permanently can at most
    # overcount by one batch in the telemetry — documented trade). Torn
    # directories (no _SUCCESS) are also removed regardless of number —
    # a crash mid-write can leave one ABOVE the committed counter, which
    # the committed-only prune would never reach; safe under the
    # single-writer assumption since the only in-flight write (ours, to
    # v<latest+1>) just committed.
    committed = set(_stats_generations(spark, stats_path))
    for name in list_subdirs(spark, stats_path):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        n = int(name[1:])
        if n == latest + 1:
            continue
        if n not in committed or n < latest:
            delete_dir(spark, f"{stats_path}/v{n}")


def corpus_distinct_estimate(spark: SparkSession, stats_path: str) -> float:
    """Estimated distinct canonical documents ever ingested, from the
    persisted register table alone (no corpus scan)."""
    regs, _ = _latest_stats(spark, stats_path)
    if regs is None:
        return 0.0
    return float(hll_estimate(spark, regs).first().estimate)


def _latest_len_hdr(
    spark: SparkSession, hdr_path: str
) -> tuple[DataFrame | None, int, int | None]:
    """Latest committed length-histogram generation: ``(registers,
    generation, batch_id)`` — same ``v<N>``/_SUCCESS discipline as the
    stats sketch (``_stats_generations`` is path-generic)."""
    gens = _stats_generations(spark, hdr_path)
    if not gens:
        return None, 0, None
    latest = gens[-1]
    regs = spark.read.schema(LEN_HDR_SCHEMA).parquet(f"{hdr_path}/v{latest}")
    first = regs.select("batch_id").first()
    return regs, latest, (None if first is None else int(first.batch_id))


def update_length_histogram(
    spark: SparkSession, new_docs: DataFrame, hdr_path: str, batch_id: int
) -> None:
    """Fold the batch's document-length HDR registers into the persisted
    corpus-lifetime length histogram at ``hdr_path`` — distribution
    telemetry (quantiles via ``corpus_length_quantiles``) that never
    re-scans history: ≤960 register rows per generation, SUM-merged.

    Same generationed ``v<N>``/_SUCCESS crash discipline as
    ``update_corpus_stats``, with one extra obligation the HLL table
    does not have: SUM-merge is NOT idempotent (re-merging a replayed
    batch double-counts where max-merge no-ops), so each generation
    records the ``batch_id`` that produced it and a call whose batch_id
    MATCHES the latest committed generation is a NO-OP — that
    generation already holds exactly this batch folded onto the
    pre-batch state, in every crash window:

    - crash BEFORE this table committed: the torn directory is
      invisible (no _SUCCESS), the replay recomputes from the latest
      committed (foreign-bid) generation — same kept set, same result;
    - crash AFTER this table committed but BEFORE the corpus append:
      the replay re-derives the same kept set, sees its own bid on the
      latest generation, and skips — content already correct;
    - crash AFTER the corpus append (before the streaming checkpoint):
      the replay's kept set is EMPTY (every doc now fingerprint-matches
      its stored copy) — the skip is what makes this window safe. The
      earlier rebase-and-rewrite protocol recomputed base+∅ here and
      PRUNED the first attempt's correct generation, permanently
      dropping the batch from the histogram (review finding, round 12).

    Correctness therefore requires batch ids to be unique across live
    batches (Structured Streaming's epoch ids; the sequential
    single-writer lease makes one committed generation per id enough) —
    ``ingest_batch`` refuses a defaulted batch_id when this telemetry
    is enabled, because two distinct batches sharing an id would make
    the second silently skip."""
    batch_regs = hdr_registers(
        new_docs.select(F.length("text").alias("len")), "len"
    )
    old, latest, last_bid = _latest_len_hdr(spark, hdr_path)
    if old is not None and last_bid == int(batch_id):
        return  # replay of an already-folded batch — see docstring
    if old is not None and last_bid is not None and int(batch_id) < last_bid:
        # (None last_bid cannot happen since the empty-generation
        # sentinel below — kept for pre-sentinel generations)
        # an id BELOW the latest folded one is neither a replay (only the
        # last batch replays under single-writer streaming) nor a new
        # batch — it is a restarted id sequence (checkpoint reset against
        # live state), which would double-count every doc it re-folds.
        # Refuse loudly; the remedy is a fresh histogram (delete + let
        # the stream rebuild, or re-derive from the corpus).
        raise RuntimeError(
            f"length histogram at {hdr_path} last folded batch "
            f"{last_bid}, got out-of-order batch {int(batch_id)} — a "
            "restarted batch-id sequence cannot be folded safely; "
            "rebuild the histogram state"
        )
    base = old.select("bucket", "n") if old is not None else None
    merged = batch_regs if base is None else hdr_merge(base, batch_regs)
    rows = merged.withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    ).collect()  # <= 960 rows by construction (see hdr_registers)
    if not rows:
        # first-ever fold with an empty kept set: a zero-row generation
        # would lose its batch_id, silently disabling the replay no-op
        # AND the out-of-order guard for the next fold (review finding,
        # round 12) — carry the id on a zero-count register instead,
        # which every consumer treats as a no-op (SUM-merge adds 0; the
        # rank walk never reaches cum >= 1 on an all-zero table, so
        # corpus_length_quantiles still answers {})
        rows = [(0, 0, int(batch_id))]
    local_rows(spark, rows, LEN_HDR_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{hdr_path}/v{latest + 1}")
    # prune: keep the just-committed generation and its base (the
    # stats-table discipline: previous generation as recovery point);
    # drop older generations and any torn (uncommitted) directory —
    # safe under the single-writer assumption since the only in-flight
    # write (ours) just committed
    committed = set(_stats_generations(spark, hdr_path))
    for name in list_subdirs(spark, hdr_path):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        n = int(name[1:])
        if n == latest + 1 or n == latest:
            continue
        if n not in committed or n < latest:
            delete_dir(spark, f"{hdr_path}/v{n}")


def corpus_length_quantiles(
    spark: SparkSession, hdr_path: str, phis: tuple = HDR_PHIS
) -> dict[float, int]:
    """Corpus-lifetime document-length quantile estimates (relative
    error ≤ 2^-HDR_S) from the persisted histogram alone — no corpus
    scan, the distribution-drift dashboard read."""
    regs, _, _ = _latest_len_hdr(spark, hdr_path)
    if regs is None:
        return {}
    return {
        float(r.phi): int(r.estimate)
        for r in hdr_quantile_estimates(
            regs.select("bucket", "n"), phis
        ).collect()
    }


#: reserved length-histogram batch id for the adoption bootstrap —
#: below every real streaming epoch id, so the replay no-op and the
#: out-of-order guard are unaffected (the BM25_BOOTSTRAP_ID discipline)
LEN_HDR_BOOTSTRAP_ID = -1


def bootstrap_length_histogram(
    spark: SparkSession, corpus: DataFrame, hdr_path: str
) -> bool:
    """Adopt the length histogram on a PRE-EXISTING corpus: when no
    generation exists yet but the corpus is non-empty, fold the ENTIRE
    stored corpus once under the reserved ``LEN_HDR_BOOTSTRAP_ID`` —
    without this, enabling ``len_hdr_path`` on a live deployment would
    silently cover only post-adoption batches, the exact defect class
    the BM25 lexicon's bootstrap closed (review finding, round 12).
    Idempotent and crash-safe: the generation write is atomic
    (_SUCCESS-gated), a torn bootstrap is invisible and re-runs, and
    once committed the existence check skips in one probe per batch.
    ``ingest_batch`` calls this before every per-batch fold. Returns
    True if a bootstrap fold ran."""
    if _stats_generations(spark, hdr_path):
        return False
    if corpus.first() is None:
        return False  # fresh deployment — batch folds build the histogram
    update_length_histogram(spark, corpus, hdr_path, LEN_HDR_BOOTSTRAP_ID)
    return True


def rebuild_length_histogram(
    spark: SparkSession, corpus_path: str, hdr_path: str
) -> None:
    """Drop and re-derive the length histogram from the stored corpus —
    the remedy the out-of-order guard's refusal points at (a restarted
    batch-id sequence cannot be folded safely), and the upgrade path
    for a histogram adopted mid-stream before the bootstrap existed
    (which covers only post-adoption batches). One corpus scan,
    column-pruned to lengths. REFUSES a missing corpus path before
    deleting anything — the rebuild_bm25_lexicon contract (a typo'd
    path must not silently destroy the state it claims to rebuild)."""
    if not path_exists(spark, corpus_path):
        raise ValueError(
            f"rebuild_length_histogram: no corpus at {corpus_path!r} — "
            "refusing to delete the histogram and rebuild from nothing "
            "(check the path)"
        )
    if path_exists(spark, hdr_path):
        delete_dir(spark, hdr_path)
    bootstrap_length_histogram(spark, _corpus(spark, corpus_path), hdr_path)


def _postings_layout_is_flat(spark: SparkSession, postings_dir: str) -> bool:
    """True when the postings dir holds top-level data files — the
    round-13 flat range-clustered layout, superseded by the bucketed
    ``tbucket=<n>`` directories. Writers and the index reader refuse a
    flat layout with the bm25-rebuild remedy (one corpus scan upgrades
    it)."""
    from ts_etl_spark.fs import list_data_files

    return bool(list_data_files(spark, postings_dir))


def _postings_buckets_marker(postings_dir: str) -> str:
    """The persisted bucket-count marker — a single-object JSON file
    INSIDE the postings dir (underscore prefix: hidden from parquet
    readers)."""
    return f"{postings_dir}/_tbuckets"


def _validate_postings_buckets(spark: SparkSession, postings_dir: str) -> None:
    """Refuse a postings table whose PERSISTED bucket count disagrees
    with LEX_POSTINGS_BUCKETS (review finding, round 14): the bucket
    count is baked into every directory name AND into the reader's
    driver-side term→bucket hash, so changing the constant against
    existing state would silently route query terms to the wrong
    directories — historical postings would vanish from rankings with
    no error. The marker is written BEFORE the first postings append
    (so bucketed data implies a marker); a mismatch, a torn marker, or
    bucketed data with no marker all refuse loudly with the
    bm25-rebuild remedy (which re-derives the layout under the current
    constant)."""
    import json

    from ts_etl_spark.fs import list_subdirs, read_text_file

    marker = _postings_buckets_marker(postings_dir)
    if path_exists(spark, marker):
        try:
            n = int(json.loads(read_text_file(spark, marker))["buckets"])
        except (ValueError, KeyError, TypeError, OSError):
            raise RuntimeError(
                f"postings bucket marker at {marker!r} is torn/garbled — "
                "run rebuild_bm25_lexicon (CLI bm25-rebuild) to re-derive "
                "the index under the current bucket count"
            ) from None
        if n != LEX_POSTINGS_BUCKETS:
            raise RuntimeError(
                f"postings index at {postings_dir!r} was built with "
                f"{n} term buckets but this engine is configured for "
                f"{LEX_POSTINGS_BUCKETS} — querying or folding would "
                "route terms to the wrong directories and silently drop "
                "historical postings; run rebuild_bm25_lexicon (CLI "
                "bm25-rebuild) to re-derive the index under the current "
                "bucket count"
            )
    elif any(
        d.startswith("tbucket=") for d in list_subdirs(spark, postings_dir)
    ):
        raise RuntimeError(
            f"postings index at {postings_dir!r} has bucket directories "
            "but no _tbuckets marker — its bucket count cannot be "
            "verified against this engine's; run rebuild_bm25_lexicon "
            "(CLI bm25-rebuild)"
        )


def _ensure_postings_buckets_marker(
    spark: SparkSession, postings_dir: str
) -> None:
    """Validate-or-create the bucket-count marker BEFORE any postings
    append — so bucketed data always implies a marker (the torn window
    is marker-without-data, which the next writer just re-validates)."""
    import json

    from ts_etl_spark.fs import write_text_file

    _validate_postings_buckets(spark, postings_dir)
    marker = _postings_buckets_marker(postings_dir)
    if not path_exists(spark, marker):
        write_text_file(
            spark, marker, json.dumps({"buckets": LEX_POSTINGS_BUCKETS})
        )


def committed_batch_dirs(
    spark: SparkSession, base: str
) -> list[tuple[str, str]]:
    """(tag, path) of every COMMITTED ``batch=<tag>`` subdirectory of
    ``base`` ([] if absent). Torn dirs — no ``_SUCCESS``, a crash
    mid-write the stream's replay rewrites — are skipped: THE shared
    listing discipline for per-batch telemetry readers
    (``heavyhitter_estimate``, the drift-report CLI), extracted in
    round 14 after a third inline copy appeared. Non-numeric tags (the
    heavy-hitter ``batch=rollup``) sort first, numeric tags ascending —
    numeric includes NEGATIVE ids (the ANN bootstrap folds under
    ``batch=-1``; ``isdigit`` alone misfiled it with the named tags —
    review finding, round 15)."""
    if not path_exists(spark, base):
        return []

    def _num(tag: str) -> int | None:
        try:
            return int(tag)
        except ValueError:
            return None

    named: list[tuple[str, str]] = []
    nums: list[tuple[str, str]] = []
    for name in list_subdirs(spark, base):
        if not name.startswith("batch=") or not path_exists(
            spark, f"{base}/{name}/_SUCCESS"
        ):
            continue
        tag = name.split("=", 1)[1]
        (named if _num(tag) is None else nums).append(
            (tag, f"{base}/{name}")
        )
    return sorted(named) + sorted(nums, key=lambda t: int(t[0]))


def update_bm25_lexicon(
    spark: SparkSession, new_docs: DataFrame, lexicon_path: str, batch_id: int
) -> None:
    """Fold the batch's term statistics into the incremental BM25
    lexicon — the production path for sparse retrieval over a growing
    corpus: ``bm25_stats_from_lexicon`` then derives (N, avgdl, idf)
    from the skinny persisted tables alone, never re-tokenizing
    history (the corpus-scan ``operators.bm25.bm25_stats`` performs on
    every call).

    Layout: three append-only tables (``postings/``: per-batch
    (term, doc_id, tf, dl) — the inverted index ``bm25_topk_from_index``
    probes so a query touches only matching postings, never the corpus
    text; ``terms/``: per-batch (term, df); ``totals/``: per-batch
    (n_docs, sum_dl)), distinct/summed on read. All three are additive
    across batches because every corpus document lands in exactly one
    batch, so read-side derivation equals a full recompute EXACTLY
    (integer arithmetic end to end — the lexicon feeds the same
    bit-exact idf path as the scan-based stats).

    Crash/replay analysis (the HDR-telemetry discipline — batch_id is
    the replay key, so it must be unique AND monotonically increasing
    per batch; write order is postings, THEN terms, THEN totals — the
    presence marker is always last — and presence is judged against the
    MAX id in totals: equal = replay no-op, below = a restarted id
    sequence that refuses loudly — ``rebuild_bm25_lexicon`` is the
    remedy — since matching against any historic id would let a
    checkpoint reset silently drop every new batch):

    - crash between any of the three appends: the replay (same kept
      set — the corpus has not advanced) sees no totals row,
      re-appends the SAME postings/term rows (whole-file task commits
      mean duplicates are complete identical rows) and the totals row;
      the readers' DISTINCT collapses the duplicates;
    - crash after totals, before the corpus append: presence recorded,
      replay no-ops — content already correct;
    - crash after the corpus append: the replay's kept set is EMPTY,
      and the presence check is what keeps the batch's true rows from
      being replaced (the HDR post-append lesson).

    A zero-kept batch appends empty postings/terms frames but DOES
    append its totals row — presence must be recorded or the stream
    would re-derive the batch forever (the empty postings write also
    creates the directory, so the pre-postings-layout guard below can
    tell "no postings yet" from "legacy lexicon")."""
    p = bm25_lexicon_paths(lexicon_path)
    if path_exists(spark, p["totals"]):
        if not path_exists(spark, p["postings"]):
            # a lexicon created before the postings table existed:
            # folding new batches would silently leave the index
            # missing all pre-upgrade history — refuse loudly with the
            # one-scan remedy (same contract as the out-of-order guard)
            raise RuntimeError(
                f"BM25 lexicon at {lexicon_path} has terms/totals but "
                "no postings table (a pre-postings layout); folding "
                "new batches would leave the postings index silently "
                "missing its history — run rebuild_bm25_lexicon "
                "(CLI bm25-rebuild) to upgrade it in one corpus scan"
            )
        if _postings_layout_is_flat(spark, p["postings"]):
            # a round-13 flat (range-clustered) postings layout: new
            # bucketed appends would MIX layouts — partition discovery
            # refuses a dir with both partitioned and unpartitioned
            # files, and even if it read, the bucket filter would drop
            # the flat history. Refuse with the same one-scan remedy.
            raise RuntimeError(
                f"BM25 lexicon at {lexicon_path} has a pre-bucketed "
                "(flat) postings layout; folding bucketed batches into "
                "it would mix layouts — run rebuild_bm25_lexicon "
                "(CLI bm25-rebuild) to upgrade it in one corpus scan"
            )
        _validate_postings_buckets(spark, p["postings"])
        last = (
            spark.read.schema(LEX_TOTALS_SCHEMA)
            .parquet(p["totals"])
            .agg(F.max("batch_id"))
            .first()[0]
        )
        if last is not None and int(batch_id) == int(last):
            return  # replay of the last folded batch
        if last is not None and int(batch_id) < int(last):
            # not a replay (only the LAST batch replays under
            # single-writer streaming) — a restarted id sequence
            # (checkpoint reset) would silently skip or double-fold;
            # refuse loudly, same contract as the dedup index's
            # out-of-order guard. Remedy: rebuild_bm25_lexicon.
            raise RuntimeError(
                f"BM25 lexicon at {lexicon_path} last folded batch "
                f"{int(last)}, got out-of-order batch {int(batch_id)} — "
                "a restarted batch-id sequence cannot be folded safely; "
                "rebuild_bm25_lexicon re-derives it from the corpus"
            )
    _append_lexicon_rows(spark, new_docs, p, int(batch_id))


def _append_lexicon_rows(
    spark: SparkSession, docs: DataFrame, p: dict[str, str], batch_id: int
) -> None:
    """Derive and append one id's (term, doc_id, tf, dl) postings,
    (term, df) and (n_docs, sum_dl) rows — the shared body of the
    per-batch fold and the adoption bootstrap. Postings append first,
    totals LAST (the crash-window ordering: totals is the presence
    marker). The postings frame is checkpointed once and feeds the df
    derivation too (df = postings rows per term, since (term, doc_id)
    is unique within a batch); postings land HIVE-PARTITIONED by term
    hash bucket (``tbucket=<n>`` — see LEX_POSTINGS_BUCKETS: planning-
    time directory pruning that holds at any batch count, where the
    round-13 per-batch range clustering still scheduled a scan task per
    file) and term-SORTED within each bucket's file (row-group pruning
    inside the probed bucket; both asserted against real layouts/
    footers). State compaction preserves the layout:
    ``compact_ingest_state`` rewrites THIS table per bucket directory
    with ``cluster_by="term"`` (``compact_bucketed_state_table``)."""
    from ts_etl_spark.operators.bm25 import _tokens

    toks = _tokens(docs, "text", "doc_id").localCheckpoint(eager=True)
    bid = F.lit(int(batch_id)).cast("long")
    postings = (
        toks.select("doc_id", "dl", F.explode("ws").alias("term"))
        .groupBy("doc_id", "dl", "term")  # dl is per-doc — a free key
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", "tf", "dl")
        .withColumn("batch_id", bid)
        .withColumn("tbucket", _term_bucket_col())
        .localCheckpoint(eager=True)
    )
    try:
        terms = (
            postings.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .withColumn("batch_id", bid)
        )
        totals = toks.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        ).withColumn("batch_id", bid)
        # marker first: bucketed data must always imply a verifiable
        # bucket count (see _validate_postings_buckets)
        _ensure_postings_buckets_marker(spark, p["postings"])
        (
            postings.repartition(LEX_POSTINGS_BUCKETS, "tbucket")
            .sortWithinPartitions("tbucket", "term")
            .write.partitionBy("tbucket")
            .mode("append")
            .parquet(p["postings"])
        )
        terms.write.mode("append").parquet(p["terms"])
        totals.write.mode("append").parquet(p["totals"])
    finally:
        postings.unpersist()
        toks.unpersist()


#: reserved lexicon id for the adoption bootstrap — below every real
#: streaming epoch id, so the out-of-order guard and max-based replay
#: detection are unaffected
BM25_BOOTSTRAP_ID = -1


def bootstrap_bm25_lexicon(
    spark: SparkSession, corpus: DataFrame, lexicon_path: str
) -> bool:
    """Adopt the lexicon on a PRE-EXISTING corpus: when no lexicon
    exists yet but the corpus is non-empty, fold the ENTIRE stored
    corpus once under the reserved ``BM25_BOOTSTRAP_ID`` — without
    this, enabling ``bm25_lexicon_path`` on a live deployment would
    silently cover only post-adoption batches (review finding; the
    dedup/orig-fp indexes bootstrap the same way). Idempotent and
    crash-safe like the per-batch fold: a torn bootstrap (postings
    and/or terms landed, totals missing) re-runs and its duplicate
    rows — identical, since the corpus has not advanced while the
    lexicon is absent — collapse under the readers' DISTINCT.
    ``ingest_batch`` calls this before every per-batch fold (one
    existence check per batch once adopted). Returns True if a
    bootstrap fold ran."""
    p = bm25_lexicon_paths(lexicon_path)
    if path_exists(spark, p["totals"]):
        return False
    if corpus.first() is None:
        return False  # fresh deployment — batch folds build the lexicon
    _append_lexicon_rows(spark, corpus, p, BM25_BOOTSTRAP_ID)
    return True


class Bm25LexiconDriftError(RuntimeError):
    """A lexicon whose recorded doc count disagrees with the corpus —
    the ghost-batch state ``verify_bm25_lexicon`` detects. Carries the
    two counts so callers (``compact-state --auto-rebuild-bm25``) can
    report and remediate without re-probing."""

    def __init__(
        self,
        lexicon_path: str,
        lex_n: int,
        corpus_n: int,
        compacted: dict[str, int] | None = None,
    ):
        self.lexicon_path = lexicon_path
        self.lex_n = lex_n
        self.corpus_n = corpus_n
        #: the compaction results that completed before the probe fired
        #: (the probe runs last) — so a handler can still report them
        self.compacted = dict(compacted or {})
        super().__init__(
            f"BM25 lexicon at {lexicon_path} records {lex_n} docs but "
            f"the corpus holds {corpus_n}: a ghost batch (totals "
            "committed, corpus append never landed, checkpoint "
            "abandoned) or state maintained outside the fold protocol "
            "— every idf derived from this lexicon is skewed. If a "
            "drain crashed mid-batch and its checkpoint is intact, "
            "restart the stream first: the pending replay repairs this "
            "window without a rebuild. Otherwise run bm25-rebuild (or "
            "compact-state --auto-rebuild-bm25) to re-derive the "
            "lexicon from the corpus"
        )


def rebuild_bm25_lexicon(
    spark: SparkSession, corpus_path: str, lexicon_path: str
) -> None:
    """Drop and re-derive the lexicon from the stored corpus — the
    remedy for the states the skinny aggregated schema cannot repair on
    read: a ghost batch (totals committed, corpus append never landed,
    checkpoint abandoned — the aggregated rows carry no doc ids to
    anti-join out, unlike the dedup index), a restarted batch-id
    sequence (the out-of-order guard's refusal), or a pre-postings
    layout (the upgrade path). One corpus scan.

    REFUSES a corpus path that does not exist (before deleting
    anything): a typo'd path would otherwise read as an empty corpus
    and silently destroy the lexicon while "rebuilding" nothing
    (review finding, round 13). A corpus path that exists but holds
    zero documents is legitimate — the state is dropped and the next
    folds rebuild it."""
    if not path_exists(spark, corpus_path):
        raise ValueError(
            f"rebuild_bm25_lexicon: no corpus at {corpus_path!r} — "
            "refusing to delete the lexicon and rebuild from nothing "
            "(check the path)"
        )
    for d in bm25_lexicon_paths(lexicon_path).values():
        # stale compaction siblings go with the table: a manifest left
        # by a compaction that crashed after its commit PUT would
        # otherwise be rolled FORWARD by the next compact-state and
        # resurrect the pre-rebuild generation's files into the rebuilt
        # table (review finding, round 14 — the flat→bucketed upgrade
        # path made this a layout-mixing wedge)
        delete_dir(spark, _compact_staging(d))
        delete_dir(spark, _compact_manifest(d))
        if path_exists(spark, d):
            delete_dir(spark, d)
    bootstrap_bm25_lexicon(spark, _corpus(spark, corpus_path), lexicon_path)


def bm25_stats_from_lexicon(
    spark: SparkSession,
    lexicon_path: str,
    queries: dict[int, str] | None = None,
) -> tuple[int, float, dict[str, float]]:
    """(N, avgdl, {term: idf}) for ``operators.bm25.bm25_topk``'s
    ``stats`` argument, from the persisted lexicon alone — EXACTLY what
    ``bm25_stats`` would compute by scanning the corpus (additive
    integer statistics; the same CPython-math.log idf). The DISTINCT
    collapses torn-append duplicates (complete identical rows, see
    ``update_bm25_lexicon``); both reads prune to the query terms /
    the two total columns before any shuffle."""
    from ts_etl_spark.operators.bm25 import BM25_QUERIES, _query_terms, idf

    queries = BM25_QUERIES if queries is None else queries
    p = bm25_lexicon_paths(lexicon_path)
    if not path_exists(spark, p["totals"]):
        raise ValueError(f"no BM25 lexicon at {lexicon_path}")
    tot = (
        spark.read.schema(LEX_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)),
            F.coalesce(F.sum("sum_dl"), F.lit(0)),
        )
        .first()
    )
    n_docs, sum_dl = int(tot[0]), int(tot[1])
    if n_docs == 0:
        raise ValueError("bm25_stats_from_lexicon: empty corpus")
    avgdl = sum_dl / n_docs
    wanted = sorted({t for _, t in _query_terms(queries)})
    rows = (
        spark.read.schema(LEX_TERMS_SCHEMA)
        .parquet(p["terms"])
        .filter(F.col("term").isin(wanted))
        .distinct()
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    idfs = {r["term"]: idf(n_docs, r["df"]) for r in rows}
    return n_docs, avgdl, idfs


def bm25_topk_from_index(
    spark: SparkSession,
    lexicon_path: str,
    queries: dict[int, str] | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Exact BM25 top-k answered ENTIRELY from the persisted lexicon —
    the production retrieval path at corpus scale. Stats come from the
    skinny terms/totals tables (``bm25_stats_from_lexicon``); candidate
    (doc_id, dl, term, tf) rows come from the postings index pruned to
    the query terms BEFORE anything else happens: the terms hash to
    their ``tbucket=<n>`` partition directories driver-side
    (``term_bucket``) and the scan PLANS over only those directories —
    a query touches 1/LEX_POSTINGS_BUCKETS of the index's files no
    matter how many batches accumulated (plan-tested: PartitionFilters
    carries the bucket isin) — then the term ``isin`` prunes row groups
    inside the probed buckets against the term-sorted footers. Never a
    corpus tokenize, never a full explode. The ranking body is the SAME
    ``_bm25_rank`` the corpus-scan ``operators.bm25.bm25_topk`` uses,
    making the two paths bit-identical by construction (and tested:
    exact frame equality over a multi-batch-built lexicon vs a scan of
    the stored corpus). The DISTINCT collapses torn-append duplicates,
    which are complete identical rows including batch_id and bucket
    (see ``update_bm25_lexicon``)."""
    from ts_etl_spark.operators.bm25 import (
        BM25_QUERIES,
        BM25_TOP_K,
        _bm25_rank,
        _live_qmap,
    )

    queries = BM25_QUERIES if queries is None else queries
    top_k = BM25_TOP_K if top_k is None else top_k
    p = bm25_lexicon_paths(lexicon_path)
    if not path_exists(spark, p["postings"]):
        raise ValueError(
            f"no postings index at {lexicon_path} — a pre-postings "
            "lexicon serves stats only; run rebuild_bm25_lexicon "
            "(CLI bm25-rebuild) to upgrade it, or rank with "
            "operators.bm25.bm25_topk (corpus scan)"
        )
    if _postings_layout_is_flat(spark, p["postings"]):
        raise ValueError(
            f"postings index at {lexicon_path} has a pre-bucketed "
            "(flat) layout — run rebuild_bm25_lexicon (CLI "
            "bm25-rebuild) to upgrade it in one corpus scan"
        )
    _validate_postings_buckets(spark, p["postings"])
    _, avgdl, idfs = bm25_stats_from_lexicon(spark, lexicon_path, queries)
    qmap = _live_qmap(queries, idfs)
    if not qmap:
        return local_rows(
            spark, [], "q_id long, doc_id long, score double, rn int"
        )
    terms = sorted({t for _, t, _ in qmap})
    buckets = sorted({term_bucket(t) for t in terms})
    tf = (
        spark.read.schema(LEX_POSTINGS_READ_SCHEMA)
        .parquet(p["postings"])
        .filter(F.col("tbucket").isin(buckets) & F.col("term").isin(terms))
        .drop("tbucket")
        .distinct()
        .select("doc_id", "dl", "term", "tf")
    )
    return _bm25_rank(tf, qmap, avgdl, top_k)


def verify_bm25_lexicon(
    spark: SparkSession, corpus_path: str, lexicon_path: str
) -> tuple[int, int]:
    """Ghost-batch invariant probe: ``(lexicon_n_docs, corpus_rows)``.
    Equality is an invariant of the fold protocol (every corpus doc is
    folded exactly once, totals last), so a mismatch means either a
    GHOST batch — totals committed, corpus append never landed, and the
    checkpoint was abandoned so no replay repaired it (lexicon >
    corpus; the documented unrepairable-on-read state, previously
    invisible until someone noticed skewed idf) — or state maintained
    outside the protocol (corpus > lexicon). Remedy either way:
    ``rebuild_bm25_lexicon``. Cheap: one distinct-sum over the skinny
    totals table + one column-pruned corpus count — ``compact-state``
    runs it whenever it is given both paths.

    A MISSING corpus path raises rather than reading as 0 documents:
    probing a typo'd path against a populated lexicon would otherwise
    report (and, under --auto-rebuild-bm25, "repair") a fictitious
    total drift (review finding, round 13)."""
    p = bm25_lexicon_paths(lexicon_path)
    if not path_exists(spark, p["totals"]):
        raise ValueError(f"no BM25 lexicon at {lexicon_path}")
    if not path_exists(spark, corpus_path):
        raise ValueError(
            f"verify_bm25_lexicon: no corpus at {corpus_path!r} — a "
            "missing path is not an empty corpus (check the path)"
        )
    lex_n = int(
        spark.read.schema(LEX_TOTALS_SCHEMA)
        .parquet(p["totals"])
        .distinct()
        .agg(F.coalesce(F.sum("n_docs"), F.lit(0)))
        .first()[0]
    )
    corpus_n = _corpus(spark, corpus_path).select("doc_id").count()
    return lex_n, corpus_n


def monitor_batch_drift(
    spark: SparkSession,
    corpus: DataFrame,
    batch_df: DataFrame,
    drift_path: str,
    batch_id: int,
    n_buckets: int = 10,
    base_lens: DataFrame | None = None,
    base_hist: DataFrame | None = None,
) -> None:
    """PSI of the batch's document-length distribution against the
    corpus-so-far, appended to a per-batch drift log — the monitoring
    check a continuously-ingested corpus runs per micro-batch (is this
    batch drawn from the same distribution the corpus was?).

    Layout mirrors the stats sketch's idempotence: rows land in a
    ``batch=<id>`` subdirectory written with overwrite, and Structured
    Streaming replays a micro-batch under the SAME batch_id, so a replay
    rewrites its own partition instead of duplicating rows. Each batch
    contributes ``n_buckets + 1`` rows (per-bucket detail + the total) —
    telemetry stays bounded by batches × buckets, never by corpus size.

    ``base_lens`` (round 10): a pre-materialized one-column ``v`` frame
    of corpus document lengths to use as the baseline INSTEAD of scanning
    corpus text — ``ingest_batch`` passes the dedup index's ``lens``
    table, making the drift monitor corpus-text-scan-free like every
    other per-batch consumer.

    ``base_hist`` (round 15, wins over ``base_lens``): the baseline as a
    weighted-value histogram ``(v, n)`` — ``ingest_batch`` derives it
    from the persisted length-HDR registers when ``len_hdr_path`` is
    configured, so the baseline side is O(≤960 register rows) per batch
    instead of a corpus-LINEAR lens-table scan (the last corpus-sized
    per-batch read in the telemetry path). Register-resolution
    approximation (``psi_drift_hist``); the 0.25 action band is far
    coarser than the ≤2^-s register width."""
    doclen = stored_doclen().alias("v")
    cur = batch_df.select(doclen)
    if cur.first() is None:  # empty batch: nothing to compare
        return
    if base_hist is not None:
        out = psi_drift_hist(base_hist, cur, "v", n_buckets=n_buckets)
    else:
        base = corpus.select(doclen) if base_lens is None else base_lens
        out = psi_drift(base, cur, "v", n_buckets=n_buckets)
    out.write.mode("overwrite").parquet(
        f"{drift_path}/batch={int(batch_id)}"
    )


#: default acceptance band for the per-batch length-quantile shift
#: signal: a batch whose p50/p99 document length is less than half or
#: more than double the corpus's is flagged
LEN_DRIFT_BAND = (0.5, 2.0)

LEN_DRIFT_SCHEMA = (
    "phi DOUBLE, corpus_len BIGINT, batch_len BIGINT, "
    "ratio DOUBLE, flagged BOOLEAN"
)


def length_drift_path(drift_path: str) -> str:
    """The length-quantile drift log lives NEXT TO the PSI drift log —
    a sibling directory, because its row schema differs and parquet
    partition discovery must not mix the two."""
    return f"{drift_path}_lenq"


def monitor_length_quantile_drift(
    spark: SparkSession,
    hdr_path: str,
    batch_df: DataFrame,
    drift_path: str,
    batch_id: int,
    phis: tuple = (0.5, 0.99),
    band: tuple = LEN_DRIFT_BAND,
) -> None:
    """The consumer the HDR length telemetry existed for: per batch,
    estimate the batch's document-length quantiles (its own ≤960-row
    HDR register pass — both sides carry the sketch's ≤2^-s error) and
    flag the probes whose ratio against the CORPUS histogram's
    estimate leaves ``band`` — the "is this crawl slice drawn from the
    same length distribution?" check, logged per batch next to the PSI
    drift rows (``length_drift_path(drift_path)/batch=<id>``, written
    with overwrite so a replay rewrites its own partition — the PSI
    log's idempotence discipline; like the PSI log, a replayed batch
    re-measures against the by-then-grown baseline, acceptable for
    telemetry). No committed histogram yet (fresh deployment, first
    batch) or an empty batch → nothing to compare, no rows."""
    corpus_q = corpus_length_quantiles(spark, hdr_path, phis)
    if not corpus_q:
        return
    batch_regs = hdr_registers(
        batch_df.select(F.length("text").alias("len")), "len"
    )
    batch_q = {
        float(r.phi): int(r.estimate)
        for r in hdr_quantile_estimates(batch_regs, phis).collect()
    }
    if not batch_q:
        return  # empty batch
    lo, hi = band
    rows = []
    for phi in sorted(batch_q):
        c, b = corpus_q[phi], batch_q[phi]
        ratio = float(b) / float(max(c, 1))
        rows.append((phi, c, b, ratio, not (lo <= ratio <= hi)))
    local_rows(spark, rows, LEN_DRIFT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{length_drift_path(drift_path)}/batch={int(batch_id)}")


CM_SCHEMA = "d INT, slot INT, c BIGINT"


def update_attempt_heavyhitters(
    spark: SparkSession, batch_df: DataFrame, hh_path: str, batch_id: int
) -> None:
    """Count-min registers of the batch's ATTEMPTED canonical
    fingerprints (pre-dedup on purpose: the question is \"which documents
    keep getting re-submitted\", and the dedup layer hides exactly those),
    one ``batch=<id>`` directory per micro-batch.

    Idempotence differs from the HLL stats sketch by necessity: count-min
    merges by SUM, and sum-merging a replayed batch into mutable state
    would double-count. So the state is per-batch-keyed like the drift
    log — a replay OVERWRITES its own ``batch=<id>`` partition — and
    readers merge at query time (``heavyhitter_estimate``). State stays
    bounded by batches × depth × width rows."""
    regs = cm_registers(
        batch_df.select(canonical_fingerprint().alias("fp")), "fp"
    )
    # overwrite mode leaves a _SUCCESS marker per batch directory;
    # heavyhitter_estimate reads only committed batches (same torn-write
    # discipline as the generationed stats sketch)
    regs.coalesce(1).write.mode("overwrite").parquet(
        f"{hh_path}/batch={int(batch_id)}"
    )


def heavyhitter_estimate(
    spark: SparkSession, hh_path: str, fingerprints: list[str]
) -> dict[str, int]:
    """Estimated ingest-attempt counts for canonical ``fingerprints``
    over the whole stream history: sum-merge every COMMITTED batch's
    registers (≤ batches × depth × width rows — telemetry-sized), then
    the standard count-min point estimate. Never underestimates the
    committed history. Torn batch directories (no ``_SUCCESS`` — a crash
    mid-write) are skipped, same discipline as the generationed stats
    sketch; the stream's replay rewrites them. A retention pass crashed
    mid-rollup is rolled forward FIRST so its consumed batches are never
    summed twice (``recover_hh_rollup``); the consolidated
    ``batch=rollup`` dir then merges like any other committed batch."""
    if not path_exists(spark, hh_path):
        return {fp: 0 for fp in fingerprints}
    recover_hh_rollup(spark, hh_path)
    committed = [p for _, p in committed_batch_dirs(spark, hh_path)]
    if not committed:
        return {fp: 0 for fp in fingerprints}
    merged = (
        spark.read.schema(CM_SCHEMA)
        .parquet(*committed)
        .groupBy("d", "slot")
        .agg(F.sum("c").alias("c"))
    )
    est = cm_estimate(spark, merged, fingerprints)
    return {r["key"]: int(r["estimate"]) for r in est.collect()}


@dataclass(frozen=True)
class IngestConfig:
    """Gate + telemetry configuration for ``ingest_batch`` /
    ``run_streaming_ingest`` (round 11 — the parameter surface had grown
    to 13 positionals). Every field is optional; the default config is
    plain fingerprint/MinHash dedup against the stored corpus.

    - ``threshold`` — near-dup Jaccard threshold for the MinHash layer.
    - ``stats_path`` — fold the batch's fingerprint registers into the
      corpus-stats sketch (distinct-document telemetry per ingest).
    - ``len_hdr_path`` — fold the batch's document-length HDR registers
      into the corpus-lifetime length histogram (quantile telemetry via
      ``corpus_length_quantiles``; replay-safe via the batch-id no-op —
      see ``update_length_histogram``).
    - ``bm25_lexicon_path`` — maintain the incremental BM25 lexicon
      (per-batch term df + corpus totals, append-only + sum-on-read;
      ``bm25_stats_from_lexicon`` feeds ``operators.bm25.bm25_topk``
      without ever re-tokenizing the corpus). Like ``len_hdr_path``,
      requires an explicit unique ``batch_id`` per batch.
    - ``drift_path`` — record the batch's PSI against the corpus-so-far
      (``monitor_batch_drift``).
    - ``hh_path`` — attempt heavy-hitter registers (pre-gate by design:
      re-submissions count as attempts).
    - ``sem_index_path`` + ``sem_cents_path`` (must be set together) —
      drop paraphrase-level near-duplicates via the semantic gate and
      maintain the embedding index the gate reads; ``sem_threshold``
      is then REQUIRED (the round-11 soak measured the generic
      SEMDEDUP_THRESHOLD default collapsing a hashed-BoW corpus —
      see ``semantic_gate``; ≈0.8 for the default embedder).
    - ``win_index_path`` — FIRST rewrite the batch through the
      incremental substring gate (``substring_gate`` — cross-ingest
      repeated spans masked before any other gate sees the text) and
      maintain the winnow-fingerprint index it reads (plus the
      original-fingerprint index riding alongside).
    - ``dedup_index_path`` — run ``dedup_incremental`` against the
      MATERIALIZED corpus-side relations (fingerprints, LSH bands,
      shingle sets — see ``DEDUP_FP_SCHEMA`` etc.) instead of
      re-deriving them from corpus text every micro-batch, and maintain
      those tables — the shape whose per-batch cost is linear in the
      batch at any corpus size (the corpus TEXT is never re-scanned by
      the dedup layers; empirically flat, tests/test_dedup_index.py).
    - ``ann_index_path`` (round 15) — maintain the persisted IVF-PQ
      vector serving index (``streaming.ann_index``: cell-partitioned
      codes + versioned model + per-batch quantization-drift telemetry;
      ``ann_topk_from_index`` then serves dense retrieval from the
      persisted state alone, never re-encoding the corpus). Kept
      documents embed through the same default-embedder seam the
      semantic gate uses. Like ``bm25_lexicon_path``, requires an
      explicit unique ``batch_id`` per batch (replay detection is by
      batch id).
    - ``lease_path`` (+ ``lease_ttl_s``) — enforce the single-writer
      assumption every piece of ingest state relies on: each batch
      acquires/refreshes the lease and a fresh foreign lease refuses
      loudly (see the lease block above ``acquire_ingest_lease``).
      Point concurrent maintenance (``compact_ingest_state``,
      ``prune_ingest_telemetry``) at the SAME lease file."""

    threshold: float = JACCARD_THRESHOLD
    stats_path: str | None = None
    len_hdr_path: str | None = None
    bm25_lexicon_path: str | None = None
    drift_path: str | None = None
    hh_path: str | None = None
    sem_index_path: str | None = None
    sem_cents_path: str | None = None
    sem_threshold: float | None = None
    win_index_path: str | None = None
    dedup_index_path: str | None = None
    ann_index_path: str | None = None
    lease_path: str | None = None
    lease_ttl_s: float = INGEST_LEASE_TTL_S

    def __post_init__(self) -> None:
        if (self.sem_index_path is None) != (self.sem_cents_path is None):
            raise ValueError(
                "sem_index_path and sem_cents_path must be given together"
            )
        if self.sem_index_path is not None and self.sem_threshold is None:
            raise ValueError(
                "the semantic gate requires an explicit sem_threshold: "
                "the generic SEMDEDUP_THRESHOLD default was measured "
                "(round-11 soak) collapsing a 25k-doc corpus under the "
                "default hashed-BoW embedder, whose unrelated-document "
                "cosine noise is ~ 1/sqrt(dim) plus any shared-"
                "boilerplate offset — pass sem_threshold~=0.8 for "
                "hashed-BoW, or a value calibrated to your embedder"
            )


def _resolve_config(config, gate_kwargs: dict) -> IngestConfig:
    """Shared config resolution for ``ingest_batch`` /
    ``run_streaming_ingest``: keyword gates construct the config, both
    at once is an error, and a non-``IngestConfig`` positional (e.g. a
    legacy caller still passing the old 4th-positional float threshold)
    fails HERE with a migration-naming TypeError instead of later with
    an opaque ``'float' object has no attribute 'threshold'``."""
    if gate_kwargs:
        if config is not None:
            raise ValueError(
                "pass gate options via config OR keyword arguments, not both"
            )
        return IngestConfig(**gate_kwargs)
    if config is None:
        return IngestConfig()
    if not isinstance(config, IngestConfig):
        raise TypeError(
            f"config must be an IngestConfig (got {type(config).__name__}); "
            "the positional gate parameters were replaced by IngestConfig — "
            "e.g. pass IngestConfig(threshold=0.8) or threshold=0.8 as a "
            "keyword"
        )
    return config


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    corpus_path: str,
    config: IngestConfig | None = None,
    batch_id: int | None = None,
    **gate_kwargs,
) -> None:
    """Dedup one batch against the persisted corpus; append survivors.
    Gates and telemetry are configured via ``config`` (an
    ``IngestConfig`` — see its field docs) or, equivalently, the same
    names as keyword arguments (``ingest_batch(..., win_index_path=p)``
    constructs the config; passing both is an error).

    Dedup-index replay analysis (the index appends BEFORE the corpus,
    like the winnow/semantic deltas, so no batch can land in the corpus
    unindexed — an unindexed corpus doc would be invisible to every
    later batch's exact/near probes, silently admitting its duplicates):

    - crash AFTER the index deltas, BEFORE the corpus append: the
      replayed batch's ids are in the index but not the corpus
      ("ghosts"). Probing them against themselves would self-drop the
      whole batch and LOSE it, so the probes exclude ghost rows (one
      anti-join of batch ids against the skinny corpus id projection
      identifies them); verdicts re-derive identically, the delta
      anti-joins (per TABLE, by doc_id) no-op, and the corpus append
      lands.
    - replay of a FULLY committed batch (checkpoint crashed after the
      corpus append): the ids are in index AND corpus — not ghosts — so
      the batch's own index rows stay in the probes and the exact layer
      drops everything, preserving the idempotent-replay property.
    - out-of-order arrivals (a genuinely-new id at or below the index
      max) RAISE, the ``semantic_gate`` contract: that document would
      be judged against only part of the corpus.

    Gate-order interplay (round 9, hardened round 10; tested): with the
    substring gate on, the EXACT canonical-fingerprint layer runs
    FIRST, on PRE-mask text, against the materialized original-text
    fingerprint index (``orig_fp_index_path(win_index_path)``). Masking
    rewrites text, so gating it later would mangle a re-submission into
    a copy that matches the stored original at NEITHER the exact layer
    (text now differs) nor — for long documents — the MinHash layer (a
    masked copy of a 240-token doc measures 3-gram Jaccard ~0.35
    against its unmasked original, below JACCARD_THRESHOLD) and
    silently re-admit it. The index holds the canonical fingerprint of
    the ORIGINAL text of every document that ever entered the gate plus
    the STORED text of everything appended, so the probe catches all
    three re-submission shapes: (a) a same- or new-doc_id copy of an
    unmasked stored original; (b) a NEW-doc_id re-crawl of a document
    that was MASKED at its own ingest — previously a real hole: the
    re-crawl's own ingest-1 fingerprints make every selected span count
    ≥2 distinct docs, so it re-masks MORE aggressively than the stored
    copy and missed both the exact and (for long docs) MinHash layers;
    (c) a copy of a document dropped at a later gate (its original
    fingerprint is indexed at gate entry, kept or not). Probing the
    index instead of re-deriving corpus fingerprints also removes the
    second full corpus pass every micro-batch paid before round 10. A
    deliberate side effect: exact re-submissions never inflate the
    winnow index's span-repetition counts (re-crawls of one document
    are not distinct documents, so spammed content cannot talk itself
    into "boilerplate"); the attempt heavy-hitter counters (pre-gate by
    design) still record them.

    Fingerprint-index append ordering (OPPOSITE of the winnow/semantic
    deltas, deliberately): the fp delta is written AFTER the corpus
    append. The probe DROPS documents outright, so a fingerprint may
    only become probe-visible once its document's ingest fully
    committed — appending the index first would, under crash replay,
    pre-drop the whole batch before it ever landed in the corpus. With
    the chosen order a crash in the window replays cleanly: the probe
    misses, masking re-derives identically (same doc_ids — their own
    index rows don't raise the distinct-doc count), the exact layer of
    ``dedup_incremental`` drops everything against the corpus copies,
    and the replayed fp delta (derived from gate ENTRANTS, not
    survivors) appends, converging the index.

    Semantic ordering/idempotence: the index delta is appended BEFORE the
    corpus append. A crash between the two replays cleanly — the replayed
    batch's surviving docs are not yet fingerprint-dropped, the semantic
    verdicts re-derive identically (the index now holds the batch's own
    kept vectors, but domination is strict-smaller-id, so a vector never
    drops against its own copy), and the delta's anti-join against the
    grown index no-ops. The reverse order would lose index rows forever:
    once the corpus append lands, a replay exact-drops the whole batch
    and the delta is never rebuilt.

    The shingle-set frames dedup_incremental caches are unpersisted once
    the append materializes them — a stream runs this every micro-batch,
    and skipping the release would accumulate cached blocks for the
    lifetime of the query."""
    config = _resolve_config(config, gate_kwargs)
    if batch_id is None:
        # drift/heavy-hitter telemetry tolerates the historical default
        # (worst case: batch=0 partitions overwrite), but the length
        # histogram's replay detection is KEYED on the id — two distinct
        # batches sharing one would make the second silently skip
        # (review finding, round 12), so a defaulted id refuses loudly
        if (
            config.len_hdr_path is not None
            or config.bm25_lexicon_path is not None
            or config.ann_index_path is not None
        ):
            raise ValueError(
                "len_hdr_path / bm25_lexicon_path / ann_index_path "
                "require an explicit, unique batch_id per batch: all "
                "three detect crash replays by batch id, so a defaulted "
                "id would make every later batch look like a replay and "
                "be dropped from the index/telemetry "
                "(run_streaming_ingest passes the streaming epoch id "
                "automatically)"
            )
        batch_id = 0
    threshold = config.threshold
    stats_path = config.stats_path
    drift_path = config.drift_path
    hh_path = config.hh_path
    sem_index_path = config.sem_index_path
    sem_cents_path = config.sem_cents_path
    sem_threshold = config.sem_threshold
    win_index_path = config.win_index_path
    dedup_index_path = config.dedup_index_path
    _require_success_markers(spark)
    if config.lease_path is not None:
        # acquire-or-refresh per batch: the heartbeat that keeps a live
        # drain's lease from looking stale to a waiting maintenance run
        acquire_ingest_lease(
            spark, config.lease_path, ttl_s=config.lease_ttl_s
        )
    # a crashed compact_ingest_state must never be read half-swapped:
    # roll any interrupted compaction forward/back before touching state
    # (a handful of FS existence checks per batch — see the compaction
    # protocol block above)
    for _d in ingest_state_dirs(
        corpus_path, dedup_index_path, win_index_path, sem_index_path,
        config.bm25_lexicon_path, config.ann_index_path,
    ):
        recover_state_compaction(spark, _d)
    corpus = _corpus(spark, corpus_path)
    persisted: list[DataFrame] = []
    dfp = dbands = dsets = dlens = None
    if dedup_index_path is not None:
        dfp, dbands, dsets, dseen, dlens = _dedup_index(
            spark, dedup_index_path, corpus
        )
        raw_ids = batch_df.select("doc_id")
        # out-of-order enforcement against the ATTEMPTS listing, not the
        # kept-only fp table: a batch id at or below the max ever
        # attempted that was never attempted arrived out of order (it
        # would be judged against only part of the corpus) — raise, the
        # semantic_gate contract. Re-attempts of previously-judged ids
        # (crash replay, duplicate redelivery, re-submission of a
        # dropped doc) are legal and re-judge deterministically.
        # DELIBERATE hardening vs round 9: a never-attempted low id now
        # raises even when its text duplicates a stored document (the
        # origfp pre-drop used to swallow that case by running first) —
        # the id-ordering contract is about ids, not content, and
        # silently accepting a contract-violating id invites the
        # non-duplicate variant that corrupts verdicts. Tested.
        #
        # FOLDED actions (round 12): the guard's never-attempted set is
        # exactly the seen-delta's anti-join, so the delta materializes
        # ONCE (eager checkpoint — one dseen scan) and the stale probe
        # runs over those few checkpointed rows against a one-row max
        # aggregate (the second and last dseen scan). The previous shape
        # paid a third full anti-join scan plus a third driver round
        # trip per micro-batch for the same verdicts.
        seen_delta = (
            raw_ids.join(dseen, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        persisted.append(seen_delta)
        stale = (
            seen_delta.join(
                dseen.agg(F.max("doc_id").alias("__mx")),
                F.col("doc_id") <= F.col("__mx"),  # no rows when seen empty
            )
            .select("doc_id", "__mx")
            .first()
        )
        if stale is not None:
            raise ValueError(
                f"batch doc_id {stale[0]} is <= the dedup index's max "
                f"attempted id {stale[1]} and was never attempted:"
                " genuinely-new ids must exceed all previously-ingested"
                " ids (ingest order). If this id WAS attempted before"
                " the index existed (dropped pre-index, so the seen"
                " bootstrap could not know it), admit it with the"
                " `seen-admit` CLI subcommand and re-run the batch"
            )
        # record the attempts FIRST, before any gate runs or any other
        # state is written — seen must stay a superset of every other
        # table for the guard above to be replay-proof (a crash anywhere
        # after this point replays with the ids already in seen)
        seen_delta.write.mode("append").parquet(
            dedup_index_paths(dedup_index_path)["seen"]
        )
    if hh_path is not None:
        # attempts, not survivors — see update_attempt_heavyhitters
        update_attempt_heavyhitters(spark, batch_df, hh_path, batch_id)
    if drift_path is not None:
        # BEFORE the append (same recacheByPath reasoning as the stats
        # ordering below) — and semantically the baseline must be the
        # corpus as it stood when the batch arrived; the raw batch, since
        # the question is what LANDED, not what the gates rewrote. The
        # baseline ladder, cheapest first (round 15): the persisted
        # length-HDR registers (O(≤960) rows per batch — the ablation
        # profile found the lens scan was the telemetry path's one
        # remaining corpus-LINEAR per-batch read), else the dedup
        # index's lens table (corpus-linear but skinny, no text scan),
        # else a corpus text scan.
        base_lens = base_hist = None
        if config.len_hdr_path is not None:
            # bootstrapped FIRST so adoption on a pre-existing corpus
            # gives both drift monitors the full history from batch one
            bootstrap_length_histogram(spark, corpus, config.len_hdr_path)
            regs, _g, _b = _latest_len_hdr(spark, config.len_hdr_path)
            if regs is not None:
                from ts_etl_spark.operators.sketches import (
                    hdr_lower,
                    hdr_width,
                )

                # register -> representative value: the integer middle
                # of [lower, lower+width) — exact buckets (width 1)
                # represent themselves. Ghost-window note: unlike the
                # lens path's anti-join below, a crash between the
                # histogram fold and the corpus append leaves THIS
                # batch's lengths in the baseline during its own replay
                # only — it biases that one PSI toward similarity and
                # self-heals when the replayed append commits (the
                # monitor_length_quantile_drift transient, documented
                # there).
                base_hist = regs.filter(F.col("n") > 0).select(
                    (
                        hdr_lower(F.col("bucket")).cast("double")
                        + (hdr_width(F.col("bucket")).cast("double") - 1.0)
                        / 2.0
                    ).alias("v"),
                    F.col("n"),
                )
        if base_hist is None and dlens is not None:
            # exclude GHOST rows only (batch ids NOT in the corpus —
            # crash-window leftovers): a re-delivered id that IS
            # committed belongs to the corpus-so-far baseline, exactly
            # as the text-scan path would count it
            drift_ghosts = batch_df.select("doc_id").join(
                corpus.select("doc_id"), "doc_id", "left_anti"
            )
            base_lens = dlens.join(
                drift_ghosts, "doc_id", "left_anti"
            ).select("v")
        monitor_batch_drift(
            spark, corpus, batch_df, drift_path, batch_id,
            base_lens=base_lens, base_hist=base_hist,
        )
        if config.len_hdr_path is not None:
            # the quantile-shift twin of the PSI row set (the consumer
            # of the HDR length telemetry); histogram bootstrapped above
            monitor_length_quantile_drift(
                spark, config.len_hdr_path, batch_df, drift_path, batch_id
            )
    win_delta = None
    fp_index = entrant_fps = None
    if win_index_path is not None:
        # exact dedup BEFORE masking, on raw text (see the docstring's
        # gate-order analysis): one skinny probe against the
        # materialized original-fingerprint index — no corpus re-scan
        fp_path = orig_fp_index_path(win_index_path)
        fp_index = _orig_fp_index(spark, fp_path, corpus)
        b_fp = batch_df.select("doc_id", canonical_fingerprint().alias("fp"))
        pre_dropped = b_fp.join(fp_index, "fp", "left_semi").select("doc_id")
        batch_df = batch_df.join(pre_dropped, "doc_id", "left_anti")
        # original-text fingerprints of every gate ENTRANT (kept or
        # later-dropped — a re-crawl of a near-dup-dropped doc must
        # still pre-drop). Materialized eagerly: masking reassigns
        # batch_df below, and the frame must not re-probe the index
        # after the end-of-batch append grows it.
        entrant_fps = (
            batch_df.select(canonical_fingerprint().alias("fp"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        persisted.append(entrant_fps)
        # substring gate next: every later gate (fingerprint/MinHash/
        # semantic) must see the cleaned text — the curation pipeline's
        # stage order. Index fps come from the ORIGINAL batch text (the
        # gate contract), and exact-dropped docs contribute none.
        masked, win_delta = substring_gate(
            spark, batch_df.select("doc_id", "text"), win_index_path,
            persisted=persisted,
        )
        # same recacheByPath reasoning as the semantic gate below: both
        # frames' lineage reads win_index_path, which gets appended to
        batch_df = masked.select("doc_id", "text").localCheckpoint(eager=True)
        win_delta = win_delta.localCheckpoint(eager=True)
        persisted.append(batch_df)
        persisted.append(win_delta)
    if dedup_index_path is not None:
        # ghosts: indexed-but-uncommitted ids (crash window between the
        # index appends and the corpus append) — their rows must not
        # probe against themselves; see the docstring's replay analysis.
        # One anti-join against the skinny corpus ID projection (column-
        # pruned — no text read). Computed on the post-gate batch ids.
        batch_ids = batch_df.select("doc_id")
        ghosts = batch_ids.join(corpus.select("doc_id"), "doc_id", "left_anti")
        kept_prov = dedup_incremental(
            None,
            batch_df.select("doc_id", "text"),
            threshold,
            persisted,
            corpus_fp=dfp.join(ghosts, "doc_id", "left_anti"),
            corpus_bands=dbands.join(ghosts, "doc_id", "left_anti"),
            corpus_sets=dsets.join(ghosts, "doc_id", "left_anti"),
        )
    else:
        kept_prov = dedup_incremental(
            corpus, batch_df.select("doc_id", "text"), threshold, persisted
        )
    kept = (
        kept_prov.filter(F.col("kept"))
        .select("doc_id", "text")
        # `kept` is traversed several times (stats registers, the dedup
        # index deltas, the corpus append); persist so the expensive
        # dedup runs once
        .persist()
    )
    persisted.append(kept)
    try:
        if sem_index_path is not None:
            kept, index_delta = semantic_gate(
                spark, kept, sem_index_path, sem_cents_path,
                sem_threshold, persisted,
            )
            # localCheckpoint (eager), not persist: BOTH frames' lineage
            # reads sem_index_path, and the index append below triggers
            # recacheByPath, which drops any mere cache of such plans —
            # the corpus append would then re-run the gate's dominant
            # cell-join against the grown index every micro-batch.
            # Checkpointing cuts the lineage, so the appends read
            # materialized blocks. (Verdicts would be identical either
            # way — strict-smaller-id domination — this is purely the
            # don't-compute-the-gate-twice guarantee.)
            kept = kept.localCheckpoint(eager=True)
            index_delta = index_delta.localCheckpoint(eager=True)
            persisted.append(kept)
            persisted.append(index_delta)
        elif dedup_index_path is not None:
            # same recacheByPath reasoning: kept's lineage reads the
            # dedup-index paths appended below, and a mere cache is
            # dropped by those appends — the corpus write would then
            # re-run the whole exact+LSH dedup against the grown index
            # every micro-batch (verdicts unchanged thanks to the ghost
            # exclusion; purely a pay-the-dedup-twice cost).
            kept = kept.localCheckpoint(eager=True)
            persisted.append(kept)
        # stats BEFORE the append: appending to corpus_path makes Spark
        # invalidate every cached plan that reads that path (recacheByPath),
        # and `kept`'s lineage reads the corpus — an after-append traversal
        # would re-execute against the grown corpus, where the batch's own
        # documents fingerprint-match their fresh copies and the registers
        # come up empty. Ordering stats first is safe under replay: if the
        # append then fails and the batch is re-ingested, the identical
        # registers max-merge to a no-op (the sketch analogue of the
        # fingerprint-idempotent corpus append).
        if stats_path is not None:
            update_corpus_stats(spark, kept, stats_path)
        if config.len_hdr_path is not None:
            # same before-append reasoning as the stats sketch; replay
            # safety comes from the batch-id no-op, not merge
            # idempotence (SUM-merge double-counts where max no-ops).
            # Adoption on a pre-existing corpus folds the stored corpus
            # first (the PRE-batch frame — kept is folded separately)
            bootstrap_length_histogram(spark, corpus, config.len_hdr_path)
            update_length_histogram(
                spark, kept, config.len_hdr_path, batch_id
            )
        if config.bm25_lexicon_path is not None:
            # before the corpus append for the same lineage reason;
            # replay-safe via the totals max-id check. Adoption on a
            # pre-existing corpus folds the stored corpus first (the
            # PRE-batch frame — kept is folded separately below)
            bootstrap_bm25_lexicon(spark, corpus, config.bm25_lexicon_path)
            update_bm25_lexicon(
                spark, kept, config.bm25_lexicon_path, batch_id
            )
        if config.ann_index_path is not None:
            # the dense-retrieval twin of the lexicon fold: same
            # before-the-corpus-append ordering, same max-batch-id
            # replay detection, same adoption bootstrap on a
            # pre-existing corpus (embedding is lazy — once adopted the
            # bootstrap is one existence check per batch)
            from ts_etl_spark.streaming.ann_index import (
                ann_index_paths,
                bootstrap_ann_index,
                doc_vectors,
                train_ann_model,
                update_ann_index,
            )

            corpus_vecs = doc_vectors(corpus)
            bootstrap_ann_index(
                spark, corpus_vecs, config.ann_index_path
            )
            kept_vecs = doc_vectors(kept)
            if not path_exists(
                spark, ann_index_paths(config.ann_index_path)["totals"]
            ):
                # No adoptable model yet (fresh deployment, or a
                # pre-existing corpus with no embeddable document — the
                # bootstrap DEFERS rather than crash the fold): the
                # first batch with an embeddable document trains the
                # model; until one arrives there is nothing to encode
                # and no state to record — a later replay of such a
                # batch re-skips identically. Crash between train and
                # fold replays clean: the committed model is
                # deterministic, so the retrain call returns the
                # committed generation and the fold proceeds.
                if kept_vecs.filter(F.col("v").isNotNull()).first() is None:
                    kept_vecs = None
                else:
                    train_ann_model(
                        spark, kept_vecs, config.ann_index_path
                    )
                    # under the now-committed model, fold any deferred
                    # token-less history so the coverage totals count
                    # every corpus document (no-op on an empty corpus)
                    bootstrap_ann_index(
                        spark, corpus_vecs, config.ann_index_path
                    )
            if kept_vecs is not None:
                update_ann_index(
                    spark, kept_vecs, config.ann_index_path, batch_id
                )
        origfp_delta = None
        if win_delta is not None:
            # origfp delta = entrant originals ∪ stored (post-gate) text
            # of what is about to land, minus what the index already
            # holds. Materialized NOW (kept's lineage reads corpus_path,
            # and the corpus append below recaches that path) but
            # WRITTEN after the corpus append — see the docstring's
            # ordering analysis.
            origfp_delta = (
                entrant_fps.unionByName(
                    kept.select(canonical_fingerprint().alias("fp"))
                )
                .distinct()
                .join(fp_index, "fp", "left_anti")
                .localCheckpoint(eager=True)
            )
            persisted.append(origfp_delta)
            # winnow index BEFORE corpus (the semantic gate's
            # crash-window contract): a replay re-derives the same
            # delta, whose doc_id anti-join no-ops, and the fp-set
            # union makes the re-derived masking verdicts identical
            win_delta.write.mode("append").parquet(win_index_path)
        if sem_index_path is not None:
            # index BEFORE corpus — see the docstring's replay analysis
            index_delta.write.mode("append").parquet(sem_index_path)
        if dedup_index_path is not None:
            # dedup index BEFORE corpus (no corpus doc may ever be
            # unindexed — see the docstring's replay analysis). Each
            # delta anti-joins by doc_id against ITS OWN table so a
            # crash between the three appends converges table-by-table
            # on replay; all three materialize eagerly BEFORE any append
            # (their lineage reads the paths being appended to, and
            # kept's cache is invalidated by the corpus append below).
            kfp = kept.select("doc_id", canonical_fingerprint().alias("fp"))
            ksets = shingle_sets(kept)
            dfp_delta = (
                kfp.join(dfp.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            sets_delta = (
                ksets.join(dsets.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            bands_delta = (
                minhash_bands(ksets)
                .join(dbands.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            lens_delta = (
                kept.select("doc_id", stored_doclen().alias("v"))
                .join(dlens.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            persisted += [dfp_delta, sets_delta, bands_delta, lens_delta]
            p = dedup_index_paths(dedup_index_path)
            sets_delta.write.mode("append").parquet(p["sets"])
            bands_delta.write.mode("append").parquet(p["bands"])
            lens_delta.write.mode("append").parquet(p["lens"])
            dfp_delta.write.mode("append").parquet(p["fp"])
        kept.write.mode("append").parquet(corpus_path)
        if origfp_delta is not None:
            # fingerprint index strictly AFTER the corpus append — a
            # probe-visible fingerprint implies a committed ingest
            origfp_delta.write.mode("append").parquet(
                orig_fp_index_path(win_index_path)
            )
    finally:
        for df in persisted:
            df.unpersist()


def run_streaming_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    checkpoint: str,
    config: IngestConfig | None = None,
    max_files: int | None = 1,
    **gate_kwargs,
) -> None:
    """Stream the landing directory into the corpus until all available
    files are processed (``availableNow``), one incremental-dedup round
    per micro-batch. Gates and telemetry come from ``config`` (an
    ``IngestConfig`` — see its field docs) or the same names as keyword
    arguments; every micro-batch runs ``ingest_batch`` under it."""
    config = _resolve_config(config, gate_kwargs)
    if config.lease_path is not None:
        # fail FAST on a foreign lease (before the stream starts), and
        # release at drain end so the next maintenance window opens
        # immediately instead of waiting out the TTL
        acquire_ingest_lease(spark, config.lease_path, ttl_s=config.lease_ttl_s)
    try:
        reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", max_files)
        stream = reader.load(landing_dir)

        def _ingest(batch_df: DataFrame, batch_id: int) -> None:
            ingest_batch(spark, batch_df, corpus_path, config, batch_id)

        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if config.lease_path is not None:
            release_ingest_lease(spark, config.lease_path)
