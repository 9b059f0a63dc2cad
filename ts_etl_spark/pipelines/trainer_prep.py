"""Trainer-prep surface — the round-3 operators that turn a curated
corpus into trainer-ready inputs (BPE tokenization, sequence packing,
overlapping-span chunking, deterministic split assignment) folded into
ONE driver-gated long-format entry, the same consolidation pattern as
``corpus_quality_signals`` (the registry is capped at 50 entries).

Unified schema ``(op, k1, k2, s, v, ok)``:

- ``chunk`` rows (one per chunk): k1 = doc_id, k2 = chunk_idx,
  s = md5(chunk text), v = char_start — FULLY value-matched by the
  oracle's generate_series + substr + md5 reconstruction (the chunker is
  declarative, so DuckDB reproduces it exactly).
- ``split`` rows (one per document): k1 = doc_id, s = the assigned split.
  Weights are powers of two (0.75 / 0.125 / 0.125), so the cumulative
  interval bounds are EXACT doubles and the oracle's md5 hex-fold
  re-derives membership bit-for-bit (the auditability property the
  operator exists for).
- ``bpe`` rows (one per document): v = the oracle-derivable
  pre-tokenizer word count; ok = the lossless-encode property
  (concatenated BPE tokens reconstruct the concatenated words) AND the
  token-count bounds n_words ≤ n_tokens ≤ n_chars. The merge TABLE is
  engine-specific (the oracle cannot learn BPE), so its exactness is
  pinned by tests/test_bpe.py's pure-Python-reference parity; the driver
  row gates the distributed plumbing end to end.
- ``pack`` rows (4 invariants): total_docs is value-matched (count);
  capacity / oversize-singleton / FFD-waste-bound invariants are
  booleans the oracle asserts TRUE (bin ASSIGNMENT depends on xxhash64
  grouping, which only Spark can compute — the bounded-boolean pattern
  of ``quantiles_sketches``).
- ``leak`` rows (round 8 — ``pipelines.leakage`` behind the driver
  gate): one row per document pair leaking across THE SPLIT THE SPLIT
  ARM EMITS (exact canonical-fingerprint / near shingle-Jaccard ≥
  threshold): k1/k2 = the pair, s = ``kind|split_a|split_b``,
  v = jaccard (NULL for exact). Fully value-mirrored: the oracle
  re-derives the md5 split, fingerprint equality, and exact Jaccard
  (LSH output == exact at the threshold, the ``dedup_minhash_lsh``
  recall contract).
- ``leak_safe`` row: the corpus under ``component_safe_splits`` (exact
  star edges + near edges → min-label components → per-component
  split) must show ZERO cross-split EDGES — equivalent to the full
  audit coming back empty (``leakage.split_edge_violations`` proves
  the equivalence) while staying linear on degenerate duplicate
  groups. The passes-by-construction property as a driver-gated
  boolean; both leakage arms share ONE LSH pass (``near_pairs``).
- ``shard`` rows (round 10 — ``pipelines.shards.assign_shards`` behind
  the driver gate): one row per shard id (k1) with v = row count. The
  assignment is the seeded md5 interval hash (``_uniform_hash``), so
  the oracle re-derives membership bit-for-bit exactly like the split
  arm — a count off by one anywhere means a document hashed into the
  wrong shard.
- ``mix`` rows (round 10 — ``pipelines.sampling.temperature_shares``
  behind the driver gate): one row per (tau, lang) with s =
  ``tau<t>|<lang>`` and v = the temperature-scaled mixture share,
  rounded to 6 digits (the ``datacard`` float-rounding precedent —
  share arithmetic is pure c^tau / Σc^tau over the #strata-bounded
  per-language counts, so DuckDB mirrors it with POW + a window SUM;
  counts are fed to the library function in sorted-key order so both
  engines' float summation order is fixed). tau=1.0 pins the natural
  proportions (normalization), tau=0.5 the tail-up-weighting path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.localrel import local_rows
from ts_etl_spark.operators.bpe import WORD_PAT, bpe_encode, learn_bpe
from ts_etl_spark.operators.chunking import chunk_documents
from ts_etl_spark.operators.packing import pack_sequences
from ts_etl_spark.operators.textops import _metric_cols
from ts_etl_spark.pipelines.sampling import assign_splits
from ts_etl_spark.sources.tables import load_table

CHUNK_CHARS = 128
CHUNK_OVERLAP = 32
#: powers of two on purpose: the cumulative bounds (0.75, 0.875) are exact
#: doubles, so the oracle needs no accumulated-float replication
SPLIT_WEIGHTS = {"train": 0.75, "val": 0.125, "test": 0.125}
PACK_MAX_TOKENS = 2048
BPE_MERGES = 24
#: training-shard count for the shard arm — small enough that every
#: shard is occupied at sf0.001, large enough to exercise the interval
#: hash's spread
N_SHARDS = 16
#: the two temperature points the mix arm pins: natural proportions and
#: the multilingual tail-up-weighting midpoint
MIX_TAUS = (1.0, 0.5)


#: per-(application, sf_dir) memo of the learned BPE merge table — the
#: driver's repeated plan builds (sweep, oracle compare, soak, bench
#: samples) otherwise re-pay the corpus word-frequency pass plus the
#: merge loop at EVERY construction; the merges are deterministic per
#: corpus, so this is the ``similarity._IVF_MEMO`` pattern, but plain
#: driver data — nothing to persist or release.
_BPE_MERGES_MEMO: dict = {}


def q_trainer_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking + splits + BPE + packing over ``documents`` (see module
    docstring). Plan shape: chunk and split arms are shuffle-free
    expression fan-outs; bpe is one distributed word-frequency pass (the
    merge loop is driver-local over the Zipf-bounded type table) plus an
    Arrow-batched encode; packing is one shuffle + per-group Arrow FFD
    with two bounded aggregates for the invariants.

    EAGER at construction (bench attribution): ``learn_bpe``'s
    word-frequency pass + merge loop (memoized per (application,
    sf_dir) — first build only) and the mix arm's #langs-bounded
    per-language count collect."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")
    t = F.lit(True)

    # Round 16 (guide §2.6 — overlap independent driver work): the leak
    # arms' construction is EAGER (component_safe_splits runs the
    # small-edges probe — one LSH materialization + the driver-local
    # union-find, ~1.5 s warm at sf0.1) and entirely independent of the
    # other arms' plan building and the mix arm's bounded collect (and,
    # cold, of the learn_bpe pass). It runs on a background thread while
    # the main thread builds everything else; the futures join before
    # the final union, so the returned frame is identical.
    from concurrent.futures import ThreadPoolExecutor

    def _leak_arms():
        from ts_etl_spark.operators.dedup import minhash_lsh_pairs
        from ts_etl_spark.pipelines.leakage import (
            component_safe_splits,
            split_edge_violations,
            split_leakage_audit,
        )

        # one LSH pass feeds the audit AND the component splitter; the
        # band join is the arm's dominant cost, so share it across
        # consumers. Repartition first: the local test file is a single
        # input split and the shingle/signature projection is the
        # compute-heavy step (the shingle_sets_df rationale — AQE
        # coalesces this away at real scale)
        par = spark.sparkContext.defaultParallelism
        ldocs = docs.repartition(par, "doc_id")
        near = minhash_lsh_pairs(ldocs).persist()
        audit = split_leakage_audit(
            ldocs, weights=SPLIT_WEIGHTS, key_cols=["doc_id"],
            seed="split", near_pairs=near,
        )
        leak = audit.select(
            F.lit("leak").alias("op"),
            F.col("id_a").alias("k1"),
            F.col("id_b").alias("k2"),
            F.concat_ws("|", "kind", "split_a", "split_b").alias("s"),
            F.col("jaccard").alias("v"),
            t.alias("ok"),
        )
        safe = component_safe_splits(
            ldocs, SPLIT_WEIGHTS, seed="split", near_pairs=near
        )
        # emptiness via the EDGE-level check, not a second pair-grained
        # audit: provably equivalent under per-component splits (see
        # split_edge_violations) and linear in degenerate duplicate
        # groups where the audit's exact pair join is O(g²)
        leak_safe = (
            split_edge_violations(
                ldocs, safe.select("doc_id", "split"), near_pairs=near
            )
            .agg((F.count("*") == 0).alias("__ok"))
            .select(
                F.lit("leak_safe").alias("op"),
                nb.alias("k1"),
                nb.alias("k2"),
                ns.alias("s"),
                nd.alias("v"),
                F.col("__ok").alias("ok"),
            )
        )
        return leak, leak_safe

    _pool = ThreadPoolExecutor(max_workers=1)
    _f_leak = _pool.submit(_leak_arms)

    chunks = chunk_documents(docs, CHUNK_CHARS, CHUNK_OVERLAP).select(
        F.lit("chunk").alias("op"),
        F.col("doc_id").alias("k1"),
        F.col("chunk_idx").cast("bigint").alias("k2"),
        F.md5("chunk").alias("s"),
        F.col("char_start").cast("double").alias("v"),
        t.alias("ok"),
    )

    splits = assign_splits(docs, SPLIT_WEIGHTS, ["doc_id"], seed="split").select(
        F.lit("split").alias("op"),
        F.col("doc_id").alias("k1"),
        nb.alias("k2"),
        F.col("split").alias("s"),
        nd.alias("v"),
        t.alias("ok"),
    )

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    merges = _BPE_MERGES_MEMO.get(memo_key)
    if merges is None:
        merges = learn_bpe(docs, n_merges=BPE_MERGES, min_freq=2)
        _BPE_MERGES_MEMO[memo_key] = merges
    words = F.regexp_extract_all(F.lower("text"), F.lit(WORD_PAT), 0)
    enc = bpe_encode(docs, merges).join(
        docs.select(
            "doc_id",
            F.array_join(words, "").alias("__wcat"),
            F.size(words).alias("__n_words"),
        ),
        "doc_id",
    )
    bpe = enc.select(
        F.lit("bpe").alias("op"),
        F.col("doc_id").alias("k1"),
        nb.alias("k2"),
        ns.alias("s"),
        F.col("__n_words").cast("double").alias("v"),
        (
            (F.array_join("tokens", "") == F.col("__wcat"))
            & (F.col("n_tokens") >= F.col("__n_words"))
            & (F.col("n_tokens") <= F.length("__wcat"))
        ).alias("ok"),
    )

    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", *_metric_cols()
    ).select("doc_id", F.col("n_bpe_tokens").alias("n_tokens"))
    packed = pack_sequences(tok, PACK_MAX_TOKENS)
    cap = F.lit(PACK_MAX_TOKENS)
    row_agg = packed.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.min(F.col("oversize") == (F.col("n_tokens") > cap)).alias("flags_ok"),
        F.sum(F.when(~F.col("oversize"), F.col("n_tokens"))).alias("norm_tokens"),
        F.count_distinct("pack_group").alias("n_groups"),
    )
    bins = packed.groupBy("pack_group", "bin_idx").agg(
        F.sum("n_tokens").alias("tokens"),
        F.count("*").alias("docs"),
        F.max(F.col("oversize").cast("int")).alias("has_over"),
    )
    bin_agg = bins.agg(
        F.max(F.when(F.col("has_over") == 0, F.col("tokens"))).alias(
            "max_norm_tokens"
        ),
        F.max(F.when(F.col("has_over") == 1, F.col("docs"))).alias(
            "max_over_docs"
        ),
        F.sum(F.when(F.col("has_over") == 0, 1).otherwise(0)).alias(
            "n_norm_bins"
        ),
    )
    combined = row_agg.join(F.broadcast(bin_agg), F.lit(True))
    lower = F.ceil(F.col("norm_tokens") / cap)
    pack_entries = [
        F.struct(
            F.lit("total_docs").alias("s"),
            F.col("n_rows").cast("double").alias("v"),
            (F.col("n_rows") == F.col("n_docs")).alias("ok"),
        ),
        F.struct(
            F.lit("capacity_ok").alias("s"),
            nd.alias("v"),
            F.coalesce(F.col("max_norm_tokens") <= cap, t).alias("ok"),
        ),
        F.struct(
            F.lit("oversize_ok").alias("s"),
            nd.alias("v"),
            (
                F.col("flags_ok")
                & F.coalesce(F.col("max_over_docs") <= 1, t)
            ).alias("ok"),
        ),
        F.struct(
            F.lit("waste_ok").alias("s"),
            nd.alias("v"),
            # first-fit half-full theorem: within a group at most ONE
            # non-oversize bin is <= half full (a second one's first item
            # would have fit in the first), so bins <= 2*tokens/cap + 1
            # per group. 11/9*OPT is tighter but OPT is unobservable —
            # substituting the token lower bound for OPT false-fails on
            # corpora of mostly ~cap/2+1-token documents (OPT ~ 2*lower).
            F.coalesce(
                F.col("n_norm_bins") <= 2 * lower + F.col("n_groups"),
                t,
            ).alias("ok"),
        ),
    ]
    pack = combined.select(
        F.explode(F.array(*pack_entries)).alias("e")
    ).select(
        F.lit("pack").alias("op"),
        nb.alias("k1"),
        nb.alias("k2"),
        F.col("e.s").alias("s"),
        F.col("e.v").alias("v"),
        F.col("e.ok").alias("ok"),
    )

    from ts_etl_spark.pipelines.sampling import temperature_shares
    from ts_etl_spark.pipelines.shards import assign_shards

    shards = (
        assign_shards(docs, N_SHARDS, ["doc_id"], seed="shard")
        .groupBy("shard")
        .agg(F.count("*").alias("__n"))
        .select(
            F.lit("shard").alias("op"),
            F.col("shard").cast("bigint").alias("k1"),
            nb.alias("k2"),
            ns.alias("s"),
            F.col("__n").cast("double").alias("v"),
            t.alias("ok"),
        )
    )

    # temperature mixing: the share math is DRIVER arithmetic over the
    # #strata-bounded per-language counts (the library contract —
    # ``temperature_shares`` feeds ``mix_to_target``), so this arm runs
    # one bounded groupBy/collect at CONSTRUCTION time (same class as
    # the CLI summary collects). ONE float path with the oracle: keys
    # are sorted before the call so Python's sum() is a left fold in
    # lang order (the oracle folds the same order via list_reduce), the
    # c**tau numerators share this host's libm pow, and rounding is
    # floor(x*1e6 + 0.5) on both sides — Python round() is banker's,
    # DuckDB ROUND half-away-from-zero, and the two diverge at exact
    # half-ulp boundaries.
    counts = dict(
        sorted(
            (r["lang"], r["n"])
            for r in load_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    )
    mix_rows = [
        (f"tau{tau}|{lang}", math.floor(share * 1e6 + 0.5) / 1e6)
        for tau in MIX_TAUS
        for lang, share in temperature_shares(counts, tau).items()
    ]
    mix = local_rows(spark, mix_rows, "s STRING, v DOUBLE").select(
        F.lit("mix").alias("op"),
        nb.alias("k1"),
        nb.alias("k2"),
        F.col("s"),
        F.col("v"),
        t.alias("ok"),
    )

    try:
        leak, leak_safe = _f_leak.result()
    finally:
        _pool.shutdown()
    return (
        chunks.unionByName(splits)
        .unionByName(bpe)
        .unionByName(pack)
        .unionByName(leak)
        .unionByName(leak_safe)
        .unionByName(shards)
        .unionByName(mix)
    )


def _trainer_prep_oracle_sql() -> str:
    from ts_etl_spark.operators.dedup import (
        _SHINGLES_CTE,
        JACCARD_THRESHOLD,
        canonical_fingerprint_sql,
    )

    stride = CHUNK_CHARS - CHUNK_OVERLAP
    return rf"""
        WITH {_SHINGLES_CTE},
        fp AS (
            SELECT doc_id, {canonical_fingerprint_sql('text')} AS f
            FROM documents
        ),
        starts AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, greatest(length(text) - {CHUNK_OVERLAP + 1}, 0),
                       {stride})) AS st
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   md5('split#' || CAST(doc_id AS VARCHAR)) AS d
            FROM documents
        ),
        shard_u AS (
            SELECT doc_id,
                   CAST(list_sum(
                       [(strpos('0123456789abcdef', substr(d, i, 1)) - 1)::BIGINT
                        << ((8 - i) * 4) for i in generate_series(1, 8)]
                   ) AS DOUBLE) / 4294967296.0 AS u
            FROM (
                SELECT doc_id,
                       md5('shard#' || CAST(doc_id AS VARCHAR)) AS d
                FROM documents
            )
        ),
        shard_assign AS (
            SELECT least(CAST(floor(u * {N_SHARDS}) AS BIGINT),
                         {N_SHARDS - 1}) AS shard
            FROM shard_u
        ),
        lang_counts AS (
            SELECT lang, CAST(COUNT(*) AS DOUBLE) AS c
            FROM documents GROUP BY lang
        ),
        u AS (
            SELECT doc_id,
                   CAST(list_sum(
                       [(strpos('0123456789abcdef', substr(d, i, 1)) - 1)::BIGINT
                        << ((8 - i) * 4) for i in generate_series(1, 8)]
                   ) AS DOUBLE) / 4294967296.0 AS u
            FROM hashed
        ),
        labels AS (
            SELECT doc_id,
                   CASE WHEN u < 0.75 THEN 'train'
                        WHEN u < 0.875 THEN 'val'
                        ELSE 'test' END AS sp
            FROM u
        ),
        exact_leak AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, la.sp AS sa, lb.sp AS sb
            FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
            JOIN labels la ON la.doc_id = a.doc_id
            JOIN labels lb ON lb.doc_id = b.doc_id
            WHERE la.sp != lb.sp
        ),
        near_leak AS (
            SELECT j.id_a, j.id_b, la.sp AS sa, lb.sp AS sb, j.jaccard
            FROM jac j
            JOIN labels la ON la.doc_id = j.id_a
            JOIN labels lb ON lb.doc_id = j.id_b
            WHERE j.jaccard >= {JACCARD_THRESHOLD} AND la.sp != lb.sp
              AND NOT EXISTS (SELECT 1 FROM exact_leak e
                              WHERE e.id_a = j.id_a AND e.id_b = j.id_b)
        )
        SELECT 'chunk' AS op, doc_id AS k1,
               CAST(st / {stride} AS BIGINT) AS k2,
               md5(substr(text, CAST(st + 1 AS INT), {CHUNK_CHARS})) AS s,
               CAST(st AS DOUBLE) AS v, TRUE AS ok
        FROM starts
        UNION ALL
        SELECT 'split', doc_id, CAST(NULL AS BIGINT),
               CASE WHEN u < 0.75 THEN 'train'
                    WHEN u < 0.875 THEN 'val'
                    ELSE 'test' END,
               CAST(NULL AS DOUBLE), TRUE
        FROM u
        UNION ALL
        SELECT 'bpe', doc_id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
               CAST(len(regexp_extract_all(lower(text), '{WORD_PAT}'))
                    AS DOUBLE),
               TRUE
        FROM documents
        UNION ALL
        SELECT 'pack', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               'total_docs', CAST((SELECT COUNT(*) FROM documents) AS DOUBLE),
               TRUE
        UNION ALL
        SELECT 'pack', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               m, CAST(NULL AS DOUBLE), TRUE
        FROM (VALUES ('capacity_ok'), ('oversize_ok'), ('waste_ok')) AS t(m)
        UNION ALL
        SELECT 'leak', id_a, id_b, 'exact|' || sa || '|' || sb,
               CAST(NULL AS DOUBLE), TRUE
        FROM exact_leak
        UNION ALL
        SELECT 'leak', id_a, id_b, 'near|' || sa || '|' || sb, jaccard, TRUE
        FROM near_leak
        UNION ALL
        -- component-safe splits pass the audit by construction; the Spark
        -- side re-runs the audit under them and gates the emptiness
        SELECT 'leak_safe', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), TRUE
        UNION ALL
        SELECT 'shard', shard, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
               CAST(COUNT(*) AS DOUBLE), TRUE
        FROM shard_assign GROUP BY shard
        UNION ALL
        -- ONE float path with the Spark arm: numerators are POW (same
        -- libm as Python's ** on this host), the denominator is an
        -- ORDERED left fold (list_reduce over lang-sorted values —
        -- SUM() OVER () has no accumulation-order contract, and Python's
        -- sum() over the sorted counts dict is a left fold), and the
        -- 6-digit rounding is floor(x*1e6 + 0.5) on both sides (Python
        -- round() is banker's, DuckDB ROUND is half-away-from-zero —
        -- they disagree at exact half-ulp boundaries)
        SELECT 'mix', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               'tau1.0|' || lang,
               floor(c / (SELECT list_reduce(list(c ORDER BY lang),
                                             (a, b) -> a + b)
                          FROM lang_counts) * 1000000 + 0.5) / 1000000.0,
               TRUE
        FROM lang_counts
        UNION ALL
        SELECT 'mix', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               'tau0.5|' || lang,
               floor(POW(c, 0.5)
                     / (SELECT list_reduce(list(POW(c, 0.5) ORDER BY lang),
                                           (a, b) -> a + b)
                        FROM lang_counts) * 1000000 + 0.5) / 1000000.0,
               TRUE
        FROM lang_counts
    """


QUERIES = {"trainer_prep": q_trainer_prep}
ORACLE = {"trainer_prep": _trainer_prep_oracle_sql()}
