"""Substring-level dedup via winnowing fingerprints — the repeated-span
layer between whole-document dedup (exact/MinHash) and paragraph dedup:
long token runs duplicated ACROSS documents (license boilerplate,
navigation chrome, quoted chain-mail) that no document- or
paragraph-grained pass can see when the surrounding text differs.
Removing them is the "deduplicating training data" substring recipe
(Lee et al. 2022, arXiv:2107.06499 — there with suffix arrays, a
global-sort structure; winnowing gives the distributed-friendly
guarantee at a fraction of the cost).

Winnowing (Schleimer et al. 2003, the MOSS fingerprinter): hash every
token k-gram, slide a window of ``w`` consecutive k-gram hashes, keep
each window's MINIMUM hash (ties → rightmost position, the robust-
winnowing rule). GUARANTEE: any shared token run of at least
``w + k - 1`` tokens shares at least one selected fingerprint — so
fingerprint equality is a complete detector for long shared substrings
(no false negatives at the guarantee length; tested as a property).
Expected fingerprint density is ~2/(w+1) per position, so the index is a
small fraction of the token stream.

Everything is engine-portable (the repo's shared md5 hash, not
xxhash64) so a DuckDB mirror reproduces fingerprints exactly — tested.

Scale shape: fingerprinting is per-document higher-order expressions
inside codegen — ZERO shuffles until the global frequency count (one
explode + partial-aggregated groupBy over selected fingerprints only,
~2/(w+1) of the k-gram stream); flagging joins the skinny (fp) frequent
set back; span masking is one per-doc aggregation. Nothing is quadratic
and no driver loop touches data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.classifier import _hash8
from ts_etl_spark.operators.sketches import _hex8_fold_sql

#: defaults: 8-token grams, window 25 → guarantee length 32 tokens —
#: spans shorter than a license header stay; boilerplate gets caught
WINNOW_K = 8
WINNOW_W = 25
#: a fingerprint is "repeated" when it appears in at least this many docs
MIN_DOCS = 2

_TOKEN_PAT = r"\s+"


def _tokens(text: Column) -> Column:
    toks = F.split(F.trim(F.lower(text)), _TOKEN_PAT)
    return F.filter(toks, lambda t: t != "")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Selected winnowing fingerprints per document:
    ``(id_col, pos, fp)`` — ``pos`` the 0-based token index where the
    selected k-gram starts, ``fp`` its engine-portable hash. Documents
    shorter than ``k`` tokens yield no rows; documents with fewer than
    ``w`` k-grams yield the global minimum (the degenerate single
    window), preserving the guarantee for short docs.

    Plan — RELATIONAL, not array-HOF: posexplode the k-gram hashes (one
    codegen row per gram), then ONE sliding window pass per document:
    ``max(struct(-gh, pos)) OVER (ROWS CURRENT ROW .. w-1 FOLLOWING)``
    computes each window's minimum hash with the rightmost-tie rule in a
    single struct comparison (max of -gh = min of gh; equal hash → max
    pos). A nested-array formulation (aggregate inside transform) looks
    natural but Catalyst re-inlines the producing array into every
    element access inside HOF lambdas, going O(n²·w) per document —
    measured 36 s for a 200-token doc; this shape is linear with one
    keyed sort shuffle on (doc, pos).

    The sliding-min frame is O(w) per row (min has no inverse aggregate,
    so Spark rescans the frame); the classic block decomposition
    (per-w-block prefix/suffix running minima + a lead, all incremental)
    is O(1) per row but needs three extra window passes — MEASURED
    slower warm at sf0.1 (0.42 s vs 0.33 s, identical output) because
    w=25 frame scans are cheap JVM loops while the extra passes pay real
    exchange/sort cost. Revisit only if w grows by an order of
    magnitude."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    from pyspark.sql.window import Window

    grams = _gram_hashes(docs, k, text_col, id_col)
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    whole = Window.partitionBy(id_col)
    sel = F.max(
        F.struct((-F.col("gh")).alias("ng"), F.col("pos").alias("p"))
    ).over(frame)
    # keep full-width window starts; with fewer than w grams total, the
    # single degenerate window at pos 0 (its frame covers the whole doc)
    return (
        grams.withColumn("__n", F.count("*").over(whole))
        .withColumn("__sel", sel)
        .filter(
            (F.col("pos") <= F.col("__n") - w)
            | ((F.col("__n") < w) & (F.col("pos") == 0))
        )
        .select(
            id_col,
            F.col("__sel.p").alias("pos"),
            (-F.col("__sel.ng")).alias("fp"),
        )
        .distinct()
    )


def repeated_fingerprints(
    fps: DataFrame,
    min_docs: int = MIN_DOCS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fingerprints selected in at least ``min_docs`` DISTINCT documents:
    ``(fp, n_docs)`` — the global repeated-substring index. One
    partial-aggregated groupBy over the (already sparse) selected set."""
    return (
        fps.select(id_col, "fp")
        .distinct()
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def repeated_spans(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_docs: int = MIN_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-document flagged span starts: ``(id_col, pos, fp, n_docs)`` —
    every selected fingerprint position whose fingerprint recurs in ≥
    ``min_docs`` documents. The audit surface (what would
    ``mask_repeated_spans`` remove, and how widely is it shared?).

    The winnowed selection feeds two consumers (the repeated count and
    the join back), so the skinny fps frame is persisted — the
    ``mask_repeated_spans`` rationale; ``persisted`` receives it for
    caller-side release."""
    fps = winnow_fingerprints(docs, k, w, text_col, id_col).persist()
    if persisted is not None:
        persisted.append(fps)
    rep = repeated_fingerprints(fps, min_docs, id_col)
    return fps.join(rep, "fp").select(id_col, "pos", "fp", "n_docs")


def _gram_hashes(
    docs: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """EVERY k-gram hash with its position: (id_col, pos, gh) — same
    tokenizer and hash as the winnowed selection. Relational shape:
    posexplode tokens, assemble grams with k-1 ``lead``s over (doc, pos)
    (one keyed sort shuffle, all codegen — the shingle-CTE recipe);
    trailing partial grams are dropped via the last lead's NULL. Docs
    shorter than k tokens therefore contribute no rows."""
    from pyspark.sql.window import Window

    toks = _tokens(F.col(text_col))
    tok_rows = docs.select(id_col, F.posexplode(toks).alias("pos", "tok"))
    wspec = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(wspec) for j in range(1, k)
    ]
    last_ok = (
        F.lead("tok", k - 1).over(wspec).isNotNull() if k > 1 else F.lit(True)
    )
    return (
        tok_rows.withColumn("__g", F.concat_ws(" ", *parts))
        .withColumn("__ok", last_ok)
        .filter("__ok")
        .select(id_col, "pos", _hash8("win#", F.col("__g")).alias("gh"))
    )


def mask_repeated_spans(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_docs: int = MIN_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """Rewrite each document with cross-document repeated spans removed —
    TWO-PHASE, so the dense work never touches the whole corpus:

    1. the winnowed index names candidate documents (any doc holding a
       fingerprint repeated in ≥ ``min_docs`` docs — complete for shared
       runs of ≥ w+k-1 tokens, the winnowing guarantee);
    2. within ONLY those candidates, every k-gram hash is counted across
       documents, and a token drops iff some k-gram covering it appears
       in ≥ ``min_docs`` distinct candidate docs. Every k-gram inside a
       shared run is itself shared, so qualifying runs mask COMPLETELY,
       while boundary grams (mixing unique context with the run) differ
       between docs and never flag — unique text survives to the token.

    Contract: shared runs of ≥ w+k-1 tokens across ≥ min_docs docs are
    fully removed; runs in [k, w+k-1) may be partially removed (only in
    docs that are candidates via some OTHER qualifying run) or kept —
    below the winnow threshold by design, tune ``w`` down for a lower
    one. Returns every input row plus ``out_col`` and
    ``n_tokens_removed``: UNTOUCHED documents pass through
    byte-identical with 0 removed (masking is not corpus-wide
    normalization); documents with flagged spans are rebuilt as their
    surviving tokens joined by single spaces — the canonical whitespace
    the fingerprinting tokenizer sees; byte preservation and span
    REMOVAL are incompatible goals, and the lossy rebuild is confined
    to documents that actually lose spans.

    Scale shape: phase 1 is the winnow plan; phase 2 explodes grams for
    the candidate subset only (on real corpora a small fraction), one
    distinct + groupBy for cross-doc counts, one skinny join back, one
    per-doc collect of flagged starts, then a map-side per-token
    ``exists`` rebuild.

    The winnowed selection feeds two consumers (the repeated-fingerprint
    count and the candidate join), so the skinny fps frame is persisted —
    without the cache the two-window winnow plan (the function's dominant
    cost) runs twice. ``persisted`` (a list, the repo's cache-release
    contract) receives it for caller-side unpersist once the lazy result
    is materialized."""
    fps = winnow_fingerprints(docs, k, w, text_col, id_col).persist()
    if persisted is not None:
        persisted.append(fps)
    rep = repeated_fingerprints(fps, min_docs, id_col)
    cand_ids = fps.join(rep, "fp").select(id_col).distinct()
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    grams = _gram_hashes(cand_docs, k, text_col, id_col)
    gfreq = (
        grams.select(id_col, "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count("*").alias("__gn"))
        .filter(F.col("__gn") >= min_docs)
        .select("gh")
    )
    flagged = (
        grams.join(gfreq, "gh")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__flagged"))
    )
    return _rebuild_masked(docs, flagged, k, text_col, id_col, out_col)


def _rebuild_masked(
    docs: DataFrame,
    flagged: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    out_col: str,
) -> DataFrame:
    """Shared mask rebuild: drop every token covered by a flagged k-token
    span start (``flagged`` = (id_col, __flagged array<int>)); docs
    absent from ``flagged`` pass through BYTE-IDENTICAL with zero
    removals — masking is an opt-in rewrite, not corpus-wide
    normalization, so casing/punctuation/whitespace of untouched
    documents survive the gate (round-9 fix: the rebuild used to emit
    the lowercased single-spaced token join for every document).
    FLAGGED docs are rebuilt from the fingerprinting tokenizer's
    normalized tokens (lowercase, single-space) — span removal and byte
    preservation are incompatible there, documented in
    ``mask_repeated_spans``. Map-side per-token ``exists`` over the
    (small) per-doc start list."""
    joined = docs.join(flagged, id_col, "left")
    toks = _tokens(F.col(text_col))
    starts = F.coalesce(
        F.col("__flagged"), F.array().cast("array<int>")
    )
    covered = lambda idx: F.exists(  # noqa: E731
        starts, lambda p: (p <= idx) & (idx <= p + F.lit(k - 1))
    )
    kept = F.filter(toks, lambda t, i: ~covered(i))
    untouched = F.col("__flagged").isNull()
    return joined.select(
        *[c for c in docs.columns],
        F.when(untouched, F.col(text_col))
        .otherwise(F.array_join(kept, " "))
        .alias(out_col),
        F.when(untouched, F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .alias("n_tokens_removed"),
    )


def mask_winnowed_spans(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_docs: int = MIN_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
    fps: DataFrame | None = None,
) -> DataFrame:
    """Mask every SELECTED winnow span whose fingerprint recurs in ≥
    ``min_docs`` documents — the fingerprint-grained sibling of
    ``mask_repeated_spans`` and the ONE-SHOT counterpart of the streaming
    ``substring_gate`` (``streaming.ingest``): span verdicts depend only
    on the SET of per-document fingerprints, a pure union, so the
    incremental gate reproduces this function over seen ∪ batch exactly
    (tested equivalence, the ``semantic_dedup_incremental`` pattern).

    Coverage contract vs ``mask_repeated_spans``: a qualifying shared run
    (≥ w+k-1 tokens, ≥ min_docs docs) is ATTENUATED — every selected
    fingerprint inside it masks its k-token span (expected ~2/(w+1)
    selection density), and at least one span per run is guaranteed by
    the winnow property — but not removed wall-to-wall; run the two-phase
    ``mask_repeated_spans`` at recuration for complete removal. In
    exchange the verdict needs no gram-level second phase, which is what
    makes the per-batch incremental form exact and index-bounded.

    ``fps`` optionally supplies precomputed ``winnow_fingerprints`` rows."""
    if fps is None:
        fps = winnow_fingerprints(docs, k, w, text_col, id_col)
    rep = repeated_fingerprints(fps, min_docs, id_col)
    flagged = (
        fps.join(rep, "fp")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__flagged"))
    )
    return _rebuild_masked(docs, flagged, k, text_col, id_col, out_col)


def mask_repeated_spans_sql(
    table: str = "documents",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_docs: int = MIN_DOCS,
) -> str:
    """DuckDB twin of ``mask_repeated_spans`` — same two-phase plan
    (winnowed candidate selection, then per-candidate gram frequency and
    covered-token removal) producing ``(doc_id, clean_text,
    n_tokens_removed)``; keep in lockstep. The per-token coverage test is
    a list comprehension over 0-based token indices, exactly the Spark
    side's ``exists`` filter."""
    fold = _hex8_fold_sql(
        "substr(md5('win#' || array_to_string(toks[gi + 1 : gi + "
        + str(k)
        + "], ' ')), 1, 8)"
    )
    return f"""
        WITH fps AS ({winnow_fingerprints_sql(table, k, w)}),
        rep AS (
            SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM fps)
            GROUP BY fp HAVING COUNT(*) >= {min_docs}
        ),
        cand AS (SELECT DISTINCT doc_id FROM fps JOIN rep USING (fp)),
        dt AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)),
                                                     '\\s+'), x -> x != '')
                       AS toks
            FROM {table}
        ),
        cg AS (
            SELECT d.doc_id, CAST(gi AS INT) AS pos,
                   CAST({fold} AS BIGINT) AS gh
            FROM (SELECT dt.* FROM dt JOIN cand USING (doc_id)
                  WHERE len(toks) >= {k}) d,
                 unnest(generate_series(0, len(d.toks) - {k})) AS u(gi)
        ),
        gfreq AS (
            SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM cg)
            GROUP BY gh HAVING COUNT(*) >= {min_docs}
        ),
        flagged AS (
            SELECT doc_id, list(pos) AS starts
            FROM cg JOIN gfreq USING (gh) GROUP BY doc_id
        ),
        kept AS (
            SELECT dt.doc_id, dt.toks, f.starts,
                   [dt.toks[idx + 1] for idx in generate_series(0, len(dt.toks) - 1)
                    if len(list_filter(COALESCE(f.starts, []),
                           p -> p <= idx AND idx <= p + {k - 1})) = 0] AS kt
            FROM dt LEFT JOIN flagged f USING (doc_id)
        )
        -- unflagged docs pass through byte-identical (round-9 contract);
        -- flagged docs rebuild from normalized tokens like the Spark side
        -- (generate_series(0, -1) makes the comprehension NULL, hence the
        -- COALESCEs in the flagged branch)
        SELECT d.doc_id,
               CASE WHEN kp.starts IS NULL THEN d.text
                    ELSE COALESCE(array_to_string(kp.kt, ' '), '') END
                   AS clean_text,
               CAST(CASE WHEN kp.starts IS NULL THEN 0
                    ELSE COALESCE(len(kp.toks) - len(kp.kt), 0) END AS INT)
                   AS n_tokens_removed
        FROM {table} d JOIN kept kp USING (doc_id)
    """


def winnow_fingerprints_sql(
    table: str = "documents",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    """DuckDB twin of ``winnow_fingerprints`` — keep in lockstep (same
    tokenizer, same md5 hash, same rightmost-min window rule)."""
    # NOTE the gram comprehension variable must NOT be named `i`:
    # _hex8_fold_sql's own `for i in generate_series(1, 8)` would shadow
    # it inside the fold body and hash the same slice for every gram
    fold = _hex8_fold_sql(
        "substr(md5('win#' || array_to_string(toks[gi + 1 : gi + "
        + str(k)
        + "], ' ')), 1, 8)"
    )
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x != '') AS toks
            FROM {table}
        ), g AS (
            SELECT doc_id, toks, greatest(len(toks) - {k - 1}, 0) AS ng
            FROM t WHERE len(toks) >= {k}
        ), h AS (
            SELECT doc_id, ng,
                   [CAST({fold} AS BIGINT) for gi in generate_series(0, ng - 1)] AS hs
            FROM g
        ), win AS (
            SELECT doc_id, hs, ng,
                   greatest(ng - {w - 1}, least(ng, 1)) AS nw,
                   least({w}, ng) AS wl
            FROM h
        ), pos AS (
            SELECT doc_id, hs, wl, unnest(generate_series(0, nw - 1)) AS s
            FROM win
        ), sel AS (
            SELECT DISTINCT doc_id,
                   -- rightmost min of hs[s .. s+wl-1] (1-based list ops)
                   (SELECT max(i) FROM unnest(generate_series(s + 1, s + wl)) AS u(i)
                    WHERE hs[i] = list_min(hs[s + 1 : s + wl])) - 1 AS pos,
                   list_min(hs[s + 1 : s + wl]) AS fp
            FROM pos
        )
        SELECT doc_id, CAST(pos AS INT) AS pos, fp FROM sel
    """
