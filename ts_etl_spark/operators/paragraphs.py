"""Paragraph-level corpus deduplication (CCNet-style): remove REPEATED
PARAGRAPHS across the corpus while keeping the documents themselves —
the cleanup stage between document-level dedup and quality filtering.
Web corpora are full of documents that are unique as a whole but share
navigation blocks, cookie banners, license footers; document-level
dedup keeps them all, and this operator strips the shared parts.

Relation to ``operators/boilerplate.py``: boilerplate DETECTS shared
word-5-grams and scores documents by their boilerplate fraction; this
operator REWRITES documents at paragraph granularity. Two standard
policies:

- ``mode="df"`` (CCNet): drop every copy of any paragraph whose
  normalized form appears in ≥ ``min_df`` distinct documents. The
  aggressive policy — repeated content is assumed boilerplate.
- ``mode="keep_first"``: keep the globally earliest occurrence
  (lowest ``(doc_id, para_idx)``) and drop later copies. The
  conservative policy — content survives exactly once.
- ``mode="within_doc"``: dedup only INSIDE each document (keep a
  paragraph's first occurrence per document, cross-document repeats
  untouched) — the repetition-cleanup policy for pages that loop their
  own content, safe to run before any corpus-level policy.

Normalization for matching is lowercase + whitespace-collapse (md5
fingerprint, the ``textops`` canonicalization); whitespace-only
paragraphs are structural, never counted or dropped.

Scale shape: split + posexplode is corpus-linear; the paragraph-
frequency aggregate is one partial-aggregated groupBy on the
fingerprint; the verdict joins back on the fingerprint (skinny
``(fp, df)`` / ``(fp, first)`` build side, shuffle hash join at scale);
reassembly is one groupBy per document collecting (idx, para) pairs —
group size = paragraphs per document, bounded by document length, never
by corpus size. No pairwise comparison anywhere.

The synthetic ``documents`` table carries no newlines, so this operator
is exercised by fixture tests with an exact DuckDB mirror
(tests/test_paragraphs.py) rather than a driver-gated entry — noted in
SURVEY §8.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARA_DELIM = "\n\n"


def _fingerprint(para) -> "F.Column":
    return F.md5(F.lower(F.regexp_replace(F.trim(para), r"\s+", " ")))


def split_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = PARA_DELIM,
) -> DataFrame:
    """(id, para_idx, para, fp, blank) — one row per paragraph, in
    document order; ``fp`` is the normalized fingerprint, ``blank``
    marks whitespace-only paragraphs (kept structural, never deduped).

    ``delimiter`` is a LITERAL string (regex-escaped before the split —
    ``F.split`` takes a Java regex, and an unescaped "|" would match the
    empty string and shatter every document into single characters while
    the DuckDB mirror string_splits literally)."""
    if not delimiter:
        raise ValueError("delimiter must be a non-empty literal string")
    parts = F.split(F.col(text_col), F.lit(re.escape(delimiter)), -1)
    return docs.select(
        F.col(id_col),
        F.posexplode(parts).alias("para_idx", "para"),
    ).select(
        id_col,
        "para_idx",
        "para",
        _fingerprint(F.col("para")).alias("fp"),
        (F.trim("para") == "").alias("blank"),
    )


def dedup_paragraphs(
    docs: DataFrame,
    mode: str = "df",
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = PARA_DELIM,
) -> DataFrame:
    """Every document rewritten: ``(id, text, n_paragraphs, n_kept)``
    where ``text`` is the surviving paragraphs re-joined in original
    order (empty string when everything was dropped — the caller's
    min-length gate catches those downstream, same contract as the
    curation pipeline's quality stage)."""
    if mode not in ("df", "keep_first", "within_doc"):
        raise ValueError(
            f"mode must be 'df', 'keep_first' or 'within_doc', got {mode!r}"
        )
    paras = split_paragraphs(docs, text_col, id_col, delimiter)
    live = paras.filter(~F.col("blank"))
    join_keys = ["fp"]
    if mode == "df":
        verdict = live.groupBy("fp").agg(
            F.count_distinct(id_col).alias("df")
        )
        keep = F.col("df") < min_df
    elif mode == "keep_first":
        verdict = live.groupBy("fp").agg(
            F.min(F.struct(id_col, "para_idx")).alias("first")
        )
        keep = (F.col(f"first.{id_col}") == F.col(id_col)) & (
            F.col("first.para_idx") == F.col("para_idx")
        )
    else:  # within_doc: first occurrence per (doc, fingerprint)
        join_keys = [id_col, "fp"]
        verdict = live.groupBy(id_col, "fp").agg(
            F.min("para_idx").alias("first_idx")
        )
        keep = F.col("first_idx") == F.col("para_idx")
    kept = (
        paras.join(verdict, join_keys, "left")
        .withColumn("keep", F.col("blank") | keep)
        .drop("df", "first", "first_idx")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("para_idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                delimiter,
            ).alias(text_col),
        )
        .select(id_col, text_col, "n_paragraphs", "n_kept")
    )


def dedup_paragraphs_sql(
    mode: str = "df", min_df: int = 2, delimiter: str = PARA_DELIM
) -> str:
    """DuckDB mirror over a ``docs`` relation of (doc_id, text). Keep in
    lockstep with dedup_paragraphs (same normalization, same policies;
    the delimiter is literal on both sides — quotes SQL-doubled,
    newlines spliced as chr(10))."""
    if mode not in ("df", "keep_first", "within_doc"):
        raise ValueError(
            f"mode must be 'df', 'keep_first' or 'within_doc', got {mode!r}"
        )
    if not delimiter:
        raise ValueError("delimiter must be a non-empty literal string")
    d = delimiter.replace("'", "''").replace("\n", "' || chr(10) || '")
    delim = f"'{d}'"
    if mode == "df":
        verdict = f"""SELECT fp FROM live GROUP BY fp
            HAVING COUNT(DISTINCT doc_id) >= {min_df}"""
        keep = "p.fp NOT IN (SELECT fp FROM bad)"
        first_join, cte = "", "bad"
    else:
        part = "fp" if mode == "keep_first" else "doc_id, fp"
        verdict = f"""SELECT doc_id, para_idx, TRUE AS is_first FROM (
            SELECT doc_id, para_idx,
                   ROW_NUMBER() OVER (PARTITION BY {part}
                                      ORDER BY doc_id, para_idx) AS rn
            FROM live) WHERE rn = 1"""
        keep = "COALESCE(f.is_first, FALSE)"
        first_join, cte = "LEFT JOIN firsts f USING (doc_id, para_idx)", "firsts"
    return f"""
        WITH paras AS (
            SELECT doc_id, l[i] AS para, i AS para_idx,
                   md5(lower(regexp_replace(trim(l[i]), '\\s+', ' ', 'g'))) AS fp,
                   trim(l[i]) = '' AS blank
            FROM (SELECT doc_id, string_split(text, {delim}) AS l FROM docs),
                 LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) ix
        ),
        live AS (SELECT * FROM paras WHERE NOT blank),
        {cte} AS ({verdict})
        SELECT p.doc_id,
               COALESCE(string_agg(CASE WHEN p.blank OR {keep} THEN p.para END,
                                   {delim} ORDER BY p.para_idx), '') AS text,
               COUNT(*) AS n_paragraphs,
               SUM(CASE WHEN p.blank OR {keep} THEN 1 ELSE 0 END) AS n_kept
        FROM paras p {first_join}
        GROUP BY p.doc_id
    """


#: composite paragraph id: doc_id * 2^20 + para_idx. 20 bits of paragraph
#: index (a million paragraphs per document) leaves 43 bits of doc_id —
#: both far beyond real corpora; guarded below anyway.
_PARA_ID_BITS = 20


def paragraph_neardup_pairs(
    docs: DataFrame,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = PARA_DELIM,
) -> DataFrame:
    """NEAR-duplicate paragraph pairs across the corpus — the fuzzy
    counterpart of ``dedup_paragraphs`` (which matches exact normalized
    fingerprints): templated boilerplate with per-page substitutions
    ("© 2024 Acme GmbH" vs "© 2024 Acme Ltd") never fingerprints equal,
    but its word-shingle Jaccard is high. Pure composition: paragraphs
    from ``split_paragraphs`` become rows of a (doc_id, text) frame with
    a composite bit-packed id, and ``dedup.minhash_lsh_pairs`` — banding,
    candidates-then-verify, the 100 TB shape — does the matching.
    Returns ``(doc_a, para_a, doc_b, para_b, jaccard)``.

    Note the unit of comparison is the PARAGRAPH; short paragraphs
    (< 3 word tokens) have no shingles and never pair, same contract as
    document-level MinHash."""
    from ts_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        minhash_lsh_pairs,
    )

    thr = JACCARD_THRESHOLD if threshold is None else threshold
    if thr < JACCARD_THRESHOLD:
        # the banding scheme (bands x rows) is tuned for recall AT the
        # module threshold and minhash_lsh_pairs hard-filters there —
        # a lower threshold would silently return nothing below 0.4
        raise ValueError(
            f"threshold must be >= {JACCARD_THRESHOLD} (the LSH banding "
            "recall floor); retune dedup's banding for lower thresholds"
        )
    paras = split_paragraphs(docs, text_col, id_col, delimiter).filter(
        ~F.col("blank")
    )
    shift = F.lit(1 << _PARA_ID_BITS)
    # composite ids must be reversible: out-of-range coordinates FAIL the
    # job (raise_error) rather than silently aliasing two paragraphs into
    # one id; doc_id large enough to overflow the long multiply already
    # fails loudly under the session's ANSI mode
    guarded = paras.select(
        F.when(
            (F.col("para_idx") < shift) & (F.col(id_col) >= 0),
            F.col(id_col) * shift + F.col("para_idx"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "paragraph coordinates out of composite-id range "
                    f"(need 0 <= para_idx < 2^{_PARA_ID_BITS} and doc_id >= 0)"
                )
            )
        )
        .alias("doc_id"),
        F.col("para").alias("text"),
    )
    pairs = minhash_lsh_pairs(guarded).filter(F.col("jaccard") >= thr)
    # decode with BIT arithmetic: `/` promotes to double, which rounds
    # ids above 2^53 and misattributes pairs to neighbouring documents
    return pairs.select(
        F.shiftright(F.col("id_a"), _PARA_ID_BITS).alias("doc_a"),
        F.col("id_a").bitwiseAND(F.lit((1 << _PARA_ID_BITS) - 1))
        .cast("int")
        .alias("para_a"),
        F.shiftright(F.col("id_b"), _PARA_ID_BITS).alias("doc_b"),
        F.col("id_b").bitwiseAND(F.lit((1 << _PARA_ID_BITS) - 1))
        .cast("int")
        .alias("para_b"),
        "jaccard",
    )
