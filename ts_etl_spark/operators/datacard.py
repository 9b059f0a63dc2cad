"""Corpus data cards — the per-slice composition report every training
dataset ships with (datasheets/data-statements practice): for each
(source, lang) slice, document and token counts, length distribution,
quality-gate pass rate, exact-duplicate rate, and share of the corpus.
``pipelines.maintenance.profile_table`` profiles arbitrary COLUMNS; this
profiles the CORPUS as training data.

Everything is one scan plus one fingerprint shuffle, all
partial-aggregatable, and every statistic is engine-portable (exact
counts/sums, linear-interpolation percentiles that Spark ``percentile``
and DuckDB ``quantile_cont`` define identically, the shared canonical
fingerprint) — the DuckDB twin reproduces the card value-for-value.

Scale shape: metrics aggregate map-side per slice (one groupBy); the
exact-dup flag is one fingerprint-keyed window over skinny (fingerprint,
doc_id) rows; the corpus share is a broadcast of the ONE-row total. At
100 TB the whole card is two shuffles of pre-aggregated rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.dedup import canonical_fingerprint

#: length percentiles reported per slice
CARD_QUANTILES = (0.5, 0.9, 0.99)


def corpus_data_card(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per slice (the distinct values of ``group_cols``):

    - ``n_docs``, ``doc_share`` (fraction of all docs, exact),
    - ``n_ws_tokens`` (whitespace tokens, summed), ``n_chars`` (summed),
    - ``chars_p50/p90/p99`` (linear-interpolation percentiles of doc
      length, rounded to 6 — EXACT ``F.percentile``, deliberately not
      the repo's usual ``percentile_approx`` route: exactness is
      load-bearing for the DuckDB ``quantile_cont`` value parity, and
      the aggregation buffer is bounded by DISTINCT doc-length values
      per slice, which stays small at any corpus size),
    - ``quality_rate`` (share passing the textops gate: ≥10 tokens,
      ≥100 chars, alpha ratio ≥ 0.5),
    - ``exact_dup_rate`` (share of docs whose canonical fingerprint has
      a smaller-id twin ANYWHERE in the corpus — cross-slice on purpose:
      a mirror site in another slice still makes these docs duplicates).

    Deterministic output; empty slices cannot occur (groupBy only emits
    observed combinations)."""
    from ts_etl_spark.operators.textops import quality_pass_expr

    raw_toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # split("") yields [''] (size 1); empty docs have zero tokens
    n_toks = F.when(F.trim(F.col(text_col)) == "", 0).otherwise(
        F.size(raw_toks)
    )
    n_chars = F.length(text_col)
    # the ONE shared gate definition (textops) — the card must report the
    # rate of exactly the gate the curation pipeline applies
    quality = quality_pass_expr(F.col(text_col))
    from pyspark.sql.window import Window

    fp_w = Window.partitionBy("__fp").orderBy(id_col)
    flagged = docs.select(
        *group_cols,
        F.col(id_col),
        F.col(text_col),
        canonical_fingerprint(F.col(text_col)).alias("__fp"),
    ).withColumn("__is_dup", F.row_number().over(fp_w) > 1)
    per_slice = flagged.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_toks).alias("n_ws_tokens"),
        F.sum(n_chars).alias("n_chars"),
        *[
            F.round(F.percentile(n_chars, q), 6).alias(
                f"chars_p{int(q * 100)}"
            )
            for q in CARD_QUANTILES
        ],
        F.round(F.avg(quality.cast("double")), 6).alias("quality_rate"),
        F.round(F.avg(F.col("__is_dup").cast("double")), 6).alias(
            "exact_dup_rate"
        ),
    )
    total = flagged.agg(F.count("*").alias("__total"))
    return per_slice.join(F.broadcast(total)).select(
        *group_cols,
        "n_docs",
        F.round(F.col("n_docs") / F.col("__total"), 6).alias("doc_share"),
        "n_ws_tokens",
        "n_chars",
        *[f"chars_p{int(q * 100)}" for q in CARD_QUANTILES],
        "quality_rate",
        "exact_dup_rate",
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 50,
    by: str = "occurrences",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus's top-``k`` word-n-grams (the other half of a data
    card: WHAT the corpus says, not just how much) —
    ``(gram, n_occurrences, n_docs)`` ordered by ``by`` (``occurrences``
    or ``docs``) descending, ties by gram ascending — fully
    deterministic, exact (the streaming ingest path keeps count-min
    sketches for the same question under memory bounds; this is the
    batch-exact report).

    Plan: explode grams once, pre-aggregate per (gram, doc) — the
    partial-agg step that both bounds the per-gram-distinct computation
    and absorbs document-level skew — then one groupBy per gram and a
    ``TakeOrdered`` top-k (no global sort materialization). Zipf bounds
    the gram table; nothing is quadratic."""
    if by not in ("occurrences", "docs"):
        raise ValueError(f"by must be 'occurrences' or 'docs', got {by!r}")
    if n < 1 or k < 1:
        raise ValueError(f"n and k must be >= 1, got n={n} k={k}")
    from ts_etl_spark.operators.textops import ngram_array

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    grams = docs.select(
        F.col(id_col), F.explode(ngram_array(toks, n)).alias("gram")
    )
    per_doc = grams.groupBy("gram", id_col).agg(F.count("*").alias("__c"))
    counts = per_doc.groupBy("gram").agg(
        F.sum("__c").alias("n_occurrences"), F.count("*").alias("n_docs")
    )
    metric = F.col("n_occurrences" if by == "occurrences" else "n_docs")
    return counts.orderBy(metric.desc(), F.col("gram")).limit(k)


def top_ngrams_sql(
    table: str = "documents",
    n: int = 3,
    k: int = 50,
    by: str = "occurrences",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``top_ngrams`` — keep in lockstep."""
    metric = "n_occurrences" if by == "occurrences" else "n_docs"
    return f"""
        WITH toks AS (
            SELECT {id_col},
                   list_filter(regexp_split_to_array(trim(lower({text_col})),
                                                     '\\s+'), x -> x != '') AS t
            FROM {table}
        ), grams AS (
            SELECT {id_col},
                   array_to_string(t[gi + 1 : gi + {n}], ' ') AS gram
            FROM toks, unnest(generate_series(0, greatest(len(t) - {n}, -1)))
                 AS u(gi)
        ), per_doc AS (
            SELECT gram, {id_col}, COUNT(*) AS c FROM grams GROUP BY 1, 2
        )
        SELECT gram, SUM(c) AS n_occurrences, COUNT(*) AS n_docs
        FROM per_doc GROUP BY gram
        ORDER BY {metric} DESC, gram LIMIT {k}
    """


def corpus_data_card_sql(
    table: str = "documents",
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``corpus_data_card`` — interpolates the SHARED
    gate/fingerprint twins (textops.quality_pass_sql,
    dedup.canonical_fingerprint_sql), not restatements."""
    from ts_etl_spark.operators.dedup import canonical_fingerprint_sql
    from ts_etl_spark.operators.textops import quality_pass_sql

    g = ", ".join(group_cols)
    toks = f"len(list_filter(regexp_split_to_array(trim({text_col}), '\\s+'), x -> x != ''))"
    quality = quality_pass_sql(text_col)
    qcols = ", ".join(
        f"round(quantile_cont(length({text_col}), {q}), 6) AS chars_p{int(q * 100)}"
        for q in CARD_QUANTILES
    )
    return f"""
        WITH fp AS (
            SELECT {g}, {id_col}, {text_col},
                   {canonical_fingerprint_sql(text_col)} AS f
            FROM {table}
        ), flagged AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY f ORDER BY {id_col}) > 1
                      AS is_dup
            FROM fp
        ), per_slice AS (
            SELECT {g},
                   COUNT(*) AS n_docs,
                   SUM({toks}) AS n_ws_tokens,
                   SUM(length({text_col})) AS n_chars,
                   {qcols},
                   round(AVG(CASE WHEN {quality} THEN 1.0 ELSE 0.0 END), 6)
                       AS quality_rate,
                   round(AVG(CASE WHEN is_dup THEN 1.0 ELSE 0.0 END), 6)
                       AS exact_dup_rate
            FROM flagged GROUP BY {g}
        )
        SELECT {g}, n_docs,
               round(CAST(n_docs AS DOUBLE)
                     / (SELECT COUNT(*) FROM {table}), 6) AS doc_share,
               n_ws_tokens, n_chars,
               {", ".join(f"chars_p{int(q * 100)}" for q in CARD_QUANTILES)},
               quality_rate, exact_dup_rate
        FROM per_slice
    """
