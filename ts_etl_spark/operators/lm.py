"""Corpus-trained n-gram language-model scoring: the perplexity-proxy
quality filter (KenLM-style) a training-data pipeline runs after the
cheap heuristics — documents that score far from the corpus distribution
are boilerplate, lists, or noise.

Everything is declarative and linear in the corpus:

- **train**: one explode + partial-aggregated groupBy each for unigram
  and bigram counts (bigrams built with the zip_with-of-slices pairing —
  each lambda touches only its arguments, avoiding the interpreted-HOF
  re-evaluation trap documented in textops);
- **score**: explode the document's bigrams, one hash join per count
  table, per-document aggregate. The count tables are corpus-vocabulary
  sized (Zipf-bounded), usually broadcast-eligible; the joins degrade to
  shuffle joins when the vocabulary outgrows the threshold — both plans
  are linear.

Add-k smoothing keeps unseen bigrams finite: log p(w2|w1) =
log((c(w1,w2)+k) / (c(w1)+k·V)) with V the unigram vocabulary size.
The per-document average log-probability and its exp(-avg) perplexity
proxy are the scoring outputs; filter policy belongs to the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT


def _doc_tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PAT), 0)


def _doc_bigrams(tokens: Column) -> Column:
    # slice length clamps at 0 so token-less documents yield an empty
    # pair array instead of an INVALID_PARAMETER_VALUE error
    n = F.greatest(F.size(tokens) - 1, F.lit(0))
    return F.zip_with(
        F.slice(tokens, 1, n),
        F.slice(tokens, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(unigram, bigram) count tables: ``(w, c1)`` and ``(w1, w2, c2)``.

    ``tokens_col`` names an existing token-ARRAY column to reuse instead
    of re-tokenizing ``text_col`` — pass the same (ideally persisted)
    projection to every consumer so the corpus is read and tokenized
    ONCE per pipeline, not once per operator (the shared-scan discipline
    of ``pipelines/curation.py``)."""
    tk = F.col(tokens_col) if tokens_col else _doc_tokens(text_col)
    toks = docs.select(tk.alias("toks"))
    unigrams = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bigrams = (
        toks.select(F.explode(_doc_bigrams(F.col("toks"))).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    return unigrams, bigrams


def score_documents(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document ``(doc_id, n_bigrams, avg_logprob, ppl_proxy)`` under
    the add-k-smoothed bigram model. Documents with fewer than two tokens
    carry NULL scores (no bigram evidence either way). ``tokens_col``
    reuses a pre-tokenized array column (see ``train_bigram_lm``)."""
    if k <= 0:
        raise ValueError("smoothing k must be positive")
    v = unigrams.agg(F.count("*").alias("__v"))
    tk = F.col(tokens_col) if tokens_col else _doc_tokens(text_col)
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_doc_bigrams(tk)).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.withColumnRenamed("w", "w1"), "w1", "left")
        .join(F.broadcast(v), F.lit(True))
        .select(
            "doc_id",
            (
                F.log(F.coalesce("c2", F.lit(0)) + F.lit(k))
                - F.log(F.coalesce("c1", F.lit(0)) + F.lit(k) * F.col("__v"))
            ).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.avg("lp").alias("avg_logprob"),
        )
        .withColumn("ppl_proxy", F.exp(-F.col("avg_logprob")))
    )
    # keep every input document: bigram-less docs surface with NULL score
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .withColumn(
            "n_bigrams", F.coalesce("n_bigrams", F.lit(0)).cast("int")
        )
    )
