"""Hashing-trick linear text classifier scoring — the model-based quality
filter stage (fastText-style) that follows the heuristic gates in a
training-data pipeline: score = sigmoid(bias + mean over token
occurrences of weight[bucket(token)]).

What this module is: the SCORING plumbing at scale — tokenize, hash every
token into a fixed feature space (the hashing trick: no vocabulary table,
collisions are part of the model), look up a per-bucket weight, average,
squash. With an externally-trained weight table the lookup is one
explode + a broadcast hash join (≤ ``n_buckets`` rows) + one partial-
aggregated per-doc groupBy; with no table the weight derives inline from
the bucket hash and the whole score is a shuffle-free projection.

Exactness contract: the linear ACTIVATION is bit-exact cross-engine (the
derived weights are multiples of 2^-31, so sums are order-independent-
exact in doubles); the sigmoid itself goes through libm exp, which is
last-ulp engine-dependent — consumers wanting exact parity compare
activations and round scores (the ``scalar_functions`` libm discipline).

What this module is NOT: a trainer. Training a real quality classifier is
a labelled-data problem that runs offline (fastText, sklearn, MLlib —
anything that emits (bucket, weight) rows); this operator consumes those
weights. The default DERIVED weights (md5 of the bucket index, mapped to
[-1, 1)) are a deterministic stand-in that exercises every part of the
scoring path and lets an external engine reproduce scores exactly — the
engine-portability discipline of ``operators/sketches.py``.

Scale shape: the explode is corpus-linear; the per-doc aggregate is one
shuffle keyed by doc_id with map-side partial aggregation; weight lookup
is either inline codegen (derived) or a broadcast join (table). Nothing
holds more than n_buckets rows beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.sketches import _hex8_fold_sql as _clf_fold_sql

#: default feature-space size; real deployments size this to the weight
#: table they trained (2^18 is fastText's default order of magnitude)
N_BUCKETS = 4096


def _hash8(prefix: str, col: Column) -> Column:
    """First 8 md5 hex chars of ``prefix || col`` as a bigint in
    [0, 2^32) — the engine-portable hash used across this repo's
    sketches (DuckDB reproduces it via the same hex fold)."""
    h = F.md5(F.concat(F.lit(prefix), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def token_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket) per token OCCURRENCE — the exploded sparse feature
    stream. Tokenization matches the LM/BPE word pattern (lowercased
    ``WORD_PAT``) so every text operator agrees on what a token is."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(WORD_PAT), 0)
        ).alias("w"),
    )
    return toks.select(
        id_col, (_hash8("clfw#", F.col("w")) % n_buckets).alias("bucket")
    )


def derived_weight(bucket: Column) -> Column:
    """Deterministic stand-in weight for ``bucket``: md5-derived uniform
    in [-1, 1). EXACT across engines AND summation orders: the value is
    an integer multiple of 2^-31 (power-of-two scale, no rounding), so a
    per-document sum of up to ~2^21 weights is exact in a double — the
    floating-point analogue of the decimal-space-sums discipline, which
    is what lets the oracle match scores bit-for-bit instead of
    tolerance-gating them."""
    return (_hash8("clfb#", bucket) / F.lit(float(1 << 32)) - 0.5) * 2.0


def _derived_parts(
    words: Column, n_buckets: int, bias: float
) -> tuple[Column, Column, Column]:
    """(n_tokens, activation, score) for the derived-weight path over a
    token ARRAY — the ONE builder behind both ``derived_score_expr`` and
    ``score_hashed_linear``'s derived branch, so the exactness contract
    (lockstep with ``score_hashed_linear_sql``) has a single Spark-side
    definition to keep true."""
    ws = F.transform(
        words, lambda w: derived_weight(_hash8("clfw#", w) % n_buckets)
    )
    n = F.size(words)
    m = F.when(n > 0, F.aggregate(ws, F.lit(0.0), lambda a, x: a + x) / n)
    act = m + F.lit(bias)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-act))
    return n, act, score


def derived_score_expr(
    text: Column | None = None,
    tokens: Column | None = None,
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
) -> Column:
    """The derived-weight quality SCORE as a single column expression
    (NULL for token-less input) — for pipelines that want the model gate
    inline in an existing projection instead of a separate frame (e.g.
    ``pipelines/curation.py``'s classifier stage). Pass ``tokens`` (an
    array column) to reuse a shared tokenization, else ``text``."""
    if (text is None) == (tokens is None):
        raise ValueError("pass exactly one of text= or tokens=")
    words = (
        tokens
        if tokens is not None
        else F.regexp_extract_all(F.lower(text), F.lit(WORD_PAT), 0)
    )
    return _derived_parts(words, n_buckets, bias)[2]


def score_hashed_linear(
    docs: DataFrame,
    weights: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
    tokens_col: str | None = None,
) -> DataFrame:
    """Every document with ``(n_tokens, score)`` where score =
    sigmoid(bias + mean of per-occurrence bucket weights); token-less
    documents surface with n_tokens = 0 and NULL activation/score (no
    evidence either way — the caller's gate decides their fate, same
    contract as the LM scorer's bigram-less documents).

    ``weights``: optional ``(bucket, weight)`` table from an external
    trainer — explode + broadcast hash join (absent buckets weigh 0, the
    hashing-trick convention for unseen features) + one partial-
    aggregated per-doc groupBy. ``None`` uses ``derived_weight`` inline
    over the token ARRAY (transform + aggregate fold): ZERO shuffles,
    zero joins — the whole score is a projection on the scan, the shape
    you want when scoring 100 TB. ``tokens_col`` reuses a pre-tokenized
    array column so a multi-operator pipeline tokenizes the corpus once
    (only the derived path — the table path re-derives buckets from the
    exploded tokens either way)."""
    if weights is None:
        words = (
            F.col(tokens_col)
            if tokens_col
            else F.regexp_extract_all(F.lower(text_col), F.lit(WORD_PAT), 0)
        )
        n, act, score = _derived_parts(words, n_buckets, bias)
        return docs.select(
            id_col,
            n.alias("n_tokens"),
            act.alias("activation"),
            score.alias("score"),
        )
    feats = token_buckets(docs, text_col, id_col, n_buckets)
    feats = feats.join(F.broadcast(weights), "bucket", "left").withColumn(
        "weight", F.coalesce("weight", F.lit(0.0))
    )
    per_doc = feats.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("weight").alias("s"),
    )
    act = F.col("s") / F.col("n_tokens") + F.lit(bias)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-act))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            act.alias("activation"),
            score.alias("score"),
        )
    )


def score_hashed_linear_sql(
    n_buckets: int = N_BUCKETS, bias: float = 0.0
) -> str:
    """DuckDB mirror of the derived-weight scoring path over a ``toks``
    CTE of ``(doc_id, t := token array)`` — the oracle side. Keep in
    lockstep with token_buckets/derived_weight."""
    bucket = (
        "(" + _clf_fold_sql("substr(md5('clfw#' || w), 1, 8)") + f") % {n_buckets}"
    )
    weight = (
        "(("
        + _clf_fold_sql(f"substr(md5('clfb#' || CAST({bucket} AS VARCHAR)), 1, 8)")
        + ") / 4294967296.0 - 0.5) * 2.0"
    )
    return f"""
        SELECT d.doc_id,
               COALESCE(s.n_tokens, 0) AS n_tokens,
               s.m + {bias} AS activation,
               1.0 / (1.0 + exp(-(s.m + {bias}))) AS score
        FROM (SELECT doc_id FROM toks) d
        LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   SUM({weight}) / COUNT(*) AS m
            FROM (SELECT doc_id, unnest(t) AS w FROM toks)
            GROUP BY doc_id
        ) s USING (doc_id)
    """
