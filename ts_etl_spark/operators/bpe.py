"""Distributed BPE tokenizer learning: the merge-table trainer a data
pipeline runs before token counting means anything.

Classic byte-pair encoding (Sennrich et al. 2016) learns merges from the
WORD-FREQUENCY DICTIONARY, not the raw corpus: after one corpus pass
(pre-tokenize + groupBy word), every iteration touches only the word-type
table, whose size is Zipf-bounded — millions of types for a 100 TB
corpus, not trillions of tokens. That asymmetry is the whole scale
design:

1. **one corpus pass**: regex pre-tokenization + ``groupBy(word)`` count
   (partial-aggregated; the only stage that sees every byte);
2. **per merge iteration** over the cached word table: adjacent-pair
   counts via a ``zip_with``-of-slices explode (each lambda touches only
   its arguments — the interpreted-HOF quadratic re-eval trap engineered
   around in textops), one small aggregate, and ONE ROW to the driver
   (the argmax pair — the same scalar-only loop traffic as
   ``dedup_components``' Pregel rounds);
3. **merge application**: a left-to-right greedy fold (``F.aggregate``)
   rewrites each word's symbol array — a narrow projection, no shuffle.

Tokenizer trainers conventionally run on a corpus SAMPLE (the merge
table converges long before the corpus is exhausted); pass
``sample_fraction`` to make that explicit at scale.

Encoding with a learned table applies merges in priority order per word —
an inherently sequential inner loop, so ``bpe_encode`` runs it in an
Arrow-batched pandas closure (by-value pickled; workers need no
importable package), with the merge list broadcast by capture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: pre-tokenization: word = letter run or digit run; everything else is a
#: single-character symbol of its own (kept simple and engine-portable)
WORD_PAT = r"[a-z]+|[0-9]+"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", sample_fraction: float | None = None
) -> DataFrame:
    """(word, freq) over the corpus — the single full pass. Sampling is
    seeded (deterministic re-runs)."""
    if sample_fraction is not None:
        docs = docs.sample(fraction=sample_fraction, seed=13)
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PAT), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_adjacent(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b via an
    array fold — matches the reference BPE semantics including runs
    ("aaa" + (a,a) -> [aa, a])."""
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _adjacent_pairs(syms: Column) -> Column:
    """array of (l, r) structs for adjacent symbol pairs."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 64,
    min_freq: int = 2,
    text_col: str = "text",
    sample_fraction: float | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns them in priority
    order. Deterministic: ties on pair count break lexicographically."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    # localCheckpoint (not persist) ON PURPOSE: each iteration stacks
    # another merge-fold expression on the word table, and with plain
    # caching the LOGICAL plan still nests — Catalyst re-analysis grows
    # superlinearly and a 32-merge run stalls for minutes on a 30-type
    # vocabulary. Eager local checkpointing truncates the lineage each
    # round so every iteration optimizes a constant-depth plan. (Not
    # fault-tolerant — an executor loss restarts the training run — which
    # is the standard trade for iterative refinement loops.)
    #
    # DataFrame.unpersist is a no-op on a checkpointed frame (its blocks
    # live on the materialized RDD, not in the SQL cache manager), so each
    # round's blocks are released explicitly via the context's
    # persistent-RDD map — without this a long-lived session accumulates
    # one word-table copy per merge learned.
    jsc = docs.sparkSession.sparkContext._jsc

    def _ids() -> set:
        return set(jsc.getPersistentRDDs().keySet().toArray())

    def _release(ids: set) -> None:
        m = jsc.getPersistentRDDs()
        for rid in ids:
            if m.containsKey(rid):
                m.get(rid).unpersist()

    def _ckpt(df: DataFrame) -> tuple[DataFrame, set]:
        prev = _ids()
        out = df.localCheckpoint(eager=True)
        return out, _ids() - prev

    words, blocks = _ckpt(
        word_frequencies(docs, text_col, sample_fraction)
        .filter(F.length("word") >= 2)
        .select(F.split("word", "").alias("syms"), "freq")
    )
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            best = (
                words.select(
                    F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                    "freq",
                )
                .groupBy("p")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.col("p.l"), F.col("p.r"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_freq:
                break
            a, b = best[0]["p"]["l"], best[0]["p"]["r"]
            merges.append((a, b))
            nxt, nxt_blocks = _ckpt(
                words.select(
                    _merge_adjacent(F.col("syms"), a, b).alias("syms"), "freq"
                )
            )
            # the previous table is never touched again — release its blocks
            _release(blocks)
            words, blocks = nxt, nxt_blocks
    finally:
        _release(blocks)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, tokens) per document under the learned merge table —
    Arrow-batched; the merge list ships by closure capture."""
    import re as _re

    pat = _re.compile(WORD_PAT)
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, n_tokens int, tokens array<string>"

    def _encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
            if not ranked:
                break
            _, i = min(ranked)
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        return syms

    def _batches(it):
        import pandas as pd

        for pdf in it:
            ids, counts, toks = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                tokens: list[str] = []
                for w in pat.findall(str(text).lower()):
                    tokens.extend(_encode_word(w))
                ids.append(doc_id)
                counts.append(len(tokens))
                toks.append(tokens)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_tokens": pd.Series(counts, dtype="int32"),
                    "tokens": pd.Series(toks, dtype="object"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, out_schema)
