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
2. **the merge loop runs DRIVER-LOCAL** over the collected word-type
   table (incremental pair counts: choosing a merge only recounts the
   words that contain it) — this is how production tokenizer trainers
   work, because a 32k-merge vocabulary run as Spark jobs would schedule
   ~64k jobs of driver/scheduler latency against a table that fits in
   driver memory after the one distributed pass. A cheap ``count()``
   guards the collect: past ``max_driver_types`` word types the loop
   falls back to the distributed implementation below.
3. **distributed overflow path** (``_learn_bpe_distributed``): per
   iteration, adjacent-pair counts via a ``zip_with``-of-slices explode
   (each lambda touches only its arguments — the interpreted-HOF
   quadratic re-eval trap engineered around in textops), one small
   aggregate, ONE ROW to the driver (the argmax pair), and a greedy
   left-to-right ``F.aggregate`` fold applying the merge. Both paths
   produce IDENTICAL merge tables including tiebreaks (tested).

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


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    the pure-Python twin of ``_merge_adjacent`` (same run semantics:
    "aaa" + (a,a) -> [aa, a])."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _learn_bpe_local(
    word_freqs: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Driver-local merge loop over the collected word-type table with
    INCREMENTAL pair counting: choosing a merge only recounts the words
    that contain it (indexed), so a 32k-merge vocabulary costs seconds,
    not 64k scheduled Spark jobs. Semantics identical to the distributed
    loop: pair counts are freq-weighted sums over adjacent symbol pairs
    (runs counted overlapping: "aaa" contributes (a,a) twice), argmax
    ties break lexicographically, merges apply greedily left-to-right."""
    from collections import defaultdict

    words: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs: list[int] = [int(f) for _, f in word_freqs]

    def _pair_counts(syms: list[str]) -> dict[tuple[str, str], int]:
        c: dict[tuple[str, str], int] = defaultdict(int)
        for x, y in zip(syms, syms[1:]):
            c[(x, y)] += 1
        return c

    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for p, c in _pair_counts(syms).items():
            counts[p] += c * freqs[i]
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        best, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append(best)
        a, b = best
        # `where` entries go stale (a word may no longer contain the pair
        # after earlier rewrites); recounting yields a zero delta for
        # those, so staleness is harmless — only missing entries would be
        # a bug, and rewrites always register their new pairs below.
        for i in where.pop(best, ()):  # pop: the pair is retired either way
            old = words[i]
            new = _merge_word(old, a, b)
            oldc, newc = _pair_counts(old), _pair_counts(new)
            for p in oldc.keys() | newc.keys():
                d = newc.get(p, 0) - oldc.get(p, 0)
                if d:
                    counts[p] += d * freqs[i]
                    if counts[p] <= 0:
                        counts.pop(p, None)
                if newc.get(p, 0):
                    where[p].add(i)
            words[i] = new
        counts.pop(best, None)
    return merges


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 64,
    min_freq: int = 2,
    text_col: str = "text",
    sample_fraction: float | None = None,
    max_driver_types: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns them in priority
    order. Deterministic: ties on pair count break lexicographically.

    The word-frequency pass is always distributed; the merge loop runs
    driver-local when the word-TYPE table has at most ``max_driver_types``
    rows (Zipf says it almost always does — a few million types even for
    a 100 TB corpus; at ~60 bytes/row the default caps driver memory near
    120 MB), and falls back to the distributed per-iteration loop past
    that."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    wf = word_frequencies(docs, text_col, sample_fraction).filter(
        F.length("word") >= 2
    )
    # gate AND fetch in ONE job: collect at most cap+1 rows — len <= cap
    # means we hold the complete type table (the word-frequency aggregate,
    # the only stage that sees every byte, runs once, not count-then-
    # collect twice); cap+1 rows means overflow, fall back distributed
    rows = wf.limit(max_driver_types + 1).collect()
    if len(rows) <= max_driver_types:
        return _learn_bpe_local(
            [(r["word"], r["freq"]) for r in rows], n_merges, min_freq
        )
    return _learn_bpe_distributed(wf, n_merges, min_freq)


def _learn_bpe_distributed(
    wf: DataFrame, n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Distributed overflow path for word-type tables too large to
    collect (see ``learn_bpe``): 2 Spark jobs per merge — correct at any
    scale but schedule-bound at production merge counts, hence the
    driver-local default."""
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
    # persistent-RDD map. That map is reached through the private _jsc
    # bridge, which is CLASSIC-MODE ONLY (absent under Spark Connect) and
    # version-fragile — so the access is guarded and block release
    # degrades to a no-op rather than crashing training (the leak is one
    # word-table copy per merge, bounded by the overflow path's use).
    try:
        jsc = wf.sparkSession.sparkContext._jsc
    except Exception:  # Spark Connect / bridge changes: no release path
        jsc = None

    def _ids() -> set:
        if jsc is None:
            return set()
        return set(jsc.getPersistentRDDs().keySet().toArray())

    def _release(ids: set) -> None:
        if jsc is None:
            return
        m = jsc.getPersistentRDDs()
        for rid in ids:
            if m.containsKey(rid):
                m.get(rid).unpersist()

    def _ckpt(df: DataFrame) -> tuple[DataFrame, set]:
        prev = _ids()
        out = df.localCheckpoint(eager=True)
        return out, _ids() - prev

    words, blocks = _ckpt(wf.select(F.split("word", "").alias("syms"), "freq"))
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
    Arrow-batched; the merge list ships by closure capture.

    The merge fold runs once per word TYPE, not per occurrence: an LRU
    memo (bounded at 2^20 entries, ~100 MB worst case per Python worker)
    fronts ``_encode_word``, and Zipf token frequencies make the hit rate
    overwhelming — the fold is the per-row Python hot spot, so memoizing
    types is the difference between O(occurrences) and O(types) folds per
    worker."""
    import re as _re

    pat = _re.compile(WORD_PAT)
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, n_tokens int, tokens array<string>"
    # plain dict (clear-on-full) rather than functools.lru_cache: the
    # closure must survive cloudpickle to the executors
    memo: dict[str, list[str]] = {}
    memo_cap = 1 << 20

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
                    t = memo.get(w)
                    if t is None:
                        if len(memo) >= memo_cap:
                            memo.clear()
                        t = _encode_word(w)
                        memo[w] = t
                    tokens.extend(t)
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
