"""Sequence packing: bin documents into fixed-token-budget training
sequences — the step between a curated corpus and a trainer that wants
dense, fixed-length batches (padding thrown away is wasted compute).

Bin packing is inherently sequential, so the scale design splits it:

1. **group**: a deterministic hash spreads documents over ``n_groups``
   independent packing groups (xxhash64 of doc_id — reproducible across
   retries, no RNG). Each group packs alone, so the stage parallelizes
   to ``n_groups`` tasks regardless of corpus size. By default
   ``n_groups`` is SELF-SIZING: one cheap ``count()`` bounds documents
   per group (``target_group_docs``), so the default-arg call is safe at
   any corpus size — a fixed group count would concentrate ~150M rows
   per pandas frame at 10B docs.
2. **pack within group**: first-fit-decreasing (FFD) over the group's
   documents inside one Arrow-batched ``applyInPandas`` call — the
   classic 11/9·OPT + 6/9 approximation, never on the driver. First-fit
   uses a CAPACITY-INDEXED segment tree (leftmost bin with remaining ≥
   need in O(log bins)), so a group of d documents packs in O(d log d)
   rather than the O(d · bins) linear rescan that dominates once groups
   hold millions of documents.
3. **label**: bins are ``(group, bin_idx)`` pairs — globally unique
   without any cross-group coordination.

Waste analysis at scale: FFD's waste within a group is bounded by the
approximation ratio; the only cross-group cost is that each group keeps
its own partially-filled tail bins. Expected waste from group-splitting
is O(n_groups · max_tokens) total — negligible when each group packs
≫ 1 bin, which the docs-per-group floor guarantees at any real corpus
size. The VERIFIABLE bound (tested, and driver-gated in
``pipelines.trainer_prep``) is the first-fit half-full theorem — at most
one non-oversize bin per group is ≤ half full, so
``bins ≤ 2·ceil(total_tokens/cap) + n_groups`` — because 11/9·OPT is a
theorem against OPT, which is unobservable, and substituting the token
lower bound for OPT is unsound (OPT approaches 2× the volume bound when
documents are just over cap/2).

Oversized documents (n_tokens > max_tokens) become singleton bins
flagged ``oversize`` — the caller decides whether to truncate or drop;
silently splitting a document would change training semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "doc_id long, n_tokens int, pack_group int, bin_idx int, oversize boolean"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    target_group_docs: int = 1_000_000,
) -> DataFrame:
    """Assign every document to a training bin of at most ``max_tokens``
    tokens: ``(doc_id, n_tokens, pack_group, bin_idx, oversize)`` with
    ``(pack_group, bin_idx)`` the global bin key. Deterministic (hash
    grouping + FFD with a fixed tiebreak), distributed (one shuffle to
    the packing groups, packing itself Arrow-batched per group), and
    complete (every input document appears exactly once).

    ``n_groups=None`` (the default) self-sizes from one cheap count:
    enough groups that no group expects more than ``target_group_docs``
    documents, floored at the cluster's default parallelism so small
    corpora still pack in parallel."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_groups is None:
        n_docs = docs.count()
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_groups = max(par, -(-n_docs // max(target_group_docs, 1)), 1)
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")
    cap = int(max_tokens)

    # defined as a closure ON PURPOSE: cloudpickle ships a nested function
    # by VALUE, while a module-level function is pickled by reference and
    # would require every Python worker to import ts_etl_spark — which
    # breaks when the library is driven via sys.path from another cwd
    def _pack_group(pdf):
        """FFD over one group: sort descending by token count, place each
        doc in the FIRST (lowest-index) bin it fits — found in O(log bins)
        by walking a max-capacity segment tree — or open a new bin."""
        import pandas as pd

        docs_sorted = sorted(
            zip(pdf["doc_id"], pdf["n_tokens"]), key=lambda t: (-t[1], t[0])
        )
        # segment tree over bin slots (leaf = remaining capacity, inner =
        # subtree max): first_fit descends leftmost, preserving the exact
        # first-fit-by-index semantics of a linear scan at O(log n) cost.
        size = 1
        while size < max(len(docs_sorted), 1):
            size *= 2
        tree = [-1] * (2 * size)
        n_bins = 0

        def _set(idx: int, rem: int) -> None:
            i = idx + size
            tree[i] = rem
            i //= 2
            while i:
                tree[i] = tree[2 * i] if tree[2 * i] >= tree[2 * i + 1] else tree[2 * i + 1]
                i //= 2

        def _first_fit(need: int) -> int | None:
            if tree[1] < need:
                return None
            i = 1
            while i < size:
                i = 2 * i if tree[2 * i] >= need else 2 * i + 1
            return i - size

        out = []
        for doc_id, n in docs_sorted:
            n = int(n)
            if n > cap:
                # singleton oversize bin (never co-packed)
                out.append((doc_id, n, n_bins, True))
                _set(n_bins, 0)
                n_bins += 1
                continue
            i = _first_fit(n)
            if i is not None:
                _set(i, tree[i + size] - n)
                out.append((doc_id, n, i, False))
            else:
                _set(n_bins, cap - n)
                out.append((doc_id, n, n_bins, False))
                n_bins += 1
        grp = int(pdf["__grp"].iloc[0])
        return pd.DataFrame(
            {
                "doc_id": [t[0] for t in out],
                "n_tokens": [t[1] for t in out],
                "pack_group": grp,
                "bin_idx": [t[2] for t in out],
                "oversize": [t[3] for t in out],
            }
        )

    prepared = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # NULL weight (e.g. a null-text document whose token count never
        # materialized) packs as 0 tokens — dropping the row would break
        # the every-document-exactly-once contract, and a NULL reaching
        # the pandas batch renders as NaN and crashes int()
        F.coalesce(F.col(tokens_col).cast("int"), F.lit(0)).alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
        .cast("int")
        .alias("__grp"),
    )
    return prepared.groupBy("__grp").applyInPandas(_pack_group, PACKED_SCHEMA)


def q_sequence_packing(spark, sf_dir: str) -> DataFrame:
    """Bench-facing run over the documents table: BPE-ish token counts
    (the engine's own counter) -> grouped FFD -> per-bin utilization.
    Not a ``queries()`` registry entry (the surface is consolidated to
    exactly 50); correctness is covered by tests/test_packing.py's
    invariants, so this exists for the bench supplement's round-over-round
    timing."""
    from ts_etl_spark.operators.textops import _metric_cols
    from ts_etl_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", *_metric_cols())
        .select("doc_id", F.col("n_bpe_tokens").alias("n_tokens"))
    )
    packed = pack_sequences(docs, max_tokens=2048)
    return packing_summary(packed, max_tokens=2048)


def packing_summary(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-bin utilization: ``(pack_group, bin_idx, docs, tokens, fill)``.
    One partial-agg shuffle on the bin key."""
    return packed.groupBy("pack_group", "bin_idx").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.sum("n_tokens") / F.lit(float(max_tokens))).alias("fill"),
    )
