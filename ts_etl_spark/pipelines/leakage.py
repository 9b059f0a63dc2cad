"""Train/eval split hygiene: the leakage audit a split must pass before
it ships. A test document that is an exact or near duplicate of a train
document lets the model see the eval set's paraphrases at train time and
silently inflates every metric computed on it — the INTERNAL counterpart
of the external-benchmark ``text_contamination`` check.

Two layers, mirroring the dedup stack's exact/near split:

- exact: canonical-fingerprint equality (trim/case/whitespace-insensitive
  — ``operators.dedup.canonical_fingerprint``) across different splits;
- near: MinHash-LSH candidate pairs verified by exact shingle Jaccard ≥
  threshold (``operators.dedup.minhash_lsh_pairs``) across different
  splits, minus pairs the exact layer already reported.

Scale shape: the exact layer is one skinny fingerprint self-join (linear
in duplicate-group mass); the near layer inherits the banded-LSH plan
(never all-pairs); split labels join on doc_id as skinny (id, split)
rows. Nothing here scans text more than the shared shingle projection.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    canonical_fingerprint,
    minhash_lsh_pairs,
)
from ts_etl_spark.pipelines.sampling import assign_splits


def _exact_pair_edges(docs: DataFrame) -> DataFrame:
    """(id_a, id_b) pairs with equal canonical fingerprints, id_a < id_b
    — the exact-duplicate edge list both the audit and the component
    splitter build on (one definition, not two drifting copies)."""
    fp = docs.select("doc_id", canonical_fingerprint().alias("fp"))
    fa = fp.select(F.col("doc_id").alias("id_a"), "fp")
    fb = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    return fa.join(
        fb, (F.col("fp") == F.col("fp_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")


def _exact_star_edges(docs: DataFrame) -> DataFrame:
    """(id_a, id_b) STAR edges per exact-duplicate group: the group's min
    doc_id is the hub, one edge per other member — g−1 edges for a
    g-member group instead of the pair join's g·(g−1)/2, with IDENTICAL
    connected components (every member touches the hub). This is the
    splitter's edge construction: a raw pre-dedup corpus can hold a
    multi-million-copy boilerplate group, and the splitter only needs
    connectivity, never the pair list. One groupBy + one fingerprint
    join — linear in corpus size."""
    fp = docs.select("doc_id", canonical_fingerprint().alias("fp"))
    hubs = fp.groupBy("fp").agg(F.min("doc_id").alias("id_a"))
    return (
        fp.join(hubs, "fp")
        .filter(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )


def split_leakage_audit(
    docs: DataFrame,
    weights: Mapping[str, float] | None = None,
    key_cols: Sequence[str] = ("doc_id",),
    seed: str = "split",
    split_col: str | None = None,
    threshold: float = JACCARD_THRESHOLD,
    persisted: list[DataFrame] | None = None,
    near_pairs: DataFrame | None = None,
) -> DataFrame:
    """Document pairs that leak across split boundaries.

    ``docs`` is a (doc_id, text, ...) frame. Either name an existing
    assignment column via ``split_col``, or pass ``weights`` (+
    ``key_cols``/``seed``) to assign splits here with the deterministic
    ``assign_splits`` — the audit then checks exactly the split the
    trainer would materialize.

    Returns ``(kind, id_a, id_b, split_a, split_b, jaccard)`` with
    ``id_a < id_b``:

    - ``kind='exact'`` — canonical fingerprints equal; ``jaccard`` NULL
      (not computed — fingerprint equality is the stronger statement).
    - ``kind='near'`` — shingle Jaccard ≥ ``threshold``, excluding pairs
      already reported exact.

    An empty result is the PASS condition. A non-empty result names the
    offending pairs; the standard remediations are re-splitting on a
    near-dup-component key (all members of a duplicate component share a
    split) or dropping the eval-side member.

    Output-size contract: the exact layer is pair-grained BY DESIGN
    (pairs are what an auditor reads), so a not-yet-deduped corpus with
    a g-copy boilerplate group can emit O(g²) exact rows. When you only
    need the PASS boolean, use ``split_edge_violations`` (emptiness-
    equivalent, g−1 exact edges per group); when you need the pair
    report on a raw corpus, run exact dedup first — the pipeline order
    ``curate_documents`` implements.

    ``persisted`` receives the internal shingle-set cache (the
    ``minhash_lsh_pairs`` contract) for caller-side release.

    ``near_pairs`` (optional) supplies a precomputed
    ``minhash_lsh_pairs``-shaped frame ``(id_a, id_b, jaccard)`` so a
    caller auditing several splits of the same corpus (or also building
    ``component_safe_splits``) pays the LSH pass once."""
    if (split_col is None) == (weights is None):
        raise ValueError("pass exactly one of split_col or weights")
    if split_col is None:
        assigned = assign_splits(docs, weights, list(key_cols), seed)
        split_col = "split"
    else:
        if split_col not in docs.columns:
            raise ValueError(f"split_col {split_col!r} not in docs")
        assigned = docs
    labels = assigned.select("doc_id", F.col(split_col).alias("__sp"))
    la = labels.select(F.col("doc_id").alias("id_a"), F.col("__sp").alias("split_a"))
    lb = labels.select(F.col("doc_id").alias("id_b"), F.col("__sp").alias("split_b"))

    # persisted: feeds both the exact arm and the near arm's anti-join —
    # without the cache the fingerprint self-join (O(g²) per duplicate
    # group) runs once per consumer
    exact_pairs = (
        _exact_pair_edges(docs)
        .join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .persist()
    )
    if persisted is not None:
        persisted.append(exact_pairs)
    exact_out = exact_pairs.select(
        F.lit("exact").alias("kind"),
        "id_a",
        "id_b",
        "split_a",
        "split_b",
        F.lit(None).cast("double").alias("jaccard"),
    )
    if near_pairs is None:
        near_pairs = minhash_lsh_pairs(docs.select("doc_id", "text"), persisted)
    near = (
        near_pairs
        .filter(F.col("jaccard") >= threshold)
        .join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .join(
            exact_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        )
        .select(
            F.lit("near").alias("kind"),
            "id_a",
            "id_b",
            "split_a",
            "split_b",
            "jaccard",
        )
    )
    return exact_out.unionByName(near)


def split_edge_violations(
    docs: DataFrame,
    labels: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    near_pairs: DataFrame | None = None,
) -> DataFrame:
    """EDGES (exact star + verified near) whose endpoints land in
    different splits: ``(kind, id_a, id_b, split_a, split_b)``.
    ``labels`` is a (doc_id, split) frame.

    EMPTINESS of this frame is EQUIVALENT to emptiness of the full
    ``split_leakage_audit`` whenever splits are constant on the
    exact/near connected components (the ``component_safe_splits``
    output): an audit 'exact' pair (a, b) crossing splits means a
    fingerprint group spans two splits, so one of its STAR edges (every
    member ↔ the group hub) crosses too; an audit 'near' pair IS an
    edge. The converse is immediate (every edge the audit's layers
    would also report). This is therefore the scale-honest way to GATE
    that a split assignment passes the audit: the audit's EXACT layer
    materializes O(g²) pairs per duplicate group — fine when pairs are
    the requested OUTPUT, a pathological blowup when a raw corpus holds
    a multi-million-copy group and all you need is the boolean — while
    the star construction here costs g−1 edges per group. The NEAR
    layer is the banded-LSH pair list either way (linear in band-bucket
    occupancy; a not-yet-deduped identical-copy mass is a clique there
    too — which is why production runs this gate AFTER exact dedup has
    collapsed such groups, the order ``curate_documents`` implements)."""
    la = labels.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    if near_pairs is None:
        near_pairs = minhash_lsh_pairs(docs.select("doc_id", "text"))
    near = near_pairs.filter(F.col("jaccard") >= threshold).select(
        F.lit("near").alias("kind"), "id_a", "id_b"
    )
    star = _exact_star_edges(docs).select(
        F.lit("exact").alias("kind"), "id_a", "id_b"
    )
    return (
        star.unionByName(near)
        .join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("kind", "id_a", "id_b", "split_a", "split_b")
    )


def component_safe_splits(
    docs: DataFrame,
    weights: Mapping[str, float],
    seed: str = "split",
    threshold: float = JACCARD_THRESHOLD,
    persisted: list[DataFrame] | None = None,
    near_pairs: DataFrame | None = None,
) -> DataFrame:
    """The remediation: assign splits on the near-dup COMPONENT, not the
    document — every member of a connected near-dup/exact-dup group lands
    in the same split, so ``split_leakage_audit`` passes by construction
    (tested). Components are the union-find closure over exact-fingerprint
    and verified near-dup edges, computed as the usual Pregel-style
    min-label iteration on the skinny edge list; the component
    representative (its min doc_id) is the split hash key, so adding
    unrelated documents never moves an existing component.

    Returns docs plus ``component`` (min doc_id of the group; own id for
    isolated docs) and ``split``. ``near_pairs`` as in
    ``split_leakage_audit`` (share one LSH pass across audit + splits)."""
    from ts_etl_spark.operators.dedup import min_label_components

    # star edges, NOT the audit's pair join: connectivity is all the
    # splitter needs, and one 10M-copy boilerplate group must cost 10M-1
    # edges, not 5·10¹³
    exact_edges = _exact_star_edges(docs)
    if near_pairs is None:
        near_pairs = minhash_lsh_pairs(docs.select("doc_id", "text"), persisted)
    near_edges = (
        near_pairs
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    edges = exact_edges.unionByName(near_edges).distinct()
    labels = min_label_components(
        edges, nodes=docs.select(F.col("doc_id").alias("node"))
    )
    if persisted is not None:
        persisted.append(labels)
    with_comp = docs.join(
        labels.select(
            F.col("node").alias("doc_id"), F.col("comp").alias("component")
        ),
        "doc_id",
    )
    return assign_splits(with_comp, weights, key_cols=["component"], seed=seed)
