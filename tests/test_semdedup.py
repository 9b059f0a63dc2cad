"""SemDeDup clustered semantic dedup: exact parity with a pure-Python
reference, the greedy-superset keep-policy property, trained-centroid
production path, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.similarity import (
    BLOCK_CENTROIDS,
    SEMDEDUP_THRESHOLD,
    _vectors,
    semantic_dedup,
    train_ivf_centroids,
)

SF = "/root/testdata/sf0.01"


def _seed_cents(vecs):
    from ts_etl_spark.operators.similarity import norm

    return vecs.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + BLOCK_CENTROIDS)
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )


def _python_reference(vecs_rows, cent_rows, threshold):
    """From-scratch numpy mirror of the dominated-by-smaller-id policy."""
    V = {r.vec_id: np.array(r.v) for r in vecs_rows}
    C = {r.c_id: np.array(r.cv) for r in cent_rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cell = {}
    for vid, v in V.items():
        sims = sorted(
            ((round(cos(v, cv), 6), -cid) for cid, cv in C.items()),
            reverse=True,
        )
        cell[vid] = -sims[0][1]
    drops = {}
    for vid in V:
        best = None
        for other in V:
            if other >= vid or cell[other] != cell[vid]:
                continue
            c = round(cos(V[vid], V[other]), 6)
            if c >= threshold and (best is None or (c, -other) > (best[1], -best[0])):
                best = (other, c)
        if best:
            drops[vid] = best
    return cell, drops


def test_semantic_dedup_matches_python_reference(spark):
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        got = semantic_dedup(vecs, cents, SEMDEDUP_THRESHOLD).collect()
        cell_ref, drops_ref = _python_reference(
            vecs.collect(), cents.collect(), SEMDEDUP_THRESHOLD
        )
        assert len(got) == len(cell_ref)  # provenance: every vector, once
        n_drop = 0
        for r in got:
            assert r.cell == cell_ref[r.vec_id], r.vec_id
            if r.vec_id in drops_ref:
                n_drop += 1
                assert not r.kept
                assert (r.dup_of, round(r.dup_cosine, 6)) == drops_ref[r.vec_id]
            else:
                assert r.kept and r.dup_of is None and r.dup_cosine is None
        assert 0 < n_drop < len(cell_ref)
    finally:
        vecs.unpersist()


def test_drop_set_is_superset_of_greedy_keep_first(spark):
    """The documented policy relation: sequential greedy keep-first-scan
    (drop iff close to an already-KEPT smaller id) drops a SUBSET of the
    dominated-by-smaller-id set."""
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        got = {r.vec_id: r for r in semantic_dedup(vecs, cents).collect()}
        cell_ref, _ = _python_reference(
            vecs.collect(), cents.collect(), SEMDEDUP_THRESHOLD
        )
        V = {r.vec_id: np.array(r.v) for r in vecs.collect()}

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        greedy_dropped = set()
        kept_by_cell: dict = {}
        for vid in sorted(V):
            ks = kept_by_cell.setdefault(cell_ref[vid], [])
            if any(
                round(cos(V[vid], V[k]), 6) >= SEMDEDUP_THRESHOLD for k in ks
            ):
                greedy_dropped.add(vid)
            else:
                ks.append(vid)
        dominated_dropped = {vid for vid, r in got.items() if not r.kept}
        assert greedy_dropped <= dominated_dropped
        assert greedy_dropped  # non-vacuous at this SF
    finally:
        vecs.unpersist()


def test_trained_centroids_production_path(spark):
    """semantic_dedup over k-means-trained centroids (the production
    quantizer): full provenance, deterministic across invocations."""
    vecs = _vectors(spark, SF).persist()
    try:
        cents = train_ivf_centroids(vecs, k=8, seed=7, max_iter=3)
        out1 = semantic_dedup(vecs, cents).collect()
        out2 = semantic_dedup(vecs, cents).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert len(out1) == vecs.count()
        kept = sum(1 for r in out1 if r.kept)
        assert 0 < kept <= len(out1)
        # dropped rows always carry their evidence
        for r in out1:
            if not r.kept:
                assert r.dup_of is not None and r.dup_cosine >= SEMDEDUP_THRESHOLD
    finally:
        vecs.unpersist()


def test_plan_shape_broadcast_assign_no_cartesian(spark):
    """Centroid assignment must broadcast (vector table unshuffled before
    assignment) and the in-cell self-join must not degenerate to a
    cartesian product."""
    vecs = _vectors(spark, SF)
    cents = _seed_cents(vecs)
    plan = (
        semantic_dedup(vecs, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_threshold_one_drops_nothing(spark):
    """cosine is rounded to 6 decimals, so a threshold just above 1 keeps
    every vector (identical-vector corpora aside)."""
    vecs = _vectors(spark, SF)
    cents = _seed_cents(vecs)
    out = semantic_dedup(vecs, cents, threshold=1.000001)
    assert out.filter(~F.col("kept")).count() == 0
