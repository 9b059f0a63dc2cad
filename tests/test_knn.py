"""k-NN graph (`knn_graph`) over IVF cell blocking: exact parity with a
pure-Python mirror on the sf0.01 corpus, rank contiguity, tie rule,
singleton-cell emptiness, k validation, and subplan-injection equivalence
(the shared `cell_edges` frame must not change results)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.similarity import (
    BLOCK_CENTROIDS,
    KNN_K,
    _vectors,
    cell_edges,
    ivf_assign,
    knn_graph,
    norm,
    semantic_dedup,
)

SF = "/root/testdata/sf0.01"


def _seed_cents(vecs):
    return vecs.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + BLOCK_CENTROIDS)
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )


def _frame(spark, rows, id_col, vec_col, nrm_col):
    """(id, list[float]) rows -> (id_col, vec_col, nrm_col) frame with the
    norm computed by the operator's own `norm` expression."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"{id_col} BIGINT, {vec_col} ARRAY<DOUBLE>",
    )
    return df.select(id_col, vec_col, norm(F.col(vec_col)).alias(nrm_col))


def _python_knn(vecs_rows, cent_rows, k):
    """From-scratch numpy mirror: 1-assign cells (rounded csim, tie to the
    smaller centroid id), directed in-cell edges, per-src top-k ordered by
    (rounded cosine desc, dst asc)."""
    V = {r.vec_id: np.array(r.v) for r in vecs_rows}
    C = {r.c_id: np.array(r.cv) for r in cent_rows}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    cell = {}
    for vid, v in V.items():
        best = min((-cos(v, cv), cid) for cid, cv in C.items())
        cell[vid] = best[1]
    out = {}
    for src in V:
        nbrs = sorted(
            (-cos(V[src], V[dst]), dst)
            for dst in V
            if dst != src and cell[dst] == cell[src]
        )
        out[src] = [
            (dst, -negc, rank)
            for rank, (negc, dst) in enumerate(nbrs[:k], start=1)
        ]
    return out


def test_knn_matches_python_reference(spark):
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        got = knn_graph(vecs, cents, KNN_K).collect()
        ref = _python_knn(vecs.collect(), cents.collect(), KNN_K)
        got_by_src: dict = {}
        for r in got:
            got_by_src.setdefault(r.vec_id, []).append(
                (r.neighbor_id, round(r.cosine, 6), r.rank)
            )
        for src in got_by_src:
            got_by_src[src].sort(key=lambda t: t[2])
        assert got_by_src == {s: n for s, n in ref.items() if n}
    finally:
        vecs.unpersist()


def test_rank_contiguity_and_bounds(spark):
    """Ranks per source are exactly 1..min(k, cell_size-1) with no gaps."""
    vecs = _vectors(spark, SF)
    cents = _seed_cents(vecs)
    rows = knn_graph(vecs, cents, KNN_K).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.vec_id, []).append(r.rank)
    assert by_src, "corpus yields a non-empty graph"
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= KNN_K


def test_k_must_be_positive(spark):
    vecs = _vectors(spark, SF)
    cents = _seed_cents(vecs)
    with pytest.raises(ValueError, match="k must be >= 1"):
        knn_graph(vecs, cents, 0)


def test_singleton_cell_emits_nothing(spark):
    """A vector alone in its cell yields no rows; cohabitants still do."""
    cents = _frame(spark, [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "c_id", "cv", "cn")
    vecs = _frame(
        spark,
        [
            (10, [1.0, 0.1]),
            (11, [1.0, -0.1]),
            (12, [0.9, 0.2]),
            (13, [-1.0, 0.05]),  # alone in cell 1
        ],
        "vec_id",
        "v",
        "nrm",
    )
    rows = knn_graph(vecs, cents, k=5).collect()
    srcs = {r.vec_id for r in rows}
    assert srcs == {10, 11, 12}
    assert all(r.neighbor_id != 13 for r in rows)


def test_tie_breaks_to_smaller_neighbor_id(spark):
    """Equal rounded cosine -> the smaller neighbor id takes the lower
    rank (mirrors the oracle's ORDER BY c DESC, dst)."""
    cents = _frame(spark, [(0, [1.0, 0.0])], "c_id", "cv", "cn")
    vecs = _frame(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 1.0]),   # cos(src=0) = 1/sqrt(2)
            (2, [1.0, -1.0]),  # cos(src=0) = 1/sqrt(2) — exact tie
        ],
        "vec_id",
        "v",
        "nrm",
    )
    rows = {
        (r.vec_id, r.rank): r.neighbor_id
        for r in knn_graph(vecs, cents, k=2).collect()
    }
    assert rows[(0, 1)] == 1 and rows[(0, 2)] == 2


def test_injected_edges_equivalence(spark):
    """knn_graph and semantic_dedup over an injected shared
    assigned/cell_edges frame return exactly the self-built results — the
    registered entry's subplan sharing cannot change answers."""
    vecs = _vectors(spark, SF).persist()
    try:
        cents = _seed_cents(vecs)
        assigned = ivf_assign(vecs, cents, n_assign=1).persist()
        edges = cell_edges(assigned).persist()
        try:
            self_knn = sorted(map(tuple, knn_graph(vecs, cents, KNN_K).collect()))
            inj_knn = sorted(
                map(tuple, knn_graph(vecs, cents, KNN_K, edges=edges).collect())
            )
            assert self_knn == inj_knn
            self_sem = sorted(map(tuple, semantic_dedup(vecs, cents).collect()))
            inj_sem = sorted(
                map(
                    tuple,
                    semantic_dedup(
                        vecs, cents, assigned=assigned, edges=edges
                    ).collect(),
                )
            )
            assert self_sem == inj_sem
        finally:
            edges.unpersist()
            assigned.unpersist()
    finally:
        vecs.unpersist()
