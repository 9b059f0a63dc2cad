"""Product quantization (round 13): encode/ADC/re-rank properties.

The driver gate (the ``q_id = -2`` row of ``embed_ann_ivf``) asserts the
bounded recall/error properties on the real embeddings; these tests pin
the ALGEBRAIC identities that make those bounds meaningful:

- a codebook containing every corpus subvector encodes LOSSLESSLY
  (qerr = 0) and makes the ADC score equal the exact dot — so the whole
  approximate path degrades to exact retrieval when quantization is
  perfect (any bug in slicing, LUT construction, or code indexing
  breaks this equality somewhere);
- with a shortlist covering the whole corpus, the exact re-rank makes
  ``pq_topk`` equal ``brute_topk`` even under a LOSSY codebook (the
  re-rank really is exact);
- ``qerr`` from the encode's argmin pass equals the reconstruction
  error computed independently;
- training is deterministic under a fixed seed.
"""

import math

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.similarity import (
    brute_topk,
    ivf_assign,
    ivf_pq_topk,
    norm,
    pq_encode,
    pq_topk,
    pq_train,
    _pq_candidates,
)

D = 8  # dims; M=4 subspaces of 2


def _vec_frame(spark, rows):
    df = spark.createDataFrame(rows, "vec_id LONG, v ARRAY<DOUBLE>")
    return df.select("vec_id", "v", norm(F.col("v")).alias("nrm"))


def _rows(n, seed=3):
    import random

    rng = random.Random(seed)
    return [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(D)])
        for i in range(n)
    ]


def _exact_codebook(spark, rows, m):
    """A codebook whose entries are EXACTLY the corpus subvectors (plus
    index-shifted duplicates to exercise tie-breaks): encoding against
    it must be lossless."""
    dsub = D // m
    ents = []
    for j in range(m):
        seen = []
        for _, v in rows:
            sub = [round(x, 10) for x in v[j * dsub : (j + 1) * dsub]]
            if sub not in seen:
                seen.append(sub)
        for c, sub in enumerate(seen):
            ents.append((j, c, sub))
    return spark.createDataFrame(ents, "j INT, code INT, cent ARRAY<DOUBLE>")


def test_lossless_codebook_gives_zero_qerr_and_exact_adc(spark):
    rows = _rows(30)
    vecs = _vec_frame(spark, rows)
    m = 4
    cb = _exact_codebook(spark, rows, m)
    enc = pq_encode(vecs, cb, m=m)
    got = enc.collect()
    assert len(got) == len(rows)
    assert all(len(r["codes"]) == m for r in got)
    assert all(abs(r["qerr"]) < 1e-18 for r in got), "lossless => qerr 0"
    # ADC over a lossless codebook == the exact cosine for EVERY pair
    q = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cand = _pq_candidates(vecs, enc, cb, q, shortlist=len(rows)).collect()
    assert cand
    for r in cand:
        assert r["adc"] == pytest.approx(r["cosine"], abs=1e-9)


def test_full_shortlist_rerank_equals_brute_force_even_lossy(spark):
    rows = _rows(40, seed=9)
    vecs = _vec_frame(spark, rows)
    q = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cb = pq_train(vecs, m=4, k=4, max_iter=5)  # deliberately coarse
    enc = pq_encode(vecs, cb, m=4)
    got = sorted(
        map(
            tuple,
            pq_topk(vecs, enc, cb, q, top_k=5, shortlist=len(rows)).collect(),
        )
    )
    want = sorted(map(tuple, brute_topk(vecs, q, top_k=5).collect()))
    assert got == want and got


def test_qerr_equals_independent_reconstruction_error(spark):
    rows = _rows(25, seed=5)
    vecs = _vec_frame(spark, rows)
    m, dsub = 4, D // 4
    cb = pq_train(vecs, m=m, k=3, max_iter=5)
    ents = {(r["j"], r["code"]): list(r["cent"]) for r in cb.collect()}
    enc = {r["vec_id"]: (list(r["codes"]), r["qerr"])
           for r in pq_encode(vecs, cb, m=m).collect()}
    for vid, v in rows:
        codes, qerr = enc[vid]
        recon = []
        for j in range(m):
            recon.extend(ents[(j, codes[j])])
        err = sum((a - b) ** 2 for a, b in zip(v, recon))
        assert math.isclose(qerr, err, rel_tol=1e-9, abs_tol=1e-12)
        # and the code really is the argmin for its subspace
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            dists = {
                c: sum((a - b) ** 2 for a, b in zip(sub, cent))
                for (jj, c), cent in ents.items()
                if jj == j
            }
            best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
            assert math.isclose(
                dists[codes[j]], best[1], rel_tol=1e-9, abs_tol=1e-12
            )


def test_pq_encode_bit_deterministic_across_partitionings(spark):
    """qerr must be BYTE-identical across physical plans (review
    finding, round 15): the serving index's crash ladder re-appends a
    replayed batch and relies on the readers' DISTINCT to collapse the
    whole-row duplicates — an F.sum over the per-subspace d2 summed in
    shuffle-merge order could differ in the last ulp between attempts,
    leaving two rows per vector that double-rank in the ADC shortlist.
    The encode now folds d2 in ascending-j order from one sorted
    collect, so any partitioning yields the same bits."""
    rows = _rows(60, seed=8)
    cb = pq_train(_vec_frame(spark, rows), m=4, k=4, max_iter=5)
    outs = []
    for parts in (1, 7, 32):
        vecs = _vec_frame(spark, rows).repartition(parts)
        outs.append(
            sorted(
                (r["vec_id"], tuple(r["codes"]), r["qerr"])
                for r in pq_encode(vecs, cb, m=4).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]  # exact, including qerr bits


def test_ivf_pq_degrades_to_brute_force_and_respects_routing(spark):
    """The composed IVF-PQ: with EVERY cell probed and a full-corpus
    shortlist it must equal brute_topk exactly (the approximation
    lives in the two knobs, never the plumbing), and with restricted
    probes every returned neighbor must belong to one of the query's
    probed cells (routing soundness)."""
    rows = _rows(40, seed=11)
    vecs = _vec_frame(spark, rows)
    q = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # deterministic seed centroids (the registered-entry pattern)
    cents = vecs.filter(F.col("vec_id").between(5, 8)).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cb = pq_train(vecs, m=4, k=4, max_iter=5)
    enc = pq_encode(vecs, cb, m=4)
    full = sorted(
        map(
            tuple,
            ivf_pq_topk(
                vecs, enc, cb, cents, q,
                nprobe=4, top_k=5, shortlist=len(rows),
            ).collect(),
        )
    )
    want = sorted(map(tuple, brute_topk(vecs, q, top_k=5).collect()))
    assert full == want and full
    # restricted routing: results only from probed cells
    routed = ivf_pq_topk(
        vecs, enc, cb, cents, q, nprobe=2, top_k=5, shortlist=len(rows)
    )
    # the routing must prune BEFORE any per-query expansion: the routed
    # plan's only nested-loop joins are ivf_assign's bounded
    # corpus-x-centroids crosses (unconditioned); the |corpus|x|queries|
    # expansion join — recognizable by its NOT (vec_id = q_id)
    # condition — must not appear (only the unrouted pq_topk uses it,
    # by design: queries are broadcast)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    nlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert nlj, "ivf_assign's centroid crosses should still be NLJs"
    assert all("vec_id" not in l and "q_id" not in l for l in nlj), (
        "the per-query expansion ran as an all-pairs NLJ despite routing"
    )
    got = routed.collect()
    assigned = {
        r.vec_id: r.cell for r in ivf_assign(vecs, cents, 1).collect()
    }
    probed = {}
    qv = q.select(
        F.col("q_id").alias("vec_id"), F.col("qv").alias("v"),
        F.col("qn").alias("nrm"),
    )
    for r in ivf_assign(qv, cents, 2).collect():
        probed.setdefault(r.vec_id, set()).add(r.cell)
    assert got
    for r in got:
        assert assigned[r.neighbor_id] in probed[r.q_id], (
            "neighbor outside the probed cells"
        )


def test_pq_handles_null_vectors_and_empty_frames(spark):
    """Review finding (round 13): a leading NULL embedding (or an
    all-null/empty frame) must not TypeError on the driver-side width
    probe — pq_train trains on the non-null rows, pq_encode encodes
    them and returns empty for none."""
    rows = _rows(12, seed=2)
    with_null = _vec_frame(spark, rows).unionByName(
        spark.createDataFrame(
            [(999, None, None)], "vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE"
        )
    )
    # NULL row sorted first exercises the old first()-row crash
    leading_null = with_null.orderBy(F.col("v").isNotNull())
    cb = pq_train(leading_null, m=4, k=3, max_iter=5)
    enc = pq_encode(leading_null, cb, m=4)
    assert enc.count() == len(rows)  # the null row is excluded
    empty = spark.createDataFrame([], "vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE")
    assert pq_encode(empty, cb, m=4).count() == 0
    with pytest.raises(ValueError, match="non-null"):
        pq_train(empty, m=4, k=3)


def test_pq_train_deterministic_and_refuses_bad_dims(spark):
    rows = _rows(20, seed=1)
    vecs = _vec_frame(spark, rows)
    a = sorted(map(tuple, pq_train(vecs, m=4, k=3, max_iter=5).collect()))
    b = sorted(map(tuple, pq_train(vecs, m=4, k=3, max_iter=5).collect()))
    assert a == b
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(vecs, m=3)


def test_pq_train_partition_independent_and_mllib_fallback(spark, monkeypatch):
    """Round 14: the driver-local Lloyd path sorts the collected
    training rows into canonical order first, so the codebook is a pure
    function of the training SET — repartitioning the input must not
    change one double. Above PQ_DRIVER_TRAIN_MAX the MLlib path still
    runs (forced here by shrinking the threshold) and returns the same
    (j, code, cent) shape under the shared contract."""
    import ts_etl_spark.operators.similarity as S

    rows = _rows(60, seed=21)
    vecs = _vec_frame(spark, rows)
    a = sorted(map(tuple, pq_train(vecs, m=4, k=5, max_iter=5).collect()))
    b = sorted(
        map(
            tuple,
            pq_train(vecs.repartition(7), m=4, k=5, max_iter=5).collect(),
        )
    )
    assert a == b and len(a) == 4 * 5
    monkeypatch.setattr(S, "PQ_DRIVER_TRAIN_MAX", 0)
    ml = S.pq_train(vecs, m=4, k=5, max_iter=5).collect()
    assert {(r["j"], r["code"]) for r in ml} == {
        (j, c) for j in range(4) for c in range(5)
    }
    assert all(len(r["cent"]) == 2 for r in ml)


def test_ivfpq_gate_row_passes_on_real_data_and_catches_unrouted(
    spark, monkeypatch
):
    """Round 14: the q_id = -3 arm's evidence on the real sf0.001
    embeddings — all booleans TRUE with the registered entry's own seed
    quantizer — and FALSIFIABILITY of the routing-soundness boolean: a
    composed path that ignores its routing (monkeypatched to return the
    unrouted brute-force ranking) must flip ivfpq_sound_ok to False,
    because brute-force neighbors include vectors outside the probed
    cells."""
    import ts_etl_spark.operators.similarity as S

    sfd = "/root/testdata/sf0.001"
    vecs = S._vectors(spark, sfd).persist()
    try:
        cents = vecs.filter(
            (F.col("vec_id") >= 100)
            & (F.col("vec_id") < 100 + S.IVF_CENTROIDS)
        ).select(
            F.col("vec_id").alias("c_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        q = vecs.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        seed_topk = S.ivf_topk(vecs, cents, q, nprobe=S.IVF_NPROBE)
        nn = vecs.filter(F.col("v").isNotNull())
        cb = S.pq_train(nn)
        enc = S.pq_encode(nn, cb).persist()
        try:
            nq, k_meas, r_ok, s_ok, e_ok = S._ivfpq_gate_row(
                vecs, q, cents, seed_topk, cb, enc
            )
            assert (nq, k_meas) == (S.N_QUERIES, S.TOP_K)
            assert r_ok and s_ok and e_ok
            # falsify soundness: an "ivf_pq_topk" that never routes
            monkeypatch.setattr(
                S,
                "ivf_pq_topk",
                lambda vecs, enc, cb, cents, q, **kw: S.brute_topk(vecs, q),
            )
            _, _, _, s_bad, _ = S._ivfpq_gate_row(
                vecs, q, cents, seed_topk, cb, enc
            )
            assert not s_bad, "unrouted results must trip soundness"
        finally:
            enc.unpersist()
    finally:
        vecs.unpersist()
