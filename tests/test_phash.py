"""Perceptual image dedup: bit-exact driver-side reference parity,
identical/near-identical payload behavior, the banding recall guarantee
(property over controlled bit flips), NULL handling, validation, and
plan shape."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.phash import (
    DEFAULT_MAX_HAMMING,
    PHASH_BANDS,
    fake_pixels,
    image_phash,
    phash64,
    phash_candidate_pairs,
    phash_neardup_pairs,
)


def _payloads(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, payload BINARY")


def test_spark_hash_matches_driver_reference(spark):
    rng = random.Random(3)
    rows = [(i, bytes(rng.randrange(256) for _ in range(rng.randrange(5, 400)))) for i in range(12)]
    got = {
        r.doc_id: r.phash
        for r in image_phash(_payloads(spark, rows)).collect()
    }
    want = {i: phash64(fake_pixels(p)) for i, p in rows}
    assert got == want


def test_identical_payloads_hash_equal_and_pair_at_zero(spark):
    p = bytes(range(200))
    rows = [(1, p), (2, p), (3, bytes(reversed(range(200))))]
    hashes = image_phash(_payloads(spark, rows))
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(hashes).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_banding_guarantee_over_bit_flips(spark):
    """Any pair within hamming <= bands-1 MUST be found: plant hashes at
    controlled flip distances and check recall 1.0 up to the guarantee."""
    rng = random.Random(11)
    base = rng.getrandbits(64)
    rows, want = [], set()
    nid = 0
    for d in range(0, PHASH_BANDS):  # distances 0..7, all <= bands-1
        a, b = nid, nid + 1
        nid += 2
        flipped = base
        for pos in rng.sample(range(64), d):
            flipped ^= 1 << pos
        rows += [
            (a, int(np.int64(np.uint64(base)))),
            (b, int(np.int64(np.uint64(flipped)))),
        ]
        if d <= PHASH_BANDS - 1:
            want.add((a, b, d))
        base = rng.getrandbits(64)  # fresh base per trial
    hashes = spark.createDataFrame(rows, "doc_id LONG, phash LONG")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(
            hashes, max_hamming=PHASH_BANDS - 1
        ).collect()
        # only planted pairs; cross-trial collisions are possible but
        # astronomically unlikely to fall under the threshold
        if r.id_b == r.id_a + 1 and r.id_a % 2 == 0
    }
    assert got == want


def test_null_payloads_yield_no_rows(spark):
    rows = [(1, bytes(100)), (2, None)]
    out = image_phash(_payloads(spark, rows)).collect()
    assert {r.doc_id for r in out} == {1}


def test_max_hamming_beyond_guarantee_refused(spark):
    hashes = spark.createDataFrame([(1, 5)], "doc_id LONG, phash LONG")
    with pytest.raises(ValueError, match="banding guarantee"):
        phash_neardup_pairs(hashes, max_hamming=PHASH_BANDS)
    from ts_etl_spark.operators.phash import phash_bands

    with pytest.raises(ValueError, match="divide 64"):
        phash_bands(hashes, bands=7)


def _sgn(u):
    return int(np.int64(np.uint64(u)))


def test_max_bucket_gives_linear_candidate_bound(spark):
    """The scale knob's contract: with ``max_bucket`` set, candidate count
    obeys the linear bound N·bands·max_bucket/2 — and when N doubles on
    the same hash distribution, candidates grow ~linearly, not
    quadratically (the uncapped 8×8-bit banding is quadratic once its
    2048 buckets saturate)."""
    rng = random.Random(7)
    cap, bands = 4, PHASH_BANDS

    def corpus(n):
        rows = [(i, _sgn(rng.getrandbits(64))) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id LONG, phash LONG")

    counts = {}
    for n in (1500, 3000):
        c = phash_candidate_pairs(corpus(n), bands=bands, max_bucket=cap).count()
        assert c <= n * bands * cap / 2, f"linear bound violated at N={n}"
        counts[n] = c
    # uncapped, 1500→3000 random hashes over 2048 saturated buckets
    # roughly quadruples candidates; capped must stay ~linear
    assert counts[3000] <= 2.5 * counts[1500] + 50


def test_max_bucket_drops_hot_bucket_keeps_cold_pairs(spark):
    """A saturated bucket (10k byte-identical boilerplate images) is
    dropped under the cap; a planted near-dup pair in cold buckets
    survives with full recall."""
    hot = [(i, 12345) for i in range(100)]  # one mega-group, every band hot
    a, b = _sgn(0xDEADBEEFCAFE0000), _sgn(0xDEADBEEFCAFE0001)  # hamming 1
    rows = hot + [(1000, a), (1001, b)]
    hashes = spark.createDataFrame(rows, "doc_id LONG, phash LONG")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(hashes, max_hamming=1, max_bucket=4).collect()
    }
    assert got == {(1000, 1001, 1)}
    with pytest.raises(ValueError, match="max_bucket"):
        phash_candidate_pairs(hashes, max_bucket=1)


def test_block_col_composes_into_join_key(spark):
    """With block_col set, identical hashes in DIFFERENT blocks never
    meet; same-block near-dups keep full recall."""
    h = _sgn(0xABCD_EF01_2345_6789)
    rows = [(1, h, "s"), (2, h, "s"), (3, h, "t")]
    hashes = spark.createDataFrame(rows, "doc_id LONG, phash LONG, cell STRING")
    got = {
        (r.id_a, r.id_b)
        for r in phash_neardup_pairs(hashes, block_col="cell").collect()
    }
    assert got == {(1, 2)}


def test_wider_bands_guarantee_hamming3(spark):
    """bands=4 (the large-corpus default: 16-bit slices, 262k buckets)
    guarantees recall for hamming <= 3."""
    rng = random.Random(23)
    rows, want = [], set()
    nid = 0
    for d in range(0, 4):
        base = rng.getrandbits(64)
        flipped = base
        for pos in rng.sample(range(64), d):
            flipped ^= 1 << pos
        rows += [(nid, _sgn(base)), (nid + 1, _sgn(flipped))]
        want.add((nid, nid + 1, d))
        nid += 2
    hashes = spark.createDataFrame(rows, "doc_id LONG, phash LONG")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup_pairs(hashes, max_hamming=3, bands=4).collect()
        if r.id_b == r.id_a + 1 and r.id_a % 2 == 0
    }
    assert got == want


def test_real_corpus_plan_and_determinism(spark):
    from ts_etl_spark.operators.multimodal import binary_payloads

    payloads = binary_payloads(spark, "/root/testdata/sf0.001")
    # plant one re-ingested copy (same bytes, new id) — the canonical
    # perceptual-dup case the operator exists to catch
    copy = payloads.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "payload"
    )
    hashes = image_phash(payloads.unionByName(copy)).persist()
    try:
        pairs = phash_neardup_pairs(hashes, DEFAULT_MAX_HAMMING)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        one = sorted(map(tuple, pairs.collect()))
        two = sorted(map(tuple, pairs.collect()))
        assert one == two
        assert (0, 1_000_000, 0) in one, "planted byte-identical copy found"
    finally:
        hashes.unpersist()
