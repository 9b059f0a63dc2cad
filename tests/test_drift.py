"""PSI drift detection: zero on identical snapshots, detects a real
shift, matches an independent Python reference computation, and handles
degenerate (constant) columns."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.drift import psi_drift

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_identical_snapshots_have_zero_psi(spark):
    o = _orders(spark)
    out = psi_drift(o, o, "o_totalprice").collect()
    total = [r for r in out if r.bucket == -1][0]
    assert total.psi_term == pytest.approx(0.0, abs=1e-12)
    assert len(out) == 11  # 10 buckets + total row


def test_shift_is_detected(spark):
    o = _orders(spark)
    shifted = o.withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
    total = [
        r
        for r in psi_drift(o, shifted, "o_totalprice").collect()
        if r.bucket == -1
    ][0]
    assert total.psi_term > 0.25  # "action needed" band


def test_matches_python_reference(spark):
    o = _orders(spark)
    cur = o.filter(F.col("o_totalprice") < 150_000)
    n_buckets, eps = 10, 0.5
    out = {
        r.bucket: r
        for r in psi_drift(o, cur, "o_totalprice", n_buckets, eps).collect()
    }

    vals_a = [float(r[0]) for r in o.select("o_totalprice").collect()]
    vals_b = [float(r[0]) for r in cur.select("o_totalprice").collect()]
    lo, hi = min(vals_a + vals_b), max(vals_a + vals_b)

    def shares(vals):
        counts = [0] * n_buckets
        for v in vals:
            b = min(int((v - lo) / (hi - lo) * n_buckets), n_buckets - 1)
            counts[b] += 1
        t = len(vals)
        return [
            (c + eps) / (t + eps * n_buckets) for c in counts
        ]

    pa, pb = shares(vals_a), shares(vals_b)
    want = sum(
        (q - p) * math.log(q / p) for p, q in zip(pa, pb)
    )
    assert out[-1].psi_term == pytest.approx(want, abs=1e-9)
    for b in range(n_buckets):
        assert out[b].share_base == pytest.approx(pa[b], abs=1e-12)
        assert out[b].share_cur == pytest.approx(pb[b], abs=1e-12)


def test_constant_column_and_validation(spark):
    a = spark.createDataFrame([(1.0,), (1.0,)], "v DOUBLE")
    b = spark.createDataFrame([(1.0,)], "v DOUBLE")
    rows = psi_drift(a, b, "v").collect()
    # degenerate range: everything lands in bucket 0, every term stays
    # finite (the Laplace floor — dominant at these row counts — is the
    # point: no ±inf from empty buckets)
    assert all(math.isfinite(r.psi_term) for r in rows)
    concentrated = [r for r in rows if r.bucket == 0][0]
    assert concentrated.share_base == max(
        r.share_base for r in rows if r.bucket >= 0
    )
    with pytest.raises(ValueError):
        psi_drift(a, b, "v", n_buckets=1)
    empty = spark.createDataFrame([(None,)], "v DOUBLE")
    with pytest.raises(ValueError, match="no non-null values"):
        psi_drift(empty, empty, "v")


def test_sided_variant_is_bit_identical_to_two_frame(spark):
    """psi_drift_sided must reproduce psi_drift EXACTLY (same IEEE
    expression shapes over the same counts), in 2 scans instead of a
    scan-per-side-per-reference — it exists so fan-outs over the drift
    output stop multiplying corpus scans."""
    from ts_etl_spark.operators.drift import psi_drift_sided

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 211 + (F.col("id") % 2) * 40).cast("double").alias("v"),
    )
    base = docs.filter(F.col("doc_id") % 2 == 0).select("v")
    cur = docs.filter(F.col("doc_id") % 2 == 1).select("v")
    two = {r.bucket: r for r in psi_drift(base, cur, "v", n_buckets=7).collect()}
    one = {
        r.bucket: r
        for r in psi_drift_sided(
            docs.select("v", (F.col("doc_id") % 2 == 1).alias("cur")),
            F.col("cur"),
            "v",
            n_buckets=7,
        ).collect()
    }
    assert set(two) == set(one)
    for b in two:
        assert two[b].share_base == one[b].share_base  # exact, not approx
        assert two[b].share_cur == one[b].share_cur
        assert (two[b].psi_term is None) == (one[b].psi_term is None)
        if two[b].psi_term is not None:
            assert two[b].psi_term == one[b].psi_term


def test_sided_variant_validation(spark):
    from ts_etl_spark.operators.drift import psi_drift_sided

    empty = spark.createDataFrame([(None, True)], "v DOUBLE, cur BOOLEAN")
    with pytest.raises(ValueError, match="no non-null values"):
        psi_drift_sided(empty, F.col("cur"), "v")
    with pytest.raises(ValueError):
        psi_drift_sided(empty, F.col("cur"), "v", n_buckets=1)


def test_sided_variant_refuses_null_side_rows(spark):
    """A NULL side is non-true under both conditional counts — such rows
    would silently vanish from every share while widening the bucket
    range. The operator refuses them loudly."""
    from ts_etl_spark.operators.drift import psi_drift_sided

    df = spark.createDataFrame(
        [(1.0, True), (2.0, False), (3.0, None)], "v DOUBLE, cur BOOLEAN"
    )
    with pytest.raises(ValueError, match="side expression is NULL"):
        psi_drift_sided(df, F.col("cur"), "v")


def test_hist_variant_exact_histogram_is_bit_identical(spark):
    """``psi_drift_hist`` fed an EXACT histogram (one row per distinct
    value with its count) must reproduce ``psi_drift`` bit-for-bit —
    the algebraic claim that the weighted path changes WHERE the counts
    come from, not what is computed."""
    from ts_etl_spark.operators.drift import psi_drift_hist

    o = _orders(spark)
    base = o.select(F.col("o_totalprice").alias("p"))
    hist = base.groupBy(F.col("p").cast("double").alias("v")).agg(
        F.count("*").alias("n")
    )
    cur = o.filter("o_orderkey % 3 = 0").select(
        (F.col("o_totalprice") * 1.4).alias("p")
    )
    exact = {r.bucket: r for r in psi_drift(base, cur, "p").collect()}
    hist_out = {
        r.bucket: r for r in psi_drift_hist(hist, cur, "p").collect()
    }
    assert set(hist_out) == set(exact)
    for b in exact:
        assert hist_out[b].share_base == exact[b].share_base
        assert hist_out[b].share_cur == exact[b].share_cur
        if exact[b].psi_term is not None:
            assert hist_out[b].psi_term == exact[b].psi_term


def test_hist_variant_hdr_registers_close_and_still_flags(spark):
    """The production feed: an HDR register table mapped to bucket
    representatives. In-distribution PSI stays near the exact value
    (register resolution ≤ 2^-s), and a genuine length shift still
    lands far past the 0.25 action band."""
    from ts_etl_spark.operators.drift import psi_drift_hist
    from ts_etl_spark.operators.sketches import (
        hdr_lower,
        hdr_registers,
        hdr_width,
    )

    lens = spark.range(5000).select(
        (100 + (F.col("id") * 37) % 900).cast("long").alias("v")
    )
    regs = hdr_registers(lens, "v")
    hist = regs.select(
        (
            hdr_lower(F.col("bucket")).cast("double")
            + (hdr_width(F.col("bucket")).cast("double") - 1.0) / 2.0
        ).alias("v"),
        F.col("n"),
    )

    def total(out):
        return [r.psi_term for r in out.collect() if r.bucket == -1][0]

    same = spark.range(1000).select(
        (100 + (F.col("id") * 53) % 900).cast("long").alias("v")
    )
    exact_same = total(psi_drift(lens, same, "v"))
    hist_same = total(psi_drift_hist(hist, same, "v"))
    assert abs(hist_same - exact_same) < 0.05
    assert hist_same < 0.25

    shifted = spark.range(1000).select(
        (3000 + (F.col("id") * 53) % 900).cast("long").alias("v")
    )
    exact_shift = total(psi_drift(lens, shifted, "v"))
    hist_shift = total(psi_drift_hist(hist, shifted, "v"))
    assert hist_shift > 0.25 and exact_shift > 0.25
