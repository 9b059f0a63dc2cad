"""Distribution-drift detection between two corpus snapshots — the
monitoring check a continuously-ingested corpus runs per release: has the
length / quality-score / token-count distribution moved since the last
snapshot, and by how much?

Population Stability Index per bucket:

    PSI = Σ_b (p_b - q_b) · ln(p_b / q_b)

with the conventional reading: < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action needed. Buckets come from a uniform split of the COMBINED
[min, max] range (one 1-row aggregate over the union — a broadcast
scalar), so both snapshots are bucketed identically; shares are Laplace-
smoothed so a bucket empty on one side contributes a finite term instead
of ±inf.

Scale shape: one union scan + one partial-aggregated groupBy over
``n_buckets`` groups per side — the same ≤2^k-rows-per-task profile as
the HLL registers. Nothing about the computation holds more than
``n_buckets`` rows after the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_counts(
    df: DataFrame, col: str, lo, hi, n_buckets: int
) -> DataFrame:
    """(bucket, n) occupied-bucket counts; bucket 0-based, clamped to
    [0, n_buckets-1] so the max value lands in the top bucket. ONE scan —
    shares and smoothing floors both derive from this ≤n_buckets-row
    frame, never from a second pass over the data.

    The bucket index is an EXPLICIT ``floor(((v-lo)/(hi-lo))*n)`` rather
    than ``width_bucket``: every step is an IEEE correctly-rounded
    operation, so an oracle engine evaluating the same expression shape
    buckets every value identically — ``width_bucket`` implementations
    are free to factor the arithmetic differently and can flip a
    boundary-adjacent value into the neighboring bucket."""
    v = F.col(col).cast("double")
    b = F.when(
        F.lit(hi) > F.lit(lo),
        F.least(
            F.greatest(
                F.floor(((v - F.lit(lo)) / (F.lit(hi) - F.lit(lo))) * n_buckets)
                .cast("int"),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        ),
    ).otherwise(F.lit(0))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def _smoothed_shares(
    counts: DataFrame, all_buckets: DataFrame, n_buckets: int, eps: float, out: str
) -> DataFrame:
    """Laplace-smoothed share per bucket INCLUDING absent buckets, from
    the tiny counts frame alone (total = sum over its rows)."""
    total = counts.agg(F.sum("n").alias("__t"))
    return (
        all_buckets.join(counts, "bucket", "left")
        .join(F.broadcast(total), F.lit(True))
        .select(
            "bucket",
            (
                (F.coalesce("n", F.lit(0)) + F.lit(eps))
                / (F.coalesce("__t", F.lit(0)) + F.lit(eps) * n_buckets)
            ).alias(out),
        )
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Per-bucket drift detail plus the total: rows
    ``(bucket, share_base, share_cur, psi_term)`` for every bucket and a
    final ``bucket = -1`` row carrying the summed PSI. Bucket boundaries
    come from the combined range so both snapshots bucket identically."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be at least 2")
    lo_hi = (
        baseline.select(F.col(col).cast("double").alias("v"))
        .unionByName(current.select(F.col(col).cast("double").alias("v")))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .first()
    )
    if lo_hi.lo is None:
        raise ValueError(
            f"no non-null values in {col!r} on either side — nothing to bucket"
        )
    lo, hi = float(lo_hi.lo), float(lo_hi.hi)
    spark = baseline.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    base = _smoothed_shares(
        bucket_counts(baseline, col, lo, hi, n_buckets),
        all_buckets, n_buckets, eps, "share_base",
    )
    cur = _smoothed_shares(
        bucket_counts(current, col, lo, hi, n_buckets),
        all_buckets, n_buckets, eps, "share_cur",
    )
    detail = base.join(cur, "bucket").withColumn(
        "psi_term",
        (F.col("share_cur") - F.col("share_base"))
        * F.log(F.col("share_cur") / F.col("share_base")),
    )
    total = detail.agg(
        F.lit(-1).cast("int").alias("bucket"),
        F.lit(None).cast("double").alias("share_base"),
        F.lit(None).cast("double").alias("share_cur"),
        F.sum("psi_term").alias("psi_term"),
    )
    return detail.unionByName(total)
