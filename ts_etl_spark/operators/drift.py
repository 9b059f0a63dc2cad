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

from ts_etl_spark.localrel import local_rows
from pyspark.sql import functions as F


def _bucket_expr(v, lo, hi, n_buckets: int):
    """The shared bucket-index expression: floor(((v-lo)/(hi-lo))*n),
    clamped to [0, n_buckets-1], degenerate range => bucket 0. ONE
    definition on purpose — ``bucket_counts`` and ``psi_drift_sided``
    must stay IEEE-identical to each other and to the DuckDB oracle for
    the bit-exact-parity guarantee to hold."""
    return F.when(
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
    b = _bucket_expr(v, lo, hi, n_buckets)
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


def _ordered_total(detail: DataFrame) -> DataFrame:
    """The ``bucket = -1`` total row as a DETERMINISTIC left fold of the
    psi terms in bucket-ascending order. A plain ``F.sum`` combines
    per-partition partials in physical-layout order, so the same ten
    terms summed from a parquet-backed frame vs a local relation can
    differ in the last ulp — which breaks the telemetry path's
    stored-equals-recomputed bit-identity (the PSI-baseline proof in
    tests/test_ingest.py). Folding ``array_sort(collect_list(...))``
    pins one summation order for every physical layout; every variant
    must build its total through THIS expression so cross-variant
    bit-identity holds at full precision, not just after rounding."""
    return detail.agg(
        F.lit(-1).cast("int").alias("bucket"),
        F.lit(None).cast("double").alias("share_base"),
        F.lit(None).cast("double").alias("share_cur"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "psi_term"))),
            F.lit(0.0),
            # coalesce each term: F.sum (the pre-fold shape) SKIPPED null
            # terms, but acc + NULL poisons a fold — with caller-supplied
            # eps=0 an empty bucket's log(0) term is NULL and the total
            # would silently become NULL instead of the sum of defined
            # terms (review finding, round 15). collect_list also drops
            # null STRUCT elements but not structs with a null field, so
            # the guard belongs here in the fold.
            lambda acc, s: acc + F.coalesce(s["psi_term"], F.lit(0.0)),
        ).alias("psi_term"),
    )


def _psi_assembly(
    spark, base_counts: DataFrame, cur_counts: DataFrame,
    n_buckets: int, eps: float,
) -> DataFrame:
    """Shares → PSI terms → detail ∪ total, from the two (bucket, n)
    count frames. THE one copy of the share/PSI arithmetic: every
    variant (two-frame, sided via its own fused path, weighted-
    histogram) must produce bit-identical values from identical counts,
    which only holds while they share this assembly."""
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    base = _smoothed_shares(
        base_counts, all_buckets, n_buckets, eps, "share_base"
    )
    cur = _smoothed_shares(
        cur_counts, all_buckets, n_buckets, eps, "share_cur"
    )
    detail = base.join(cur, "bucket").withColumn(
        "psi_term",
        (F.col("share_cur") - F.col("share_base"))
        * F.log(F.col("share_cur") / F.col("share_base")),
    )
    return detail.unionByName(_ordered_total(detail))


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
    return _psi_assembly(
        baseline.sparkSession,
        bucket_counts(baseline, col, lo, hi, n_buckets),
        bucket_counts(current, col, lo, hi, n_buckets),
        n_buckets, eps,
    )


def weighted_bucket_counts(
    hist: DataFrame, lo, hi, n_buckets: int
) -> DataFrame:
    """``bucket_counts`` when the observations arrive pre-aggregated as
    a weighted-value histogram ``(v, n)``: the SAME bucket expression
    (IEEE-identical boundaries), counts summed from the weights. A
    histogram row whose exact values all equal ``v`` contributes
    exactly what ``n`` raw rows would — so feeding exact
    ``(value, count)`` pairs reproduces ``bucket_counts`` bit-for-bit,
    and feeding bucket-representative values (an HDR register table)
    is off by at most the registers that straddle a bucket edge."""
    v = F.col("v").cast("double")
    b = _bucket_expr(v, lo, hi, n_buckets)
    return (
        hist.filter(v.isNotNull() & (F.col("n") > 0))
        .select(b.alias("bucket"), "n")
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )


def psi_drift_hist(
    base_hist: DataFrame,
    current: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """``psi_drift`` with the BASELINE supplied as a weighted-value
    histogram ``(v DOUBLE, n BIGINT)`` instead of one row per
    observation — the O(histogram) baseline path: per evaluation the
    baseline side touches only the histogram's rows (an HDR register
    table is ≤960), never the population it summarizes. Share and PSI
    arithmetic are the exact expression shapes of ``psi_drift``, so
    with an EXACT histogram (every distinct value its own row) the
    output is bit-identical; with a bucket-resolution histogram the
    baseline shares carry the sketch's resolution (HDR: register
    width/lower ≤ 2^-s, values < 2^(s+1) exact) — a monitoring-grade
    approximation, bounded by edge-straddling registers. The combined
    range takes the histogram's min/max REPRESENTATIVE values, which
    sit inside the true extremes by at most one register width."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be at least 2")
    v = F.col("v").cast("double")
    lo_hi = (
        base_hist.filter(F.col("n") > 0)
        .select(v.alias("v"))
        .unionByName(current.select(F.col(col).cast("double").alias("v")))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .first()
    )
    if lo_hi.lo is None:
        raise ValueError(
            f"no non-null values in {col!r} on either side — nothing to bucket"
        )
    lo, hi = float(lo_hi.lo), float(lo_hi.hi)
    return _psi_assembly(
        base_hist.sparkSession,
        weighted_bucket_counts(base_hist, lo, hi, n_buckets),
        bucket_counts(current, col, lo, hi, n_buckets),
        n_buckets, eps,
    )


def psi_drift_sided(
    df: DataFrame,
    side: "F.Column",
    col: str,
    n_buckets: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """``psi_drift`` when both snapshots live in ONE frame, told apart by
    the boolean column expression ``side`` (false = baseline, true =
    current): identical output, one-pass plan.

    The two-frame version costs a scan per side per evaluation — and its
    detail/total self-union plus any downstream fan-out MULTIPLIES those
    scans (Spark re-executes a subtree per reference; the drift arm of
    ``corpus_quality_signals`` measured 15+ scans). Here the combined
    range is one aggregate, both sides' bucket counts come from one
    more scan (a pivoted conditional count), and the ≤``n_buckets``
    count rows materialize through the driver (the same bounded scalar
    transfer as the lo/hi row), so the share/PSI arithmetic — the SAME
    IEEE expression shapes as ``psi_drift``, hence bit-identical values —
    runs over a local relation that downstream plans can re-reference
    for free. Scans per evaluation: 2, regardless of fan-out."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be at least 2")
    v = F.col(col).cast("double")
    lo_hi = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
    if lo_hi.lo is None:
        raise ValueError(
            f"no non-null values in {col!r} on either side — nothing to bucket"
        )
    lo, hi = float(lo_hi.lo), float(lo_hi.hi)
    b = _bucket_expr(v, lo, hi, n_buckets)
    rows = (
        df.filter(v.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.sum(F.when(~side, 1).otherwise(0)).alias("n_base"),
            F.sum(F.when(side, 1).otherwise(0)).alias("n_cur"),
            # NULL side is non-true under BOTH when() branches — such a
            # row would silently vanish from every count while its value
            # still widened the bucket range. The two-frame psi_drift has
            # no such state (every row belongs to a frame), so refuse it
            # loudly instead of computing shares over dropped data.
            F.sum(F.when(side.isNull(), 1).otherwise(0)).alias("n_nullside"),
        )
        .collect()
    )
    dropped = sum(r["n_nullside"] for r in rows)
    if dropped:
        raise ValueError(
            f"side expression is NULL for {dropped} non-null rows — every "
            "row must belong to exactly one snapshot (coalesce the side "
            "column first)"
        )
    counted = {r["bucket"]: (r["n_base"], r["n_cur"]) for r in rows}
    spark = df.sparkSession
    local = local_rows(
        spark,
        [
            (i, *counted.get(i, (0, 0)))
            for i in range(n_buckets)
        ],
        "bucket INT, n_base BIGINT, n_cur BIGINT",
    )
    t_base = sum(nb for nb, _ in counted.values())
    t_cur = sum(nc for _, nc in counted.values())
    share = lambda n, t: (F.col(n) + F.lit(eps)) / (  # noqa: E731
        F.lit(t) + F.lit(eps) * n_buckets
    )
    detail = local.select(
        "bucket",
        share("n_base", t_base).alias("share_base"),
        share("n_cur", t_cur).alias("share_cur"),
    ).withColumn(
        "psi_term",
        (F.col("share_cur") - F.col("share_base"))
        * F.log(F.col("share_cur") / F.col("share_base")),
    )
    return detail.unionByName(_ordered_total(detail))
