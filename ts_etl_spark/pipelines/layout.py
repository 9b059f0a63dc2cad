"""Multi-dimensional data layout: Z-order (Morton) clustering for parquet.

The min/max statistics in parquet footers are the lake's free index: a
reader skips any file or row group whose [min, max] interval misses the
predicate. A LINEAR sort only concentrates those intervals for the leading
sort column — a filter on any other column still touches every file.
Interleaving the bits of several columns' bucket ranks (the Z-order /
Morton curve) makes every file span roughly a hyper-rectangle of the key
space, so range predicates on ANY clustered column — and especially
conjunctions — overlap only ~N^((d-1)/d) of N files instead of all of
them. This is the layout trick behind `OPTIMIZE ... ZORDER BY` in lakehouse
table formats, built here from plain DataFrame expressions.

Everything is a narrow, codegen-friendly projection:

1. per-column range buckets: one 1-row min/max aggregate joined back as a
   broadcast scalar (bounded — d columns, one row), then ``width_bucket``;
2. bit interleave: a fixed expression tree over the bucket ids (16 bits per
   column, shifts and masks only — no UDF);
3. layout: ``repartitionByRange`` on the key (range exchange samples the
   key distribution, so output files are balanced even when the key space
   is not) + ``sortWithinPartitions`` so row groups inside each file stay
   tight too.

Scale notes (100 TB): the only driver traffic is the d-column min/max row
(plus, for equal-frequency columns, one bounded quantile-boundary array);
the rewrite is one range shuffle of the data — the same cost profile as
``compact_parquet`` plus a sort per output partition. Range buckets are
equal-WIDTH by default: a heavily skewed column concentrates ranks in few
buckets and weakens its dimension's pruning — name such columns in
``equal_frequency`` to rank them by approximate quantile boundaries
instead (every bucket then holds ~the same row count regardless of the
value distribution; the interleave is agnostic to how bucket ids were
produced).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.fs import dir_bytes
from ts_etl_spark.pipelines.maintenance import DEFAULT_TARGET_FILE_BYTES

#: bits of bucket resolution per clustered column (16 ⇒ 65536 buckets —
#: far finer than any realistic file count, so resolution never limits
#: pruning). The effective per-column bits are capped at ``63 // d`` so
#: the top interleaved bit index (bits*d - 1) stays ≤ 62: a bit in the
#: long's sign position would make that Morton region NEGATIVE and
#: repartitionByRange would order it before all others, splitting one
#: region across the file layout.
ZORDER_BITS = 16

#: equal-frequency mode ranks against quantile boundaries collected to the
#: driver (a bounded array) and assigns buckets via a literal binary-search
#: expression tree — 256 buckets keeps that tree at depth 8 while staying
#: far finer than any realistic output file count
EQFREQ_BUCKETS = 256


def _interleave(bucket_ids: list[Column], bits: int) -> Column:
    """Bit-interleave d bucket-id columns into one Morton key: output bit
    (i*d + j) = bit i of column j. A fixed shift/mask expression tree —
    whole-stage-codegen territory, no Python in the hot path."""
    d = len(bucket_ids)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_ids):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit.cast("long"), i * d + j))
    return key


def _rank_from_cuts(v: Column, cuts: list[float]) -> Column:
    """Bucket rank of ``v`` against sorted literal boundaries via a static
    binary-search expression tree: rank r covers (cuts[r-1], cuts[r]], so
    each row evaluates ~log2(len(cuts)) literal comparisons inside
    whole-stage codegen — no per-row array scan, no UDF."""

    def build(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(v <= F.lit(cuts[mid]), build(lo, mid)).otherwise(
            build(mid + 1, hi)
        )

    return build(0, len(cuts))


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    out: str = "__zkey",
    equal_frequency: Sequence[str] = (),
) -> DataFrame:
    """``df`` plus the Morton-interleaved clustering key column ``out``.

    Per-column [min, max] comes from ONE 1-row aggregate broadcast back
    onto the frame (the scalar-subquery pattern — bounded at d columns ×
    one row); each value then maps to a ``width_bucket`` rank and the
    ranks' bits interleave. Nulls sort first (bucket 0).

    Columns named in ``equal_frequency`` rank by approximate quantile
    boundaries instead of equal-width buckets (one ``percentile_approx``
    aggregate, boundaries collected to the driver — ≤``EQFREQ_BUCKETS``
    doubles — and folded into a literal binary-search CASE tree): the
    right mode for skewed columns, where equal-width buckets concentrate
    most rows into a few ranks and that dimension stops pruning."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("z-order supports 1..4 columns (key must fit a bigint)")
    unknown_eq = set(equal_frequency) - set(cols)
    if unknown_eq:
        raise ValueError(
            f"equal_frequency columns {sorted(unknown_eq)} not in cols {cols}"
        )
    # cap so the top interleaved bit (bits*d - 1) never reaches the long's
    # sign bit — see ZORDER_BITS
    bits = min(bits, 63 // len(cols))
    # validate orderable-as-number up front: under ANSI mode (the session
    # default) a string column would crash MID-REWRITE on the first
    # non-numeric value, and with ANSI off it would silently cast to NULL
    # and not cluster at all while the rewrite reports success. Dates and
    # timestamps rank via their numeric epoch instead of a direct cast
    # (cast date->double is a type error).
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    dtypes = dict(df.dtypes)

    def as_num(c: str):
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"z-order column {c!r} not in {sorted(dtypes)}")
        if t in ("float", "double"):
            # normalize NaN to NULL so both bucketing modes rank it with
            # the nulls (bucket 0). Raw NaN would diverge: it fails every
            # v <= cut in the equal-frequency CASE tree (silently landing
            # in the TOP rank) while the width path coalesces NULL to lo
            # (rank 0) — and it would also poison the min/max and
            # percentile aggregates (NaN sorts above every double).
            v = F.col(c).cast("double")
            return F.when(F.isnan(v), F.lit(None)).otherwise(v)
        if t in numeric or t.startswith("decimal"):
            return F.col(c).cast("double")
        if t == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        if t.startswith("timestamp"):
            return F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
        raise ValueError(
            f"z-order column {c!r} has unorderable type {t}; cluster on a "
            "numeric/date/timestamp column (or pre-compute a numeric rank)"
        )

    n_buckets = 1 << bits
    eq_cols = [c for c in cols if c in set(equal_frequency)]
    width_cols = [c for c in cols if c not in set(equal_frequency)]

    # quantile boundaries for equal-frequency columns: ONE aggregate, the
    # result is d_eq bounded arrays collected to the driver
    eq_cuts: dict[str, list[float]] = {}
    if eq_cols:
        probs = F.array(
            *[F.lit(i / EQFREQ_BUCKETS) for i in range(1, EQFREQ_BUCKETS)]
        )
        row = df.agg(
            *[
                F.percentile_approx(as_num(c), probs, 10000).alias(c)
                for c in eq_cols
            ]
        ).first()
        for c in eq_cols:
            raw = [x for x in (row[c] or []) if x is not None]
            # dedupe: repeated boundaries on heavy point masses would add
            # unreachable ranks; unique cuts keep the CASE tree minimal
            eq_cuts[c] = sorted(set(raw))

    d = df
    if width_cols:
        rng = df.agg(
            *[
                agg
                for c in width_cols
                for agg in (
                    F.min(as_num(c)).alias(f"__lo_{c}"),
                    F.max(as_num(c)).alias(f"__hi_{c}"),
                )
            ]
        )
        d = df.join(F.broadcast(rng))
    # an equal-frequency rank spans EQFREQ_BUCKETS (8 bits); shift it into
    # the full `bits`-wide rank space so its dimension carries the same
    # interleave weight as the width-bucketed columns — unshifted it would
    # only populate the LOW Morton bits and the other dimensions would
    # entirely dominate the key order
    eq_shift = max(bits - (EQFREQ_BUCKETS - 1).bit_length(), 0)
    ids = []
    for c in cols:
        if c in eq_cuts:
            v = F.coalesce(as_num(c), F.lit(float("-inf")))  # nulls rank 0
            rank = _rank_from_cuts(v, eq_cuts[c])
            ids.append(F.shiftleft(rank, eq_shift).cast("int"))
            continue
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        v = F.coalesce(as_num(c), lo)
        # width_bucket needs lo < hi (constant column ⇒ rank 0); v == hi
        # yields n_buckets+1, which the clamp below folds into the top rank
        rank = F.when(
            hi > lo, F.width_bucket(v, lo, hi, n_buckets) - 1
        ).otherwise(F.lit(0))
        ids.append(
            F.least(F.greatest(rank, F.lit(0)), F.lit(n_buckets - 1)).cast("int")
        )
    return d.select(*df.columns, _interleave(ids, bits).alias(out))


def cluster_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    cols: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    equal_frequency: Sequence[str] = (),
) -> int:
    """Rewrite a parquet directory Z-ordered by ``cols`` (copy-on-write,
    like ``compact_parquet``): ``ceil(bytes/target)`` balanced output files
    whose footer min/max intervals tile the clustered key space, so
    selective readers on any clustered column skip most of them. Columns
    named in ``equal_frequency`` bucket by quantile rank (see
    ``with_zorder_key``). Returns the output file count."""
    total = dir_bytes(spark, path, suffix=".parquet")
    if total == 0:
        raise ValueError(f"no parquet data found at {path!r}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    keyed = with_zorder_key(
        spark.read.parquet(path), cols, equal_frequency=equal_frequency
    )
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
