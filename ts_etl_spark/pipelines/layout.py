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

Scale notes (100 TB): the only driver traffic is the d-column min/max row;
the rewrite is one range shuffle of the data — the same cost profile as
``compact_parquet`` plus a sort per output partition. Range buckets are
equal-WIDTH: a heavily skewed column concentrates ranks in few buckets and
weakens its dimension's pruning (switch that column to a pre-computed
equal-frequency rank if it matters; the interleave is agnostic to how the
bucket ids were produced).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.fs import dir_bytes
from ts_etl_spark.pipelines.maintenance import DEFAULT_TARGET_FILE_BYTES

#: bits of bucket resolution per clustered column (16 ⇒ 65536 buckets —
#: far finer than any realistic file count, so resolution never limits
#: pruning; the interleaved key still fits a bigint for up to 4 columns)
ZORDER_BITS = 16


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


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS, out: str = "__zkey"
) -> DataFrame:
    """``df`` plus the Morton-interleaved clustering key column ``out``.

    Per-column [min, max] comes from ONE 1-row aggregate broadcast back
    onto the frame (the scalar-subquery pattern — bounded at d columns ×
    one row); each value then maps to a ``width_bucket`` rank and the
    ranks' bits interleave. Nulls sort first (bucket 0)."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("z-order supports 1..4 columns (key must fit a bigint)")
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
    rng = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(as_num(c)).alias(f"__lo_{c}"),
                F.max(as_num(c)).alias(f"__hi_{c}"),
            )
        ]
    )
    d = df.join(F.broadcast(rng))
    ids = []
    for c in cols:
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
) -> int:
    """Rewrite a parquet directory Z-ordered by ``cols`` (copy-on-write,
    like ``compact_parquet``): ``ceil(bytes/target)`` balanced output files
    whose footer min/max intervals tile the clustered key space, so
    selective readers on any clustered column skip most of them. Returns
    the output file count."""
    total = dir_bytes(spark, path, suffix=".parquet")
    if total == 0:
        raise ValueError(f"no parquet data found at {path!r}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    keyed = with_zorder_key(spark.read.parquet(path), cols)
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
