"""Time-series gap filling with linear interpolation — the hypertable
companion to the rollup operators in ``events.py``: downstream consumers
(charting, forecasting, joins on aligned time grids) want one row per
(key, bucket) even where no event landed.

Plan shape, all declarative:

1. **grid**: per-key [min, max] bucket range (one partial-agg groupBy)
   expanded with ``sequence`` + ``explode`` — fan-out is bounded by the
   time range over the bucket width, never by event volume;
2. **align**: left join actual bucket aggregates onto the grid — a keyed
   equi-join, co-partitioned with the grid's own shuffle;
3. **interpolate**: two window passes per key ordered by bucket — last
   non-null value/timestamp before the gap and first after (the classic
   LOCF pair) — then the linear blend. Window state per key is a few
   scalars; a genuinely hot key is the ``skew.py`` bucketed-scan case.

Edge policy: gaps before the first observation or after the last keep
NULL (extrapolation is a modeling decision, not a fill), and
``filled`` marks synthesized rows so consumers can tell measurement from
interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    exact_avg_scale: int | None = None,
) -> DataFrame:
    """One row per (key, bucket) across each key's observed time range:
    ``(key, bucket_ts, value, filled)`` where missing buckets carry the
    linear interpolation between their nearest observed neighbors (NULL
    outside the observed range) and ``filled`` is TRUE on synthesized
    rows.

    ``exact_avg_scale``: when the value column is a fixed-decimal-in-
    double (money-like), pass its scale to aggregate each bucket as an
    exact decimal sum divided by the count — order-insensitive and
    bit-identical across engines/partitionings (every downstream
    interpolation step is then a correctly-rounded IEEE op on identical
    operands). Default keeps the plain double ``avg`` for generic
    values."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    step = F.lit(bucket_seconds)
    # floor, not cast-truncation: truncation rounds toward zero, which
    # would merge the two buckets adjacent to the 1970 epoch and shift
    # every pre-1970 observation one bucket high
    epoch = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    if exact_avg_scale is None:
        bucket_avg = F.avg(value_col)
    else:
        from pyspark.sql import types as T

        d = T.DecimalType(18, exact_avg_scale)
        bucket_avg = F.sum(F.col(value_col).cast(d)).cast("double") / F.count(
            "*"
        )
    actual = (
        df.select(F.col(key).alias("k"), epoch.alias("b"), F.col(value_col))
        .groupBy("k", "b")
        .agg(bucket_avg.alias("v"))
    )
    grid = (
        actual.groupBy("k")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select("k", F.explode(F.sequence("lo", "hi", step)).alias("b"))
    )
    joined = grid.join(actual, ["k", "b"], "left")

    w = Window.partitionBy("k").orderBy("b")
    before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(before)
    next_v = F.first("v", ignorenulls=True).over(after)
    prev_b = F.last(
        F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True
    ).over(before)
    next_b = F.first(
        F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True
    ).over(after)

    frac = (F.col("b") - prev_b) / (next_b - prev_b)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        # both neighbors exist -> linear blend; one-sided gaps stay NULL
        prev_v + (next_v - prev_v) * frac
    )
    return joined.select(
        F.col("k").alias(key),
        F.col("b").cast("timestamp").alias("bucket_ts"),
        interp.alias("value"),
        F.col("v").isNull().alias("filled"),
    )
