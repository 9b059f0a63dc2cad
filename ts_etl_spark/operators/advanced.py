"""Advanced operators (SURVEY.md §2.4 custom-operator guidance): as-of join,
pivot/unpivot, pandas grouped-map aggregation, subqueries, array aggregation.

As-of join is the canonical "operator Spark lacks" — implemented as a
composition of existing DataFrame ops (union + window last-non-null), NOT a
per-key loop: one shuffle on the key, one window pass, linear at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ts_etl_spark.sources.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the columns of the LATEST right row with
    ``right_ts <= left_ts`` for the same key (ties: right wins — the
    standard backward as-of).

    Spark-first shape: union the two sides tagged by origin, sort within key
    by (ts, origin), and carry the right columns forward with
    ``last(..., ignorenulls=True)`` — one shuffle, one window, no per-key
    driver loop, no range cross-join blowup.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # ties among right rows at the same ts resolve by the tiebreak column
    # (highest wins) — keeps the result deterministic
    order: list[Column] = [F.col("__ts"), F.col("__side")]
    if right_tiebreak is not None:
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__a_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__a_{c}").alias(f"asof_{c}") for c in right_cols],
    )


def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the same user's most recent prior-or-equal
    'view' event (classic attribution as-of join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(
        purchases, views, "user_id", "ts", "ts", ["view_event_id"],
        right_tiebreak="view_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        "asof_view_event_id",
    )


def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (order counts by status × priority, priorities as columns) then
    unpivot (melt) the wide result back to long format — both reshape
    operators in one round-trip. The pivot is a single grouped aggregation
    with a fixed column list (no second distinct-values pass); the unpivot
    is an Expand node, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    renames = {p: f"p{p[0]}" for p in prios}
    for old, new in renames.items():
        wide = wide.withColumnRenamed(old, new)
    wide = wide.select(
        "o_orderstatus",
        *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in renames.values()],
    )
    return wide.unpivot("o_orderstatus", list(renames.values()), "priority", "n")


def q_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas aggregation (applyInPandas): exact per-group
    median — numpy's interpolated median matches DuckDB's quantile_cont.
    Arrow-batched; defined as a closure so it pickles by value (executors
    don't need this package importable)."""

    def median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        return _pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "median_price": [pdf["l_extendedprice"].median()],
                "n": [len(pdf)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(median_fn, "l_returnflag STRING, median_price DOUBLE, n BIGINT")
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5× the global average price (scalar subquery via SQL;
    Catalyst plans the subquery once and broadcasts the scalar)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM sq_orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                                AS DOUBLE) / COUNT(*)
                                    FROM sq_orders)
        """
    )


def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic order: per-nation sorted list of
    supplier keys (sort_array makes collect_list order-insensitive). The
    numerically-sorted list is joined to a comma string so the result row is
    all scalars (array columns break generic result hashers)."""
    sup = load_table(spark, sf_dir, "supplier")
    keys = F.sort_array(F.collect_list("s_suppkey"))
    return sup.groupBy("s_nationkey").agg(
        F.array_join(F.transform(keys, lambda k: k.cast("string")), ",").alias(
            "suppkeys"
        ),
        F.count("*").alias("n"),
    )


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Range join (|left_ts - right_ts| <= gap, same key) WITHOUT the
    nested-loop blowup: both sides bucket by floor(ts/gap); a row can only
    match rows in its own or adjacent buckets, so the left explodes to 3
    bucket probes and the join is a plain equi-join on (key, bucket) with a
    residual range filter. Linear in matches, shuffle on (key, bucket)."""
    gap = F.lit(max_gap_seconds)
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / gap)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / gap)
    probes = F.explode(F.array(lb - 1, lb, lb + 1)).alias("__bucket")
    l = left.select("*", probes)
    r = right.select("*", rb.alias("__bucket"))
    out = l.join(r, [key, "__bucket"]).filter(
        F.abs(
            F.unix_timestamp(F.col(left_ts)).cast("long")
            - F.unix_timestamp(F.col(right_ts)).cast("long")
        )
        <= gap
    )
    return out.drop("__bucket")


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events within 5 minutes of a purchase by the same user
    (bucketized range join — the scalable interval-join pattern)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    out = bucketized_range_join(purchases, errors, "user_id", "p_ts", "e_ts", 300)
    return out.select(
        "user_id",
        "purchase_id",
        "error_id",
        (
            F.unix_timestamp("e_ts").cast("long")
            - F.unix_timestamp("p_ts").cast("long")
        ).alias("gap_seconds"),
    )


def q_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both time-semantics join operators in one tagged union (unified
    schema: op, user_id, id1, id2, info). As-of rows: id1 = purchase event,
    id2 = attributed view (nullable), info = purchase timestamp. Range rows:
    id1 = purchase, id2 = error within ±5 min, info = signed gap seconds.
    Each branch keeps its own linear plan (union + window carry-forward;
    bucketized 3-probe equi-join) — no cross-branch exchange."""
    asof = q_asof_purchase_view(spark, sf_dir).select(
        F.lit("asof").alias("op"),
        "user_id",
        F.col("event_id").alias("id1"),
        F.col("asof_view_event_id").alias("id2"),
        F.col("ts").alias("info"),
    )
    rng = q_range_join_events(spark, sf_dir).select(
        F.lit("range").alias("op"),
        "user_id",
        F.col("purchase_id").alias("id1"),
        F.col("error_id").alias("id2"),
        F.col("gap_seconds").cast("string").alias("info"),
    )
    return asof.unionByName(rng)


def q_subquery_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filtering, deterministic array aggregation, AND the
    Arrow-batched grouped-map pandas path in one tagged union (unified
    schema: op, k, v, s, n). Scalar rows: orders above 1.5× the global
    average price. Collect rows: per-nation sorted supplier key list as a
    comma string. Median rows: per-returnflag exact interpolated median via
    ``applyInPandas`` (numpy's interpolation matches DuckDB's
    quantile_cont)."""
    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    scalar = q_scalar_subquery(spark, sf_dir).select(
        F.lit("scalar_above_avg").alias("op"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        ns.alias("s"),
        nb.alias("n"),
    )
    collected = q_collect_sorted(spark, sf_dir).select(
        F.lit("collect").alias("op"),
        F.col("s_nationkey").cast("bigint").alias("k"),
        F.lit(None).cast("double").alias("v"),
        F.col("suppkeys").alias("s"),
        "n",
    )
    median = q_pandas_median(spark, sf_dir).select(
        F.lit("median").alias("op"),
        nb.alias("k"),
        F.col("median_price").alias("v"),
        F.col("l_returnflag").alias("s"),
        "n",
    )
    return scalar.unionByName(collected).unionByName(median)


# q_pivot_unpivot is registered as the 'pivot' arm of relational's
# set_operations (round-4 consolidation freeing registry slots for the
# round-3 operator entries)
QUERIES = {
    "temporal_joins": q_temporal_joins,
    "subquery_collect": q_subquery_collect,
}

ORACLE = {
    "temporal_joins": """
        SELECT 'asof' AS op, p.user_id, p.event_id AS id1,
               (SELECT v.event_id FROM events v
                WHERE v.event_type = 'view' AND v.user_id = p.user_id
                  AND v.ts <= p.ts
                ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS id2,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS info
        FROM events p WHERE p.event_type = 'purchase'
        UNION ALL
        -- floor to whole epoch seconds to mirror Spark's unix_timestamp
        SELECT 'range' AS op, p.user_id, p.event_id AS id1, e.event_id AS id2,
               CAST(CAST(floor(epoch(e.ts)) AS BIGINT)
                    - CAST(floor(epoch(p.ts)) AS BIGINT) AS VARCHAR) AS info
        FROM events p JOIN events e
          ON p.user_id = e.user_id
         AND p.event_type = 'purchase' AND e.event_type = 'error'
         AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
                 - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 300
    """,
    "subquery_collect": """
        SELECT 'scalar_above_avg' AS op, o_orderkey AS k, o_totalprice AS v,
               CAST(NULL AS VARCHAR) AS s, CAST(NULL AS BIGINT) AS n
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                                AS DOUBLE) / COUNT(*)
                                    FROM orders)
        UNION ALL
        SELECT 'collect' AS op, CAST(s_nationkey AS BIGINT) AS k,
               CAST(NULL AS DOUBLE) AS v,
               array_to_string(list_sort(list(s_suppkey)), ',') AS s,
               COUNT(*) AS n
        FROM supplier GROUP BY s_nationkey
        UNION ALL
        SELECT 'median' AS op, CAST(NULL AS BIGINT) AS k,
               quantile_cont(l_extendedprice, 0.5) AS v,
               l_returnflag AS s, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
}
