"""Relational operator surface (SURVEY.md §2.4 core): filter/project, joins
(inner/left/semi/anti, broadcast + shuffle), aggregations (hash agg,
distinct, rollup/cube/grouping sets), window functions, sort/limit/top-k,
set operations — all TPC-H-style over the driver tables.

Determinism contract with the DuckDB oracle
-------------------------------------------
Sums over doubles are order-sensitive in IEEE arithmetic and Spark/DuckDB
aggregate in different orders. Every money/rate column in the test tables is
an exact 2-decimal double, so each aggregation here casts operands to
DECIMAL(18,2) first (exact, associative, order-insensitive), sums in decimal
space, and casts the final result back to DOUBLE — bit-identical across
engines and across partitionings. Averages are SUM(decimal)::double / count.

Scale notes (100 TB design point)
---------------------------------
- Fixed-cardinality dimensions (region, nation — constant size at ANY SF)
  carry explicit broadcast hints. SF-scaling tables (customer, supplier,
  part) are joined UNHINTED: the autoBroadcastJoinThreshold + AQE broadcast
  them while small and fall back to shuffle joins at scale — a forced hint
  would OOM materializing a multi-TB side at 100 TB.
- Aggregations are partial (map-side combine) by construction — plain
  ``groupBy().agg()`` — so the shuffle carries one row per group per task.
- Filters are plain column predicates on the scan side of every join, so
  Catalyst pushes them into the parquet scan (check ``PushedFilters``).
- Top-k is ``orderBy().limit()`` which Spark executes as
  TakeOrderedAndProject: per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ts_etl_spark.sources.tables import load_table

DEC = T.DecimalType(18, 2)


def dec(c: Column | str) -> Column:
    """Exact 2-decimal view of a money/rate double (see module docstring)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def money_sum(expr: Column) -> Column:
    """Order-insensitive exact sum, surfaced as DOUBLE."""
    return F.sum(expr).cast("double")


def day_str(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, "yyyy-MM-dd")


# --------------------------------------------------------------------------
# TPC-H-style analytics
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter + hash aggregate with partial agg.
    One shuffle, 6-ish groups; filter pushed to parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec("l_quantity")).alias("sum_qty"),
            money_sum(dec("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            (money_sum(dec("l_quantity")) / F.count("*")).alias("avg_qty"),
            (money_sum(dec("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (money_sum(dec("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF: no forced broadcast hint — the session's
        # autoBroadcastJoinThreshold + AQE convert to broadcast when the
        # filtered side is actually small, and fall back to SMJ at 100 TB
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", day_str("o_orderdate").alias("o_orderdate"))
        .agg(money_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with broadcast dims, region filter pushed
    through nation to the fact side via the join graph."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # supplier scales with SF: unhinted (threshold/AQE decide); nation and
        # region have fixed cardinality at any SF so their hints are safe
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(revenue).alias("revenue"))
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches
    the parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Relational core: filter/project, joins, distinct, set ops, top-k
# --------------------------------------------------------------------------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level filter + computed projection; no shuffle at all."""
    li = load_table(spark, sf_dir, "lineitem")
    net = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return li.filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        net.cast("double").alias("net_price"),
    )


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim → broadcast join, chosen by the PLANNER (size-based
    threshold + AQE), not a hard hint: customer scales with SF, so a forced
    broadcast would OOM at 100 TB while the unhinted join degrades to SMJ."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(dec("o_totalprice")).alias("total_revenue"),
        )
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            money_sum(F.coalesce(dec("o_totalprice"), F.lit(0).cast(DEC))).alias(
                "total_spent"
            ),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: EXISTS without materializing the probe side."""
    cust = load_table(spark, sf_dir, "customer")
    fo = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(fo, cust.c_custkey == fo.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase exact distinct agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count("*").alias("n_rows"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), money_sum(dec("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), money_sum(dec("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over a temp view."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k without a global sort (TakeOrderedAndProject)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", day_str("o_orderdate").alias("o_orderdate")
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.subtract(f)  # EXCEPT (distinct) semantics


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return o.union(p).distinct()


def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics: EXCEPT ALL (multiplicity-aware difference)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.exceptAll(f)


def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics: INTERSECT ALL (multiplicity-aware intersection)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersectAll(f)


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: single shuffle on the partition key."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day_str("o_orderdate").alias("o_orderdate"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Further TPC-H shapes (adapted to the driver tables' columns)
# --------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    Two independent broadcast dim paths (supplier-nation, customer-nation)
    off the same fact scan."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    sn = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(revenue).alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned revenue in a window."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation — orders per customer, then
    customers per order count (including zero-order customers)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue %)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast(DEC))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * money_sum(promo) / money_sum(revenue)).alias(
                "promo_revenue_pct"
            )
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact aggregate, joined back to dims."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            day_str("o_orderdate").alias("o_orderdate"),
            "total_qty",
        )
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across a join (brand/size/qty bands)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 40))
    )
    return joined.filter(cond).agg(
        money_sum(revenue).alias("revenue"), F.count("*").alias("n_items")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi join + priority counts (orders with
    at least one lineitem shipped after the order date)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue, keep the max (ties included)
    via a scalar aggregate comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(money_sum(revenue).alias("total_revenue"))
    max_rev = per_supp.agg(F.max("total_revenue").alias("m"))
    return (
        # max_rev is a 1-row aggregate at any SF — its hint is safe; supplier
        # scales with SF, so it joins unhinted (threshold/AQE decide)
        per_supp.join(F.broadcast(max_rev), per_supp.total_revenue == max_rev.m)
        .join(sup, per_supp.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile/percent_rank/cume_dist over a
    unique ordering (deterministic; the rationals are exact in IEEE).

    Scale note: an UNPARTITIONED ranking window is inherently a single-
    partition sort — correct here as the semantic definition, but at 100 TB
    you'd bucket by ``approx_quantiles`` boundaries instead (see
    ``approx_quantiles``) or rank within partitions."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function surface over customer names — each expression
    mirrored exactly in the oracle."""
    cust = load_table(spark, sf_dir, "customer")
    n = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.upper(n).alias("up"),
        F.substring(n, 1, 8).alias("first8"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse(n).alias("rev"),
        F.length(n).alias("len"),
        F.translate(n, "#", "-").alias("translated"),
        F.concat_ws("|", n, F.col("c_mktsegment")).alias("joined"),
        F.instr(n, "#").alias("hash_pos"),
    )


# --------------------------------------------------------------------------
# Approximate / sketch operators
# --------------------------------------------------------------------------


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts. Sketch internals differ across
    engines, so this is a rows-only check; the exact counterpart
    (agg_distinct) carries the oracle gate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_suppliers"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (both engines: linear interpolation on
    the fully sorted column)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.agg(
        pct.getItem(0).alias("p25"), pct.getItem(1).alias("p50"), pct.getItem(2).alias("p75")
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles — rows-only check (sketch
    semantics are engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
    )
    return li.agg(
        pct.getItem(0).alias("p25"), pct.getItem(1).alias("p50"), pct.getItem(2).alias("p75")
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_segment_revenue": q3_segment_revenue,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q4_order_priority": q4_order_priority,
    "q15_top_supplier": q15_top_supplier,
    "window_ntile": q_window_ntile,
    "string_functions": q_string_functions,
    "filter_project": q_filter_project,
    "join_broadcast_agg": q_join_broadcast,
    "join_left_agg": q_join_left,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "agg_distinct": q_agg_distinct,
    "rollup_agg": q_rollup,
    "cube_agg": q_cube,
    "grouping_sets": q_grouping_sets,
    "distinct_pairs": q_distinct,
    "topk_orders": q_topk_orders,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "set_union": q_set_union,
    "set_except_all": q_set_except_all,
    "set_intersect_all": q_set_intersect_all,
    "window_rank": q_window_rank,
    "window_running_sum": q_window_running_sum,
    "window_lag": q_window_lag,
    "approx_distinct": q_approx_distinct,
    "quantiles": q_quantiles,
    "approx_quantiles": q_approx_quantiles,
}

# DuckDB oracle SQL. Decimal-space aggregation mirrors the Spark side so
# results are bit-identical (see module docstring).
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

ORACLE = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({_REV} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_segment_revenue": f"""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY CAST(SUM({_REV}) AS DOUBLE) DESC, o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "q6_revenue_forecast": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
        ORDER BY CAST(SUM({_REV}) AS DOUBLE) DESC, c_custkey
        LIMIT 20
    """,
    "q13_order_count_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_predicates": f"""
        SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 20)
           OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 30)
           OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 40)
    """,
    "filter_project": f"""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST({_REV} AS DOUBLE) AS net_price
        FROM lineitem
        WHERE l_quantity >= 45 AND l_returnflag = 'R'
    """,
    "join_broadcast_agg": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_left_agg": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)),
                                 CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "agg_distinct": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS distinct_parts,
               COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "rollup_agg": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
               coalesce(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "distinct_pairs": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "set_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "set_except": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "set_union": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    "set_except_all": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "set_intersect_all": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_total
        FROM orders
    """,
    "window_lag": """
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS INT) AS days_since_prev
        FROM orders
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q15_top_supplier": f"""
        WITH per_supp AS (
            SELECT l_suppkey, CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
    """,
    "window_ntile": """
        SELECT o_orderkey,
               CAST(NTILE(10) OVER w AS INT) AS decile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "string_functions": """
        SELECT c_custkey,
               upper(c_name) AS up,
               substr(c_name, 1, 8) AS first8,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               reverse(c_name) AS rev,
               CAST(length(c_name) AS INT) AS len,
               replace(c_name, '#', '-') AS translated,
               c_name || '|' || c_mktsegment AS joined,
               CAST(strpos(c_name, '#') AS INT) AS hash_pos
        FROM customer
    """,
    "quantiles": """
        SELECT quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.50) AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75
        FROM lineitem
    """,
    # approx_distinct / approx_quantiles: rows-only (engine-specific sketches)
}
