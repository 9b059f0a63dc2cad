"""Plan-shape regression tests: the properties that keep the headline
queries efficient at scale, pinned via .explain() (see plans/audit.py)."""

from pyspark.sql import functions as F

from tests.golden import CSV_FIXTURE
from ts_etl_spark.operators.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
    q6_revenue_forecast,
    q_filter_project,
    q_join_broadcast,
    q_topk_orders,
)
from ts_etl_spark.plans.audit import (
    count_nodes,
    has_whole_stage_codegen,
    num_exchanges,
    plan_str,
    pushed_filters,
    read_schemas,
)
from ts_etl_spark.sources.csv_source import read_csv

SF = "/root/testdata/sf0.01"


def test_q6_filters_pushed_to_scan(spark):
    pf = pushed_filters(q6_revenue_forecast(spark, SF))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, f"{col} not pushed to parquet scan: {pf}"


def test_q6_column_pruning(spark):
    (schema,) = read_schemas(q6_revenue_forecast(spark, SF))
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q1_single_shuffle_partial_agg(spark):
    df = q1_pricing_summary(spark, SF)
    assert num_exchanges(df) == 1  # one hash shuffle; map-side partial agg
    assert count_nodes(df, "HashAggregate") == 2  # partial + final


def test_q5_dimensions_broadcast(spark):
    df = q5_local_supplier_volume(spark, SF)
    assert count_nodes(df, "BroadcastHashJoin") >= 3
    # only the fact-to-fact join (lineitem ⋈ orders) may merge-join
    assert count_nodes(df, "SortMergeJoin") <= 1


def test_broadcast_join_no_fact_shuffle(spark):
    df = q_join_broadcast(spark, SF)
    assert count_nodes(df, "BroadcastHashJoin") == 1
    # the only exchange is the tiny post-agg one, never a fact-table shuffle
    assert num_exchanges(df) <= 1


def test_topk_no_global_sort(spark):
    df = q_topk_orders(spark, SF)
    assert count_nodes(df, "TakeOrderedAndProject") == 1
    assert count_nodes(df, "Sort") == 0


def test_filter_project_no_shuffle(spark):
    df = q_filter_project(spark, SF)
    assert num_exchanges(df) == 0
    assert pushed_filters(df)  # quantity/returnflag predicates reach the scan


def test_csv_source_single_codegen_stage(spark):
    df = read_csv(spark, CSV_FIXTURE).drop("__row_id")
    assert num_exchanges(df) == 0
    assert has_whole_stage_codegen(df)


def test_events_tumbling_single_shuffle(spark):
    from ts_etl_spark.operators.events import q_events_tumbling

    df = q_events_tumbling(spark, SF)
    assert num_exchanges(df) == 1
    assert count_nodes(df, "HashAggregate") == 2


def test_embed_topk_broadcasts_queries(spark):
    from ts_etl_spark.operators.similarity import q_embed_topk

    df = q_embed_topk(spark, SF)
    # the query side broadcasts; the vector table is never shuffled pre-join
    assert count_nodes(df, "BroadcastNestedLoopJoin") + count_nodes(
        df, "BroadcastHashJoin"
    ) >= 1


def test_minhash_bounded_shuffles(spark):
    """MinHash-LSH must stay at a handful of exchanges (signature
    repartition, band self-join, verification joins) — a regression here
    means the quadratic path snuck back in."""
    from ts_etl_spark.operators.dedup import q_dedup_minhash_lsh

    df = q_dedup_minhash_lsh(spark, SF)
    assert num_exchanges(df) <= 8, plan_str(df)


def test_asof_single_window_pass(spark):
    from ts_etl_spark.operators.advanced import q_asof_purchase_view

    df = q_asof_purchase_view(spark, SF)
    assert count_nodes(df, "Window") == 1
    assert num_exchanges(df) <= 3  # two scans union + one keyed shuffle
