"""Benchmark harness (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop writer (full materialization,
no sink cost, no driver collect). A warmup query amortizes JVM/codegen
startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ts_etl_spark.operators import all_queries  # noqa: E402
from ts_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_segment_revenue",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "join_broadcast_agg",
    "agg_distinct",
    "window_functions",
    "topk_orders",
    "events_windows",
    "events_session",
    "asof_purchase_view",
    "range_join_events",
    "stream_stream_join",
    "pandas_median",
    "dedup_minhash_lsh",
    "dedup_ngram_topk",
    "embed_topk",
    "embed_neardup_label",
    "text_metrics",
    "text_signatures",
    "multimodal_meta_resize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="ts-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup: JVM + codegen + parquet footer cache
    run("pandas_median")  # warmup: Python/Arrow worker pool spin-up

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run(name), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
