"""Physical-plan audit helpers.

The 100 TB design rules this engine holds itself to (SURVEY.md §4.2, build
brief) are checkable properties of the optimized plan:

- filters reach the parquet scan (``PushedFilters``),
- projections prune the scan (``ReadSchema``),
- dimension joins broadcast (``BroadcastHashJoin``), big joins shuffle at
  most once per key change,
- top-k never globally sorts (``TakeOrderedAndProject``),
- row-level operators stay inside whole-stage codegen.

``tests/test_plans.py`` pins these for the headline queries so a regression
in plan shape fails CI, not just the benchmark.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan_str(df)))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan_str(df))


def count_nodes(df: DataFrame, node: str) -> int:
    # count only plan-tree node headers like "(4) Exchange", not free text
    return len(re.findall(rf"\(\d+\) {node}\b", plan_str(df)))


def num_exchanges(df: DataFrame) -> int:
    return count_nodes(df, "Exchange")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # simple mode marks codegen'd operators with a "*(stage)" prefix;
    # formatted mode tags them "[codegen id : N]"
    return "*(" in plan_str(df, "simple") or "codegen id" in plan_str(df)
