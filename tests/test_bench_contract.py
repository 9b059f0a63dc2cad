"""Contract between bench.py and the registered query surface.

Round 2 consolidated/renamed `queries()` entries but bench.py's HEADLINE
list kept the old names, so bench crashed with KeyError and the round
produced no BENCH line at all. These tests make that class of breakage a
test failure instead of a silent loss of the perf signal. No Spark session
needed — pure import-level checks.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    # bench.py sets PYSPARK_SUBMIT_ARGS at import; scope it so other tests'
    # sessions aren't affected.
    before = {
        k: os.environ.get(k) for k in ("PYSPARK_SUBMIT_ARGS", "SPARK_GRAFT_DRIVER_MEM")
    }
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    finally:
        for k, v in before.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        sys.modules.pop("bench", None)
    return mod


def test_headline_names_are_registered_queries():
    from ts_etl_spark.operators import all_queries

    bench = _load_bench()
    registered = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"bench HEADLINE names not in queries(): {missing}"


def test_supplement_entries_resolve_and_do_not_shadow():
    """Bench supplements (timed but deliberately outside the 50-entry
    driver window) must resolve to callables and must never shadow a
    registered query name — a collision would silently re-time the
    registered entry under the supplement protocol."""
    from ts_etl_spark.operators import all_queries

    bench = _load_bench()
    sup = bench._supplement()
    assert sup, "supplement map unexpectedly empty"
    registered = set(all_queries())
    assert not (set(sup) & registered), "supplement shadows queries() names"
    assert all(callable(f) for f in sup.values())


def test_query_surface_fits_driver_window():
    """The driver's CORRECTNESS sweep verifies the first 50 queries() entries
    in registration order; every declared query must get a row."""
    from ts_etl_spark.operators import all_oracle, all_queries

    qs = all_queries()
    assert len(qs) <= 50, (
        f"{len(qs)} queries registered; the driver only verifies the first 50 — "
        "consolidate before registering more"
    )
    # every query has an oracle (rows-only checks are deliberate, keep none)
    assert set(all_oracle()) == set(qs)


def test_memoized_cold_entries_are_timed_names():
    """Every MEMOIZED name (cold-sample recording, round-11) must be an
    entry bench actually times — HEADLINE or a supplement — or the cold
    record silently vanishes from BENCH_r{N}.json."""
    bench = _load_bench()
    timed = set(bench.HEADLINE) | set(bench._supplement())
    stray = [n for n in bench.MEMOIZED if n not in timed]
    assert not stray, f"MEMOIZED names bench never times: {stray}"


def test_clear_construction_memos_resolves():
    """The cold-sample stall guard clears each MEMOIZED entry's own
    module-level memo by import — a memo rename must fail here, not
    crash mid-bench; an unknown name must refuse (a MEMOIZED addition
    without a registered memo would silently record a warm cold)."""
    import pytest

    bench = _load_bench()
    for name in bench.MEMOIZED:
        bench._clear_construction_memos(name)
    with pytest.raises(KeyError):
        bench._clear_construction_memos("not_a_memoized_entry")


def test_bench_priors_cover_timed_entries():
    """bench_priors.json (the round-15 stall-recheck baseline) must
    only name entries bench actually times — a consolidation rename
    that misses the priors file would silently disable the recheck for
    the renamed entry (or KeyError-free no-op on a ghost name)."""
    import json

    mod = _load_bench()
    with open(os.path.join(REPO, "bench_priors.json")) as fh:
        priors = json.load(fh)
    timed = set(mod.HEADLINE) | set(mod._supplement())
    ghosts = set(priors) - timed
    assert not ghosts, f"priors name untimed entries: {sorted(ghosts)}"
    assert all(
        isinstance(v, (int, float)) and v > 0 for v in priors.values()
    )
