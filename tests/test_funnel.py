"""Funnel conversion and cohort retention: hand-derived fixtures, the
ordering/horizon contracts, monotonicity, and DuckDB mirrors over the
real events table."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.funnel import (
    funnel_counts,
    funnel_counts_sql,
    funnel_users,
    retention_cohorts,
    retention_cohorts_sql,
)

SF = "/root/testdata/sf0.01"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts TIMESTAMP"
    )


def test_funnel_hand_fixture(spark):
    """u1 completes all 3 steps in order; u2 clicks BEFORE viewing (breaks
    order); u3 purchases past the horizon; u4 only views."""
    t = datetime
    rows = [
        (1, "view", t(2024, 1, 1, 10)), (1, "click", t(2024, 1, 1, 11)),
        (1, "purchase", t(2024, 1, 1, 12)),
        (2, "click", t(2024, 1, 1, 9)), (2, "view", t(2024, 1, 1, 10)),
        (2, "purchase", t(2024, 1, 1, 11)),
        (3, "view", t(2024, 1, 1, 0)), (3, "click", t(2024, 1, 1, 1)),
        (3, "purchase", t(2024, 1, 3, 0)),  # > 24h after the view
        (4, "view", t(2024, 1, 2, 0)),
    ]
    got = {
        r.step_name: (r.n_users, r.conversion)
        for r in funnel_counts(_ev(spark, rows)).collect()
    }
    assert got["1_view"] == (4, 1.0)
    assert got["2_click"] == (2, 0.5)  # u1 and u3 click after viewing
    assert got["3_purchase"] == (1, 0.25)  # only u1 inside the horizon
    users = {r.user_id: r for r in funnel_users(_ev(spark, rows)).collect()}
    assert users[1].t3 is not None
    assert users[2].t2 is None  # click before view never counts
    assert users[3].t2 is not None and users[3].t3 is None


def test_funnel_strict_ordering_excludes_simultaneous_events(spark):
    """A step at exactly the same timestamp as the previous step does NOT
    advance the funnel (strictly-after semantics)."""
    t = datetime(2024, 1, 1, 10)
    rows = [(1, "view", t), (1, "click", t)]
    got = {r.step_name: r.n_users for r in funnel_counts(_ev(spark, rows)).collect()}
    assert got == {"1_view": 1, "2_click": 0, "3_purchase": 0}


def test_funnel_empty_first_step_yields_null_conversion(spark):
    rows = [(1, "click", datetime(2024, 1, 1))]
    got = funnel_counts(_ev(spark, rows)).collect()
    assert all(r.n_users == 0 and r.conversion is None for r in got)
    with pytest.raises(ValueError, match="two steps"):
        funnel_counts(_ev(spark, rows), steps=["view"])


def test_funnel_counts_monotone_and_match_duckdb(spark):
    """On the real events table the per-step counts never increase, and
    the whole summary matches the SQL twin exactly."""
    import duckdb

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(
        (r.step, r.step_name, r.n_users, r.conversion)
        for r in funnel_counts(ev).collect()
    )
    ns = [g[2] for g in got]
    assert ns == sorted(ns, reverse=True) and ns[0] > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(con.execute(funnel_counts_sql()).fetchall())
    assert got == want


def test_retention_hand_fixture(spark):
    """Two cohort members signing up in week of Jan 1 2024 (a Monday):
    one active in weeks 0 and 1, one only week 0; a pre-signup event is
    ignored; a user without the cohort event never appears."""
    t = datetime
    rows = [
        (1, "signup", t(2024, 1, 2)), (1, "view", t(2024, 1, 10)),
        (2, "signup", t(2024, 1, 3)),
        (2, "view", t(2023, 12, 25)),  # pre-cohort activity: ignored
        (3, "view", t(2024, 1, 4)),  # never signed up
    ]
    got = {
        (r.cohort, r.week_offset): (r.n_active, r.retention)
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
    }


def test_retention_matches_duckdb_on_real_events(spark):
    import duckdb

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(map(tuple, retention_cohorts(ev).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(con.execute(retention_cohorts_sql()).fetchall())
    assert got == want and len(got) > 0
    # offset-0 retention is 1.0 by construction (the signup itself)
    assert all(r[3] == 1.0 for r in got if r[1] == 0)


def test_funnel_and_retention_plans_reduce_before_shuffling(spark):
    """Neither operator windows or sorts the raw stream: no Window over
    events, no CartesianProduct; the funnel plan's joins are per-user."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for df in (funnel_counts(ev), retention_cohorts(ev)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


def test_sql_twins_escape_quoted_names(spark):
    """Step/cohort names containing a single quote must produce valid,
    non-injectable SQL in the DuckDB twins (matching the Spark side,
    which compares them as plain values)."""
    import duckdb

    t = datetime
    rows = [
        (1, "o'view", t(2024, 1, 1, 10)), (1, "o'buy", t(2024, 1, 1, 11)),
        (2, "o'view", t(2024, 1, 2, 10)),
    ]
    ev = _ev(spark, rows)
    steps = ("o'view", "o'buy")
    got = sorted(map(tuple, funnel_counts(ev, steps=steps).collect()))
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = sorted(map(tuple, con.execute(funnel_counts_sql(steps)).fetchall()))
    assert got == want and got[0][2] == 2
    got_r = sorted(
        map(tuple, retention_cohorts(ev, cohort_event="o'view").collect())
    )
    want_r = sorted(
        con.execute(retention_cohorts_sql("o'view")).fetchall()
    )
    assert got_r == [tuple(r) for r in want_r] and len(got_r) >= 1
