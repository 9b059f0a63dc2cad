"""Behavioral event analytics: ordered funnel conversion and cohort
retention — the two product-analytics operators every event store ships
(ClickHouse ``windowFunnel``, the SQL cohort-retention pattern),
expressed Spark-first.

Funnel: users progress through an ORDERED step sequence (e.g. view →
click → purchase); step i counts only events strictly AFTER the user's
step-(i-1) time and within ``horizon_seconds`` of their step-1 time.
Implemented as a min-timestamp chain: one partial-aggregated groupBy per
step over a skinny (user, ts) projection, each joined hash-wise to the
previous step's per-user row — K steps = K scans of one event-type
partition each + K keyed shuffles of per-USER rows (not per-event), no
window over the raw stream, no per-user sort. Timestamps compare at full
microsecond precision (no unix-seconds truncation), so results are
bit-identical cross-engine.

Retention: cohort = week of the user's first ``cohort_event``; a cohort
member is retained in week-offset k if they have ANY event in
cohort_week + k. One groupBy for first-seen, one distinct over (user,
week), one hash join, one cell aggregate — every shuffle carries
per-user or per-cell rows. Week truncation is Monday-based in both Spark
and DuckDB, making the cells exactly mirrorable.

At 100 TB both operators reduce the event stream to per-user rows in
their FIRST aggregation and never look back at raw events except through
partial-aggregated scans — the property that keeps them linear however
long the history grows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: registered-entry geometry: the purchase funnel over the synthetic
#: stream, one day to convert
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_HORIZON_S = 86_400
RETENTION_COHORT_EVENT = "signup"


def funnel_users(
    events: DataFrame,
    steps: Sequence[str] = FUNNEL_STEPS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: int = FUNNEL_HORIZON_S,
) -> DataFrame:
    """Per-user funnel progression: one row per user who completed step 1,
    with columns ``t1..tK`` — ``t_i`` the earliest step-i event strictly
    after ``t_{i-1}`` and within the horizon of ``t1``, NULL from the
    first uncompleted step on."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), F.col(ts_col).alias("t")
    )
    out = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
    )
    horizon = F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("et") == step)
            .join(out.select("u", f"t{i - 1}", "t1"), "u")
            .filter(
                (F.col("t") > F.col(f"t{i - 1}"))
                & (F.col("t") <= F.col("t1") + horizon)
            )
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        out = out.join(nxt, "u", "left")
    return out.select(
        F.col("u").alias(user_col), *[f"t{i}" for i in range(1, len(steps) + 1)]
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str] = FUNNEL_STEPS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: int = FUNNEL_HORIZON_S,
) -> DataFrame:
    """The funnel summary: one row per step —
    ``(step, step_name, n_users, conversion)`` with conversion the
    fraction of step-1 users reaching this step (NULL when nobody entered
    the funnel). The per-user frame reduces to ONE aggregate row (K
    non-null counts), then fans out to K rows driver-free."""
    u = funnel_users(
        events, steps, user_col, ts_col, type_col, horizon_seconds
    )
    one = u.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        r = one.select(
            F.lit(i).alias("step"),
            F.lit(f"{i}_{step}").alias("step_name"),
            F.col(f"n{i}").alias("n_users"),
            F.when(
                F.col("n1") > 0, F.col(f"n{i}").cast("double") / F.col("n1")
            ).alias("conversion"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = RETENTION_COHORT_EVENT,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention:
    ``(cohort, week_offset, n_active, retention)`` — cohort is the Monday
    of the user's first ``cohort_event`` week (date string), a user is
    active in offset k if they have any event during cohort-week + k
    (pre-cohort activity is ignored), retention = n_active /
    cohort_size."""
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), F.col(ts_col).alias("t")
    )
    first = (
        ev.filter(F.col("et") == cohort_event)
        .groupBy("u")
        .agg(F.date_trunc("week", F.min("t")).alias("cohort"))
    )
    active = ev.select("u", F.date_trunc("week", "t").alias("wk")).distinct()
    offset = (
        F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7
    ).cast("int")
    cells = (
        active.join(first, "u")
        .filter(F.col("wk") >= F.col("cohort"))
        .groupBy("cohort", offset.alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return cells.join(sizes, "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "week_offset",
        "n_active",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


def _sql_str(s: str) -> str:
    """Escape a value for inclusion in a single-quoted SQL literal —
    caller-supplied step/cohort names must not be able to break (or
    inject into) the generated twin."""
    return s.replace("'", "''")


def funnel_counts_sql(
    steps: Sequence[str] = FUNNEL_STEPS,
    horizon_seconds: int = FUNNEL_HORIZON_S,
) -> str:
    """DuckDB twin of ``funnel_counts`` over the ``events`` view — keep in
    lockstep with the Spark min-chain (strict progress, horizon from t1,
    microsecond-precision comparisons)."""
    ctes = [
        f"f1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
        f"WHERE event_type = '{_sql_str(steps[0])}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        # each f{i} carries t1 forward so the horizon check never re-joins f1
        ctes.append(
            f"f{i} AS (SELECT e.user_id, MIN(p.t1) AS t1, MIN(e.ts) AS t{i} "
            f"FROM events e JOIN f{i - 1} p USING (user_id) "
            f"WHERE e.event_type = '{_sql_str(step)}' AND e.ts > p.t{i - 1} "
            f"AND e.ts <= p.t1 + INTERVAL '{int(horizon_seconds)} seconds' "
            f"GROUP BY 1)"
        )
    selects = []
    for i, step in enumerate(steps, start=1):
        selects.append(
            f"SELECT {i} AS step, '{_sql_str(f'{i}_{step}')}' AS step_name, "
            f"(SELECT COUNT(*) FROM f{i}) AS n_users, "
            f"CASE WHEN (SELECT COUNT(*) FROM f1) > 0 THEN "
            f"CAST((SELECT COUNT(*) FROM f{i}) AS DOUBLE) "
            f"/ (SELECT COUNT(*) FROM f1) END AS conversion"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def retention_cohorts_sql(
    cohort_event: str = RETENTION_COHORT_EVENT,
) -> str:
    """DuckDB twin of ``retention_cohorts`` over the ``events`` view."""
    return f"""
        WITH rf AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
            FROM events WHERE event_type = '{_sql_str(cohort_event)}' GROUP BY 1
        ), ra AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        ), rj AS (
            SELECT cohort,
                   CAST(datediff('day', CAST(cohort AS DATE), CAST(wk AS DATE))
                        / 7 AS INT) AS week_offset,
                   COUNT(*) AS n_active
            FROM ra JOIN rf USING (user_id)
            WHERE wk >= cohort GROUP BY 1, 2
        ), rs AS (SELECT cohort, COUNT(*) AS cohort_size FROM rf GROUP BY 1)
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort, week_offset, n_active,
               CAST(n_active AS DOUBLE) / cohort_size AS retention
        FROM rj JOIN rs USING (cohort)
    """
