"""Gap filling: a hand-checkable fixture with interior and edge gaps,
a DuckDB mirror over the real events table, and the completeness
invariant (dense grid per key)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.gapfill import gap_fill_interpolate

SF = "/root/testdata/sf0.001"
HOUR = 3600


def test_handmade_gaps_interpolate_linearly(spark):
    rows = [
        (1, "2024-01-01 00:30:00", 10.0),
        (1, "2024-01-01 03:15:00", 40.0),   # 2 missing buckets between
        (1, "2024-01-01 04:45:00", 20.0),
        (2, "2024-01-01 00:00:00", 5.0),    # single observation
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r.user_id, str(r.bucket_ts)): r
        for r in gap_fill_interpolate(
            df, "user_id", "ts", "value", HOUR
        ).collect()
    }
    # key 1: buckets 00..04, gaps at 01 and 02 blend 10 -> 40 linearly
    assert out[(1, "2024-01-01 00:00:00")].value == 10.0
    assert out[(1, "2024-01-01 01:00:00")].value == pytest.approx(20.0)
    assert out[(1, "2024-01-01 02:00:00")].value == pytest.approx(30.0)
    assert out[(1, "2024-01-01 03:00:00")].value == 40.0
    assert out[(1, "2024-01-01 04:00:00")].value == 20.0
    assert out[(1, "2024-01-01 01:00:00")].filled
    assert not out[(1, "2024-01-01 00:00:00")].filled
    # key 2: one bucket, no gaps
    assert len([k for k in out if k[0] == 2]) == 1


def test_dense_grid_and_duckdb_mirror(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = gap_fill_interpolate(events, "user_id", "ts", "value", HOUR)
    # key on epoch seconds: DuckDB renders timestamps TZ-aware, Spark
    # naive (both sessions are UTC)
    got = {
        (r.user_id, r.epoch_b): (r.value, r.filled)
        for r in out.withColumn(
            "epoch_b", F.unix_timestamp("bucket_ts")
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = con.execute("""
        WITH actual AS (
            SELECT user_id AS k,
                   to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS b,
                   AVG(value) AS v
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT k, unnest(generate_series(min(b), max(b), INTERVAL 1 HOUR)) AS b
            FROM actual GROUP BY k
        ),
        j AS (SELECT g.k, g.b, a.v FROM grid g LEFT JOIN actual a USING (k, b)),
        n AS (
            SELECT k, b, v,
                   last_value(v IGNORE NULLS) OVER
                     (PARTITION BY k ORDER BY b ROWS UNBOUNDED PRECEDING) AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
                     (PARTITION BY k ORDER BY b ROWS UNBOUNDED PRECEDING) AS pb,
                   first_value(v IGNORE NULLS) OVER
                     (PARTITION BY k ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER
                     (PARTITION BY k ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
            FROM j
        )
        SELECT k, CAST(epoch(b) AS BIGINT) AS eb,
               COALESCE(v, pv + (nv - pv) * (epoch(b) - epoch(pb)) / (epoch(nb) - epoch(pb))) AS value,
               v IS NULL AS filled
        FROM n
    """).fetchall()
    assert len(got) == len(want)
    for k, eb, value, filled in want:
        gv, gf = got[(k, eb)]
        assert gf == filled
        if value is None:
            assert gv is None
        else:
            assert gv == pytest.approx(value, abs=1e-9)

    # dense grid: per key, bucket count == (max-min)/hour + 1
    spans = (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                (
                    F.unix_timestamp(F.max("bucket_ts"))
                    - F.unix_timestamp(F.min("bucket_ts"))
                )
                / HOUR
                + 1
            ).alias("expect"),
        )
        .collect()
    )
    for r in spans:
        assert r.n == r.expect


def test_invalid_bucket_rejected(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError):
        gap_fill_interpolate(df, "user_id", "ts", "value", 0)
