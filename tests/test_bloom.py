"""Bloom-filter membership: the no-false-negative contract, measured
false-positive behavior vs the analytic rate, sizing helper, NULL
handling, plan shape, and the DuckDB position-set mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.bloom import (
    BLOOM_BITS,
    BLOOM_K,
    bloom_bitmap_df,
    bloom_fpp,
    bloom_position_sql,
    bloom_probe_cols,
    bloom_size,
)


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "g STRING")


def test_no_false_negatives_ever(spark):
    members = [f"member-{i}" for i in range(500)]
    bf = bloom_bitmap_df(_items(spark, members))
    probed = bloom_probe_cols(_items(spark, members), bf)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_false_positive_rate_near_analytic(spark):
    """Probing 2000 non-members after 500 inserts: the observed FP rate
    must sit within 3x of the analytic (1-e^(-kn/m))^k — loose enough to
    be stable, tight enough to catch a broken hash."""
    members = [f"member-{i}" for i in range(500)]
    others = [f"other-{i}" for i in range(2000)]
    bf = bloom_bitmap_df(_items(spark, members))
    fp = bloom_probe_cols(_items(spark, others), bf).filter("bloom_hit").count()
    expected = bloom_fpp(500)
    assert fp / 2000 <= 3 * expected + 0.002, (fp, expected)


def test_null_values_probe_false_and_skip_build(spark):
    bf = bloom_bitmap_df(
        spark.createDataFrame([("a",), (None,)], "g STRING")
    )
    probed = {
        r.g: r.bloom_hit
        for r in bloom_probe_cols(
            spark.createDataFrame([("a",), (None,)], "g STRING"), bf
        ).collect()
    }
    assert probed["a"] is True
    assert probed[None] is False


def test_bitmap_is_one_dense_row(spark):
    bf = bloom_bitmap_df(_items(spark, ["x", "y"]))
    rows = bf.collect()
    assert len(rows) == 1
    assert len(rows[0].bf) == BLOOM_BITS // 64
    assert any(w != 0 for w in rows[0].bf)


def test_empty_build_set_probes_nothing(spark):
    bf = bloom_bitmap_df(_items(spark, []))
    row = bf.collect()
    # the aggregate still yields one all-zero row
    assert len(row) == 1 and all(w == 0 for w in row[0].bf)
    probed = bloom_probe_cols(_items(spark, ["a", "b"]), bf)
    assert probed.filter("bloom_hit").count() == 0


def test_probe_plan_is_broadcast_no_extra_shuffle(spark):
    """After the 1-row bitmap broadcast, probing adds no Exchange to the
    probe side and never a cartesian of real cardinality."""
    bf = bloom_bitmap_df(_items(spark, ["x"]))
    probed = bloom_probe_cols(_items(spark, ["a", "b"]), bf)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sizing_helper_round_trips_fpp():
    m, k = bloom_size(10_000, 0.01)
    assert m % 64 == 0
    assert bloom_fpp(10_000, m, k) <= 0.011
    with pytest.raises(ValueError):
        bloom_size(100, 1.5)


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap_df(_items(spark, ["a"]), n_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_bitmap_df(_items(spark, ["a"]), k=0)


def test_duckdb_position_mirror_matches_spark_bitmap(spark):
    """The oracle technique: DuckDB's md5 position set must equal the set
    of bits Spark sets in the bitmap (position membership == bit test)."""
    import duckdb

    vals = [f"w{i}" for i in range(50)]
    bf = bloom_bitmap_df(_items(spark, vals)).collect()[0].bf
    spark_bits = {
        64 * w + b for w, word in enumerate(bf) for b in range(64)
        if (word >> b) & 1
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck_bits = set()
    for j in range(BLOOM_K):
        duck_bits |= {
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT {bloom_position_sql('g', j)} FROM t"
            ).fetchall()
        }
    assert spark_bits == duck_bits


def test_caller_bf_column_survives_probe(spark):
    """Internals live under __bloom_* names, so a caller column named
    'bf' passes through the probe untouched."""
    members = ["a", "b"]
    bf = bloom_bitmap_df(_items(spark, members))
    df = _items(spark, members + ["z"]).withColumn("bf", F.lit(7))
    probed = bloom_probe_cols(df, bf)
    assert set(probed.columns) == {"g", "bf", "bloom_hit"}
    rows = probed.collect()
    assert all(r.bf == 7 for r in rows)
    assert all(r.bloom_hit for r in rows if r.g in members)


def test_reserved_internal_name_collision_raises(spark):
    bf = bloom_bitmap_df(_items(spark, ["a"]))
    clash = _items(spark, ["a"]).withColumn("__bloom_p0", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        bloom_probe_cols(clash, bf)


def test_optimal_sizing_holds_target_fpp_empirically(spark):
    """The sizing math (bloom_size) as evidence, not formula: build at a
    target fpp=0.01 for 400 members and measure the observed
    false-positive rate on 2000 held-out grams — it must stay within 2x
    of the target (the registered 8192-bit entry deliberately runs lossy;
    THIS is the production regime)."""
    target = 0.01
    members = [f"in-{i}" for i in range(400)]
    held_out = [f"out-{i}" for i in range(2000)]
    n_bits, k = bloom_size(len(members), target)
    assert bloom_fpp(len(members), n_bits, k) <= target
    bf = bloom_bitmap_df(_items(spark, members), n_bits=n_bits, k=k)
    probed = bloom_probe_cols(
        _items(spark, held_out), bf, n_bits=n_bits, k=k
    )
    fp = probed.filter(F.col("bloom_hit")).count()
    observed = fp / len(held_out)
    assert observed <= 2 * target, (n_bits, k, fp, observed)
    # and the no-false-negative side at this sizing too
    hits = bloom_probe_cols(_items(spark, members), bf, n_bits=n_bits, k=k)
    assert hits.filter(~F.col("bloom_hit")).count() == 0
