"""SCD-1 merge and SCD-2 history: winner semantics, interval invariants,
idempotence."""

from pyspark.sql import functions as F

from ts_etl_spark.pipelines.upsert import merge_upsert, scd2_apply


def _cur(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "NL", "2024-01-01"),
            (2, "bob", "DE", "2024-01-02"),
            (3, "carol", "FR", "2024-01-03"),
        ],
        "id LONG, name STRING, country STRING, updated STRING",
    )


def _upd(spark):
    return spark.createDataFrame(
        [
            (2, "bob", "BE", "2024-02-01"),   # update
            (4, "dave", "ES", "2024-02-02"),  # insert
            (3, "carol", "IT", "2024-01-01"), # STALE update (older) -> ignored
        ],
        "id LONG, name STRING, country STRING, updated STRING",
    )


def test_merge_upsert_latest_wins(spark):
    out = {
        r.id: (r.country, r.updated)
        for r in merge_upsert(_cur(spark), _upd(spark), ["id"], "updated").collect()
    }
    assert out == {
        1: ("NL", "2024-01-01"),  # untouched
        2: ("BE", "2024-02-01"),  # updated
        3: ("FR", "2024-01-03"),  # stale update ignored
        4: ("ES", "2024-02-02"),  # inserted
    }


def test_merge_upsert_idempotent_and_tiebreak(spark):
    once = merge_upsert(_cur(spark), _upd(spark), ["id"], "updated")
    twice = merge_upsert(once, _upd(spark), ["id"], "updated")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # equal-timestamp correction: the update side wins the tie
    fix = spark.createDataFrame(
        [(1, "alice", "UK", "2024-01-01")],
        "id LONG, name STRING, country STRING, updated STRING",
    )
    out = {r.id: r.country for r in merge_upsert(_cur(spark), fix, ["id"], "updated").collect()}
    assert out[1] == "UK"


def _hist(spark):
    return spark.createDataFrame(
        [
            (1, "NL", "2024-01-01", "2024-03-01", False),
            (1, "BE", "2024-03-01", None, True),
            (2, "DE", "2024-01-02", None, True),
        ],
        "id LONG, country STRING, valid_from STRING, valid_to STRING, is_current BOOLEAN",
    )


def test_scd2_intervals_partition_timeline(spark):
    upd = spark.createDataFrame(
        [(1, "FR", "2024-05-01"), (2, "IT", "2024-04-01"), (3, "ES", "2024-06-01")],
        "id LONG, country STRING, updated STRING",
    )
    out = scd2_apply(_hist(spark), upd, ["id"], "updated").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.id, []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        # exactly one open current row per key, at the end
        assert [r.is_current for r in rows] == [False] * (len(rows) - 1) + [True]
        # intervals chain with no gap/overlap
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
        assert rows[-1].valid_to is None
    assert {r.id: [x.country for x in v] for r, v in [(v[0], v) for v in by_key.values()]} == {
        1: ["NL", "BE", "FR"],
        2: ["DE", "IT"],
        3: ["ES"],
    }


def test_scd2_idempotent(spark):
    upd = spark.createDataFrame(
        [(1, "FR", "2024-05-01")], "id LONG, country STRING, updated STRING"
    )
    once = scd2_apply(_hist(spark), upd, ["id"], "updated")
    twice = scd2_apply(once, upd, ["id"], "updated")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
