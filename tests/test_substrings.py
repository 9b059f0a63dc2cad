"""Winnowing substring dedup: the w+k-1 detection guarantee (randomized
property), hand-derived boilerplate detection, span masking semantics,
fingerprint density, the DuckDB twin, and partition independence."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.substrings import (
    WINNOW_K,
    WINNOW_W,
    mask_repeated_spans,
    repeated_fingerprints,
    repeated_spans,
    winnow_fingerprints,
    winnow_fingerprints_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _rand_words(rng, n):
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def test_shared_run_guarantee_randomized(spark):
    """Any two docs sharing a token run of length >= w+k-1 share at least
    one fingerprint — the winnowing theorem, over randomized contexts."""
    k, w = 4, 6
    guarantee = w + k - 1  # 9 tokens
    rng = random.Random(7)
    rows = []
    for trial in range(8):
        shared = _rand_words(rng, guarantee)
        rows.append((trial * 2, f"{_rand_words(rng, rng.randrange(0, 30))} {shared} {_rand_words(rng, rng.randrange(0, 30))}"))
        rows.append((trial * 2 + 1, f"{_rand_words(rng, rng.randrange(0, 30))} {shared} {_rand_words(rng, rng.randrange(0, 30))}"))
    fps = winnow_fingerprints(_docs(spark, rows), k=k, w=w)
    collected = fps.collect()
    sets: dict = {}
    for r in collected:
        sets.setdefault(r.doc_id, set()).add(r.fp)
    for trial in range(8):
        a, b = sets.get(trial * 2, set()), sets.get(trial * 2 + 1, set())
        assert a & b, f"trial {trial}: shared {guarantee}-token run missed"


def test_boilerplate_detected_and_unique_docs_clean(spark):
    k, w = 4, 6
    boiler = " ".join(f"licensed under the apache license version two clause {i}" for i in range(2))
    rng = random.Random(3)
    rows = [
        (1, f"{_rand_words(rng, 20)} {boiler}"),
        (2, f"{boiler} {_rand_words(rng, 25)}"),
        (3, f"{_rand_words(rng, 15)} {boiler} {_rand_words(rng, 10)}"),
        (4, _rand_words(rng, 40)),
        (5, _rand_words(rng, 40)),
    ]
    spans = repeated_spans(_docs(spark, rows), k=k, w=w, min_docs=2).collect()
    flagged_docs = {r.doc_id for r in spans}
    assert {1, 2, 3} <= flagged_docs
    assert 4 not in flagged_docs and 5 not in flagged_docs
    assert all(r.n_docs >= 2 for r in spans)


def test_mask_removes_boilerplate_keeps_unique(spark):
    k, w = 4, 6
    boiler = "all rights reserved redistribution permitted under license terms only"
    rows = [
        (1, f"one unique sentence here {boiler}"),
        (2, f"{boiler} another quite different tail entirely"),
        (3, "no repeated content in this document at all whatsoever"),
    ]
    out = {
        r.doc_id: r
        for r in mask_repeated_spans(
            _docs(spark, rows), k=k, w=w, min_docs=2
        ).collect()
    }
    for w_ in boiler.split():
        assert w_ not in out[1].clean_text.split()
        assert w_ not in out[2].clean_text.split()
    assert out[1].n_tokens_removed > 0 and out[2].n_tokens_removed > 0
    # unique docs: canonical-whitespace passthrough, nothing removed
    assert out[3].clean_text == rows[2][1]
    assert out[3].n_tokens_removed == 0
    # unique prefix/suffix tokens survive
    assert "unique" in out[1].clean_text.split()
    assert "tail" in out[2].clean_text.split()


def test_fingerprint_density_near_expected(spark):
    """Winnowing selects ~2/(w+1) of positions; assert within loose
    bounds on a long random doc (no adversarial structure)."""
    k, w = 5, 20
    rng = random.Random(11)
    text = _rand_words(rng, 3000)
    n_grams = 3000 - k + 1
    n_sel = winnow_fingerprints(_docs(spark, [(1, text)]), k=k, w=w).count()
    expected = 2.0 / (w + 1) * n_grams
    assert 0.5 * expected <= n_sel <= 2.0 * expected, (n_sel, expected)


def test_duckdb_twin_matches_exactly(spark):
    rng = random.Random(5)
    shared = _rand_words(rng, 15)
    rows = [
        (1, f"{_rand_words(rng, 12)} {shared}"),
        (2, f"{shared} {_rand_words(rng, 9)}"),
        (3, _rand_words(rng, 25)),
        (4, "short doc"),  # fewer than k tokens -> no rows
    ]
    k, w = 4, 6
    got = sorted(
        map(tuple, winnow_fingerprints(_docs(spark, rows), k=k, w=w).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.execute(winnow_fingerprints_sql(k=k, w=w)).fetchall())
    )
    assert got == want and len(got) > 0
    assert not any(r[0] == 4 for r in got)


def test_mask_duckdb_twin_matches_exactly(spark):
    """mask_repeated_spans vs its SQL twin: value-for-value on a mix of
    masked candidates, clean docs, and sub-k docs."""
    from ts_etl_spark.operators.substrings import mask_repeated_spans_sql

    rng = random.Random(7)
    shared = _rand_words(rng, 14)
    rows = [
        (1, f"{_rand_words(rng, 10)} {shared}"),
        (2, f"{shared} {_rand_words(rng, 8)}"),
        (3, _rand_words(rng, 30)),
        (4, "short doc"),
        (5, ""),
    ]
    k, w, m = 4, 6, 2
    got = sorted(
        map(
            tuple,
            mask_repeated_spans(_docs(spark, rows), k=k, w=w, min_docs=m)
            .select("doc_id", "clean_text", "n_tokens_removed")
            .collect(),
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(mask_repeated_spans_sql(k=k, w=w, min_docs=m)).fetchall(),
        )
    )
    assert got == want
    removed = {r[0]: r[2] for r in got}
    assert removed[1] > 0 and removed[2] > 0, "shared run masked"
    assert removed[3] == 0 and removed[4] == 0 and removed[5] == 0


def test_partition_independence(spark):
    rng = random.Random(9)
    rows = [(i, _rand_words(rng, 60)) for i in range(20)]
    one = sorted(
        map(
            tuple,
            winnow_fingerprints(_docs(spark, rows).coalesce(1)).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            winnow_fingerprints(_docs(spark, rows).repartition(7)).collect(),
        )
    )
    assert one == many


def test_validation(spark):
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(_docs(spark, [(1, "a b c")]), k=0)
