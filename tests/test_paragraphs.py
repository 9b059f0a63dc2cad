"""Paragraph-level dedup: exact DuckDB mirror for both policies over a
multi-paragraph fixture (the synthetic documents table has no newlines,
so this operator is fixture-verified — see the module docstring),
policy semantics, structure preservation, idempotence, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.paragraphs import (
    dedup_paragraphs,
    dedup_paragraphs_sql,
)

BOILER = "All Rights Reserved.\nContact us for details."
COOKIE = "This site uses   cookies."


def _fixture(spark):
    rows = [
        (1, f"Unique intro one.\n\n{BOILER}\n\nUnique body one."),
        (2, f"{BOILER}\n\nUnique body two.\n\n{COOKIE}"),
        (3, f"Unique intro three.\n\n{COOKIE.lower()}\n\n\n\nTail three."),
        (4, "Entirely unique document with one paragraph."),
        (5, f"{BOILER}"),
        (6, ""),
        (7, f"Unique seven.\n\nUnique seven."),  # self-duplicate, df = 1
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


@pytest.mark.parametrize("mode", ["df", "keep_first", "within_doc"])
def test_matches_duckdb_exactly(spark, mode):
    docs = _fixture(spark)
    got = {
        r.doc_id: (r.text, r.n_paragraphs, r.n_kept)
        for r in dedup_paragraphs(docs, mode=mode).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [(r.doc_id, r.text) for r in docs.collect()],
    )
    want = {
        d: (t, n, k)
        for d, t, n, k in con.execute(
            dedup_paragraphs_sql(mode=mode)
        ).fetchall()
    }
    assert got == want, mode


def test_df_mode_drops_every_copy_of_shared_paragraphs(spark):
    out = {
        r.doc_id: r for r in dedup_paragraphs(_fixture(spark), mode="df").collect()
    }
    # BOILER (docs 1, 2, 5) and COOKIE (docs 2, 3 — case/whitespace
    # normalized) are gone everywhere
    for d in (1, 2, 3, 5):
        assert BOILER not in out[d].text
        assert "cookies" not in out[d].text.lower()
    # unique content survives verbatim
    assert out[1].text == "Unique intro one.\n\nUnique body one."
    assert out[2].text == "Unique body two."
    assert out[4].text == "Entirely unique document with one paragraph."
    # a document that was ALL boilerplate becomes empty, not absent
    assert out[5].text == "" and out[5].n_kept == 0
    assert out[6].text == ""
    # duplicate WITHIN one document is df=1: kept in df mode
    assert out[7].text == "Unique seven.\n\nUnique seven."


def test_keep_first_keeps_exactly_one_copy(spark):
    out = {
        r.doc_id: r
        for r in dedup_paragraphs(_fixture(spark), mode="keep_first").collect()
    }
    # BOILER survives only in doc 1 (lowest (doc_id, idx))
    assert BOILER in out[1].text
    assert BOILER not in out[2].text and BOILER not in out[5].text
    # normalized-equal cookie paragraph: doc 2's copy is first, doc 3 loses
    assert "cookies" in out[2].text
    assert "cookies" not in out[3].text.lower()
    # within-document duplicate: only the first copy survives
    assert out[7].text == "Unique seven."
    # blank structural paragraphs never count: doc 3's double-blank splits
    # into an empty paragraph that is preserved, not deduped
    assert out[3].n_paragraphs == 4


def test_idempotent(spark):
    docs = _fixture(spark)
    once = dedup_paragraphs(docs, mode="df").select("doc_id", "text")
    twice = dedup_paragraphs(once, mode="df").select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_validation_and_plan_shape(spark):
    docs = _fixture(spark)
    with pytest.raises(ValueError, match="mode"):
        dedup_paragraphs(docs, mode="nope")
    plan = (
        dedup_paragraphs(docs, mode="df")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regex_metacharacter_delimiter_is_literal(spark):
    """The delimiter is a literal, not a regex: '|' must split on pipes
    only (an unescaped regex '|' matches the empty string and shatters
    documents into characters), and both engines must agree."""
    docs = spark.createDataFrame(
        [(1, "shared part|unique one"), (2, "shared part|unique two")],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.text, r.n_paragraphs)
        for r in dedup_paragraphs(docs, mode="df", delimiter="|").collect()
    }
    assert got[1] == ("unique one", 2)
    assert got[2] == ("unique two", 2)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [(1, "shared part|unique one"), (2, "shared part|unique two")],
    )
    want = {
        d: (t, n)
        for d, t, n, _ in con.execute(
            dedup_paragraphs_sql(mode="df", delimiter="|")
        ).fetchall()
    }
    assert got == want
    with pytest.raises(ValueError, match="delimiter"):
        dedup_paragraphs(docs, delimiter="")


def test_within_doc_mode_leaves_cross_document_repeats(spark):
    """within_doc dedups repetition INSIDE a document only: doc 7's
    self-repeat collapses, while BOILER shared across docs 1/2/5 stays
    everywhere (cross-document policy is a separate decision)."""
    out = {
        r.doc_id: r
        for r in dedup_paragraphs(_fixture(spark), mode="within_doc").collect()
    }
    assert out[7].text == "Unique seven."
    for d in (1, 2, 5):
        assert BOILER in out[d].text, d


def test_neardup_pairs_catch_templated_boilerplate(spark):
    """Templated boilerplate with per-page substitutions never
    fingerprints equal (exact dedup misses it) but pairs under MinHash
    Jaccard; unrelated paragraphs never pair."""
    footer_a = (
        "copyright 2024 acme gmbh all rights reserved contact the "
        "operator for takedown requests and licensing terms"
    )
    footer_b = footer_a.replace("gmbh", "ltd")
    docs = spark.createDataFrame(
        [
            (1, f"unique body one with its own words\n\n{footer_a}"),
            (2, f"completely different second body text\n\n{footer_b}"),
            (3, "nothing shared with anything else at all here"),
        ],
        "doc_id LONG, text STRING",
    )
    from ts_etl_spark.operators.paragraphs import paragraph_neardup_pairs

    got = paragraph_neardup_pairs(docs, threshold=0.5).collect()
    assert len(got) == 1
    p = got[0]
    assert (p.doc_a, p.para_a, p.doc_b, p.para_b) == (1, 1, 2, 1)
    assert p.jaccard >= 0.5
    # exact paragraph dedup does NOT catch the substitution pair
    exact = {
        r.doc_id: r.n_kept
        for r in dedup_paragraphs(docs, mode="df").collect()
    }
    assert exact[1] == 2 and exact[2] == 2  # nothing dropped


def test_neardup_threshold_floor_and_sql_mode_validation(spark):
    from ts_etl_spark.operators.paragraphs import paragraph_neardup_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="recall floor"):
        paragraph_neardup_pairs(docs, threshold=0.2)
    with pytest.raises(ValueError, match="mode"):
        dedup_paragraphs_sql(mode="keepfirst")


def test_roundtrip_identity_property(spark):
    """When nothing qualifies for dropping, the split/reassemble cycle is
    the IDENTITY on arbitrary texts — including delimiter runs at the
    edges, empty paragraphs, unicode, and whitespace-only documents
    (property-based: the rewrite machinery must never corrupt a document
    it decided to keep intact)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=15, deadline=None)
    @given(texts)
    def check(batch):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "doc_id LONG, text STRING"
        )
        # min_df above the corpus size: nothing can qualify in df mode
        out = {
            r.doc_id: r.text
            for r in dedup_paragraphs(
                docs, mode="df", min_df=len(batch) + 1
            ).collect()
        }
        assert out == dict(enumerate(batch))

    check()


def test_within_doc_idempotent(spark):
    docs = _fixture(spark)
    once = dedup_paragraphs(docs, mode="within_doc").select("doc_id", "text")
    twice = dedup_paragraphs(once, mode="within_doc").select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_para_nd_arm_structure(spark, sf_smoke):
    """Round-11 gate: the para_nd arm of dedup_exact must emit EXACTLY
    one pair per planted template group (docs 2k and 2k+1, first
    paragraphs, Jaccard 6/8) — LSH recall at J=0.75 is effectively
    certain (miss probability (1-0.75^2)^32 ≈ 3e-12 per pair) and the
    cross-group construction shares zero shingles, so any extra or
    missing row is a logic bug, not banding noise."""
    from ts_etl_spark.operators.dedup import q_dedup_exact
    from ts_etl_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    rows = (
        q_dedup_exact(spark, sf_smoke)
        .filter("op = 'para_nd'")
        .collect()
    )
    assert len(rows) == n_docs // 2
    for r in rows:
        assert r.doc_id % 2 == 0 and r.n == r.doc_id + 1
        assert r.key == f"{r.doc_id + 1}:0:0:750000", r.key
