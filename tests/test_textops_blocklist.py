"""Blocklist content filter: path equivalence, DuckDB mirror, whole-token
semantics, plan shape, and the curation stage."""

from __future__ import annotations



def test_blocklist_inline_and_join_paths_agree_and_match_duckdb(spark):
    """Whole-token blocklist matching: the literal-array codegen path and
    the explode+broadcast-join path must agree exactly, and both must
    match a DuckDB mirror over the same tokenization."""
    import duckdb

    from ts_etl_spark.operators.bpe import WORD_PAT
    from ts_etl_spark.operators.textops import blocklist_signals

    docs = spark.createDataFrame(
        [
            (1, "the Spam and the CLASSIC class act"),
            (2, "clean words only here"),
            (3, ""),
            (4, "spam spam spam"),
            (5, None),
        ],
        "doc_id LONG, text STRING",
    )
    terms = ["spam", "class"]
    inline = {
        r.doc_id: (r.n_tokens, r.n_hits, r.n_distinct_hits, r.hit_frac)
        for r in blocklist_signals(docs, terms).collect()
    }
    joined = {
        r.doc_id: (r.n_tokens, r.n_hits, r.n_distinct_hits, r.hit_frac)
        for r in blocklist_signals(docs, terms, inline_limit=1).collect()
    }
    assert inline == joined
    # whole-token: "CLASSIC" does not hit "class"; case-insensitive
    assert inline[1] == (7, 2, 2, 2 / 7)
    assert inline[2] == (4, 0, 0, 0.0)
    # empty AND NULL text agree across paths: zero tokens, NULL fraction
    assert inline[3] == (0, 0, 0, None)
    assert inline[5] == (0, 0, 0, None)
    assert inline[4] == (3, 3, 1, 1.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [(r.doc_id, r.text) for r in docs.collect()],
    )
    want = {
        d: (n, h, dh, f)
        for d, n, h, dh, f in con.execute(
            f"""
            WITH toks AS (
                SELECT doc_id,
                       COALESCE(regexp_extract_all(lower(text), '{WORD_PAT}'),
                                []) AS t
                FROM docs
            )
            SELECT doc_id, len(t) AS n,
                   len(list_filter(t, w -> list_contains(['spam','class'], w))) AS h,
                   len(list_intersect(list_distinct(t), ['spam','class'])) AS dh,
                   CASE WHEN len(t) > 0 THEN
                        len(list_filter(t, w -> list_contains(['spam','class'], w)))::DOUBLE / len(t)
                   END AS f
            FROM toks
            """
        ).fetchall()
    }
    assert inline == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        blocklist_signals(docs, [])


def test_blocklist_inline_path_is_shuffle_free(spark):
    from ts_etl_spark.operators.textops import blocklist_signals

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    plan = (
        blocklist_signals(docs, ["a"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_blocklist_paths_share_one_schema(spark):
    """The inline and broadcast-join plans must emit IDENTICAL dtypes so
    outputs union cleanly across the inline_limit boundary."""
    from ts_etl_spark.operators.textops import blocklist_signals

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    inline = blocklist_signals(docs, ["a", "b"])
    joined = blocklist_signals(docs, ["a", "b"], inline_limit=1)
    assert inline.dtypes == joined.dtypes
    assert dict(inline.dtypes)["n_hits"] == "bigint"
    # and the union a consumer would write is legal + consistent
    assert inline.unionByName(joined).count() == 2


def test_frac_expr_refuses_oversized_term_lists(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ts_etl_spark.operators.textops import blocklist_frac_expr

    with _pytest.raises(ValueError, match="inline limit"):
        blocklist_frac_expr(F.col("text"), [f"t{i}" for i in range(3000)])


def test_registered_entry_routes_both_paths(spark, sf_smoke):
    """Round-11 gate: the text_pii_redaction entry carries BOTH
    blocklist plan shapes — the inline arm as a literal-array codegen
    projection (no join for it) and the >2048-term arm through the
    broadcast term-table join — and the term lists really straddle the
    routing boundary."""
    from ts_etl_spark.operators.textops import (
        BLOCKLIST_INLINE_TERMS,
        BLOCKLIST_JOIN_TERMS,
        q_text_pii_redaction,
    )

    assert len(set(BLOCKLIST_INLINE_TERMS)) <= 2048
    assert len(set(BLOCKLIST_JOIN_TERMS)) > 2048
    plan = (
        q_text_pii_redaction(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, "big-list arm must broadcast-probe"
    # non-trivial hits on the synthetic corpus for both arms (a blocklist
    # gate that never fires proves nothing)
    row = (
        q_text_pii_redaction(spark, sf_smoke)
        .selectExpr(
            "sum(bl_n_hits) AS a", "sum(blb_n_hits) AS b",
            "sum(bl_n_tokens) AS n",
        )
        .first()
    )
    assert row.a > 0 and row.b > 0 and row.n > 0
