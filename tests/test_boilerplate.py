"""Boilerplate detection: a planted-template fixture where the expected
scores are derivable by hand, a full DuckDB mirror over the real
documents table, and keep-every-row semantics."""

from __future__ import annotations

import duckdb
import pytest

from ts_etl_spark.operators.boilerplate import boilerplate_scores, q_boilerplate

SF = "/root/testdata/sf0.001"

FOOTER = "copyright acme corp all rights reserved"  # 6 words -> 2 5-grams


def test_planted_template_is_detected(spark):
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet pink brown black",
        "north south east west up down left right front back",
    ]
    rows = [(i, f"{b} {FOOTER}") for i, b in enumerate(bodies)]
    rows.append((99, "unique words only nothing shared here at all"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: r
        for r in boilerplate_scores(
            docs, n=5, min_doc_frac=0.5, min_docs=2
        ).collect()
    }
    # every footer-carrying doc: 6 body grams + 2 footer grams + 4
    # straddling grams (body tail x footer head, unique per doc) = 12
    # distinct grams, of which exactly the 2 footer grams are shared by
    # all four docs (>= 50% of 5)
    for i in range(4):
        assert out[i].n_grams == 12
        assert out[i].n_boiler == 2
        assert out[i].boiler_frac == pytest.approx(2 / 12)
    assert out[99].n_boiler == 0


def test_matches_duckdb_mirror_on_real_corpus(spark):
    got = {
        r.doc_id: (r.n_grams, r.n_boiler)
        for r in q_boilerplate(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute("""
        WITH words AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(w[ix.i:ix.i + 4], ' ') AS g
            FROM words,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i) ix
        ),
        total AS (SELECT COUNT(*) AS n FROM documents),
        boiler AS (
            SELECT g, 1 AS hit FROM grams, total
            GROUP BY g, total.n
            HAVING COUNT(*) >= greatest(2, CAST(ceil(0.05 * total.n) AS BIGINT))
        ),
        scored AS (
            SELECT gr.doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(COALESCE(b.hit, 0)) AS INT) AS n_boiler
            FROM grams gr LEFT JOIN boiler b USING (g)
            GROUP BY gr.doc_id
        )
        SELECT d.doc_id, COALESCE(s.n_grams, 0), COALESCE(s.n_boiler, 0)
        FROM documents d LEFT JOIN scored s USING (doc_id)
        """).fetchall()
    }
    assert got == want
    # the synthetic corpus is word salad, so zero boilerplate hits here is
    # the CORRECT answer on both engines — cross-engine equality is the
    # claim; positive detection is pinned by the planted-template fixture


def test_gramless_docs_kept_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, None)], "doc_id LONG, text STRING"
    )
    out = {r.doc_id: r for r in boilerplate_scores(docs).collect()}
    assert out[1].n_grams == 0 and out[1].boiler_frac == 0.0
    assert out[2].n_grams == 0
    with pytest.raises(ValueError):
        boilerplate_scores(docs, min_doc_frac=0.0)
    with pytest.raises(ValueError):
        boilerplate_scores(docs, min_docs=1)
