"""Code-switch detection: hand fixtures (mixed, mono, unidentified,
ties), the shared pred_lang definition, and the DuckDB twin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ts_etl_spark.operators.textops import (
    mixed_language_signals,
    mixed_language_sql,
    pred_lang_expr,
)

EN = "the cat and the dog went to the house of friends"
FR = "le chat et la maison est dans les jardins des voisins"
DE = "der hund und die katze ist nicht in der stadt"
UND = "zzz qqq www rrr ttt yyy"

FIX = [
    (1, f"{EN}\n\n{FR}\n\n{EN}"),          # mixed: en x2, fr x1
    (2, f"{EN}\n\n{EN}"),                   # mono en
    (3, f"{UND}\n\n{UND}"),                 # nothing identifies
    (4, f"{EN}\n\n{DE}\n\n{FR}\n\n{UND}"),  # three-way mix + noise
    (5, ""),                                 # empty doc: one blank paragraph
]


def _docs(spark):
    return spark.createDataFrame(FIX, "doc_id LONG, text STRING")


def test_hand_fixture(spark):
    out = {r.doc_id: r for r in mixed_language_signals(_docs(spark)).collect()}
    assert len(out) == 5
    r1 = out[1]
    assert (r1.n_paragraphs, r1.n_langs, r1.dominant_lang, r1.mixed) == (3, 2, "en", True)
    assert abs(r1.dominant_frac - 2 / 3) < 1e-12
    r2 = out[2]
    assert (r2.n_langs, r2.dominant_lang, r2.dominant_frac, r2.mixed) == (1, "en", 1.0, False)
    r3 = out[3]
    assert (r3.n_langs, r3.dominant_lang, r3.dominant_frac, r3.mixed) == (0, "und", None, False)
    r4 = out[4]
    assert r4.n_langs == 3 and r4.mixed
    r5 = out[5]
    assert (r5.n_paragraphs, r5.n_langs, r5.dominant_lang) == (1, 0, "und")


def test_modal_tie_is_lexicographic(spark):
    docs = spark.createDataFrame(
        [(1, f"{FR}\n\n{EN}")], "doc_id LONG, text STRING"
    )
    r = mixed_language_signals(docs).collect()[0]
    assert r.dominant_lang == "en", "1-1 tie resolves to the smaller lang code"
    assert r.dominant_frac == 0.5 and r.mixed


def test_paragraph_pred_matches_doc_pred_on_single_paragraph(spark):
    """The shared definition: a one-paragraph doc's dominant_lang equals
    the whole-document pred_lang."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([EN, FR, DE, UND])],
        "doc_id LONG, text STRING",
    )
    whole = {
        r.doc_id: r.p
        for r in docs.select("doc_id", pred_lang_expr().alias("p")).collect()
    }
    per = {
        r.doc_id: r.dominant_lang
        for r in mixed_language_signals(docs).collect()
    }
    assert per == whole


def test_duckdb_twin(spark):
    got = sorted(map(tuple, mixed_language_signals(_docs(spark)).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", FIX)
    want = sorted(map(tuple, con.execute(mixed_language_sql()).fetchall()))
    assert got == want
