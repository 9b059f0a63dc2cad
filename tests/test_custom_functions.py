"""User-defined function surface: scalar pandas UDF, UDAF, UDTF —
cross-checked against DuckDB / built-in equivalents."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.functions.custom import (
    WordNGrams,
    geo_mean,
    log1p_ratio,
    register_all,
)
from ts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def test_scalar_pandas_udf_matches_duckdb(spark, ddb):
    li = load_table(spark, SF, "lineitem")
    got = {
        (r.l_orderkey, r.l_linenumber): r.v
        for r in li.select(
            "l_orderkey",
            "l_linenumber",
            log1p_ratio(F.col("l_extendedprice"), F.col("l_quantity")).alias("v"),
        ).collect()
    }
    want = {
        (o, ln): v
        for o, ln, v in ddb.execute(
            "SELECT l_orderkey, l_linenumber,"
            " ln(1 + l_extendedprice / l_quantity) FROM lineitem"
        ).fetchall()
    }
    assert len(got) == len(want)
    assert all(math.isclose(got[k], want[k], rel_tol=1e-12) for k in want)


def test_udaf_geo_mean_matches_duckdb(spark, ddb):
    li = load_table(spark, SF, "lineitem")
    got = {
        r.l_returnflag: r.g
        for r in li.groupBy("l_returnflag").agg(geo_mean("l_quantity").alias("g")).collect()
    }
    want = {
        f: g
        for f, g in ddb.execute(
            "SELECT l_returnflag, exp(avg(ln(l_quantity)))"
            " FROM lineitem WHERE l_quantity > 0 GROUP BY l_returnflag"
        ).fetchall()
    }
    assert set(got) == set(want)
    assert all(math.isclose(got[k], want[k], rel_tol=1e-9) for k in want)


def test_udtf_word_ngrams_matches_builtin(spark):
    """The Python UDTF must produce exactly the grams of the JVM-side
    ngram_array pipeline (same tokenization)."""
    from ts_etl_spark.operators.textops import ngram_array

    register_all(spark)
    load_table(spark, SF, "documents").createOrReplaceTempView("udtf_docs")
    got = {
        (r.doc_id, r.pos, r.gram)
        for r in spark.sql(
            "SELECT doc_id, g.gram, g.pos FROM udtf_docs, "
            "LATERAL word_ngrams(text, 3) g WHERE doc_id < 30"
        ).collect()
    }
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    want = {
        (r.doc_id, r.pos, r.gram)
        for r in load_table(spark, SF, "documents")
        .filter("doc_id < 30")
        .select(
            "doc_id",
            F.posexplode(ngram_array(toks, 3)).alias("p0", "gram"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")
        .collect()
    }
    assert got == want and len(got) > 0


def test_sql_registration(spark):
    register_all(spark)
    row = spark.sql(
        "SELECT log1p_ratio(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS a"
    ).collect()[0]
    assert math.isclose(row.a, math.log(2.0), rel_tol=1e-12)
