"""Local mirror of the driver's correctness gate: run every ``queries()``
entry on Spark at sf0.01 and its ``oracle_sql()`` on DuckDB over the same
parquet files; compare row count, column names, and the full order-
insensitive multiset of values (exact equality — the engine is designed so
results are bit-identical, see operators/relational.py docstring)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# driver gate runs at sf0.01; the soak tier (pytest -m soak) reruns every
# parity case at sf0.1 to catch SF-dependent nondeterminism (decimal
# overflow, tie-breaks, AQE plan changes) before the driver would.
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
SOAK_SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def ddb():
    con = _connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def ddb_soak():
    con = _connect(SOAK_SF_DIR)
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(rows, cols):
    # order-insensitive multiset compare: sort columns by name, count tuples
    from collections import Counter

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


# The driver's value hasher is *encoding*-sensitive: identical values hash
# differently if one engine returns e.g. int128 (DuckDB HUGEINT from
# SUM(INTEGER)) where the other returns int64.  Map every DuckDB result type
# to its Spark equivalent and require an exact logical-type match so that
# class of driver failure is caught locally (round-2 q12 regression test).
_DUCK2SPARK = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "int128-NOT-REPRESENTABLE-IN-SPARK",
    "UHUGEINT": "uint128-NOT-REPRESENTABLE-IN-SPARK",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def _duck_to_spark_type(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{_duck_to_spark_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return _DUCK2SPARK.get(t, f"<unmapped-duckdb-type:{t}>")


def _check_result_types(spark, con, name, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    ddb_types = {
        row[0]: _duck_to_spark_type(row[1])
        for row in con.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
    }
    assert spark_types == ddb_types, (
        f"{name}: result type mismatch (driver hash is encoding-sensitive); "
        f"spark={spark_types} duckdb={ddb_types}"
    )


def _check_match(spark, con, name, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(ORACLE[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count differs"
    sn, dn = _rows(spark_rows, spark_cols), _rows(ddb_rows, ddb_cols)
    only_s = list((sn - dn).keys())[:3]
    only_d = list((dn - sn).keys())[:3]
    assert sn == dn, f"{name}: mismatch; spark-only={only_s} ddb-only={only_d}"


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_result_types(spark, ddb, name):
    _check_result_types(spark, ddb, name, SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, ddb, name):
    _check_match(spark, ddb, name, SF_DIR)


@pytest.mark.soak
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match_soak(spark, ddb_soak, name):
    """Full parity sweep at sf0.1 — 10x the driver's gate SF.  Catches
    SF-dependent nondeterminism (decimal overflow, tie-breaks, AQE plan
    changes).  Excluded from the default run; execute with ``pytest -m soak``
    (ideally SPARK_TEST_MASTER=local[16])."""
    _check_result_types(spark, ddb_soak, name, SOAK_SF_DIR)
    _check_match(spark, ddb_soak, name, SOAK_SF_DIR)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
