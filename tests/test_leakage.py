"""Split leakage audit: hand fixtures (exact + near pairs across splits,
same-split pairs suppressed), full DuckDB mirror over the real corpus
with the deterministic split hash, component-safe splits passing the
audit by construction, and input validation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.dedup import JACCARD_THRESHOLD
from ts_etl_spark.pipelines.leakage import (
    component_safe_splits,
    split_leakage_audit,
)

SF = "/root/testdata/sf0.01"

# word-9-sequences: 1/2 identical modulo case+whitespace (exact layer);
# 3/4 share all but the last word (3-gram Jaccard 6/8 = 0.75 >= 0.5);
# 5/6 likewise but SAME split; 7 unrelated
T = "alpha beta gamma delta epsilon zeta eta theta iota"
FIX = [
    (1, T, "train"),
    (2, "  " + T.upper() + " ", "test"),
    (3, T + " kappa", "train"),
    (4, T + " lambda", "val"),
    (5, "one two three four five six seven eight nine ten", "train"),
    (6, "one two three four five six seven eight nine zzz", "train"),
    (7, "totally different words about other things entirely here now", "test"),
]


def _fix(spark):
    return spark.createDataFrame(FIX, "doc_id LONG, text STRING, split STRING")


def test_hand_fixture_kinds_and_suppression(spark):
    persisted = []
    out = split_leakage_audit(
        _fix(spark), split_col="split", persisted=persisted
    ).collect()
    for df in persisted:
        df.unpersist()
    got = {(r.kind, r.id_a, r.id_b): r for r in out}
    # 1≅2 exact (case/whitespace); 1,2,3,4 all share the 9-word prefix so
    # every cross-split pair among them is a near pair — except (1,2),
    # which the exact layer owns, and (1,3), which shares 'train'
    assert set(got) == {
        ("exact", 1, 2),
        ("near", 1, 4),
        ("near", 2, 3),
        ("near", 2, 4),
        ("near", 3, 4),
    }
    assert got[("exact", 1, 2)].jaccard is None
    assert ("near", 3, 4) in got and got[("near", 3, 4)].jaccard >= JACCARD_THRESHOLD
    assert not any(k[1] == 5 or k[2] == 5 for k in got), "same-split pair suppressed"
    assert not any(k[1] == 7 or k[2] == 7 for k in got), "unrelated doc clean"
    # exact pairs never re-reported as near
    assert ("near", 1, 2) not in got
    for r in out:
        assert r.split_a != r.split_b


def test_duckdb_mirror_on_real_corpus(spark):
    """Full audit vs a from-scratch DuckDB mirror: md5-derived split
    assignment (train/test 50/50 to maximize straddle odds), fingerprint
    equality for exact, all-pairs exact Jaccard for near (LSH == exact at
    this threshold on this corpus — the dedup_minhash_lsh oracle's own
    equivalence)."""
    from ts_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    persisted = []
    got = sorted(
        map(
            tuple,
            split_leakage_audit(
                docs,
                weights={"train": 0.5, "test": 0.5},
                persisted=persisted,
            ).collect(),
        )
    )
    for df in persisted:
        df.unpersist()

    from ts_etl_spark.operators.dedup import _SHINGLES_CTE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        WITH {_SHINGLES_CTE},
        hashed AS (
            SELECT doc_id, md5('split#' || CAST(doc_id AS VARCHAR)) AS d
            FROM documents
        ),
        sp AS (
            SELECT doc_id,
                   CASE WHEN CAST(list_sum(
                       [(strpos('0123456789abcdef', substr(d, i, 1)) - 1)::BIGINT
                        << ((8 - i) * 4) for i in generate_series(1, 8)]
                   ) AS DOUBLE) / 4294967296.0 < 0.5
                   THEN 'train' ELSE 'test' END AS s
            FROM hashed
        ),
        fp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
            FROM documents
        ),
        ex AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
        )
        SELECT 'exact' AS kind, id_a, id_b, sa.s AS split_a, sb.s AS split_b,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM ex JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b
        WHERE sa.s != sb.s
        UNION ALL
        SELECT 'near', j.id_a, j.id_b, sa.s, sb.s, j.jaccard
        FROM jac j
        JOIN sp sa ON sa.doc_id = j.id_a JOIN sp sb ON sb.doc_id = j.id_b
        WHERE j.jaccard >= {JACCARD_THRESHOLD} AND sa.s != sb.s
          AND NOT EXISTS (
              SELECT 1 FROM ex WHERE ex.id_a = j.id_a AND ex.id_b = j.id_b
                AND (SELECT s FROM sp WHERE doc_id = ex.id_a)
                    != (SELECT s FROM sp WHERE doc_id = ex.id_b)
          )
        """
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) > 0, "non-vacuous: the 50/50 split must straddle some pair"


def test_component_safe_splits_pass_the_audit(spark):
    from ts_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    persisted = []
    safe = component_safe_splits(
        docs, {"train": 0.5, "test": 0.5}, persisted=persisted
    ).persist()
    persisted.append(safe)
    try:
        assert safe.count() == docs.count(), "every doc assigned"
        audit = split_leakage_audit(
            safe, split_col="split", persisted=persisted
        )
        assert audit.count() == 0, "component splitting eliminates leakage"
        # representative key: component == min doc_id of its group
        comps = safe.groupBy("component").agg(
            F.min("doc_id").alias("mn"), F.count("*").alias("n")
        )
        assert comps.filter(F.col("component") != F.col("mn")).count() == 0
        assert comps.filter(F.col("n") > 1).count() > 0, "non-vacuous groups"
    finally:
        for df in persisted:
            df.unpersist()


def test_star_edges_linear_in_group_size_same_components(spark):
    """The splitter's exact edges are the star construction: a planted
    1000-copy group yields exactly g−1 = 999 edges (the pair join would
    make 499,500), and the components they induce are identical."""
    from ts_etl_spark.operators.dedup import min_label_components
    from ts_etl_spark.pipelines.leakage import (
        _exact_pair_edges,
        _exact_star_edges,
    )

    g = 1000
    rows = [(i, "the same boilerplate text every crawler keeps finding") for i in range(g)]
    rows += [(g, "first unique document"), (g + 1, "second unique document")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    star = _exact_star_edges(docs)
    assert star.count() == g - 1
    hub = {r.id_a for r in star.collect()}
    assert hub == {0}, "hub is the group's min doc_id"

    small = docs.filter(F.col("doc_id") >= g - 5)  # 5 copies + 2 uniques
    nodes = small.select(F.col("doc_id").alias("node"))

    def comps(edges):
        return {
            (r.node, r.comp)
            for r in min_label_components(edges, nodes=nodes).collect()
        }

    assert comps(_exact_star_edges(small)) == comps(_exact_pair_edges(small))


def test_edge_violations_equivalent_to_audit_emptiness(spark):
    """split_edge_violations' emptiness gate: nonempty exactly when the
    full audit is nonempty on the leaking hand fixture, empty on
    component-safe splits, and linear on a planted degenerate group
    (star edges, never the audit's O(g²) pairs)."""
    from ts_etl_spark.pipelines.leakage import split_edge_violations

    fix = _fix(spark)
    labels = fix.select("doc_id", "split")
    viol = split_edge_violations(fix, labels).collect()
    assert viol, "leaking fixture shows crossing edges"
    persisted = []
    audit = split_leakage_audit(fix, split_col="split", persisted=persisted)
    assert audit.count() > 0
    for df in persisted:
        df.unpersist()
    # every audited leak's component is represented among edge kinds
    kinds = {r.kind for r in viol}
    assert kinds <= {"exact", "near"} and kinds

    safe = component_safe_splits(fix, {"train": 0.5, "test": 0.5})
    assert (
        split_edge_violations(fix, safe.select("doc_id", "split")).count() == 0
    ), "component-safe splits show zero crossing edges"

    # planted 1000-copy group straddling a split: the EXACT layer sees
    # it through g-1 star edges, never the audit's 499500 pairs (the
    # near layer is LSH's clique on not-yet-deduped identical text —
    # the documented reason this gate runs post-exact-dedup in practice)
    g = 1000
    rows = [(i, "same boilerplate text that every crawler keeps finding") for i in range(g)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    bad = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "train").otherwise("test").alias("split"),
    )
    v = split_edge_violations(docs, bad)
    n_exact = v.filter(F.col("kind") == "exact").count()
    assert 0 < n_exact <= g - 1, f"exact layer linear, got {n_exact}"


def test_validation(spark):
    docs = _fix(spark)
    with pytest.raises(ValueError, match="exactly one"):
        split_leakage_audit(docs)
    with pytest.raises(ValueError, match="exactly one"):
        split_leakage_audit(docs, weights={"a": 1}, split_col="split")
    with pytest.raises(ValueError, match="not in docs"):
        split_leakage_audit(docs.drop("split"), split_col="split")


def test_min_label_components_raises_on_non_convergence(spark):
    """A chain longer than the iteration budget must fail loudly, not
    return split components (review finding: silent truncation would
    break component_safe_splits' by-construction guarantee)."""
    from ts_etl_spark.operators.dedup import min_label_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a LONG, id_b LONG"
    )
    # small_edges=0 forces the distributed Pregel path (the local
    # union-find is exact at any diameter and would mask the budget)
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, max_iter=2, small_edges=0)
    # ...and converges fine with budget for the diameter
    labels = min_label_components(chain, max_iter=10, small_edges=0)
    assert {r.comp for r in labels.collect()} == {0}
    labels.unpersist()


@pytest.mark.slow
def test_local_union_find_equals_distributed(spark):
    """The route-by-size fast path: driver-local union-find labels equal
    the distributed Pregel labels on a mixed graph (chain + clique +
    isolated nodes), with and without an explicit node frame."""
    import random

    from ts_etl_spark.operators.dedup import min_label_components

    rng = random.Random(31)
    edges = [(i, i + 1) for i in range(10, 18)]  # a 9-node chain
    edges += [(a, b) for a in range(4) for b in range(4) if a < b]  # clique
    edges += [(rng.randrange(100, 200), rng.randrange(100, 200)) for _ in range(30)]
    edges = [e for e in edges if e[0] != e[1]]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    nodes = spark.createDataFrame(
        [(n,) for n in range(250)], "node LONG"
    )

    def lab(**kw):
        df = min_label_components(pairs, **kw)
        out = {(r.node, r.comp) for r in df.collect()}
        df.unpersist()
        return out

    assert lab() == lab(small_edges=0)
    assert lab(nodes=nodes) == lab(nodes=nodes, small_edges=0)
    got = dict(lab(nodes=nodes))
    assert got[249] == 249, "isolated node labels itself"
    assert all(got[i] == 10 for i in range(10, 19)), "chain collapses to min"
