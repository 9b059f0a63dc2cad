"""Incremental (batch-vs-corpus) dedup: planted-case behavior and
equivalence with one-shot greedy dedup over the union."""

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    canonical_fingerprint,
    dedup_incremental,
    minhash_bands,
    shingle_sets,
)
from ts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon "
    "phi chi psi omega one two three four five six"
)
OTHER = (
    "red orange yellow green blue indigo violet black white gray "
    "brown pink cyan magenta teal maroon navy olive lime aqua "
    "silver gold bronze copper iron zinc lead tin nickel cobalt"
)


def test_incremental_planted_cases(spark):
    corpus = _df(spark, [(1, BASE), (2, OTHER)])
    near_base = BASE.replace("one two three four five six", "uno dos tres cuatro cinco seis")
    novel = (
        "table chair lamp desk shelf couch rug curtain mirror clock "
        "vase frame plant book pen cup plate bowl fork spoon "
        "knife pot pan tray jar lid rack hook bin box"
    )
    near_novel = novel.replace("knife pot pan tray jar lid rack hook bin box",
                               "blade kettle wok board tin cap stand nail bag crate")
    batch = _df(
        spark,
        [
            (10, "  " + BASE.upper() + " "),  # reformatted copy -> exact_corpus
            (11, near_base),                  # near-dup of corpus -> near_corpus
            (12, novel),                      # novel -> kept
            (13, novel),                      # exact copy within batch -> exact_batch
            (14, near_novel),                 # near-dup within batch -> near_batch
        ],
    )
    out = {r.doc_id: (r.kept, r.drop_reason) for r in dedup_incremental(corpus, batch).collect()}
    assert out[10] == (False, "exact_corpus")
    assert out[11] == (False, "near_corpus")
    assert out[12] == (True, None)
    assert out[13] == (False, "exact_batch")
    assert out[14] == (False, "near_batch")


@pytest.fixture(scope="module")
def split_docs(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return docs.filter("doc_id < 350"), docs.filter("doc_id >= 350")


def test_incremental_equals_one_shot_on_real_data(spark, split_docs):
    """The convergence property: incremental ingestion drops exactly the
    batch documents that one-shot greedy-by-id dedup over corpus ∪ batch
    would drop — so a continuously-fed corpus equals a recurated one."""
    corpus, batch = split_docs
    union = corpus.unionByName(batch)

    # one-shot reference: exact layer = smaller-id canonical-fp twin;
    # near layer = verified LSH pairs over the union, drop the higher id
    from pyspark.sql.window import Window

    fp_w = Window.partitionBy("fp").orderBy("doc_id")
    exact_dropped = {
        r.doc_id
        for r in union.select("doc_id", canonical_fingerprint().alias("fp"))
        .withColumn("rk", F.row_number().over(fp_w))
        .filter("rk > 1")
        .collect()
    }
    sets = shingle_sets(union).persist()
    bands = minhash_bands(sets)
    cands = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("shs").alias("shs_a"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("shs").alias("shs_b"))
    common = F.size(F.array_intersect("shs_a", "shs_b"))
    un = F.size("shs_a") + F.size("shs_b") - common
    near_dropped = {
        r.id_b
        for r in cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter((common.cast("double") / un) >= JACCARD_THRESHOLD)
        .collect()
    }

    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    want_dropped = (exact_dropped | near_dropped) & batch_ids

    got = dedup_incremental(corpus, batch).collect()
    got_dropped = {r.doc_id for r in got if not r.kept}
    assert {r.doc_id for r in got} == batch_ids  # every batch row reported
    assert got_dropped == want_dropped
