"""Corpus quality signals — the round-3 statistical quality operators
(bigram-LM perplexity proxy, cross-document boilerplate detection, PSI
snapshot drift) folded into ONE driver-gated long-format entry, so the
hard external correctness sweep covers them (the registry is capped at
50; this is the tagged-union consolidation pattern of ``agg_extensions``).

Unified schema ``(op, doc_id, n, n2, v, ok)``:

- ``lm`` rows (one per document): n = bigram count, v = the add-k-smoothed
  average log-probability under the corpus-trained bigram LM, rounded to
  6 decimals (sums of libm logs are last-ulp engine-dependent — the same
  tolerance discipline as ``scalar_functions``); NULL for bigram-less
  documents.
- ``boiler`` rows (one per document): n = distinct word-5-grams,
  n2 = grams shared corpus-wide (df ≥ max(2, 5%·N)), v = the boilerplate
  fraction (a single exact division — no rounding needed).
- ``clf`` rows (one per document, round 5): n = token count, v = the
  hashing-trick linear quality score (fastText-style: md5-bucketed
  tokens, derived stand-in weights, sigmoid of the mean — see
  ``operators/classifier.py``), rounded to 6 decimals (the sigmoid's
  libm exp is last-ulp engine-dependent; the underlying activation is
  bit-exact and pinned by tests/test_classifier.py); NULL for
  token-less documents.
- ``drift_base`` / ``drift_cur`` rows (one per bucket): the Laplace-
  smoothed document-length share per side, splitting the corpus into
  even/odd doc_id halves (a deterministic two-snapshot stand-in). Shares
  are exact rationals of counts — value-matched unrounded.
- ``drift_psi`` rows (one per bucket plus the bucket = -1 total): the PSI
  contribution, rounded to 6 decimals (ln of a share ratio).
- ``drift_hpsi`` rows (round 15; one per bucket plus the total): the
  SAME PSI computed through ``psi_drift_hist`` with the baseline side
  pre-aggregated into an exact weighted-value histogram — the
  weighted-baseline path ``ingest_batch``'s drift monitor runs against
  the persisted length-HDR registers. With an exact histogram the arm
  is bit-identical to ``drift_psi`` BY CONSTRUCTION (same IEEE
  expression shapes; tests/test_drift.py pins it), so one oracle CTE
  serves both — and the sweep now gates the production route, not just
  its unit tests.

Every underlying operator keeps its own exhaustive suite (tests/test_lm,
test_boilerplate, test_drift); this entry pins the cross-engine answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.operators.boilerplate import BOILER_N, boilerplate_scores
from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.classifier import (
    score_hashed_linear,
    score_hashed_linear_sql,
)
from ts_etl_spark.operators.drift import psi_drift_hist, psi_drift_sided
from ts_etl_spark.operators.lm import score_documents, train_bigram_lm
from ts_etl_spark.sources.tables import load_table, spread_input

LM_K = 0.5
DRIFT_BUCKETS = 10


def q_corpus_quality_signals(
    spark: SparkSession,
    sf_dir: str,
    persisted: list[DataFrame] | None = None,
) -> DataFrame:
    """LM scoring + boilerplate + classifier scoring + drift over
    ``documents`` (see module docstring). Plan shape: each arm keeps its
    own linear plan (explode + two hash joins; gram explode + df
    threshold; a shuffle-free classifier projection; two bounded bucket
    aggregates) — the union adds no exchange.

    Cache contract (same as ``pipelines.curation.curate_documents``):
    the shared tokenized projection is persisted and needed until the
    RESULT materializes, so release belongs to the caller — pass
    ``persisted`` (a list) to receive the cached frame and unpersist it
    after collecting; one-shot bench/driver runs clear the whole cache
    instead."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ni = F.lit(None).cast("int")
    t = F.lit(True)

    # ONE shared tokenized projection feeds lm-train, lm-score and the
    # classifier arm — the regex tokenizer is the per-row hot spot, and
    # without sharing each arm re-reads and re-tokenizes the corpus
    # (the shared-scan discipline of pipelines/curation.py). The persist
    # holds only (doc_id, tokens); one-shot bench/driver runs clear the
    # whole cache after each query. Round 16: the projection is spread
    # behind the guard — on the single-split local file the tokenizer
    # (and every cache partition consumer after it, e.g. the clf
    # projection) otherwise runs as ONE task; interleaved A/B with the
    # boiler spread below: entry 4.0 → 3.5 s, win in every paired
    # sample. Guard-gated: shuffle-free at production scan widths.
    docs_spread = spread_input(docs, "doc_id")
    toked = docs_spread.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(WORD_PAT), 0).alias(
            "__toks"
        ),
    ).persist()
    if persisted is not None:
        persisted.append(toked)

    uni, bi = train_bigram_lm(toked, tokens_col="__toks")
    lm = score_documents(toked, uni, bi, k=LM_K, tokens_col="__toks").select(
        F.lit("lm").alias("op"),
        "doc_id",
        F.col("n_bigrams").alias("n"),
        ni.alias("n2"),
        F.round("avg_logprob", 6).alias("v"),
        t.alias("ok"),
    )

    # the boiler arm's exploded gram frame feeds TWO consumers (df
    # aggregate + scoring join); cache it under the entry's documented
    # contract — caller-released via `persisted`, or (bench/driver
    # one-shots) cleared with the whole cache, same as `toked` above
    _boiler_caches = persisted if persisted is not None else []
    boiler = boilerplate_scores(
        docs_spread, n=BOILER_N, persisted=_boiler_caches
    ).select(
        F.lit("boiler").alias("op"),
        "doc_id",
        F.col("n_grams").cast("int").alias("n"),
        F.col("n_boiler").cast("int").alias("n2"),
        F.col("boiler_frac").alias("v"),
        t.alias("ok"),
    )

    clf = score_hashed_linear(toked, tokens_col="__toks").select(
        F.lit("clf").alias("op"),
        "doc_id",
        F.col("n_tokens").cast("int").alias("n"),
        ni.alias("n2"),
        F.round("score", 6).alias("v"),
        t.alias("ok"),
    )

    # deterministic two-snapshot stand-in: even vs odd doc_id halves.
    # ONE-PASS sided PSI + ONE explode fan-out: the previous shape (the
    # two-frame psi_drift referenced by three union branches) re-executed
    # the whole drift subtree per branch — 15+ documents scans for a
    # 10-bucket answer; this computes counts in 2 scans and fans the
    # (base, cur, psi) row kinds out of the tiny local detail frame.
    psi = psi_drift_sided(
        docs.select(F.length("text").alias("len"), (F.col("doc_id") % 2 == 1).alias("cur")),
        F.col("cur"),
        "len",
        n_buckets=DRIFT_BUCKETS,
    )
    nb = F.lit(None).cast("bigint")
    kinds = [
        F.struct(F.lit("drift_base").alias("op"), F.col("share_base").alias("v")),
        F.struct(F.lit("drift_cur").alias("op"), F.col("share_cur").alias("v")),
        F.struct(F.lit("drift_psi").alias("op"), F.round("psi_term", 6).alias("v")),
    ]
    drift = psi.select(
        F.col("bucket"),
        F.explode(
            F.when(F.col("bucket") >= 0, F.array(*kinds)).otherwise(
                F.array(kinds[2])
            )
        ).alias("e"),
    ).select(
        F.col("e.op").alias("op"),
        nb.alias("doc_id"),
        F.col("bucket").alias("n"),
        ni.alias("n2"),
        F.col("e.v").alias("v"),
        t.alias("ok"),
    )

    # the weighted-baseline route (round 15): baseline side collapsed to
    # an EXACT (length, count) histogram first — the shape the ingest
    # drift monitor feeds from the persisted HDR registers. Exactness of
    # the histogram makes this bit-identical to drift_psi (pinned in
    # tests/test_drift.py), so the oracle reuses the one psi CTE; the
    # two arms hash-matching EACH OTHER inside the sweep is the gate on
    # the production path's algebra.
    even_hist = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .groupBy(F.length("text").cast("double").alias("v"))
        .agg(F.count("*").alias("n"))
    )
    hdrift = psi_drift_hist(
        even_hist,
        docs.filter(F.col("doc_id") % 2 == 1).select(
            F.length("text").alias("len")
        ),
        "len",
        n_buckets=DRIFT_BUCKETS,
    ).select(
        F.lit("drift_hpsi").alias("op"),
        nb.alias("doc_id"),
        F.col("bucket").alias("n"),
        ni.alias("n2"),
        F.round("psi_term", 6).alias("v"),
        t.alias("ok"),
    )
    return (
        lm.unionByName(boiler)
        .unionByName(clf)
        .unionByName(drift)
        .unionByName(hdrift)
    )


def _quality_oracle_sql() -> str:
    n = BOILER_N
    k = DRIFT_BUCKETS
    return rf"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PAT}') AS t
            FROM documents
        ),
        lm_grams AS (
            -- list_zip pads to the longer list; the padded tail pair is
            -- (last, NULL) and tokens are never NULL, so filter it out
            SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
                SELECT doc_id, unnest(list_zip(t, t[2:])) AS p FROM toks
            ) WHERE p[2] IS NOT NULL
        ),
        uni AS (
            SELECT w1 AS w, COUNT(*) AS c1 FROM (
                SELECT doc_id, unnest(t) AS w1 FROM toks
            ) GROUP BY 1
        ),
        bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM lm_grams GROUP BY 1, 2),
        vv AS (SELECT COUNT(*) AS v FROM uni),
        lm_scored AS (
            SELECT g.doc_id,
                   COUNT(*) AS n_bigrams,
                   AVG(ln(COALESCE(b.c2, 0) + {LM_K})
                       - ln(COALESCE(u.c1, 0) + {LM_K} * vv.v)) AS avg_logprob
            FROM lm_grams g
            LEFT JOIN bi b USING (w1, w2)
            LEFT JOIN uni u ON g.w1 = u.w
            CROSS JOIN vv
            GROUP BY g.doc_id
        ),
        words AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
            FROM documents
        ),
        bgrams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(w[ix.i:ix.i + {n - 1}], ' ') AS g
            FROM words,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1})) AS i) ix
        ),
        total AS (SELECT COUNT(*) AS n FROM documents),
        boiler AS (
            SELECT g, 1 AS hit FROM bgrams, total
            GROUP BY g, total.n
            HAVING COUNT(*) >= greatest(2, CAST(ceil(0.05 * total.n) AS BIGINT))
        ),
        bscored AS (
            SELECT gr.doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(COALESCE(b.hit, 0)) AS INT) AS n_boiler
            FROM bgrams gr LEFT JOIN boiler b USING (g)
            GROUP BY gr.doc_id
        ),
        lens AS (
            SELECT doc_id % 2 AS side, CAST(length(text) AS DOUBLE) AS v
            FROM documents
        ),
        rng AS (SELECT min(v) AS lo, max(v) AS hi FROM lens),
        buckets AS (
            SELECT side,
                   CASE WHEN hi > lo THEN
                        least(greatest(CAST(floor(((v - lo) / (hi - lo)) * {k})
                                            AS INT), 0), {k - 1})
                   ELSE 0 END AS bucket
            FROM lens, rng
        ),
        counted AS (
            SELECT side, bucket, COUNT(*) AS c FROM buckets GROUP BY 1, 2
        ),
        grid AS (SELECT unnest(generate_series(0, {k - 1})) AS bucket),
        tot AS (
            SELECT side, SUM(c) AS t FROM counted GROUP BY side
        ),
        shares AS (
            SELECT g.bucket,
                   (COALESCE(c0.c, 0) + 0.5)
                     / (COALESCE(t0.t, 0) + 0.5 * {k}) AS share_base,
                   (COALESCE(c1.c, 0) + 0.5)
                     / (COALESCE(t1.t, 0) + 0.5 * {k}) AS share_cur
            FROM grid g
            LEFT JOIN (SELECT * FROM counted WHERE side = 0) c0 USING (bucket)
            LEFT JOIN (SELECT * FROM counted WHERE side = 1) c1 USING (bucket)
            LEFT JOIN (SELECT * FROM tot WHERE side = 0) t0 ON TRUE
            LEFT JOIN (SELECT * FROM tot WHERE side = 1) t1 ON TRUE
        ),
        psi AS (
            SELECT CAST(bucket AS INT) AS bucket, share_base, share_cur,
                   (share_cur - share_base) * ln(share_cur / share_base) AS term
            FROM shares
        )
        SELECT 'lm' AS op, d.doc_id,
               CAST(COALESCE(s.n_bigrams, 0) AS INT) AS n,
               CAST(NULL AS INT) AS n2,
               round(s.avg_logprob, 6) AS v, TRUE AS ok
        FROM documents d LEFT JOIN lm_scored s USING (doc_id)
        UNION ALL
        SELECT 'boiler' AS op, d.doc_id,
               CAST(COALESCE(s.n_grams, 0) AS INT) AS n,
               CAST(COALESCE(s.n_boiler, 0) AS INT) AS n2,
               CASE WHEN COALESCE(s.n_grams, 0) > 0
                    THEN CAST(s.n_boiler AS DOUBLE) / s.n_grams
                    ELSE 0.0 END AS v,
               TRUE AS ok
        FROM documents d LEFT JOIN bscored s USING (doc_id)
        UNION ALL
        SELECT 'clf', doc_id, CAST(n_tokens AS INT), CAST(NULL AS INT),
               round(score, 6), TRUE
        FROM ({score_hashed_linear_sql()})
        UNION ALL
        SELECT 'drift_base', CAST(NULL AS BIGINT), bucket, CAST(NULL AS INT),
               share_base, TRUE FROM psi
        UNION ALL
        SELECT 'drift_cur', CAST(NULL AS BIGINT), bucket, CAST(NULL AS INT),
               share_cur, TRUE FROM psi
        UNION ALL
        SELECT 'drift_psi', CAST(NULL AS BIGINT), bucket, CAST(NULL AS INT),
               round(term, 6), TRUE FROM psi
        UNION ALL
        SELECT 'drift_psi', CAST(NULL AS BIGINT), CAST(-1 AS INT),
               CAST(NULL AS INT), round(SUM(term), 6), TRUE FROM psi
        UNION ALL
        -- weighted-baseline arm (round 15): with an EXACT histogram the
        -- Spark side is bit-identical to drift_psi, so the same CTE is
        -- the mirror for both
        SELECT 'drift_hpsi', CAST(NULL AS BIGINT), bucket, CAST(NULL AS INT),
               round(term, 6), TRUE FROM psi
        UNION ALL
        SELECT 'drift_hpsi', CAST(NULL AS BIGINT), CAST(-1 AS INT),
               CAST(NULL AS INT), round(SUM(term), 6), TRUE FROM psi
    """


QUERIES = {"corpus_quality_signals": q_corpus_quality_signals}
ORACLE = {"corpus_quality_signals": _quality_oracle_sql()}
