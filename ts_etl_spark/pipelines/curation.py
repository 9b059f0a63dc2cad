"""Training-data curation pipeline: the operator surface composed into the
end-to-end corpus-preparation flow a large-scale LLM data pipeline runs —
quality gate → canonical/exact dedup → MinHash-LSH near-dup removal →
language filter → greedy token budget — with full per-document provenance.

Every stage reuses an already-oracle-checked operator (textops metrics and
signatures, dedup.q_dedup_minhash_lsh, skew.bucketed_running_sum), so the
pipeline adds POLICY, not new computation. Plan shape at 100 TB:

- metrics/signals: one shuffle-free codegen projection over the scan.
- canonical dedup: one (fingerprint) keyed window — group size = duplicate
  multiplicity, bounded in practice (a pathological viral-text key is the
  salted-aggregate case; the rank only needs min, which AQE skew-split
  handles).
- near-dup removal: the LSH pair list (banded candidates, exact verify) is
  orders of magnitude smaller than the corpus; survivors anti-join against
  its id_b side — one broadcast-able skinny join.
- token budget: skew-safe two-level cumulative sum (bucketed_running_sum),
  never a single-partition global sort.

Provenance contract: the returned frame has EVERY input document, `kept`
boolean, and a `drop_reason` in dropped rows (first failing stage in
pipeline order: quality → exact_dup → near_dup → language → budget), so
corpus composition is auditable and each stage's yield is one groupBy away.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.operators.dedup import JACCARD_THRESHOLD, q_dedup_minhash_lsh
from ts_etl_spark.operators.skew import bucketed_running_sum
from ts_etl_spark.operators.textops import _metric_cols, _signature_cols
from ts_etl_spark.sinks.table_sink import write_parquet
from ts_etl_spark.sources.tables import load_table


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    languages: Sequence[str] | None = None,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    token_budget: int | None = None,
) -> DataFrame:
    """Run the curation flow over ``documents``; return every document with
    metrics, signals, and provenance (``kept`` / ``drop_reason``).

    Policies (each documented where it diverges from a naive formulation):

    - exact dedup dedups on the CANONICAL fingerprint (lowercased,
      whitespace-collapsed md5 from textops) — catches trivially-reformatted
      copies, keeps the lowest doc_id of each group.
    - near-dup removal is greedy-by-id over verified LSH pairs (cosine of
      the pair list: keep ``id_a``, drop ``id_b``): every dropped document
      has a surviving near-duplicate with a smaller id. Pairs are computed
      over the FULL corpus (not post-filter survivors) so the pair list is
      reusable across policy changes; a doc dropped by quality may still
      "shield" its near-dups — by design, the kept representative is then
      absent, which is the conservative direction (drops more, never keeps
      two near-dups).
    - token budget is greedy by ascending doc_id over BPE-ish token counts
      of documents that survived every other stage: a document is in budget
      while the cumulative count BEFORE it is under the budget (so the
      boundary document that crosses the line is kept — budget is a target,
      not a hard ceiling; flip the comparison for a hard cap).
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "text", *_metric_cols(), *_signature_cols())

    # exact/canonical dedup: rank within fingerprint, rep = lowest doc_id
    from pyspark.sql.window import Window

    fp_w = Window.partitionBy("fingerprint").orderBy("doc_id")
    scored = scored.withColumn(
        "is_exact_dup", F.row_number().over(fp_w) > 1
    )

    # near-dup removal: verified LSH pairs, drop the higher id of each pair
    pairs = q_dedup_minhash_lsh(spark, sf_dir).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    near_dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    scored = scored.join(
        near_dropped.withColumn("is_near_dup", F.lit(True)), "doc_id", "left"
    ).withColumn("is_near_dup", F.coalesce("is_near_dup", F.lit(False)))

    lang_ok = (
        F.col("pred_lang").isin(*languages) if languages else F.lit(True)
    )
    scored = scored.withColumn("lang_ok", lang_ok)

    # first failing stage in pipeline order (null = survived all gates)
    reason = (
        F.when(~F.col("quality_pass"), "quality")
        .when(F.col("is_exact_dup"), "exact_dup")
        .when(F.col("is_near_dup"), "near_dup")
        .when(~F.col("lang_ok"), "language")
    )
    scored = scored.withColumn("drop_reason", reason)

    if token_budget is None:
        return scored.withColumn("kept", F.col("drop_reason").isNull())

    # greedy token budget over surviving docs, skew-safe global cumsum
    survivors = scored.filter(F.col("drop_reason").isNull())
    budgeted = bucketed_running_sum(
        survivors.withColumn("__all", F.lit(0)),
        key="__all",
        order="doc_id",
        value="n_bpe_tokens",
        out="cum_tokens",
    ).drop("__all")
    in_budget = (F.col("cum_tokens") - F.col("n_bpe_tokens")) < F.lit(token_budget)
    budgeted = budgeted.select(
        "doc_id",
        F.col("cum_tokens").alias("cum_tokens"),
        (~in_budget).alias("over_budget"),
    )
    out = (
        scored.join(budgeted, "doc_id", "left")
        .withColumn(
            "drop_reason",
            F.coalesce(
                "drop_reason", F.when(F.col("over_budget"), "budget")
            ),
        )
        .withColumn("kept", F.col("drop_reason").isNull())
        .drop("over_budget")
    )
    return out


def write_curated(df: DataFrame, path: str) -> None:
    """Persist the kept documents partitioned by predicted language — the
    layout downstream per-language sampling reads with partition pruning."""
    write_parquet(df.filter(F.col("kept")), path, partition_by=["pred_lang"])
