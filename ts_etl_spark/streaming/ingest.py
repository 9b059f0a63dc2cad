"""Continuous corpus ingestion: a landing directory of document files
streams through incremental dedup into a persisted, growing corpus.

Each micro-batch runs ``operators.dedup.dedup_incremental`` against the
corpus-so-far via ``foreachBatch`` (the integration point for batch-only
constructs inside a stream), appending only surviving documents. The
batch-side equivalence proof (``tests/test_incremental.py``) transfers:
the streamed corpus converges to exactly what one-shot recuration of all
input would keep.

Failure semantics: checkpointing makes batch replay possible, and the
operator makes replay IDEMPOTENT — a replayed batch's documents already in
the corpus drop in the exact layer (same canonical fingerprint ⇒
``exact_corpus``), so the corpus never double-ingests. That self-healing
property is why production dedup-on-ingest pipelines key on content
fingerprints rather than offsets.

Scale notes: the per-batch cost is linear in the batch — the corpus side
contributes its fingerprint set and LSH band index, both skinny narrow
projections (materialize them as bucketed tables and append per batch to
avoid even the corpus re-scan; kept as derived-on-read here since the
driver's test corpora are small)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.fs import path_exists
from ts_etl_spark.operators.dedup import JACCARD_THRESHOLD, dedup_incremental

DOCS_SCHEMA = "doc_id LONG, text STRING"


def _corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    # existence via the Hadoop FileSystem API — os.path would silently
    # report an hdfs:// or s3a:// corpus as absent
    if path_exists(spark, corpus_path):
        return spark.read.schema(DOCS_SCHEMA).parquet(corpus_path)
    return spark.createDataFrame([], DOCS_SCHEMA)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    corpus_path: str,
    threshold: float = JACCARD_THRESHOLD,
) -> None:
    """Dedup one batch against the persisted corpus; append survivors.

    The shingle-set frames dedup_incremental caches are unpersisted once
    the append materializes them — a stream runs this every micro-batch,
    and skipping the release would accumulate cached blocks for the
    lifetime of the query."""
    corpus = _corpus(spark, corpus_path)
    persisted: list[DataFrame] = []
    kept = (
        dedup_incremental(
            corpus, batch_df.select("doc_id", "text"), threshold, persisted
        )
        .filter(F.col("kept"))
        .select("doc_id", "text")
    )
    try:
        kept.write.mode("append").parquet(corpus_path)
    finally:
        for df in persisted:
            df.unpersist()


def run_streaming_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    checkpoint: str,
    threshold: float = JACCARD_THRESHOLD,
    max_files: int | None = 1,
) -> None:
    """Stream the landing directory into the corpus until all available
    files are processed (``availableNow``), one incremental-dedup round per
    micro-batch."""
    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.load(landing_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, corpus_path, threshold)

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
