"""End-to-end pipeline compositions built from the operator surface."""

from ts_etl_spark.pipelines.curation import curate_documents, write_curated

__all__ = ["curate_documents", "write_curated"]
