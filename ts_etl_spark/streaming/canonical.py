"""Structured Streaming over the reference's own surface: a stream of CSV
files continuously normalized onto the canonical schema.

The reference IS a streaming ETL (Node Transform pipeline over stdin,
reference src/index.ts:82); its Spark-native equivalent for unbounded input
is ``readStream`` over a landing directory with the SAME canonicalization
projection the batch path uses (one code path, two execution modes — the
Spark unification guarantee). Tests assert stream output == batch output
over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ts_etl_spark.functions.normalize import normalize_row_exprs
from ts_etl_spark.sources.csv_source import match_headers


def stream_csv_canonical(
    spark: SparkSession,
    path: str,
    header_line: str,
    delimiter: str = ",",
    encoding: str = "ISO-8859-1",
) -> DataFrame:
    """Stream CSV files from a directory into the canonical normalized
    frame. Streaming sources need a declared schema, so the actual header
    (from the landing contract or one sampled file) is passed explicitly;
    per-file header rows are still consumed by ``header=True``."""
    actual = header_line.split(delimiter)
    schema = T.StructType([T.StructField(h, T.StringType()) for h in actual])
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", encoding)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .format("csv")
        .load(path)
    )
    mapping = match_headers(raw.columns)
    return raw.select(normalize_row_exprs({h: F.col(f"`{a}`") for h, a in mapping.items()}))
