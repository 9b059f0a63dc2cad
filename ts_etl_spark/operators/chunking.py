"""Document chunking for embedding pipelines: split each document into
overlapping character spans with stable ids — the step between a curated
corpus and an embedding model with a bounded context.

Fully declarative (``sequence`` of start offsets exploded + ``substring``
slicing — no UDF), so chunking a 100 TB corpus is one narrow
generate-and-project over the scan: fan-out is bounded by
``ceil(len / stride)`` per document, there is no shuffle, and every chunk
carries (doc_id, chunk_idx, char_start) so downstream embeddings join
back to their source span without re-reading the text.

The final chunk is the only one allowed shorter than ``chunk_chars``;
a stride of ``chunk_chars - overlap`` guarantees every character is
covered and consecutive chunks share exactly ``overlap`` characters
(except at the tail). Empty documents produce a single empty chunk, so
every input row remains represented (the same keep-every-row contract as
the LM scorer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 2048,
    overlap: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, char_start, chunk) — overlapping spans of at
    most ``chunk_chars`` characters, consecutive chunks sharing
    ``overlap`` characters."""
    if chunk_chars <= 0:
        raise ValueError("chunk_chars must be positive")
    if not 0 <= overlap < chunk_chars:
        raise ValueError("overlap must be in [0, chunk_chars)")
    stride = chunk_chars - overlap
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    # chunk k covers [k*stride, k*stride + chunk_chars); chunk k-1 ends at
    # k*stride + overlap, so a further chunk is needed only while
    # k*stride + overlap < len — bounding starts at len - overlap - 1
    # stops exactly when a chunk reaches the end (no redundant tail chunk
    # fully contained in its predecessor). The floor at 0 keeps one start
    # offset even for empty text, so every document keeps >= 1 row.
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.posexplode(starts).alias("chunk_idx", "char_start"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "char_start",
        F.substring(
            F.coalesce(F.col("__text"), F.lit("")),
            F.col("char_start") + 1,
            F.lit(chunk_chars),
        ).alias("chunk"),
    )
