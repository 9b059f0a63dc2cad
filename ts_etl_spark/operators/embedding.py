"""Document embedding generation — the bridge from the text surface to
the similarity surface (embed → PCA → IVF/top-k/near-dup all exist
downstream in ``operators/similarity.py``).

Pluggable seam, same pattern as the multimodal decoder: pass
``embedder`` (a callable ``DataFrame -> DataFrame`` wrapping a real
model — typically an Arrow-batched ``mapInPandas`` around a served
encoder) and this module only validates the contract. The DEFAULT is a
deterministic signed feature-hashing projection (hashed bag-of-words:
each token adds ±1 to one of ``dim`` buckets, md5-derived bucket and
sign, L2-normalized) — not a stand-in stub but a legitimate cheap
baseline (random-projection bag-of-words preserves cosine structure for
lexical similarity) that is engine-portable and exactly reproducible,
so every downstream ANN/PCA/dedup pipeline is testable end to end
without a model in the container.

Caveat (measured in the round-11 ingest soak): ``WORD_PAT`` is
``[a-z]+|[0-9]+``, so alphanumeric identifiers split — "w123" tokenizes
as "w" + "123". Text dominated by a shared id PREFIX (machine logs,
synthetic ids, SKU-heavy pages) therefore embeds with one overwhelming
shared bucket and pairwise cosines near 1.0, and a semantic-dedup gate
over those embeddings will (correctly, given the vectors) collapse such
documents. For id-heavy corpora pass a real ``embedder`` or pre-strip
ids; this is tokenizer policy shared with the LM/BPE/classifier stack,
not an embedding bug.

Scale shape (default path): tokenize + explode (corpus-linear), ONE
partial-aggregated groupBy per (doc, bucket) — at most ``dim`` rows per
document pre-shuffle — then a map_from_entries densification and an
in-array L2 normalization, all JVM expressions. A 100 TB corpus embeds
at shuffle-of-(docs × occupied-buckets) cost, never holding more than a
``dim``-long array per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.bpe import WORD_PAT
from ts_etl_spark.operators.classifier import _hash8 as _hash_int

DEFAULT_DIM = 64


def _sign(col: Column) -> Column:
    """±1 from the 9th md5 hex char's parity (independent of the bucket
    window, chars 1-8)."""
    h = F.md5(F.concat(F.lit("emb#"), col.cast("string")))
    nib = F.conv(F.substring(h, 9, 1), 16, 10).cast("int")
    return F.when(nib % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def embed_documents(
    docs: DataFrame,
    dim: int = DEFAULT_DIM,
    embedder: Callable[[DataFrame], DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every document with an ``embedding`` (length-``dim`` double
    array, L2 norm 1) — NULL for token-less documents (no evidence,
    the shared scorer contract).

    With ``embedder``, delegate and validate the (id, embedding)
    contract; otherwise the deterministic hashed-BoW default."""
    if embedder is not None:
        out = embedder(docs)
        missing = {id_col, "embedding"} - set(out.columns)
        if missing:
            raise ValueError(
                f"embedder result is missing columns {sorted(missing)}"
            )
        return out
    if dim < 2:
        raise ValueError("dim must be at least 2")
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(WORD_PAT), 0)
        ).alias("w"),
    )
    cells = toks.select(
        id_col,
        (_hash_int("emb#", F.col("w")) % dim).cast("int").alias("bucket"),
        _sign(F.col("w")).alias("s"),
    )
    # two-level: per-(doc,bucket) partial sums first (bounded pre-shuffle),
    # then densify per doc. A vector whose buckets all cancel to zero
    # (or a token-less doc) has no direction — embedding NULL.
    summed = cells.groupBy(id_col, "bucket").agg(F.sum("s").alias("v"))
    dense = (
        summed.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("__m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.coalesce(
                    F.col("__m")[j.cast("int")], F.lit(0)
                ).cast("double"),
            ).alias("__raw"),
        )
    )
    nrm = F.sqrt(
        F.aggregate(
            F.col("__raw"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    normalized = dense.select(
        id_col,
        F.when(
            nrm > 0, F.transform(F.col("__raw"), lambda x: x / nrm)
        ).alias("embedding"),
    )
    return (
        docs.select(id_col)
        .join(normalized, id_col, "left")
        .select(id_col, "embedding")
    )
