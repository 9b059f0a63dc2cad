"""Deterministic training-shard layout: the last hop between a curated /
packed corpus and a trainer's data loader — N shards of roughly equal
size, each an unbiased interleave of the corpus, with deterministic
membership AND deterministic within-shard order, so a re-run of the
pipeline (or a second cluster) produces byte-equal shard contents and a
training run is exactly reproducible.

Shard assignment is the seeded md5 interval hash the split/sampling
operators use (`pipelines/sampling.py`) — engine-portable and
independent of partitioning, never `rand()` or task ids. Layout is
``shard=<k>`` directories with EXACTLY ONE file each: rows are
repartitioned BY the shard column (each shard value lands wholly in one
task), sorted within partitions by the caller's order columns, and
written with ``partitionBy`` — a task holding two shard values (hash
collision of partition keys) still emits one file per shard directory.

Scale shape: one full shuffle (unavoidable for a global deterministic
interleave) + per-partition sorts; the manifest aggregate is
``n_shards`` rows. At 100 TB, size ``n_shards`` so a shard fits a
loader worker (thousands of shards — the shuffle is the same cost at
any shard count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.pipelines.sampling import _uniform_hash


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_cols: Sequence[str],
    seed: str = "shard",
) -> DataFrame:
    """``df`` plus a deterministic ``shard`` column in [0, n_shards):
    floor of the seeded md5 uniform hash of ``key_cols`` — membership
    depends only on the keys and the seed, not on partitioning, so every
    engine and every re-run agrees."""
    if n_shards < 1:
        raise ValueError("n_shards must be positive")
    u = _uniform_hash(key_cols, seed)
    shard = F.least(
        F.floor(u * n_shards).cast("int"), F.lit(n_shards - 1)
    )
    return df.withColumn("shard", shard)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
    seed: str = "shard",
    mode: str = "overwrite",
) -> dict[int, int]:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``path/shard=<k>/`` (one parquet file per shard) and return the
    per-shard row-count manifest (an ``n_shards``-row collect).

    The manifest always holds EXACTLY ``n_shards`` entries, shards
    ``0..n_shards-1`` — a shard value no row hashed into appears with
    count 0 (and, inherent to Hive-style ``partitionBy`` layout, has no
    ``shard=<k>`` directory on disk; loaders should iterate the manifest,
    not ``listdir``).

    ``order_cols`` fixes the within-shard row order (defaults to
    ``key_cols``) — with unique keys the shard files are fully
    reproducible row-for-row."""
    order = list(order_cols if order_cols is not None else key_cols)
    # persist across the write and the manifest aggregate — without it
    # the manifest would re-scan and re-hash the whole corpus a second
    # time after the write action already did
    sharded = assign_shards(df, n_shards, key_cols, seed).persist()
    try:
        (
            sharded.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", *order)
            .write.mode(mode)
            .partitionBy("shard")
            .parquet(path)
        )
        occupied = {
            int(r["shard"]): r["n"]
            for r in sharded.groupBy("shard")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        return {k: occupied.get(k, 0) for k in range(n_shards)}
    finally:
        sharded.unpersist()
