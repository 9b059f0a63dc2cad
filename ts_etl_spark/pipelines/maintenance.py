"""Table-maintenance utilities: column profiling and small-file
compaction — the operational chores a long-lived parquet lake needs.

Both are single-pass and driver-light: profiling is ONE aggregate over the
table (every per-column statistic partial-aggregates, so the shuffle
carries one row per column set, not data); compaction is a rewrite whose
output file count is computed from the observed byte size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.localrel import local_rows
from ts_etl_spark.fs import dir_bytes

#: profile: HLL++ relative error (same sketch the approx entries use)
PROFILE_RSD = 0.05

_HASH_MOD = 1 << 62  # sums of 32-bit row hashes never overflow a long


def table_content_hash(df: DataFrame, cols: list[str] | None = None) -> int:
    """Order- and partition-INDEPENDENT content hash of a table: each
    row's canonical rendering — per field ``v<charlen>:<value>`` (NULL
    is the bare token ``n``), fields concatenated, over ``cols`` (default
    all columns sorted by name) — hashes through the repo's
    engine-portable md5 fold, and the row hashes SUM mod 2^62. Addition
    commutes, so any repartition, shuffle, or file order yields the
    identical value, while any changed/added/dropped row moves it. The
    length prefix makes the rendering INJECTIVE: without it,
    ("a#b", "c") and ("a", "b#c") would collide by construction under
    any separator-joined form.

    The attestation primitive behind "did this rewrite change the
    data?": compare before/after compaction, Z-order, shard relayout.
    Duplicate-row multiplicity counts (a sum, not a set-hash). ONE
    partial-aggregated pass; the shuffle carries one partial sum per
    partition. DuckDB twin: ``table_content_hash_sql``.

    Cross-ENGINE equality (Spark hash == DuckDB twin hash) is guaranteed
    only for string / integer / boolean / date columns, whose
    cast-to-string renderings are identical in both engines. DOUBLE /
    FLOAT / TIMESTAMP render differently (Spark ``1.0E30`` vs DuckDB
    ``1e+30``; timestamp ``T`` separators), so for such columns either
    pre-render them yourself with one explicit portable format expression
    on both sides, or treat the attestation as WITHIN-engine only —
    within one engine the hash is exact for every type either way (the
    rewrite-attestation use case runs before/after in the same engine)."""
    row = table_content_hash_frame(df, cols).first()
    return int(row.h) if row.h is not None else 0


def table_content_hash_frame(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """The LAZY one-row ``(h bigint)`` frame behind ``table_content_hash``
    (same contract) — for compositions that embed the attestation in a
    larger plan without forcing a driver-side action at construction
    time (``operators.report``). NULL h on an empty table (the eager
    wrapper maps it to 0)."""
    from ts_etl_spark.operators.classifier import _hash8

    use = sorted(df.columns) if cols is None else list(cols)

    def field(c):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
        )

    rendered = F.concat(*[field(c) for c in use])
    # accumulate in DECIMAL(38,0): a LONG sum of 2^32-bounded row hashes
    # overflows (ANSI: aborts) past ~2^31 rows — exactly the scale this
    # exists for. 38 digits cover ~1e28 rows.
    return df.agg(
        (
            F.sum(_hash8("tch#", rendered).cast("decimal(38,0)"))
            % F.lit(_HASH_MOD)
        )
        .cast("bigint")
        .alias("h")
    )


def table_content_hash_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of ``table_content_hash`` (pass the same column list;
    DuckDB cannot introspect-and-sort here) — keep in lockstep. Value
    parity with the Spark side holds for string/integer/boolean/date
    columns only; see the cross-engine caveat on ``table_content_hash``
    for float/timestamp columns."""
    from ts_etl_spark.operators.sketches import _hex8_fold_sql

    rendered = " || ".join(
        f"CASE WHEN CAST({c} AS VARCHAR) IS NULL THEN 'n' "
        f"ELSE 'v' || CAST(length(CAST({c} AS VARCHAR)) AS VARCHAR) || ':' "
        f"|| CAST({c} AS VARCHAR) END"
        for c in cols
    )
    fold = _hex8_fold_sql(f"substr(md5('tch#' || ({rendered})), 1, 8)")
    return (
        f"SELECT CAST(COALESCE(SUM({fold}), 0) % {_HASH_MOD} AS BIGINT) AS h "
        f"FROM {table}"
    )


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column data-quality profile in ONE aggregate pass: row count,
    null count, approximate distinct count (HLL++), and min/max rendered
    as strings (type-agnostic). Long format (column, metric, value) so the
    result is narrow regardless of column count.

    Every statistic is a partial-aggregatable function — the plan is one
    scan + one final aggregate of sketch buffers, no per-column re-scan,
    which is what makes profiling a 100 TB table one job."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in df.columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c, PROFILE_RSD).alias(f"__dist_{c}"),
            # aggregate on the NATIVE type (numeric/date ordering), render
            # as string after — min(cast) would compare lexicographically
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = []
    for c in df.columns:
        out += [
            (c, "rows", str(row["__rows"])),
            (c, "nulls", str(row[f"__nulls_{c}"])),
            (c, "approx_distinct", str(row[f"__dist_{c}"])),
            (c, "min", row[f"__min_{c}"]),
            (c, "max", row[f"__max_{c}"]),
        ]
    return local_rows(spark, out, "column STRING, metric STRING, value STRING")


DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    cluster_by: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files. The small-files problem is the
    classic lake pathology (every file costs a task + open + footer read —
    10k tiny files turn a 1-second scan into a scheduling storm).

    Copy-on-write: writes to ``out_path`` (the atomic-swap unit), returns
    the output file count. Uses ``repartition`` (round-robin) for even
    sizes; partition-key-aware layouts should instead rewrite via
    ``table_sink.write_parquet`` with ``partition_by``.

    ``cluster_by``: range-partition + sort the rewrite on this column
    instead of round-robin, PRESERVING a key-clustered layout whose
    footer min/max stats a reader's filter prunes on (the BM25 postings
    table's shape — a round-robin rewrite would make every output file
    span the whole key domain and silently revert the pruning to
    vacuous; review finding, round 13). Content is identical either
    way — only file assignment changes.

    Input size comes from the Hadoop FileSystem API, so any URI scheme the
    session supports works (hdfs://, s3a://, ...); an input with zero
    parquet bytes raises instead of silently compacting to one file."""
    total = dir_bytes(spark, path, suffix=".parquet")
    if total == 0:
        raise ValueError(f"no parquet data found at {path!r}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_by is not None:
        df = df.repartitionByRange(n_files, cluster_by).sortWithinPartitions(
            cluster_by
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files
