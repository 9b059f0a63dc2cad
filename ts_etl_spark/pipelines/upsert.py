"""Upsert / merge patterns over immutable parquet — the table-maintenance
shapes (SCD type 1 and type 2) an ETL pipeline needs without a
transactional table format.

Both are DECLARATIVE rebuilds: union the known versions, then let one
keyed window decide winners / validity intervals. That makes them
idempotent (re-applying the same updates is a no-op) and safe under
retry — the property a copy-on-write parquet pipeline needs, since its
"commit" is an atomic directory swap of recomputed output.

Scale shape: one shuffle on the business key, window state = versions per
key (bounded by update frequency, not corpus size). No driver-side state,
no row-at-a-time logic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    current: DataFrame, updates: DataFrame, key_cols: Sequence[str], ts_col: str
) -> DataFrame:
    """SCD type 1 merge: one row per key, the LATEST version wins
    (ties broken toward the update side so replaying an equal-timestamp
    correction applies it). Inserts, updates and unchanged rows fall out
    of the same window — no separate code paths."""
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_apply(
    history: DataFrame, updates: DataFrame, key_cols: Sequence[str], ts_col: str
) -> DataFrame:
    """SCD type 2: full-history table with (valid_from, valid_to,
    is_current) — updates open new versions and close the previous ones.

    Implemented as a declarative REBUILD: every known version (prior
    history rows via their valid_from, update rows via their event time)
    enters one window per key ordered by valid_from; ``valid_to`` is the
    next version's start (null = open) and ``is_current`` marks the last.
    Exact duplicate (key, valid_from) versions collapse to one (update
    wins). Idempotent by construction: re-applying the same updates
    changes nothing."""
    hist_versions = history.select(
        *key_cols,
        *[
            c
            for c in history.columns
            if c not in (*key_cols, "valid_from", "valid_to", "is_current")
        ],
        F.col("valid_from"),
        F.lit(0).alias("__src"),
    )
    upd_versions = updates.select(
        *key_cols,
        *[c for c in updates.columns if c not in (*key_cols, ts_col)],
        F.col(ts_col).alias("valid_from"),
        F.lit(1).alias("__src"),
    )
    allv = hist_versions.unionByName(upd_versions)
    dedup_w = Window.partitionBy(*key_cols, "valid_from").orderBy(
        F.col("__src").desc()
    )
    versions = (
        allv.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    seq_w = Window.partitionBy(*key_cols).orderBy("valid_from")
    return versions.withColumn(
        "valid_to", F.lead("valid_from").over(seq_w)
    ).withColumn("is_current", F.col("valid_to").isNull())
