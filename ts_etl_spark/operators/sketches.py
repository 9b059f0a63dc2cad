"""Mergeable HyperLogLog registers built from plain DataFrame expressions.

Spark's ``approx_count_distinct`` answers one-shot questions, but its
sketch state is opaque: it cannot be persisted, merged with tomorrow's
batch, or cross-checked by another engine. This module materializes the
HLL state ITSELF as a tiny table of ``(bucket, rho)`` registers — 2^p
rows — with three properties that matter at 100 TB:

- **mergeable**: registers of a union = element-wise MAX of the unions'
  registers (`hll_merge`), so incremental ingest updates a persisted
  256-row state table instead of re-scanning the corpus for a distinct
  count (the same pattern `streaming/ingest.py` uses for dedup state);
- **engine-portable**: the hash is md5 of the value's canonical string —
  not an engine-private hash — so a DuckDB oracle reproduces every
  register EXACTLY (value parity, not just a tolerance boolean);
- **cheap**: one narrow projection + one partial-aggregated groupBy over
  2^p groups; the shuffle carries at most 2^p rows per task.

Production note: md5 is the *verification* hash. A throughput-critical
deployment would swap ``_hll_hash`` for ``xxhash64`` (JVM-intrinsic,
~10x faster) — every other line is hash-agnostic; only cross-engine
register parity is lost.

Register derivation (standard HLL, Flajolet et al.): for each value,
h = md5 hex digest; ``bucket`` = first p/4 hex chars (the register
index, kept AS the hex string — registers don't need integer ids);
``rho`` = 1 + number of leading zero BITS in the next 60 bits, read
directly off the hex digits (4 zero bits per leading '0' char, plus
0-3 from the first non-zero char). Nulls are excluded (COUNT DISTINCT
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: register-index bits: 2^8 = 256 registers, standard error 1.04/16 = 6.5%
HLL_P = 8

#: bias-correction constant alpha_m for m = 256 (Flajolet et al. 2007)
_ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256.0)


def _hll_hash(col: Column) -> Column:
    """Engine-portable hash: md5 of the canonical string form."""
    return F.md5(col.cast("string"))


def _rho(rest: Column) -> Column:
    """1 + leading zero bits of the 60-bit suffix, from hex chars alone:
    each leading '0' char is 4 zero bits; the first non-zero char adds
    3 ('1'), 2 ('2'-'3'), 1 ('4'-'7') or 0 ('8'-'f'). All-zero suffix
    (never in practice: p(2^-60) per value) degenerates to 61."""
    zero_chars = F.length(F.regexp_extract(rest, "^0*", 0))
    first_nz = F.substring(F.regexp_replace(rest, "^0*", ""), 1, 1)
    extra = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (zero_chars * 4 + extra + 1).cast("int")


def hll_registers(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """The HLL register table for ``df[col]``: one row per OCCUPIED
    register, ``(bucket: 2-hex-char string, rho: int)``. Partial
    aggregation means each task emits at most 2^p rows pre-shuffle."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16] (hex-char indexing)")
    chars = p // 4
    h = _hll_hash(F.col(col))
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.substring(h, 1, chars).alias("bucket"),
            _rho(F.substring(h, chars + 1, 15)).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (element-wise max) — registers of a UNION of
    datasets. This is the incremental path: persist yesterday's 256-row
    table, merge today's batch registers, never re-scan history."""
    it = iter(register_tables)
    merged = next(it)
    for regs in it:
        merged = merged.unionByName(regs)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    spark: SparkSession, registers: DataFrame, p: int = HLL_P
) -> DataFrame:
    """One-row ``(estimate: double)`` from a register table: the raw HLL
    estimator alpha_m * m^2 / sum(2^-rho_j) with empty registers counted
    at rho=0, plus linear counting below the 2.5m small-range threshold
    (the regime where the raw estimator biases high). The full-register
    frame is built by generating all 2^p hex buckets (a 2^p-row local
    relation — broadcast territory) and left-joining the occupied ones."""
    if p != HLL_P:
        raise ValueError("estimate constants are calibrated for p=8 (m=256)")
    m = 1 << p
    all_buckets = spark.range(m).select(
        F.lower(F.lpad(F.hex(F.col("id")), p // 4, "0")).alias("bucket")
    )
    full = all_buckets.join(F.broadcast(registers), "bucket", "left").select(
        F.coalesce("rho", F.lit(0)).alias("rho")
    )
    raw = F.lit(_ALPHA_256 * m * m) / F.sum(F.pow(F.lit(2.0), -F.col("rho")))
    zeros = F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
    # linear counting: m * ln(m / empty_registers), used when raw <= 2.5m
    # and some register is still empty (standard HLL small-range correction)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return full.agg(
        F.when((raw <= 2.5 * m) & (zeros > 0), linear)
        .otherwise(raw)
        .alias("estimate")
    )


# DuckDB mirror of the register derivation (the oracle side of the exact
# cross-engine parity claim). Keep in lockstep with hll_registers/_rho.
HLL_REGISTERS_SQL = """
    SELECT substr(md5(CAST({col} AS VARCHAR)), 1, 2) AS bucket,
           MAX(
             4 * length(regexp_extract(substr(md5(CAST({col} AS VARCHAR)), 3, 15), '^0*'))
             + CASE substr(regexp_replace(substr(md5(CAST({col} AS VARCHAR)), 3, 15), '^0*', ''), 1, 1)
                 WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                 ELSE 0 END
             + 1
           ) AS rho
    FROM {table} WHERE {col} IS NOT NULL
    GROUP BY 1
"""


# --------------------------------------------------------------------------
# Count-min sketch: mergeable frequency state (the counting dual of HLL)
# --------------------------------------------------------------------------

#: depth = independent hash rows (error prob decays as ~e^-depth);
#: width = counters per row (overestimate bound eps = e/width of total mass)
CM_DEPTH = 4
CM_WIDTH = 256


def _cm_hash_int(col: Column, d: int) -> Column:
    """Row-``d`` hash of the canonical string form, as a bigint in
    [0, 2^32): ONE md5 of the value carved into four independent 32-bit
    words (hex chars 8d+1..8d+8) — one digest serves every depth row, so
    the scan pays a single md5 per value instead of depth seeded ones.
    Engine-portable for the same reason as ``_hll_hash`` (and swappable
    for ``xxhash64(col, lit(d))`` when cross-engine parity isn't
    needed)."""
    h = F.md5(F.concat(F.lit("cm#"), col.cast("string")))
    return F.conv(F.substring(h, 8 * d + 1, 8), 16, 10).cast("bigint")


def cm_registers(
    df: DataFrame, col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """The count-min counter table for ``df[col]``: one row per OCCUPIED
    cell, ``(d: int, slot: int, c: bigint)`` — ≤ depth·width rows total,
    partial-aggregated so each task emits at most that many pre-shuffle.

    Same three scale properties as the HLL registers: mergeable
    (counters of a union = element-wise SUM — ``cm_merge``), engine-
    portable (md5-derived slots, so an oracle reproduces every cell
    EXACTLY), and cheap (one projection + one bounded groupBy). Point
    queries via ``cm_estimate`` NEVER underestimate (each cell holds the
    key's true count plus non-negative collision mass) and overestimate
    by more than e·N/width with probability ≤ e^-depth per query."""
    if not 1 <= depth <= 4 or width < 2:
        raise ValueError(
            "depth must be in [1, 4] (one md5 digest carries four 32-bit "
            "words) and width >= 2"
        )
    entries = [
        F.struct(
            F.lit(d).alias("d"),
            (_cm_hash_int(F.col(col), d) % width).cast("int").alias("slot"),
        )
        for d in range(depth)
    ]
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(F.array(*entries)).alias("e"))
        .select("e.d", "e.slot")
        .groupBy("d", "slot")
        .agg(F.count("*").alias("c"))
    )


def cm_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge counter tables (element-wise sum) — counters of a UNION of
    datasets; the incremental-ingest path, like ``hll_merge``."""
    it = iter(register_tables)
    merged = next(it)
    for regs in it:
        merged = merged.unionByName(regs)
    return merged.groupBy("d", "slot").agg(F.sum("c").alias("c"))


def cm_estimate(
    spark: SparkSession,
    registers: DataFrame,
    keys: list,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-frequency estimates ``(key: string, estimate: bigint)`` for
    ``keys`` (canonical string forms, matching ``col.cast(string)``):
    min over the depth rows of the key's cell, absent cells counting 0.
    The keys frame is a local relation and the counter table is ≤
    depth·width rows — broadcast territory on both sides."""
    kdf = spark.createDataFrame([(str(k),) for k in keys], "key STRING")
    entries = [
        F.struct(
            F.lit(d).alias("d"),
            (_cm_hash_int(F.col("key"), d) % width).cast("int").alias("slot"),
        )
        for d in range(depth)
    ]
    melt = kdf.select(
        "key", F.explode(F.array(*entries)).alias("e")
    ).select("key", "e.d", "e.slot")
    return (
        melt.join(F.broadcast(registers), ["d", "slot"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("estimate"))
    )


def _hex8_fold_sql(expr: str) -> str:
    """DuckDB: integer value of the 8-hex-char string expression ``expr``
    (the same big-endian fold the trainer-prep oracle uses)."""
    return (
        "list_sum([(strpos('0123456789abcdef', substr(" + expr + ", i, 1)) - 1)::BIGINT"
        " << ((8 - i) * 4) for i in generate_series(1, 8)])"
    )


def cm_registers_sql(table: str, col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    """DuckDB mirror of ``cm_registers`` (oracle side of the exact
    cross-engine cell parity claim). Keep in lockstep with _cm_hash_int."""
    fold = _hex8_fold_sql(
        f"substr(md5('cm#' || CAST({col} AS VARCHAR)), 8 * t.d + 1, 8)"
    )
    return f"""
        SELECT t.d, CAST(({fold}) % {width} AS INT) AS slot, COUNT(*) AS c
        FROM {table}, (SELECT unnest(generate_series(0, {depth - 1})) AS d) t
        WHERE {col} IS NOT NULL
        GROUP BY 1, 2
    """


def cm_estimate_sql(
    registers_cte: str, key: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> str:
    """DuckDB mirror of ``cm_estimate`` for one literal key: a scalar
    subquery over the ``registers_cte`` relation name."""
    fold = _hex8_fold_sql(f"substr(md5('cm#' || '{key}'), 8 * q.d + 1, 8)")
    return f"""(
        SELECT MIN(COALESCE(r.c, 0))
        FROM (SELECT d, CAST(({fold}) % {width} AS INT) AS slot
              FROM (SELECT unnest(generate_series(0, {depth - 1})) AS d) q) q2
        LEFT JOIN {registers_cte} r USING (d, slot)
    )"""


def hll_registers_by(
    df: DataFrame, group_cols: list[str], col: str, p: int = HLL_P
) -> DataFrame:
    """Per-group HLL register tables in ONE pass: ``(*group_cols,
    bucket, rho)`` with at most 2^p rows per group — the corpus-stats
    shape for "distinct documents per language/domain/source" questions.
    Same merge law as the global table (element-wise max within a
    group), so per-group state persists and folds incrementally exactly
    like ``hll_registers``."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16] (hex-char indexing)")
    chars = p // 4
    h = _hll_hash(F.col(col))
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            F.substring(h, 1, chars).alias("bucket"),
            _rho(F.substring(h, chars + 1, 15)).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group estimates from a ``hll_registers_by`` table WITHOUT
    materializing the 2^p-row dense register frame per group: occupied
    registers always have rho ≥ 1, so the estimator's empty-register
    terms reduce to counts — sum(2^-rho) over all m registers =
    sum over occupied + (m - occupied), and zeros = m - occupied. One
    partial-aggregated groupBy over the register table, linear in the
    number of groups; same raw-vs-linear-counting switch as the global
    ``hll_estimate``."""
    if p != HLL_P:
        raise ValueError("estimate constants are calibrated for p=8 (m=256)")
    m = 1 << p
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("__occ"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
    )
    zeros = F.lit(m) - F.col("__occ")
    raw = F.lit(_ALPHA_256 * m * m) / (F.col("__s") + zeros.cast("double"))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return agg.select(
        *group_cols,
        F.when((raw <= 2.5 * m) & (zeros > 0), linear)
        .otherwise(raw)
        .alias("estimate"),
    )
