"""Engine-portable Bloom-filter set membership — the broadcastable
prescreen that replaces a shuffle join against a reference set with a
map-side O(1) probe.

The motivating 100 TB use is contamination prescreening: instead of
hash-joining every corpus n-gram against the benchmark gram table (a
shuffle whose build side must be co-located or broadcast as ROWS), build
a fixed-size bitmap over the benchmark grams ONCE, broadcast the ~m/8
bytes, and filter corpus grams map-side; only the tiny flagged fraction
proceeds to exact verification. Same pattern for "have we ingested this
fingerprint", URL blocklists, and id-set pruning. Spark's own
``bloom_filter_agg`` exists but is not a public SQL routine (it backs the
injected runtime filters this repo enables in ``session.py``); this
module builds the same structure from public DataFrame expressions, with
the repo's engine-portable md5 hash so an external engine reproduces the
EXACT bitmap — flagged sets are value-matchable cross-engine, not just
tolerance-gated.

Representation: ``n_bits`` bits packed into ``n_bits/64`` longs. Build is
distributed end-to-end: k positions per item (``md5('bloom<j>#'||item)``
folded to a bigint, mod n_bits), one partial-aggregated ``bit_or`` per
64-bit word, then one row folding the words into a dense bigint array
(missing words are 0). Probe reads ``element_at`` + shift/mask per hash —
constant work per item, inside codegen, no Python.

Guarantees (standard Bloom): NO false negatives ever — every member of
the build set probes true; false-positive rate ≈ (1 - e^(-k·n/m))^k,
sized via ``bloom_fpp``/``bloom_size``. The no-false-negative side is the
correctness contract the gated entry asserts per gram.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ts_etl_spark.operators.classifier import _hash8
from ts_etl_spark.operators.sketches import _hex8_fold_sql

#: registered-entry sizing: 8192 bits / 4 hashes. Small enough that the
#: sf0.1 stand-in benchmark (~3k grams) pushes the filter into a visibly
#: lossy regime (fpp ~0.3 — the prescreen still prunes most grams and the
#: exact-verify step behind it stays mandatory), while sf0.01 sits near
#: fpp ~3e-4. Production sizes m from the FIXED benchmark size via
#: bloom_size (eval suites don't scale with the corpus).
BLOOM_BITS = 8192
BLOOM_K = 4


def bloom_position(col: Column, j: int, n_bits: int = BLOOM_BITS) -> Column:
    """Bit position of hash ``j`` for ``col``: the shared engine-portable
    md5 hash (first 8 hex chars as bigint) mod ``n_bits``."""
    return _hash8(f"bloom{j}#", col) % n_bits


def bloom_bitmap_df(
    items: DataFrame,
    col: str = "g",
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """ONE-row frame ``(bf: array<bigint>)`` — the dense
    ``n_bits/64``-word bitmap over every non-null value of ``items.col``.

    Plan: k position expressions fan out per item (no join), one
    partial-aggregated ``bit_or`` groupBy over ≤ n_bits/64 word keys,
    then a single-row fold to the dense array. Broadcast-join the result
    against any frame and probe with ``bloom_probe_cols``."""
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if k < 1:
        raise ValueError("k must be >= 1")
    n_words = n_bits // 64
    c = F.col(col)
    pos = items.filter(c.isNotNull()).select(
        F.explode(
            F.array(*[bloom_position(c, j, n_bits) for j in range(k)])
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("bits"))
    # try_element_at: ANSI element_at raises on absent map keys, and
    # words the build set never touched are legitimately absent
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("m"), i), F.lit(0).cast("bigint")
        ),
    )
    return (
        words.agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))
            ).alias("m")
        )
        .select(dense.alias("bf"))
    )


def bloom_probe_cols(
    df: DataFrame,
    bf: DataFrame,
    col: str = "g",
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus boolean ``out_col`` — TRUE iff every one of the k bits
    for ``df.col`` is set in the broadcast bitmap ``bf`` (a
    ``bloom_bitmap_df`` result). NULL values probe false. The join is a
    1-row broadcast; each probe is k element_at+shift ops in codegen.

    The bitmap and position intermediates live under collision-proof
    ``__bloom_*`` names; a caller column named like one of them would
    bind ambiguously or get silently dropped, so that's an error."""
    reserved = {"__bloom_bf", *(f"__bloom_p{j}" for j in range(k))}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"df columns collide with bloom_probe_cols internals: {sorted(clash)}"
        )
    probed = df.join(
        F.broadcast(bf.select(F.col("bf").alias("__bloom_bf"))), F.lit(True)
    )
    hit = F.lit(True)
    out = probed
    for j in range(k):
        out = out.withColumn(
            f"__bloom_p{j}", bloom_position(F.col(col), j, n_bits)
        )
        bit = F.expr(
            f"(element_at(__bloom_bf, CAST(__bloom_p{j} / 64 AS INT) + 1)"
            f" >> CAST(__bloom_p{j} % 64 AS INT)) & 1"
        )
        hit = hit & (bit == 1)
    return out.withColumn(
        out_col, F.coalesce(hit, F.lit(False))
    ).drop("__bloom_bf", *[f"__bloom_p{j}" for j in range(k)])


def bloom_fpp(n_items: int, n_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> float:
    """Expected false-positive probability for n_items inserted."""
    return (1.0 - math.exp(-k * n_items / n_bits)) ** k


def bloom_size(n_items: int, fpp: float) -> tuple[int, int]:
    """(n_bits rounded up to a multiple of 64, optimal k) for a target
    false-positive rate — the standard m = -n·ln(p)/ln(2)² sizing."""
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    key = max(1, round(m / n_items * math.log(2)))
    return m, key


def bloom_position_sql(expr: str, j: int, n_bits: int = BLOOM_BITS) -> str:
    """DuckDB twin of ``bloom_position`` for a string SQL expression —
    keep in lockstep with the Spark definition."""
    fold = _hex8_fold_sql(
        f"substr(md5('bloom{j}#' || CAST({expr} AS VARCHAR)), 1, 8)"
    )
    return f"(({fold}) % {n_bits})"
