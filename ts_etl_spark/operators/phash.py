"""Perceptual image dedup — pHash over the multimodal binary column,
then banded hamming near-dup pairs: the image-side counterpart of the
text MinHash/SimHash stack (re-encoded, resized, or lightly edited
copies of an image survive exact byte dedup; their DCT low-frequency
signature does not).

pHash (the classic DCT recipe): decode to a 32×32 grayscale float
array, 2-D DCT-II, keep the top-left 8×8 low-frequency block, threshold
each coefficient against the block's MEDIAN → 64 bits packed into one
bigint. Deterministic given the decoder.

Decoding follows the repo's multimodal seam: the DEFAULT pixel decoder
is a deterministic fake (payload bytes tiled into the 32×32 array — the
image libraries aren't in this container), so the Spark-side plumbing —
Arrow-batched ``mapInPandas``, schema, packing, banding — is real and
tested; pass ``pixel_decoder`` (e.g. a PIL/luma+resize callable
returning a 32×32 float array) for real images
(``multimodal.resolve_decoder`` is the same pattern).

Near-dup search never goes all-pairs: the 64-bit hash splits into
``bands`` fixed slices; by pigeonhole, any pair within hamming distance
``bands - 1`` agrees EXACTLY on at least one slice, so a band-equality
self-join (skinny (band, value, id) rows — the SimHash banding plan)
yields a candidate superset, and one codegen ``bit_count(a XOR b)``
verifies. Guarantee tested as a property.

Scale model — the honest version. A band of width w has only 2**w
possible values, so the join has at most ``bands * 2**w`` buckets
TOTAL; once the corpus outgrows that, bucket occupancy grows
linearly with N and the candidate set grows QUADRATICALLY
(~ bands * N²/2 / 2**w pairs for uniform hashes; real pHash values
cluster, making it worse). With the recall-friendly default of 8
bands of 8 bits that ceiling is 2048 buckets — fine for thousands of
images, catastrophic for billions (~N²/512 candidates). The knobs,
in order of preference at scale:

1. ``bands=4`` (16-bit slices → 262,144 buckets, pigeonhole
   guarantee hamming ≤ 3) — the large-corpus default; complete
   recall for re-encodes, which land within 2-3 bits in practice.
2. ``block_col`` — compose a cheap second blocking key (e.g. a size
   class or IVF cell from image metadata) into the join key;
   multiplies the bucket space by the key's cardinality. Recall
   caveat: near-dups must agree on the key.
3. ``max_bucket`` — drop (band, value[, block]) buckets whose
   occupancy exceeds the cap BEFORE the self-join (one extra
   partial-agg pass; the blocklist_frac_expr route-by-size
   pattern). Bounds candidates ≤ N·bands·max_bucket/2 — linear in
   N by construction. Recall caveat: a pair whose ONLY agreeing
   band lands in a dropped bucket is missed; saturated buckets are
   near-uninformative (everything matches everything), so this is
   the standard hot-bucket treatment (same contract as dropping
   stopword grams in PPJoin prefixes).

Hashing itself is one Arrow-batched pass (no shuffle); verification
touches candidates only.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_SIDE = 32
PHASH_BLOCK = 8
#: 8 bands of 8 bits: candidate recall is GUARANTEED for hamming <= 7
PHASH_BANDS = 8
DEFAULT_MAX_HAMMING = 6


def fake_pixels(payload: bytes) -> np.ndarray:
    """Deterministic stand-in pixel decoder: payload bytes tiled into a
    32×32 float64 array in [0, 1). Not an image decode — the seam for
    one (see module docstring)."""
    if len(payload) == 0:
        return np.zeros((PHASH_SIDE, PHASH_SIDE), dtype=np.float64)
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = PHASH_SIDE * PHASH_SIDE
    tiled = np.tile(buf, n // len(buf) + 1)[:n]
    return tiled.reshape(PHASH_SIDE, PHASH_SIDE).astype(np.float64) / 255.0


def _dct_matrix(n: int = PHASH_SIDE) -> np.ndarray:
    """Orthonormal DCT-II basis (the scipy.fft.dct(norm='ortho') matrix,
    built directly so scipy isn't a dependency)."""
    k = np.arange(n).reshape(-1, 1)
    j = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * (2 * j + 1) * k / (2 * n))
    m[0, :] *= np.sqrt(1.0 / n)
    m[1:, :] *= np.sqrt(2.0 / n)
    return m


_DCT = _dct_matrix()


def phash64(pixels: np.ndarray) -> int:
    """64-bit pHash of a 32×32 grayscale array: 2-D DCT-II, top-left 8×8
    block, bit i set iff coefficient i exceeds the block median
    (row-major order, bit 0 = most significant). Returned as a SIGNED
    64-bit int (Spark bigint-compatible)."""
    coef = (_DCT @ pixels @ _DCT.T)[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = float(np.median(coef))
    bits = 0
    for c in coef:
        bits = (bits << 1) | (1 if float(c) > med else 0)
    return int(np.int64(np.uint64(bits)))


def image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    pixel_decoder: Callable[[bytes], np.ndarray] | None = None,
    out_col: str = "phash",
) -> DataFrame:
    """(id_col, out_col bigint) for every row with a non-null payload —
    one Arrow-batched ``mapInPandas`` pass, no shuffle. NULL payloads
    yield no row (no pixels, no evidence).

    The worker closure is SELF-CONTAINED: the DCT matrix and the default
    decoder are captured by VALUE (locals), never as references to this
    module — cloudpickle pickles module-level functions by reference, and
    a Python worker whose PYTHONPATH lacks the package (driver-only
    ``sys.path`` injection, thin executor images) would die with
    ModuleNotFoundError mid-job. A caller-supplied ``pixel_decoder``
    must satisfy the same constraint or ship the package to workers."""
    import pandas as pd

    schema = f"{id_col} LONG, {out_col} LONG"
    dct = _DCT
    side, block = PHASH_SIDE, PHASH_BLOCK
    decoder = pixel_decoder

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np

        def _fake(payload: bytes) -> "_np.ndarray":
            if len(payload) == 0:
                return _np.zeros((side, side), dtype=_np.float64)
            buf = _np.frombuffer(payload, dtype=_np.uint8)
            n = side * side
            tiled = _np.tile(buf, n // len(buf) + 1)[:n]
            return tiled.reshape(side, side).astype(_np.float64) / 255.0

        dec = decoder if decoder is not None else _fake

        def _hash(pix):
            coef = (dct @ pix @ dct.T)[:block, :block].ravel()
            med = float(_np.median(coef))
            bits = 0
            for c in coef:
                bits = (bits << 1) | (1 if float(c) > med else 0)
            return int(_np.int64(_np.uint64(bits)))

        for pdf in it:
            sub = pdf[pdf[payload_col].notna()]
            yield pd.DataFrame(
                {
                    id_col: sub[id_col].astype("int64"),
                    out_col: [_hash(dec(bytes(p))) for p in sub[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def phash_bands(
    hashes: DataFrame,
    bands: int = PHASH_BANDS,
    id_col: str = "doc_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Skinny (id, band, bv) band slices of each 64-bit hash — band j is
    bits [64 - (j+1)·w, 64 - j·w) (w = 64/bands), extracted with
    shift/mask so the layout is engine-portable."""
    if 64 % bands != 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(
                    f"(CAST({hash_col} AS BIGINT) >> {64 - (j + 1) * width})"
                    f" & {mask}"
                ).alias("bv"),
            )
            for j in range(bands)
        ]
    )
    return hashes.select(id_col, F.explode(slices).alias("s")).select(
        id_col, F.col("s.band").alias("band"), F.col("s.bv").alias("bv")
    )


def phash_candidate_pairs(
    hashes: DataFrame,
    bands: int = PHASH_BANDS,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    block_col: str | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from the band-equality
    self-join, id_a < id_b — the blocking stage of
    :func:`phash_neardup_pairs`, exposed so the linear-candidate bound
    under ``max_bucket`` is directly testable.

    ``block_col`` (a column of ``hashes``) is composed into the join
    key; rows with a NULL block key never pair (NULL ≠ NULL in the
    equality join) — assign a sentinel block first if NULLs should form
    a bucket. ``max_bucket`` drops over-occupied buckets first: a groupBy
    count over the skinny band rows, joined back — candidates are then
    ≤ N·bands·max_bucket/2 by construction (each surviving bucket of
    size s ≤ max_bucket contributes s·(s-1)/2 ≤ s·max_bucket/2 pairs,
    and bucket sizes sum to ≤ N·bands). See the module docstring for
    the recall contract of both knobs."""
    key = ["band", "bv"] + ([block_col] if block_col else [])
    b = phash_bands(hashes, bands, id_col, hash_col)
    if block_col:
        b = b.join(hashes.select(id_col, block_col), id_col)
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
        sizes = b.groupBy(*key).agg(F.count("*").alias("_occ"))
        b = (
            b.join(sizes, key)
            .filter(F.col("_occ") <= max_bucket)
            .drop("_occ")
        )
    x = b.select(*key, F.col(id_col).alias("id_a"))
    y = b.select(
        *[F.col(c).alias(f"{c}_y") for c in key],
        F.col(id_col).alias("id_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in key:
        cond = cond & (F.col(c) == F.col(f"{c}_y"))
    return x.join(y, cond).select("id_a", "id_b").distinct()


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    bands: int = PHASH_BANDS,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    block_col: str | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(phash_a, phash_b) ≤
    ``max_hamming``, id_a < id_b. COMPLETE whenever ``max_hamming ≤
    bands - 1`` (pigeonhole: some band slice is untouched and matches
    exactly) AND neither ``block_col`` nor ``max_bucket`` is set; a
    ``max_hamming`` beyond the pigeonhole guarantee is refused rather
    than silently losing recall. The default 8×8-bit banding has only
    2048 buckets total — quadratic candidates past ~10⁴ images; at
    corpus scale use ``bands=4`` (hamming ≤ 3, 262k buckets) plus
    ``block_col``/``max_bucket`` per the module-docstring scale model."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding guarantee "
            f"(bands - 1 = {bands - 1}); raise bands"
        )
    cands = phash_candidate_pairs(
        hashes, bands, id_col, hash_col, block_col, max_bucket
    )
    ha = hashes.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("ph_a"))
    hb = hashes.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("ph_b"))
    hamming = F.bit_count(
        F.expr("CAST(ph_a AS BIGINT) ^ CAST(ph_b AS BIGINT)")
    )
    return (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
