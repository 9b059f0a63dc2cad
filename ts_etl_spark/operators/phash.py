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

Scale shape: hashing is one Arrow-batched pass (no shuffle); banding is
one explode + one equality self-join keyed on (band, value) — linear in
band-bucket occupancy; verification touches candidates only.
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


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    bands: int = PHASH_BANDS,
    id_col: str = "doc_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(phash_a, phash_b) ≤
    ``max_hamming``, id_a < id_b. COMPLETE whenever ``max_hamming ≤
    bands - 1`` (pigeonhole: some band slice is untouched and matches
    exactly); a larger ``max_hamming`` is refused rather than silently
    losing recall."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding guarantee "
            f"(bands - 1 = {bands - 1}); raise bands"
        )
    b = phash_bands(hashes, bands, id_col, hash_col)
    x = b.select("band", "bv", F.col(id_col).alias("id_a"))
    y = b.select(
        F.col("band").alias("band_y"),
        F.col("bv").alias("bv_y"),
        F.col(id_col).alias("id_b"),
    )
    cands = (
        x.join(
            y,
            (F.col("band") == F.col("band_y"))
            & (F.col("bv") == F.col("bv_y"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
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
