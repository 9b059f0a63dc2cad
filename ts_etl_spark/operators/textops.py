"""Text-analysis operators over ``documents`` (SURVEY.md §2.4): token
counting, quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in expression work (regexp_count/length/md5 …) — fully
codegen'd, shuffle-free row-level transforms; at 100 TB these are pure
map-side operators limited only by scan bandwidth.

Determinism: all metrics are integer counts combined with a single double
division (bit-identical across engines), or md5 hex digests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_etl_spark.sources.tables import load_table

# language-ID marker regexes (shared literally with the DuckDB oracle).
# The synthetic corpus is vocabulary-salad, so this scores *markers*, not
# real language; the point is a deterministic argmax over marker counts.
LANG_MARKERS = {
    "en": r"\b(the|a|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|et|les|des|est)\b",
    "es": r"\b(el|los|las|y|es|una)\b",
}
CJK = r"[一-鿿]"


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count + basic char-class stats per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    spaces = F.length(F.regexp_replace(F.col("text"), r"[^\s]", ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars"),
        (alpha.cast("double") / n_chars).alias("alpha_ratio"),
        (digits.cast("double") / n_chars).alias("digit_ratio"),
        (spaces.cast("double") / n_chars).alias("space_ratio"),
        ((n_chars - spaces).cast("double") / F.size(toks)).alias("avg_token_len"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: keep docs passing simple length/shape heuristics —
    the classic pre-training corpus filter."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast("double") / n_chars
    )
    keep = (n_tokens >= 10) & (n_chars >= 100) & (alpha_ratio >= 0.5)
    return docs.select("doc_id", "lang", "source").filter(keep)


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-count language ID with deterministic argmax (ties resolved in
    declaration order, zh only on CJK presence, else 'und')."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        lang: F.regexp_count(F.lower(F.col("text")), F.lit(pat))
        for lang, pat in LANG_MARKERS.items()
    }
    cjk = F.regexp_count(F.col("text"), F.lit(CJK))
    best = F.greatest(*scores.values())
    pred = F.when(cjk > 0, F.lit("zh"))
    for lang in LANG_MARKERS:  # declaration order = tie-break order
        pred = pred.when((best > 0) & (scores[lang] == best), F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    sel = [F.col("doc_id"), pred.alias("pred_lang")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    return docs.select(*sel)


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form fingerprint: md5 of lower/whitespace-collapsed text."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


#: BPE-ish pretokenizer regex (GPT-2-style approximation): letter runs,
#: digit runs, single non-alnum-non-space marks — shared with the oracle.
BPE_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: rolling-hash modulus (fits in a long at every intermediate step even
#: under ANSI overflow checking: acc*31 + cp < 2^36)
RH_MOD = 2147483647


def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens AND a BPE-ish regex pretokenizer
    count (the cheap proxy for LLM token budgeting at corpus scale)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_PAT))
    return docs.select(
        "doc_id", ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens")
    )


def q_text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the character stream (mod 2^31-1) —
    a seed-free content fingerprint reproducible in any engine. Pure
    expression work (aggregate over split chars), shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    rhash = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(RH_MOD)),
    )
    return docs.select("doc_id", rhash.alias("rhash"))


QUERIES = {
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_tokens_bpe": q_text_tokens_bpe,
    "text_rolling_hash": q_text_rolling_hash,
}

_LANG_SCORES_SQL = ",\n".join(
    f"len(regexp_extract_all(lower(text), '{pat}')) AS score_{lang}"
    for lang, pat in LANG_MARKERS.items()
)

ORACLE = {
    "text_stats": r"""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
               CAST(length(text) AS INT) AS n_chars,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                   / length(text) AS alpha_ratio,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / length(text) AS digit_ratio,
               CAST(length(regexp_replace(text, '[^\s]', '', 'g')) AS DOUBLE)
                   / length(text) AS space_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\s]', '', 'g')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len
        FROM documents
    """,
    "text_quality": r"""
        SELECT doc_id, lang, source FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 10
          AND length(text) >= 100
          AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / length(text) >= 0.5
    """,
    "text_langid": f"""
        WITH scored AS (
            SELECT doc_id,
                   {_LANG_SCORES_SQL},
                   len(regexp_extract_all(text, '{CJK}')) AS score_cjk
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN score_cjk > 0 THEN 'zh'
                    WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
                    WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                    ELSE 'es' END AS pred_lang,
               CAST(score_en AS INT) AS score_en,
               CAST(score_de AS INT) AS score_de,
               CAST(score_fr AS INT) AS score_fr,
               CAST(score_es AS INT) AS score_es
        FROM scored
    """,
    "text_fingerprint": r"""
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "text_tokens_bpe": rf"""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS INT) AS n_bpe_tokens
        FROM documents
    """,
    "text_rolling_hash": f"""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                                [CAST(unicode(x) AS BIGINT) for x in string_split(text, '')]),
                   (acc, c) -> (acc * 31 + c) % {RH_MOD}
               ) AS rhash
        FROM documents
    """,
}
