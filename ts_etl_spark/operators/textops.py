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

#: BPE-ish pretokenizer regex (GPT-2-style approximation): letter runs,
#: digit runs, single non-alnum-non-space marks — shared with the oracle.
BPE_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: rolling-hash modulus (fits in a long at every intermediate step even
#: under ANSI overflow checking: acc*31 + cp < 2^36)
RH_MOD = 2147483647


def _metric_cols() -> list:
    """Corpus-metric columns: token counts (whitespace + BPE-ish regex
    pretokenizer — the cheap proxy for LLM token budgeting), char-class
    ratios, and the classic pre-training quality gate as a boolean."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    spaces = F.length(F.regexp_replace(F.col("text"), r"[^\s]", ""))
    alpha_ratio = alpha.cast("double") / n_chars
    quality_pass = (n_tokens >= 10) & (n_chars >= 100) & (alpha_ratio >= 0.5)
    return [
        n_tokens.alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PAT)).alias("n_bpe_tokens"),
        n_chars.alias("n_chars"),
        alpha_ratio.alias("alpha_ratio"),
        (digits.cast("double") / n_chars).alias("digit_ratio"),
        (spaces.cast("double") / n_chars).alias("space_ratio"),
        ((n_chars - spaces).cast("double") / n_tokens).alias("avg_token_len"),
        quality_pass.alias("quality_pass"),
    ]


def _signature_cols() -> list:
    """Identity-signal columns: marker-count language ID with deterministic
    argmax (ties resolved in declaration order, zh only on CJK presence,
    else 'und'), canonical-form md5 fingerprint (lower/whitespace-collapsed),
    and a polynomial rolling hash over the character stream (mod 2^31-1 —
    seed-free, reproducible in any engine, pmod-bounded so ANSI overflow
    checking never trips)."""
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
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    rhash = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(RH_MOD)),
    )
    sel = [pred.alias("pred_lang")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    sel += [F.md5(canon).alias("fingerprint"), rhash.alias("rhash")]
    return sel


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus metrics (building block; registered via the
    merged ``text_analysis``)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *_metric_cols())


def q_text_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document identity signals (building block; registered via the
    merged ``text_analysis``)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *_signature_cols())


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text-analysis surface — corpus metrics AND identity signals
    — in ONE shuffle-free projection over documents (same grain, same scan;
    merging the two column families costs nothing and keeps every expression
    inside a single WholeStageCodegen stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *_metric_cols(), *_signature_cols())


QUERIES = {
    "text_analysis": q_text_analysis,
}

_LANG_SCORES_SQL = ",\n".join(
    f"len(regexp_extract_all(lower(text), '{pat}')) AS score_{lang}"
    for lang, pat in LANG_MARKERS.items()
)

ORACLE = {
    "text_analysis": rf"""
        WITH scored AS (
            SELECT doc_id, text,
                   {_LANG_SCORES_SQL},
                   len(regexp_extract_all(text, '{CJK}')) AS score_cjk
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS INT) AS n_bpe_tokens,
               CAST(length(text) AS INT) AS n_chars,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                   / length(text) AS alpha_ratio,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / length(text) AS digit_ratio,
               CAST(length(regexp_replace(text, '[^\s]', '', 'g')) AS DOUBLE)
                   / length(text) AS space_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\s]', '', 'g')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len,
               (len(regexp_split_to_array(trim(text), '\s+')) >= 10
                AND length(text) >= 100
                AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                        / length(text) >= 0.5) AS quality_pass,
               CASE WHEN score_cjk > 0 THEN 'zh'
                    WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
                    WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                    ELSE 'es' END AS pred_lang,
               CAST(score_en AS INT) AS score_en,
               CAST(score_de AS INT) AS score_de,
               CAST(score_fr AS INT) AS score_fr,
               CAST(score_es AS INT) AS score_es,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                                [CAST(unicode(x) AS BIGINT) for x in string_split(text, '')]),
                   (acc, c) -> (acc * 31 + c) % {RH_MOD}
               ) AS rhash
        FROM scored
    """,
}
