"""Operator modules of the extension surface (SURVEY.md §2.4).

Each module exposes:
- ``QUERIES``: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
- ``ORACLE``:  dict[name, str] — DuckDB-runnable ANSI SQL equivalents
  (omitted for non-SQL-expressible ops; the driver then records a weaker
  rows-only check).

``all_queries()`` / ``all_oracle()`` merge them for ``__spark_entry__``.

Round 4 put every round-3 operator behind the driver gate: ``lm`` +
``boilerplate`` + ``drift`` register through ``quality``
(corpus_quality_signals); ``bpe`` + ``packing`` + ``chunking`` + split
assignment through ``pipelines.trainer_prep`` (trainer_prep); ``gapfill``
as the gapfill arm of events_time_rollups; the audio modality as
multimodal_audio. Slots came from consolidating same-category entries
(dedup_simhash + dedup_components; set_operations + pivot_unpivot;
filter_project_sample + scalar_functions). Library-only modules now:
``sketches`` (HLL + count-min registers, both surfaced inside
quantiles_sketches), ``skew`` (salting patterns, exercised by the
guarded window path), ``classifier`` (round 5; the derived-weight score
is the gated clf arm of corpus_quality_signals, the weight-table path is
fixture-tested), ``paragraphs`` (round 5; paragraph-level corpus
dedup — the synthetic documents carry no newlines, so it is verified by
fixture tests with an exact DuckDB mirror, tests/test_paragraphs.py),
and ``embedding`` (round 5; pluggable document-embedding seam with a
deterministic hashed-BoW default, bit-exact against a pure-Python
reference, feeding the similarity surface end to end).
"""

from __future__ import annotations

from ts_etl_spark.operators import (
    advanced,
    dedup,
    events,
    multimodal,
    quality,
    relational,
    report,
    similarity,
    textops,
)
from ts_etl_spark.pipelines import curation, trainer_prep

# Registration order = the order the driver's CORRECTNESS sweep visits
# queries (it verifies the first 50 entries). The LLM-data-pipeline modules
# register FIRST as insurance: even if the total ever creeps past 50 again,
# dedup/similarity/text/quality/multimodal/trainer-prep/events keep their
# driver-green rows. (The whole surface is consolidated to ≤50 entries so
# every query gets a row in one sweep.)
_MODULES = (
    dedup,
    similarity,
    textops,
    quality,
    multimodal,
    report,
    curation,
    trainer_prep,
    events,
    relational,
    advanced,
)


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
