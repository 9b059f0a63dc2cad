"""Skew-mitigation patterns (SURVEY.md §2.4 scale notes).

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these explicit patterns cover the cases AQE cannot: aggregation hot keys and
broadcast-infeasible dimension joins against a skewed fact key.

- ``salted_aggregate``: two-phase aggregation — partial agg on
  (key, salt), final agg on key. The hot key's load spreads over
  ``n_salt`` reducers in phase 1; phase 2 only merges ``n_salt`` rows per
  key. Supports the decomposable aggregates (count/sum/min/max).
- ``salted_join``: replicate the dimension side ``n_salt`` times, salt the
  fact side deterministically — the hot fact key spreads over ``n_salt``
  co-partitioned streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _fact_salt(df: DataFrame, n_salt: int) -> Column:
    """Deterministic per-row salt: hash of the whole row spreads a hot key
    uniformly without RNG (keeps results reproducible across retries)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``measures`` maps column -> one of count/sum/min/max (the decomposable
    aggregates: merge(partial) == total). Output columns are ``<fn>_<col>``.
    """
    partial_aggs, final_aggs = [], []
    for col, fn in measures.items():
        out = f"{fn}_{col}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(out))
            final_aggs.append(F.sum(out).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(out))
            final_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(out))
            final_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(out))
            final_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = (
        df.withColumn(_SALT, _fact_salt(df, n_salt))
        .groupBy(*keys, _SALT)
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim replicated ``n_salt``×, fact salted, join on
    (key, salt). Correct for inner/left joins on a unique dim key."""
    salted_fact = fact.withColumn(_SALT, _fact_salt(fact, n_salt))
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_fact.join(replicated_dim, [on, _SALT], how)
    return out.drop(_SALT)
