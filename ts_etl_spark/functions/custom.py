"""User-defined function surface: scalar (Arrow-vectorized), aggregate
(grouped-agg pandas UDF), and table-valued (Python UDTF) — the three
extension points a user reaches for when built-in expressions genuinely
cannot express the logic.

Discipline (SURVEY §"UDFs are the slow path"): everything registered here
is either Arrow-batched (scalar/UDAF — one Python roundtrip per batch, not
per row) or explicitly a demonstration of the API shape (UDTF). The
engine's own operators use built-in expressions wherever possible; these
exist so USER logic has a first-class, tested on-ramp — completing the
reference's extension-surface analogue (its parser/renderer registries,
src/parsers/index.ts:8-31) on the function axis.

Every function is defined as a closure/class pickled by value, so a bare
session without this package on the executor path can still run them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


@pandas_udf(DoubleType())
def log1p_ratio(num: pd.Series, den: pd.Series) -> pd.Series:
    """Scalar Arrow-vectorized UDF: log1p of a ratio, NULL-safe — the
    vectorized shape for numeric feature engineering (numpy over Arrow
    batches; ~10-100× the throughput of a row-at-a-time Python UDF)."""
    import numpy as np

    return pd.Series(np.log1p(num.to_numpy() / den.to_numpy()))


@pandas_udf(DoubleType())
def geo_mean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): geometric mean of the positive
    values — exp(mean(ln x)), a real aggregate DuckDB can mirror exactly.

    Scale note: grouped-agg UDFs materialize each GROUP as one pandas
    Series — right for bounded group sizes; an unbounded hot group needs
    the partial-aggregatable reformulation (sum of logs via built-ins)."""
    import numpy as np

    x = v.to_numpy()
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


@udtf(
    returnType=StructType(
        [StructField("gram", StringType()), StructField("pos", IntegerType())]
    )
)
class WordNGrams:
    """Python UDTF (table function): explode a document into word n-grams
    with positions — usable from SQL as a lateral table function:

        SELECT doc_id, g.gram, g.pos
        FROM documents, LATERAL word_ngrams(text, 3) g

    The engine's own gram operators use the built-in zip_with pipeline
    (textops.ngram_array — JVM-side, no Python); this UDTF is the on-ramp
    for USER tokenizers that genuinely need Python (a real BPE, a language
    -specific segmenter), with the same table-function call shape."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n < 1:
            return
        words = text.strip().lower().split()
        for i in range(len(words) - n + 1):
            yield (" ".join(words[i : i + n]), i + 1)


def register_all(spark: SparkSession) -> None:
    """Register the surface for SQL use (idempotent):
    ``log1p_ratio(num, den)``, ``geo_mean(x)``, ``word_ngrams(text, n)``."""
    spark.udf.register("log1p_ratio", log1p_ratio)
    spark.udf.register("geo_mean", geo_mean)
    spark.udtf.register("word_ngrams", WordNGrams)
