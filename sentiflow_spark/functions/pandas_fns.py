"""Arrow-vectorized Python function surface: scalar ``@pandas_udf``,
grouped-agg ``@pandas_udf`` (UDAF), and a Python UDTF.

The engine's rule (SURVEY §7.1) is built-ins first — every hot-path
operator is JVM-side. But the reference's model-call operators
(SURVEY §2.9 U1–U3) establish that the engine must ALSO carry a
user-extensible Python surface, and at 100 TB the only acceptable form
of that surface is Arrow-batched: one Python invocation per ~10k-row
batch, columnar transfer, no per-row pickling. This module pins each
of Spark's three Arrow UDF shapes with deterministic, oracle-checkable
semantics (integer cents arithmetic — exact on every engine):

- scalar ``@pandas_udf``: per-row vectorized compute (the shape a
  custom scorer/featurizer plugs into),
- GROUPED_AGG ``@pandas_udf``: a custom aggregate over a whole group
  (the shape a custom sketch/statistic plugs into). The full group is
  materialized in one pandas Series — bounded-cardinality keys only;
  for unbounded keys use a built-in or an algebraic two-phase agg,
- ``@udtf``: one row → many rows (the shape U1's topic extraction
  has: SURVEY cites internal/topic_generation/topic_generation.go
  emitting 0..n topics per headline batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# DataType objects, not DDL strings: string return types are parsed
# through the active SparkContext at decoration time, which would make
# this module unimportable before a session exists (pytest collection,
# driver import order).


@pandas_udf(LongType())
def taxed_cents(price: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized exact money math: price with tax applied, in integer
    cents. ``round(price*100)`` and ``round(tax*100)`` are exact (the
    synthetic data is 2-dp), and the whole computation stays in int64,
    so Spark and any SQL oracle agree bit-for-bit. One Arrow batch in,
    one numpy int64 vector compute, one batch out."""
    cents = price.mul(100).round().astype("int64")
    tax_pct = tax.mul(100).round().astype("int64")
    return cents * (100 + tax_pct) // 100


@pandas_udf(DoubleType())
def median_cents(cents: pd.Series) -> float:  # type: ignore[misc]
    """GROUPED_AGG UDAF: exact median over integer cents. np.median's
    linear interpolation on int64 yields x.0 or x.5 — both exactly
    representable, so it hash-matches DuckDB's quantile_cont-based
    median. Whole group arrives as one Series (use only on
    bounded-cardinality keys)."""
    return float(np.median(cents.to_numpy()))


@pandas_udf(DoubleType())
def rerank_logit(n_chars: pd.Series, bm25_rank: pd.Series) -> pd.Series:
    """Deterministic cross-encoder stand-in for ret_rerank_stub (the
    U1-U3 / mm_feature_extract stub convention): a fixed arithmetic
    pseudo-logit over (n_chars, bm25_rank) the SQL oracle mirrors
    exactly. A real deployment swaps tokenizer+model inference into
    this same Arrow batch; everything around it is production-shaped."""
    return (
        (n_chars.astype("int64") * 131 + bm25_rank.astype("int64") * 17) % 2001
        - 1000
    ) / 1000.0


@udtf(
    returnType=StructType(
        [StructField("pos", IntegerType()), StructField("word", StringType())]
    ),
    useArrow=True,
)
class FirstWordsUDTF:
    """Python UDTF (Spark 4 table function): one text row → up to
    ``max_words`` (pos, word) rows, splitting on single spaces.
    Registered per-session via :func:`register_udtfs`; used from SQL
    with LATERAL. The built-in equivalent (posexplode(slice(split())))
    is the hot-path form; the UDTF exists because U1-style operators
    (LLM topic extraction, 1 row → 0..n rows) need a Python body."""

    MAX_WORDS = 5

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")[: self.MAX_WORDS], start=1):
            yield i, w


def register_udtfs(spark) -> None:
    """Idempotently register the UDTF surface for SQL use."""
    spark.udtf.register("first_words", FirstWordsUDTF)
