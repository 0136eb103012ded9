"""Declared queries for the Arrow-vectorized Python surface
(functions/pandas_fns.py): scalar pandas UDF, grouped-agg pandas UDAF,
Python UDTF. Tagged ``arrow-udf`` — the plan guardrail exempts these
from the no-Python rule (they ARE the sanctioned Python path) but
still asserts they plan as Arrow evaluation, never pickled-row
BatchEvalPython.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiflow_spark.functions.pandas_fns import (
    median_cents,
    register_udtfs,
    taxed_cents,
)
from sentiflow_spark.queries.registry import register
from sentiflow_spark.tables import load


@register(
    "pd_scalar_taxed_cents",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 + CAST(round(l_tax * 100) AS BIGINT)) // 100
             AS taxed_cents
    FROM lineitem
    """,
    tags=("pandas-udf", "arrow-udf", "U2", "M5"),
    doc="Scalar @pandas_udf (Arrow-batched, vectorized numpy int64 "
    "money math) — the plug-in shape for custom per-row featurizers; "
    "exact-integer semantics make it hash-checkable cross-engine.",
)
def pd_scalar_taxed_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        taxed_cents(F.col("l_extendedprice"), F.col("l_tax")).alias("taxed_cents"),
    )


@register(
    "pd_grouped_median",
    oracle="""
    SELECT l_returnflag,
           median(CAST(round(l_extendedprice * 100) AS BIGINT)) AS med_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("pandas-udf", "arrow-udf", "U3", "M5"),
    doc="GROUPED_AGG @pandas_udf (custom UDAF): exact median of "
    "integer cents per return flag. The whole group ships to Python "
    "as one Arrow batch — bounded-key aggregates only; the plan is "
    "still a proper two-stage aggregate with a hash shuffle.",
)
def pd_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        median_cents(cents).alias("med_cents")
    )


@register(
    "pd_udtf_first_words",
    oracle="""
    SELECT doc_id, i AS pos, words[i] AS word
    FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
         generate_series(1, 5) AS g(i)
    WHERE i <= len(words)
    """,
    tags=("pandas-udf", "arrow-udf", "U1", "M5"),
    doc="Python UDTF via LATERAL: one document row fans out to up to "
    "5 (pos, word) rows — the 1→0..n row shape of the reference's "
    "LLM topic extraction (U1).",
)
def pd_udtf_first_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    register_udtfs(spark)
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.word "
        "FROM {docs} d, LATERAL first_words(d.text) t",
        docs=docs,
    )
