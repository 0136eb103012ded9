"""Topic-generation job (SURVEY §3.3 — the reference's
``cmd/topic-generator``): headlines → LLM topic extraction (U1) →
JSON repair (P7) → batch-local dedup (A2) → anti-join vs stored
topics (J4) → upsert.

U1's OpenAI call is a deterministic stub here (category from a fixed
lang→category map, topic = leading words), mirroring the fixture
strategy of FIXTURES.md §2; the real adapter would be a mapInPandas
batch UDF exactly like pipeline/model_udfs-style code. The
read-once staleness quirk of the reference (stored topics scanned once
before the loop — topic_generation.go:219-236) is preserved by taking
``stored`` as an explicit argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sentiflow_spark.operators.joins import anti_join_stored

# Reference taxonomy: 9 categories (internal/producer/fetch.go:19-29).
LANG_CATEGORY = {
    "en": "technology",
    "de": "business",
    "es": "entertainment",
    "fr": "science",
    "zh": "health",
}
DEFAULT_CATEGORY = "general"


def category_from_lang(lang: Column) -> Column:
    expr = F.lit(DEFAULT_CATEGORY)
    for code, cat in sorted(LANG_CATEGORY.items(), reverse=True):
        expr = F.when(lang == code, F.lit(cat)).otherwise(expr)
    return expr


def duck_category_from_lang(lang: str) -> str:
    expr = f"'{DEFAULT_CATEGORY}'"
    for code, cat in sorted(LANG_CATEGORY.items(), reverse=True):
        expr = f"CASE WHEN {lang} = '{code}' THEN '{cat}' ELSE {expr} END"
    return expr


def extract_topics_stub(headlines: DataFrame) -> DataFrame:
    """U1 stub: one topic per headline — topic phrase = first two
    words, category from the language map, url as the unique key."""
    toks = F.split(F.col("text"), " ")
    return headlines.select(
        F.col("text").alias("title"),
        # F.get is 0-based and NULL-safe out of bounds (element_at throws
        # under ANSI); concat_ws skips NULLs in both engines
        F.concat_ws(" ", F.get(toks, 0), F.get(toks, 1)).alias("topic"),
        category_from_lang(F.col("lang")).alias("category"),
        F.concat(F.lit("https://doc/"), F.col("doc_id")).alias("url"),
    )


def dedup_topics(topics: DataFrame) -> DataFrame:
    """A2: first-wins by url with an explicit deterministic tiebreak
    (the reference keeps encounter order; we order by title)."""
    w = W.partitionBy("url").orderBy("title")
    return (
        topics.filter(F.col("url") != "")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def generate_topics(headlines: DataFrame, stored: DataFrame) -> DataFrame:
    """Full U1→A2→J4 chain against a read-once stored snapshot."""
    return anti_join_stored(
        dedup_topics(extract_topics_stub(headlines)), stored, "url"
    )
