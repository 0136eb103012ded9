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


def repair_llm_json(col: Column) -> Column:
    """P7 — LLM-output JSON repair, the Spark rendering of the
    reference's ``cleanOpenAIResponse``
    (internal/topic_generation/topic_generation.go:174-198).

    Observable semantics preserved exactly:

    1. trim whitespace;
    2. slice from the FIRST ``{`` to the LAST ``}`` — empty string when
       either brace is absent or they are inverted (the reference
       returns ``""`` and logs);
    3. normalize curly quotes (U+201C/U+201D) to straight quotes.

    The reference's ```` ```json ```` fence-trim is subsumed by the
    brace slice (a fence is always outside the outermost braces, so
    after step 2 the Go TrimPrefix/TrimSuffix are no-ops). Pure
    codegen'd string expressions — no UDF, no shuffle.
    """
    s = F.trim(col)
    start = F.instr(s, "{")
    rev_end = F.instr(F.reverse(s), "}")
    end = F.length(s) - rev_end + 1
    ok = (start > 0) & (rev_end > 0) & (end > start)
    body = F.when(ok, F.substring(s, start, end - start + 1)).otherwise(F.lit(""))
    return F.translate(body, "“”", '""')


def duck_repair_llm_json(expr: str) -> str:
    """DuckDB fragment computing exactly ``repair_llm_json``.

    ``expr`` should be a simple column reference (it is evaluated
    several times).
    """
    s = f"trim({expr})"
    start = f"strpos({s}, '{{')"
    rev_end = f"strpos(reverse({s}), '}}')"
    end = f"(length({s}) - {rev_end} + 1)"
    body = (
        f"CASE WHEN {start} > 0 AND {rev_end} > 0 AND {end} > {start} "
        f"THEN substring({s}, {start}, {end} - {start} + 1) ELSE '' END"
    )
    return f"translate({body}, '“”', '\"\"')"


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
