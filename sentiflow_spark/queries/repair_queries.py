"""P7 — LLM-output JSON repair, declared-query surface.

The reference never trusts raw LLM output: ``cleanOpenAIResponse``
(internal/topic_generation/topic_generation.go:174-198) trims the
response, slices from the first ``{`` to the last ``}``, strips
markdown fences, and normalizes curly quotes before ``json.Unmarshal``.
These queries exercise the Spark rendering of that chain
(`sentiflow_spark.pipeline.topics.repair_llm_json`) end-to-end:
deliberately-dirty LLM text (fences, surrounding prose, curly-quoted
values, no-JSON-at-all) is synthesized deterministically from the
``documents`` table, repaired, parsed, deduplicated (A2) and
anti-joined against stored topics (J4) — the full
``cmd/topic-generator`` parse path.

Everything is codegen'd string expressions — no UDF, no extra shuffle
beyond the A2 window; at 100 TB the repair step is free (map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sentiflow_spark.pipeline.topics import duck_repair_llm_json, repair_llm_json
from sentiflow_spark.queries.registry import register
from sentiflow_spark.tables import load

# Shared dirty-response synthesis (Spark + DuckDB renderings must agree
# byte-for-byte). The payload string is sanitized to [A-Za-z0-9 ] so the
# synthesized JSON is valid by construction once repaired.
_N_URL_BUCKETS = 50

# The payload sanitizer runs on a 40-char PREFIX, never the full text:
# Catalyst pushes the chain's repaired-nonempty predicate down through
# the synthesis projections, inlining every aliased subexpression into
# the filter without reuse — a full-text regex referenced ~6× per
# branch turns into dozens of full-text evaluations per row (measured
# 50 s at 100k rows vs 3 s for the projection). Bounding the regex to
# the prefix makes every inlined copy O(40 chars).
_DUCK_DIRTY = f"""
    SELECT doc_id,
           regexp_replace(substring(text, 1, 40), '[^A-Za-z0-9 ]', '', 'g') AS t,
           'https://doc/' || CAST(doc_id % {_N_URL_BUCKETS} AS VARCHAR) AS u
    FROM documents
"""

_DUCK_RAW = """
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN '```json' || chr(10)
                    || '{"title": "' || t || '", "topic": "' || t
                    || '", "url": "' || u || '"}' || chr(10) || '```'
             WHEN 1 THEN 'Here is your JSON:' || chr(10)
                    || '{"title": "' || t || '", "topic": "' || t
                    || '", "url": "' || u || '"}  Hope this helps!'
             WHEN 2 THEN '{"title": “' || t || '”, "topic": “' || t
                    || '”, "url": “' || u || '”}'
             ELSE 'Sorry, I could not produce JSON for this request.'
           END AS raw
    FROM dirty
"""


def _dirty_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the four dirty-LLM-output shapes the reference's
    repair chain must survive, deterministically by doc_id."""
    docs = load(spark, sf_dir, "documents")
    t = F.regexp_replace(F.substring(F.col("text"), 1, 40), "[^A-Za-z0-9 ]", "")
    u = F.concat(
        F.lit("https://doc/"), (F.col("doc_id") % _N_URL_BUCKETS).cast("string")
    )
    dirty = docs.select("doc_id", t.alias("t"), u.alias("u"))
    body = F.concat(
        F.lit('{"title": "'), F.col("t"), F.lit('", "topic": "'), F.col("t"),
        F.lit('", "url": "'), F.col("u"), F.lit('"}'),
    )
    curly_body = F.concat(
        F.lit('{"title": “'), F.col("t"), F.lit('”, "topic": “'), F.col("t"),
        F.lit('”, "url": “'), F.col("u"), F.lit('”}'),
    )
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("```json\n"), body, F.lit("\n```")))
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("Here is your JSON:\n"), body, F.lit("  Hope this helps!")),
        )
        .when(F.col("doc_id") % 4 == 2, curly_body)
        .otherwise(F.lit("Sorry, I could not produce JSON for this request."))
    )
    return dirty.select("doc_id", raw.alias("raw"))


@register(
    "pl_topic_repair",
    oracle=f"""
    WITH dirty AS ({_DUCK_DIRTY}),
    raws AS ({_DUCK_RAW})
    SELECT doc_id, {duck_repair_llm_json("raw")} AS repaired
    FROM raws
    """,
    tags=("pipeline", "P7", "U1"),
    doc="P7 JSON repair over synthesized dirty LLM output: markdown "
    "fences, surrounding prose, curly-quoted values, and a no-JSON "
    "refusal (repaired to the reference's empty-string sentinel). "
    "Pure map-side string expressions — WholeStageCodegen, zero "
    "shuffles, linear at any scale.",
)
def pl_topic_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    raws = _dirty_raw(spark, sf_dir)
    return raws.select("doc_id", repair_llm_json(F.col("raw")).alias("repaired"))


@register(
    "pl_topic_repair_chain",
    oracle=f"""
    WITH dirty AS ({_DUCK_DIRTY}),
    raws AS ({_DUCK_RAW}),
    rep AS (
      SELECT doc_id, {duck_repair_llm_json("raw")} AS repaired FROM raws
    ),
    parsed AS (
      SELECT doc_id,
             json_extract_string(repaired, '$.title') AS title,
             json_extract_string(repaired, '$.topic') AS topic,
             json_extract_string(repaired, '$.url') AS url
      FROM rep WHERE repaired <> ''
    ),
    deduped AS (
      SELECT title, topic, url
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY url ORDER BY title, doc_id) AS rn
        FROM parsed
      ) WHERE rn = 1
    ),
    stored AS (
      SELECT DISTINCT 'https://doc/' || CAST(doc_id % {_N_URL_BUCKETS} AS VARCHAR) AS url
      FROM documents WHERE (doc_id % {_N_URL_BUCKETS}) % 3 = 0
    )
    SELECT d.title, d.topic, d.url
    FROM deduped d ANTI JOIN stored s ON d.url = s.url
    """,
    tags=("pipeline", "P7", "U1", "A2", "J4"),
    doc="The full cmd/topic-generator parse path: P7 repair → JSON "
    "field extraction (U1 parse) → A2 first-wins dedup by url with a "
    "deterministic (title, doc_id) tiebreak → J4 anti-join against "
    "stored topic urls. Refusals (empty repair) drop out exactly as "
    "the reference's error branch does. One window shuffle on url + "
    "one anti-join; the stored side stays a distinct-key set.",
)
def pl_topic_repair_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rep = _dirty_raw(spark, sf_dir).select(
        "doc_id", repair_llm_json(F.col("raw")).alias("repaired")
    )
    # single from_json parse (three get_json_object calls would each
    # re-parse — and re-inline the whole repair chain — per field)
    parsed = rep.filter(F.col("repaired") != "").select(
        "doc_id",
        F.from_json("repaired", "title string, topic string, url string").alias("p"),
    ).select("doc_id", "p.title", "p.topic", "p.url")
    w = Window.partitionBy("url").orderBy("title", "doc_id")
    deduped = (
        parsed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("title", "topic", "url")
    )
    stored = (
        docs.filter((F.col("doc_id") % _N_URL_BUCKETS) % 3 == 0)
        .select(
            F.concat(
                F.lit("https://doc/"), (F.col("doc_id") % _N_URL_BUCKETS).cast("string")
            ).alias("url")
        )
        .distinct()
    )
    return deduped.join(stored, "url", "left_anti").select("title", "topic", "url")
