"""Golden replay of the reference's captured OpenAI output
(/root/reference/responses.json — 30 topics, 7 categories) through the
U1 parse → P7 repair → A2 dedup → J4 anti-join chain (SURVEY §5 item 4).

The fixture is the only reference-derived golden that exists; it is
read from the read-only reference tree at test time (never copied into
this repo) and skipped if absent.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from sentiflow_spark.operators.joins import anti_join_stored
from sentiflow_spark.pipeline.topics import dedup_topics, repair_llm_json

GOLDEN = "/root/reference/responses.json"

TOPIC_SCHEMA = StructType(
    [
        StructField(
            "topics",
            ArrayType(
                StructType(
                    [
                        StructField("title", StringType()),
                        StructField("topic", StringType()),
                        StructField("category", StringType()),
                        StructField("url", StringType()),
                    ]
                )
            ),
        )
    ]
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden fixture not present"
)


@pytest.fixture(scope="module")
def golden_text() -> str:
    with open(GOLDEN, encoding="utf-8") as fh:
        return fh.read()


def _parse_topics(spark, raw: str):
    """P7 repair → from_json with the reference's Topics schema →
    explode to one row per topic."""
    df = spark.createDataFrame([(raw,)], "raw string")
    repaired = df.select(repair_llm_json(F.col("raw")).alias("clean"))
    return (
        repaired.select(F.from_json("clean", TOPIC_SCHEMA).alias("p"))
        .select(F.explode("p.topics").alias("t"))
        .select("t.title", "t.topic", "t.category", "t.url")
    )


def test_golden_parses_clean(spark, golden_text):
    """The captured response parses to exactly the reference's 30
    topics across 7 categories, every one with a non-empty url."""
    expected = json.loads(golden_text)["topics"]
    rows = _parse_topics(spark, golden_text).collect()
    assert len(rows) == len(expected) == 30
    assert {r.category for r in rows} == {t["category"] for t in expected}
    assert len({r.category for r in rows}) == 7
    assert all(r.url for r in rows)
    got = {(r.title, r.topic, r.category, r.url) for r in rows}
    want = {(t["title"], t["topic"], t["category"], t["url"]) for t in expected}
    assert got == want


def test_golden_survives_llm_dirt(spark, golden_text):
    """Wrapping the capture in the exact dirt cleanOpenAIResponse
    strips — prose, markdown fences, trailing chatter — parses to the
    identical topic set (topic_generation.go:174-198 parity)."""
    dirty = (
        "Sure! Here is the JSON you asked for:\n```json\n"
        + golden_text
        + "\n```\nLet me know if you need anything else."
    )
    clean_rows = _parse_topics(spark, golden_text).collect()
    dirty_rows = _parse_topics(spark, dirty).collect()
    assert sorted(map(tuple, dirty_rows)) == sorted(map(tuple, clean_rows))


def test_golden_braceless_refusal_is_empty(spark):
    """No braces at all → the reference returns "" and unmarshal yields
    zero topics; our chain must produce zero rows, not an error."""
    rows = _parse_topics(spark, "I'm sorry, I can't help with that.").collect()
    assert rows == []


def test_golden_chain_dedup_and_anti_join(spark, golden_text):
    """Full U1→A2→J4: duplicate the batch against itself (A2 keeps one
    per url), then anti-join against a stored set holding 5 of the 30
    urls (J4 drops exactly those)."""
    expected = json.loads(golden_text)["topics"]
    parsed = _parse_topics(spark, golden_text)
    doubled = parsed.unionAll(parsed)

    deduped = dedup_topics(doubled)
    assert deduped.count() == 30

    stored_urls = sorted(t["url"] for t in expected)[:5]
    stored = spark.createDataFrame([(u,) for u in stored_urls], "url string")
    fresh = anti_join_stored(deduped, stored, "url")
    got_urls = {r.url for r in fresh.collect()}
    assert len(got_urls) == 25
    assert got_urls.isdisjoint(stored_urls)
