"""The real model-service adapters (pipeline/model_udfs.py) driven with
local transports — the Spark plumbing (Arrow batching, pruning,
schema, missing-row F5 quirk, retry envelope) is exercised for real;
only the HTTP hop is replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiflow_spark.operators.projections import to_raw_content
from sentiflow_spark.pipeline.model_udfs import (
    _with_retries,
    extract_topics_via_llm,
    score_via_service,
    summarize_via_service,
)
from sentiflow_spark.pipeline.stubs import stub_sentiment, stub_summarize
from sentiflow_spark.tables import load


def _raw(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return to_raw_content(
        docs,
        topic=F.col("lang"),
        source=F.col("source"),
        post_id=F.col("doc_id"),
        text=F.col("text"),
    )


# transports are defined INSIDE each test: cloudpickle serializes
# nested functions by value, while module-level ones ship by reference
# to workers that cannot import the test module


def test_summary_adapter_matches_stub(spark, sf_dir):
    def transport(batch):
        return [
            {"content_id": r["content_id"], "summary": r["text"][:128]} for r in batch
        ]

    reqs = _raw(spark, sf_dir).select("content_id", "text")
    via_service = summarize_via_service(reqs, transport)
    expected = stub_summarize(reqs)
    assert via_service.exceptAll(expected).count() == 0
    assert expected.exceptAll(via_service).count() == 0


def test_score_adapter_matches_stub_including_f5(spark, sf_dir):
    def transport(batch):
        out = []
        for r in batch:
            n = len(r["text"])
            if n % 47 == 0:  # F5: service returns nothing for these ids
                continue
            score = ((n * 37 + 11) % 2001 - 1000) / 1000.0
            label = (
                "positive"
                if score > 0.05
                else "negative" if score < -0.05 else "neutral"
            )
            out.append(
                {
                    "content_id": r["content_id"],
                    "sentiment_score": score,
                    "sentiment_label": label,
                    "confidence": abs(score),
                }
            )
        return out

    reqs = _raw(spark, sf_dir).select("content_id", "text")
    via_service = score_via_service(reqs, transport)
    expected = stub_sentiment(reqs)
    assert via_service.exceptAll(expected).count() == 0
    assert expected.exceptAll(via_service).count() == 0
    # F5 rows really are missing from the service output
    assert via_service.count() < reqs.count()


def test_topic_adapter_udtf_cardinality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(250)
    headlines = docs.select(
        F.col("text").alias("title"),
        F.concat(F.lit("https://x/"), F.col("doc_id")).alias("url"),
    )

    def transport(batch):
        assert len(batch) <= 100  # the reference's LLM buffer cap
        # emit a topic for every other headline (0..1 rows per input)
        return [
            {"title": r["title"], "topic": r["title"][:16], "category": "tech",
             "url": r["url"]}
            for i, r in enumerate(batch) if i % 2 == 0
        ]

    topics = extract_topics_via_llm(headlines, transport)
    n = topics.count()
    assert 0 < n < 250
    assert set(topics.columns) == {"title", "topic", "category", "url"}


def test_retry_envelope_retries_then_raises():
    calls = {"n": 0}

    def flaky(batch):
        calls["n"] += 1
        raise OSError("conn refused")

    import sentiflow_spark.pipeline.model_udfs as mu

    orig = mu.BACKOFF_BASE_S
    mu.BACKOFF_BASE_S = 0.001
    try:
        with pytest.raises(OSError):
            _with_retries(flaky, [])
    finally:
        mu.BACKOFF_BASE_S = orig
    assert calls["n"] == mu.MAX_ATTEMPTS


def test_retry_envelope_fails_fast_on_malformed_response():
    """A deterministic contract error (malformed JSON → ValueError)
    must NOT be retried — it can never succeed."""
    calls = {"n": 0}

    def malformed(batch):
        calls["n"] += 1
        raise ValueError("not json")

    with pytest.raises(ValueError):
        _with_retries(malformed, [])
    assert calls["n"] == 1


def test_retry_envelope_recovers():
    calls = {"n": 0}

    def flaky_then_ok(batch):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("conn reset")
        return [{"ok": True}]

    import sentiflow_spark.pipeline.model_udfs as mu

    orig = mu.BACKOFF_BASE_S
    mu.BACKOFF_BASE_S = 0.001
    try:
        assert _with_retries(flaky_then_ok, []) == [{"ok": True}]
    finally:
        mu.BACKOFF_BASE_S = orig


def test_score_adapter_runs_in_streaming(spark, sf_dir):
    """The mapInPandas service adapter composes with Structured
    Streaming: the same UDF scores micro-batches inside a streaming
    query (the production deployment shape)."""
    from sentiflow_spark.streaming.dag import load_stream, run_to_table

    def transport(batch):
        return [
            {
                "content_id": r["content_id"],
                "sentiment_score": 0.5,
                "sentiment_label": "positive",
                "confidence": 0.5,
            }
            for r in batch
        ]

    docs = load_stream(spark, sf_dir, "documents")
    raw = to_raw_content(
        docs,
        topic=F.col("lang"),
        source=F.col("source"),
        post_id=F.col("doc_id"),
        text=F.col("text"),
    )
    scored = score_via_service(raw.select("content_id", "text"), transport)
    out = run_to_table(scored)
    assert out.count() == 500
    assert out.filter(F.col("sentiment_label") == "positive").count() == 500


def test_rate_limit_hint_parsing():
    """parseRateLimitHeaders parity (reddit_client.go:247-268) plus
    standard Retry-After: explicit seconds win; X-Ratelimit pacing is
    reset/remaining with the reference's defaults and >=1 clamp; no
    headers -> None (fall back to exponential backoff)."""
    from sentiflow_spark.pipeline.model_udfs import rate_limit_hint

    assert rate_limit_hint(None) is None
    assert rate_limit_hint({}) is None
    assert rate_limit_hint({"Retry-After": "7"}) == 7.0
    # unparseable Retry-After falls through to the ratelimit pair
    assert rate_limit_hint({"Retry-After": "Wed, 21 Oct", "X-Ratelimit-Reset": "30",
                            "X-Ratelimit-Remaining": "10"}) == 3.0
    # defaults: remaining=60 when only reset is present
    assert rate_limit_hint({"X-Ratelimit-Reset": "120"}) == 2.0
    # remaining clamped to >=1 (the reference's divide-by-zero guard)
    assert rate_limit_hint({"X-Ratelimit-Reset": "45", "X-Ratelimit-Remaining": "0"}) == 45.0
    # reset defaults to 60 when only remaining is present
    assert rate_limit_hint({"X-Ratelimit-Remaining": "30"}) == 2.0


def test_retry_envelope_honors_retry_after(monkeypatch):
    """A 429 with Retry-After sleeps the server's hint (not the
    exponential schedule) and then succeeds; a plain 400 raises
    immediately without retrying."""
    import io
    import urllib.error

    import sentiflow_spark.pipeline.model_udfs as mu

    naps = []
    monkeypatch.setattr(mu.time, "sleep", naps.append)

    calls = {"n": 0}

    def limited(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.HTTPError(
                "http://svc", 429, "Too Many Requests",
                {"Retry-After": "3"}, io.BytesIO(b""))
        return [{"ok": True}]

    assert mu._with_retries(limited, []) == [{"ok": True}]
    assert calls["n"] == 2 and naps == [3.0]

    def bad_request(batch):
        calls["n"] += 1
        raise urllib.error.HTTPError("http://svc", 400, "Bad Request", {}, io.BytesIO(b""))

    calls["n"] = 0
    import pytest

    with pytest.raises(urllib.error.HTTPError):
        mu._with_retries(bad_request, [])
    assert calls["n"] == 1  # no retry on deterministic client error


def test_reddit_url_builder_reference_params():
    """buildRedditAPIUrl parity (reddit_client.go:67-85): q/sort/limit/
    t/type always present, after only when continuing a chain."""
    from urllib.parse import parse_qs, urlparse

    from sentiflow_spark.pipeline.model_udfs import build_reddit_search_url

    u = urlparse(build_reddit_search_url("https://api.example", "golang", "spark joins"))
    assert u.path == "/r/golang/search"
    q = parse_qs(u.query)
    assert q["q"] == ["spark joins"]
    assert q["sort"] == ["relevance"] and q["limit"] == ["100"]
    assert q["t"] == ["day"] and q["type"] == ["link"]
    assert "after" not in q

    u2 = urlparse(build_reddit_search_url("https://api.example", "golang", "x", after="t3_abc"))
    assert parse_qs(u2.query)["after"] == ["t3_abc"]


def test_fetch_paginated_follows_after_cursor(spark):
    """S4 pagination (fetch.go:95-117): pages chain on the after
    cursor, stop on empty cursor, nothing dropped or duplicated; the
    accumulated rows feed the P2 projection as one DataFrame."""
    from sentiflow_spark.operators.projections import to_raw_content
    from sentiflow_spark.pipeline.model_udfs import fetch_paginated

    pages = {
        "": ([{"post_id": "p1", "title": "a"}, {"post_id": "p2", "title": "b"}], "c1"),
        "c1": ([{"post_id": "p3", "title": "c"}], "c2"),
        "c2": ([{"post_id": "p4", "title": "d"}], ""),
    }
    seen_cursors = []

    def fetch_page(after):
        seen_cursors.append(after)
        return pages[after]

    rows = fetch_paginated(fetch_page)
    assert seen_cursors == ["", "c1", "c2"]
    assert [r["post_id"] for r in rows] == ["p1", "p2", "p3", "p4"]

    # cursor cycle → the max_pages rail stops it (reference loops forever)
    cyc = fetch_paginated(lambda after: ([{"post_id": "x"}], "loop"), max_pages=7)
    assert len(cyc) == 7

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(r["post_id"], r["title"], "golang", "spark") for r in rows],
        ["post_id", "title", "subreddit", "topic"],
    )
    projected = to_raw_content(
        df,
        topic=F.col("topic"),
        source=F.col("subreddit"),
        post_id=F.col("post_id"),
        text=F.col("title"),
    )
    assert projected.count() == 4
    assert projected.select("content_id").distinct().count() == 4


def test_reddit_search_datasource_distributed_pagination(spark):
    """S4 as a real Spark source: each (subreddit, topic) pagination
    chain is its own input partition (the ingest tier fans out with
    the crawl plan instead of serializing on the driver), every chain
    follows the fixture's 3-page after-cursor sequence through the
    REAL build_reddit_search_url, and the union of chains is exactly
    subreddits x topics x pages x posts rows."""
    from sentiflow_spark.sources.http_source import (
        FIXTURE_PAGES,
        FIXTURE_POSTS_PER_PAGE,
        RedditSearchDataSource,
    )

    spark.dataSource.register(RedditSearchDataSource)
    df = (
        spark.read.format("reddit_search")
        .option("subreddits", "golang,dataengineering")
        .option("topics", "spark,duckdb")
        .option("transport", "fixture")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # 2 subreddits x 2 topics
    rows = df.collect()
    assert len(rows) == 4 * FIXTURE_PAGES * FIXTURE_POSTS_PER_PAGE
    by_chain = {}
    for r in rows:
        by_chain.setdefault((r.subreddit, r.topic), []).append(r)
    assert set(by_chain) == {
        ("golang", "spark"),
        ("golang", "duckdb"),
        ("dataengineering", "spark"),
        ("dataengineering", "duckdb"),
    }
    chain = sorted(
        by_chain[("golang", "spark")], key=lambda r: (r.page_idx, r.post_id)
    )
    # cursor chain followed in order: pages 0,1,2 each with 5 posts
    assert [r.page_idx for r in chain] == [
        p for p in range(FIXTURE_PAGES) for _ in range(FIXTURE_POSTS_PER_PAGE)
    ]
    assert chain[0].post_id == "golang-spark-0-0"
    assert chain[0].title == "spark post 0 on r/golang (page 0)"
    assert chain[-1].created_utc == 1700000000.0 + 2 * 100 + 4


def test_reddit_poll_stream_source_micro_batch_per_round(spark):
    """The streaming poll source: each micro-batch is one poll round
    over the crawl plan, the offset is the poll number, and rows carry
    the round they were fetched in — two availableNow runs through one
    checkpoint advance the poll offset instead of re-reading round 0
    (the reference's ticker, with Spark's checkpoint as the clock)."""
    import shutil
    import tempfile

    from sentiflow_spark.sources.http_source import (
        FIXTURE_PAGES,
        FIXTURE_POSTS_PER_PAGE,
        RedditPollDataSource,
    )

    spark.dataSource.register(RedditPollDataSource)
    d = tempfile.mkdtemp(prefix="sf_poll_")
    out, ckpt = f"{d}/out", f"{d}/ckpt"
    try:
        def run_once():
            q = (
                spark.readStream.format("reddit_poll")
                .option("subreddits", "golang")
                .option("topics", "spark")
                .option("transport", "fixture")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        first = spark.read.parquet(out).collect()
        polls_after_first = {r.poll_idx for r in first}
        run_once()
        rows = spark.read.parquet(out).collect()
        per_round = FIXTURE_PAGES * FIXTURE_POSTS_PER_PAGE
        assert len(first) % per_round == 0 and len(first) > 0
        assert len(rows) > len(first)  # second run fetched NEW rounds
        polls = {r.poll_idx for r in rows}
        assert polls_after_first == set(range(len(polls_after_first)))
        assert polls == set(range(len(polls)))  # contiguous, no replays
        by_poll = {}
        for r in rows:
            by_poll.setdefault(r.poll_idx, []).append(r)
        assert all(len(v) == per_round for v in by_poll.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reddit_search_datasource_arrow_path_identical(spark):
    """arrow=true flips the reader to one RecordBatch per chain (Arrow
    transfer instead of per-row pickling); rows must be identical to
    the tuple path."""
    from sentiflow_spark.sources.http_source import RedditSearchDataSource

    spark.dataSource.register(RedditSearchDataSource)

    def rd(arrow):
        return sorted(
            spark.read.format("reddit_search")
            .option("subreddits", "golang,dataengineering")
            .option("topics", "spark,duckdb")
            .option("transport", "fixture")
            .option("arrow", arrow)
            .load()
            .collect()
        )

    assert rd("true") == rd("false")
