"""Real model-service adapters for the U1–U3 operators (SURVEY §2.9):
Arrow-batched ``mapInPandas`` UDFs that ship micro-batches of rows to an
external inference service and join the results back onto the stream.

The reference calls three services over HTTP — OpenAI topic extraction
(``internal/topic_generation/topic_generation.go:60-113``), a
HuggingFace summarizer and sentiment scorer
(``internal/clients/huggingface_client.go:80-113``) — with 5–10 retry
attempts, exponential backoff capped at 30–60 s with jitter
(``internal/consumers/summary_consumer.go:121-150``), and a 15 s
health probe gating consumption
(``internal/monitoring/ai_healthchecks.go:12-48``).

Spark-first shape:

- One ``mapInPandas`` per service. Arrow delivers column batches to
  Python; each batch becomes ONE service call (the reference's
  count-based buffer falls out of Arrow's batching —
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` is the batch-size
  knob, default 10k; set it to the service's max batch).
- The transport is INJECTED (``Transport = Callable[[list[dict]],
  list[dict]]``). Production passes :func:`http_transport`; tests pass
  a deterministic local function — no network, no mock patching, and
  the operator's Spark plumbing (schema, batching, join-back, missing
  -row quirk F5) is exercised for real either way.
- Retries live INSIDE the UDF (per-batch, not per-row), so a flaky
  service costs one task retry at most; Spark's own task retry is the
  outer loop, matching the reference's commit-after-durable semantics
  (checkpoint only advances when the batch succeeded).
- Health gating is a driver-side concern: :func:`probe_health` is
  called by the job loop / StreamingQueryListener, not inside tasks
  (reference F4/U4 — an operational gate, not a row operator).

Scale: each Arrow batch is independent → the call fan-out equals the
number of concurrent tasks; cap with ``maxOffsetsPerTrigger`` or the
stage's partition count, exactly how the reference capped at 2 workers
(``internal/clients/reddit_client.go:29``).
"""

from __future__ import annotations

import json
import random
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

Transport = Callable[[list[dict[str, Any]]], list[dict[str, Any]]]

# Reference retry envelope: summaries 10 attempts / cap 60 s
# (summary_consumer.go:125-147), generic clients 5 attempts / cap 32 s
# (internal/clients/constants.go:6-8).
MAX_ATTEMPTS = 5
BACKOFF_BASE_S = 1.0
BACKOFF_CAP_S = 32.0


def http_transport(url: str, timeout_s: float = 10.0) -> Transport:
    """POST-JSON transport: ``[{...}] -> [{...}]`` (the HF batch-endpoint
    contract, ``internal/models/huggingface_models.go:3-40``). Built on
    urllib so it carries no dependencies; swap for any callable with
    the same signature."""

    def call(batch: list[dict[str, Any]]) -> list[dict[str, Any]]:
        req = urllib.request.Request(
            url,
            data=json.dumps(batch).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return json.loads(resp.read())

    return call


def rate_limit_hint(headers) -> float | None:
    """Server pacing hints → seconds to wait before the next attempt.

    Mirrors the reference's ``parseRateLimitHeaders``
    (internal/clients/reddit_client.go:247-268): defaults remaining=60
    / reset=60 s, clamps remaining to ≥1, and paces at reset/remaining.
    A standard ``Retry-After: <seconds>`` wins outright when present.
    Returns None when the response carries no pacing information at
    all (caller falls back to exponential backoff)."""
    if headers is None:
        return None
    retry_after = headers.get("Retry-After")
    if retry_after is not None:
        try:
            return max(0.0, float(retry_after))
        except ValueError:
            pass  # HTTP-date form — fall through to X-Ratelimit-*
    remaining_raw = headers.get("X-Ratelimit-Remaining")
    reset_raw = headers.get("X-Ratelimit-Reset")
    if remaining_raw is None and reset_raw is None:
        return None
    remaining, reset = 60.0, 60.0
    try:
        if remaining_raw is not None:
            remaining = float(remaining_raw)
    except ValueError:
        pass
    try:
        if reset_raw is not None:
            reset = float(reset_raw)
    except ValueError:
        pass
    return max(0.0, reset) / max(1.0, remaining)


def _with_retries(call: Transport, batch: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Exponential backoff with jitter, mirroring the reference's
    envelope. Only TRANSIENT transport errors (connection/timeouts,
    5xx, 429) are retried; a malformed response (json.loads →
    ValueError) or a non-retryable 4xx is deterministic and re-raises
    immediately — retrying it would burn minutes of in-task backoff
    sleep on an error that cannot succeed. A 429/503 carrying
    Retry-After / X-Ratelimit-* headers overrides the computed backoff
    with the server's own pacing hint (capped at BACKOFF_CAP_S so a
    hostile header can't park an executor). The final raise hands off
    to Spark's task retry (the outer at-least-once loop)."""
    delay = BACKOFF_BASE_S
    for attempt in range(1, MAX_ATTEMPTS + 1):
        try:
            return call(batch)
        except urllib.error.HTTPError as exc:
            if exc.code not in (429, 503) and exc.code < 500:
                raise  # deterministic client error: retry can't succeed
            if attempt == MAX_ATTEMPTS:
                raise
            hint = rate_limit_hint(exc.headers) if exc.code in (429, 503) else None
            if hint is not None:
                time.sleep(min(hint, BACKOFF_CAP_S))
            else:
                time.sleep(min(delay, BACKOFF_CAP_S) * (0.5 + random.random() / 2))
            delay *= 2
        except (urllib.error.URLError, OSError):
            if attempt == MAX_ATTEMPTS:
                raise
            time.sleep(min(delay, BACKOFF_CAP_S) * (0.5 + random.random() / 2))
            delay *= 2
    raise AssertionError("unreachable")


def build_reddit_search_url(
    base: str, subreddit: str, topic: str, after: str = ""
) -> str:
    """S4 request construction — parameter-for-parameter port of
    ``buildRedditAPIUrl`` (internal/clients/reddit_client.go:67-85):
    relevance sort, 100-post pages, last-day recency, link type, and
    the ``after`` cursor only when continuing a page chain."""
    import urllib.parse

    params = [
        ("q", topic),
        ("sort", "relevance"),
        ("limit", "100"),
        ("t", "day"),
        ("type", "link"),
    ]
    if after:
        params.append(("after", after))
    return f"{base}/r/{subreddit}/search?" + urllib.parse.urlencode(params)


def fetch_paginated(fetch_page, max_pages: int = 1000) -> list:
    """S4 pagination loop — the ``after``-cursor chain of
    ``fetchAndProcessTopics`` (internal/producer/fetch.go:95-117):
    start with an empty cursor, accumulate each page, follow
    ``nextAfter`` until the API returns an empty cursor.

    ``fetch_page(after) -> (rows, next_after)`` is injected (the same
    port pattern as the model transports), so tests drive it without a
    network and production wires the OAuth'd HTTP client. Driver-side
    by design: ingest is a driver-orchestrated fetch whose result
    becomes the DataFrame the distributed pipeline starts from.
    ``max_pages`` is a safety rail the reference lacks (its loop is
    unbounded); a cursor cycle otherwise fetches forever."""
    rows: list = []
    after = ""
    for _ in range(max_pages):
        page, after = fetch_page(after)
        rows.extend(page)
        if not after:
            break
    return rows


def probe_health(url: str, timeout_s: float = 5.0) -> bool:
    """U4 health probe (GET /, 15 s cadence in the reference). Driver
    -side only: call from the job loop to pause/resume triggers."""
    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            return 200 <= resp.status < 300
    except (urllib.error.URLError, OSError):
        return False


SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
    ]
)

SENTIMENT_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("sentiment_score", T.DoubleType(), True),
        T.StructField("sentiment_label", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)


def _batched_service_udf(
    requests: DataFrame,
    transport: Transport,
    in_cols: list[str],
    out_schema: T.StructType,
) -> DataFrame:
    """Shared shape for U2/U3: prune to the request columns (the
    reference's P5 projection), one service call per Arrow batch,
    results re-emitted as rows keyed by content_id for the J1/J2
    join-back."""
    pruned = requests.select(*in_cols)
    out_fields = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payload = pdf.to_dict("records")
            results = _with_retries(transport, payload)
            out = pd.DataFrame(results)
            # a service may omit rows (F5 quirk) or columns; emit what
            # it returned, typed to the declared schema
            for col in out_fields:
                if col not in out.columns:
                    out[col] = None
            yield out[out_fields]

    return pruned.mapInPandas(run, out_schema)


def summarize_via_service(requests: DataFrame, transport: Transport) -> DataFrame:
    """U2: {content_id, text} → {content_id, summary}."""
    return _batched_service_udf(
        requests, transport, ["content_id", "text"], SUMMARY_SCHEMA
    )


def score_via_service(requests: DataFrame, transport: Transport) -> DataFrame:
    """U3: {content_id, text} → {content_id, score, label, confidence}."""
    return _batched_service_udf(
        requests, transport, ["content_id", "text"], SENTIMENT_SCHEMA
    )


def extract_topics_via_llm(
    headlines: DataFrame, transport: Transport, batch_size: int = 100
) -> DataFrame:
    """U1: headline rows → 0..1 topic rows each (UDTF shape — output
    cardinality differs from input). The transport receives ≤100
    headlines per call (the reference's LLM buffer,
    ``topic_generation.go:43``) and returns topic dicts; JSON repair
    (P7) is the transport's problem in production, pipeline.topics
    handles the parse-side repair for raw LLM text."""
    pruned = headlines.select("title", "url")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                results = _with_retries(transport, chunk.to_dict("records"))
                out = pd.DataFrame(results)
                for col in ("title", "topic", "category", "url"):
                    if col not in out.columns:
                        out[col] = None
                yield out[["title", "topic", "category", "url"]]

    return pruned.mapInPandas(run, TOPIC_SCHEMA)
