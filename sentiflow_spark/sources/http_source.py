"""S4 as a first-class Spark data source (PySpark 4 DataSource API).

The reference's producer fetches Reddit search results in an
``after``-cursor pagination loop per (subreddit, topic) pair, entirely
on one process (``internal/producer/fetch.go:95-117``,
``internal/clients/reddit_client.go:67-85``). Round 1/2 ported that as
driver-side helpers (``pipeline/model_udfs.py::build_reddit_search_url``
/ ``fetch_paginated``); this module upgrades it to the idiomatic Spark
shape: a custom ``DataSource`` where EACH (subreddit, topic) fetch
chain is an ``InputPartition`` — chains are inherently serial (each
page yields the next cursor), but a real ingest crawls many
subreddit×topic pairs, and those fan out across executors. On a
1000-executor cluster the ingest tier is then as wide as the crawl
plan, with no driver bottleneck and no collected intermediate list.

Transports are ports, as everywhere in this engine: the deterministic
``fixture`` transport answers URL requests from the URL's own query
parameters (so ``build_reddit_search_url`` and the cursor chain are
exercised for real), and a production deployment registers an HTTP
transport instead. No network is touched in tests.

Usage::

    spark.dataSource.register(RedditSearchDataSource)
    df = (spark.read.format("reddit_search")
          .option("subreddits", "golang,python")
          .option("topics", "spark,duckdb")
          .option("transport", "fixture")
          .load())
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "subreddit string, topic string, post_id string, title string, "
    "selftext string, author string, created_utc double, page_idx int"
)

FIXTURE_PAGES = 3
FIXTURE_POSTS_PER_PAGE = 5


def fixture_transport(url: str) -> str:
    """Deterministic stand-in for the Reddit API: parses the REAL
    request URL (path subreddit + q/after params from
    build_reddit_search_url) and answers a JSON page derived only from
    them — 3 pages of 5 posts per (subreddit, topic) chain, cursor
    chain ``'' -> p1 -> p2 -> ''``. Tests assert against this exact
    contract."""
    import urllib.parse

    parsed = urllib.parse.urlparse(url)
    sub = parsed.path.split("/r/")[1].split("/")[0]
    q = dict(urllib.parse.parse_qsl(parsed.query))
    topic, after = q["q"], q.get("after", "")
    page = 0 if not after else int(after[1:])
    posts = [
        {
            "id": f"{sub}-{topic}-{page}-{i}",
            "title": f"{topic} post {i} on r/{sub} (page {page})",
            "selftext": f"body {sub}/{topic}/{page}/{i}",
            "author": f"u{i}",
            "created_utc": 1700000000.0 + page * 100 + i,
        }
        for i in range(FIXTURE_POSTS_PER_PAGE)
    ]
    next_after = f"p{page + 1}" if page + 1 < FIXTURE_PAGES else ""
    return json.dumps({"data": {"after": next_after, "children": posts}})


def http_transport(url: str) -> str:  # pragma: no cover - needs network
    """Production transport: plain GET. Kept trivially small so the
    fixture covers all logic; retry/backoff wraps at the call site via
    pipeline.model_udfs.call_with_retries conventions."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.read().decode("utf-8")


TRANSPORTS = {"fixture": fixture_transport, "http": http_transport}


@dataclass
class ChainPartition(InputPartition):
    """One serial pagination chain = one Spark input partition."""

    subreddit: str
    topic: str


class RedditSearchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.subreddits = [
            s for s in (options.get("subreddits") or "").split(",") if s
        ]
        self.topics = [t for t in (options.get("topics") or "").split(",") if t]
        self.base = options.get("base", "https://oauth.reddit.com")
        self.transport_name = options.get("transport", "fixture")
        self.max_pages = int(options.get("max_pages", "1000"))
        self.arrow = options.get("arrow", "false").lower() == "true"
        if not self.subreddits or not self.topics:
            raise ValueError(
                "reddit_search requires non-empty 'subreddits' and 'topics'"
            )
        if self.transport_name not in TRANSPORTS:
            raise ValueError(f"unknown transport {self.transport_name!r}")

    def partitions(self) -> list[InputPartition]:
        return [
            ChainPartition(s, t) for s in self.subreddits for t in self.topics
        ]

    def read(self, partition: ChainPartition) -> Iterator:
        # executor-side: build the transport here, never pickle it
        from sentiflow_spark.pipeline.model_udfs import (
            build_reddit_search_url,
            fetch_paginated,
        )

        transport = TRANSPORTS[self.transport_name]
        sub, topic = partition.subreddit, partition.topic
        state = {"page": 0}

        def fetch_page(after: str):
            url = build_reddit_search_url(self.base, sub, topic, after)
            payload = json.loads(transport(url))["data"]
            page_idx = state["page"]
            state["page"] += 1
            rows = [
                (
                    sub,
                    topic,
                    p["id"],
                    p["title"],
                    p.get("selftext", ""),
                    p.get("author", ""),
                    float(p.get("created_utc", 0.0)),
                    page_idx,
                )
                for p in payload["children"]
            ]
            return rows, payload.get("after") or ""

        rows = fetch_paginated(fetch_page, max_pages=self.max_pages)
        if self.arrow:
            # Arrow fast path: one RecordBatch per chain instead of
            # per-row pickling through the Python<->JVM bridge — the
            # DataSource API accepts either; identical rows by test.
            import pyarrow as pa

            names = [f.split()[0] for f in SCHEMA.split(", ")]
            types = [pa.string()] * 6 + [pa.float64(), pa.int32()]
            cols = list(zip(*rows)) if rows else [[] for _ in names]
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=t) for c, t in zip(cols, types)],
                names=names,
            )
        else:
            yield from rows


class RedditSearchDataSource(DataSource):
    """spark.read.format("reddit_search") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "reddit_search"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return RedditSearchReader(self.options)


class RedditPollStreamReader(SimpleDataSourceStreamReader):
    """S8's scheduled poll loop as a Structured Streaming source: the
    reference's producer re-crawls every subreddit×topic pair on a
    ticker (``cmd/producer/main.go``); here each micro-batch is one
    poll round, the offset is the monotonically increasing poll
    number (checkpointed by Spark — a crash resumes at the next round
    exactly like the reference's ticker), and ``readBetweenOffsets``
    replays any round deterministically because the fixture transport
    is a pure function of the request URL. The simple-reader API runs
    the poll on the driver like the reference's single producer; the
    wide path for a big crawl plan is the batch RedditSearchDataSource
    per round."""

    def __init__(self, options: dict):
        self.inner = RedditSearchReader(options)
        self.inner.arrow = False  # poll rounds append poll_idx per row

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _poll_rows(self, poll: int) -> list[tuple]:
        rows: list[tuple] = []
        for part in self.inner.partitions():
            rows.extend(
                r + (poll,) for r in self.inner.read(part)
            )
        return rows

    def read(self, start: dict):
        poll = start["poll"]
        return iter(self._poll_rows(poll)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for poll in range(start["poll"], end["poll"]):
            yield from self._poll_rows(poll)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing external


class RedditPollDataSource(DataSource):
    """spark.readStream.format("reddit_poll") — one micro-batch per
    poll round over the configured subreddit×topic crawl plan."""

    @classmethod
    def name(cls) -> str:
        return "reddit_poll"

    def schema(self) -> str:
        return SCHEMA + ", poll_idx int"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return RedditPollStreamReader(self.options)
