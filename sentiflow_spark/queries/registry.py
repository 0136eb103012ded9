"""Declared-query registry — the correctness surface of the engine.

Every operator the engine claims (SURVEY.md §2 inventory plus the
large-scale training-data extensions) registers here with:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation,
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run on the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops, which
  get a weaker rows-only check),
- ``tags`` — operator families for selection in tests/bench.

The driver executes both sides at sf=0.01 and compares row count,
schema, and an order-insensitive value hash; ``sentiflow_spark.oracle``
implements the same comparison for local tests.

Cross-engine determinism rules every registered query follows:

1. Aggregates over doubles go through DECIMAL (exact, order-independent)
   and the final value is cast back to DOUBLE — bitwise identical in
   both engines. This applies to the OUTPUT representation too: a raw
   DECIMAL output column reaches the driver as Python ``Decimal``
   objects on the Spark side vs float64 on the DuckDB side (exact
   sums that must stay exact ship as strings instead).
2. Timestamps in output are formatted to strings (or cast to DATE).
3. Any "pick one row per key" uses an explicit row_number tiebreak,
   never dropDuplicates (whose pick is partition-order dependent).
4. Column names are aliased identically on both sides.
5. Collection-typed (array/map) output columns are serialized to
   strings on both sides (``array_join``/``to_json`` vs
   ``array_to_string``/``to_json``) — list cells crash the driver's
   pandas ``sort_values`` canonicalization.
6. Integer-valued oracle aggregates are cast to BIGINT: DuckDB
   ``SUM(int)`` returns HUGEINT, which pandas coerces to float64 and
   the driver then hashes ``0.0`` against Spark's ``0``.

Rules 5-6 (and the pandas path generally) are enforced locally by
tools/pandas_canon.py / tools/oracle_sweep.py, which canonicalize
exactly like the driver; round 3 shipped 5 value-identical red rows
because the old tuple-based sweep could not see this class.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""
    # Optional cheaper oracle for LARGE scale factors in local sweeps
    # (e.g. a mirrored-blocking variant where `oracle` is deliberately
    # brute-force). The driver always gets `oracle` (it runs sf0.01,
    # where the expensive proof-carrying form is affordable).
    oracle_big: str | None = None


REGISTRY: dict[str, Query] = {}

# Modules that define queries; imported lazily by load_all() so that
# importing the registry itself stays cheap.
_QUERY_MODULES = (
    "sentiflow_spark.queries.repair_queries",
    "sentiflow_spark.queries.dedup_queries",
    "sentiflow_spark.queries.curation_queries",
    "sentiflow_spark.queries.curation_dag",
    "sentiflow_spark.queries.curation_delta",
    "sentiflow_spark.queries.similarity_queries",
    "sentiflow_spark.queries.retrieval_queries",
    "sentiflow_spark.queries.multimodal_queries",
    "sentiflow_spark.queries.window_queries",
    "sentiflow_spark.queries.pandas_udf_queries",
    "sentiflow_spark.queries.expression_extra",
    "sentiflow_spark.queries.text_queries",
    "sentiflow_spark.queries.streaming_queries",
    "sentiflow_spark.queries.pipeline_queries",
    "sentiflow_spark.queries.relational",
    "sentiflow_spark.queries.tpch_extra",
    "sentiflow_spark.queries.corpus_queries",
)

# The driver's CORRECTNESS window covers the first ~50 entries of the
# queries() dict, so load_all() orders DRIVER-UNVERIFIED queries first —
# the window self-rotates onto fresh families every round as the driver
# commits CORRECTNESS_r{N}.json back into the repo.  Within the
# unverified set, families are fronted in this fixed order (round 3:
# corpus_queries' 48 + the 2-query pandas tail fill the window exactly;
# round 4 inherits streaming + text + expression_extra + the rel/tpch
# tail).  The full family→round ledger lives in COVERAGE.md.
_ROTATION = (
    "corpus_queries",
    "pandas_udf_queries",
    "streaming_queries",
    "text_queries",
    "expression_extra",
    "relational",
    "tpch_extra",
    "pipeline_queries",
)


def _driver_verified() -> tuple[frozenset[str], frozenset[str]]:
    """Query names with a green row in any committed driver
    CORRECTNESS_r*.json, split by the strength of the check:
    ``(hash_verified, rows_only_seen)``.  Rows-only queries (declared
    no-oracle ops — the driver only confirms they run and produce
    rows) never reach the hash-verified set: they stay in the driver
    rotation at reduced priority so every round re-exercises them,
    rather than permanently leaving the window on a weak signal."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: set[str] = set()
    rows_only: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # declared rows-only contract: the driver saw it run
                # and produce rows — a weaker state than hash-verified
                if (row.get("spark_rows") or 0) > 0:
                    rows_only.add(name)
            elif (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("hash_match")
            ):
                # hash-fail rows stay UNverified so they re-enter the
                # driver window after their oracle/representation fix
                # (round 3 shipped 4 value-identical hash-fails caused
                # by pandas canonicalization; see tools/pandas_canon.py)
                seen.add(name)
    return frozenset(seen), frozenset(rows_only - seen)


# ---------------------------------------------------------------------------
# Prepared-plan memo (r12 optimization round).
#
# Profiling the bench showed that for the expression-heavy declared
# queries, 0.2-1.3 s per invocation goes into CONSTRUCTING the
# DataFrame — thousands of py4j round-trips building the Column tree —
# before Spark runs a single task (mm_curation_gate: 1.28 s build,
# 0 jobs). A production engine prepares a statement once and executes
# it many times; this memo is exactly that, and nothing more: it
# caches the ANALYZED LOGICAL PLAN (a data-free expression tree) per
# (applicationId, sf_dir, query) and wraps it in a FRESH Dataset via
# Dataset.ofRows on every call, so each call gets a fresh
# QueryExecution — fresh optimization, fresh stages, fresh RDDs, a
# full recompute from the parquet inputs. No result, partition, or
# shuffle output is ever reused (reusing the SAME DataFrame object
# would let AQE reuse materialized stages — that is precisely what the
# fresh ofRows wrap prevents).
#
# Guard rails — a query is memoized ONLY when its construction is
# provably pure plan-building:
#   * tag-exempt: streaming / iterative / sink queries execute or
#     mutate state while building;
#   * runtime-exempt: the first build must launch ZERO Spark jobs
#     (catches metadata counts, index materialization, eager
#     localCheckpoints) and the analyzed plan must contain no
#     LogicalRDD / InMemoryRelation node (pinned data would otherwise
#     be carried across calls — the result-caching line this repo
#     does not cross).
# The analyzed (not optimized) plan is cached, so time-dependent
# expressions (now(), current_date) are still stamped per execution by
# the optimizer's ComputeCurrentTime rule, and temp-view references
# are resolved at build time against the sf_dir in the cache key.
#
# STALENESS CONTRACT (r13, closing the r12 verdict's caveat): the
# cached analyzed plan embeds the parquet FILE-INDEX SNAPSHOT taken
# when the plan was first built — files appended to a table directory
# afterwards are INVISIBLE to later calls of the same
# (applicationId, sf_dir, query) key, exactly like a prepared
# statement over a static file listing. This is correct for the
# engine's contract (the sf_dir corpora are immutable inputs; stores
# that DO grow — the curation LSM state, IVF upserts — are built by
# iterative/sink-tagged queries the memo already exempts). Pointing a
# memoized query at a GROWING directory table requires invalidating
# the key first: new SparkSession (applicationId changes) or
# registry._PLAN_MEMO.pop(key). Pinned by
# test_memo_snapshot_static_inputs_contract.
# ---------------------------------------------------------------------------

_PLAN_EXEMPT_TAGS = frozenset({"streaming", "iterative", "sink"})
_PLAN_MEMO: dict[tuple[str, str, str], object] = {}
_PLAN_SKIP: set[tuple[str, str, str]] = set()


def _prepared(name: str, tags: tuple[str, ...], fn: SparkQuery) -> SparkQuery:
    if _PLAN_EXEMPT_TAGS & set(tags):
        return fn

    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            sc = spark.sparkContext
            key = (sc.applicationId, sf_dir.rstrip("/"), name)
            jplan = _PLAN_MEMO.get(key)
            if jplan is not None:
                from pyspark.sql.classic.dataframe import DataFrame as _CDF

                jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, jplan
                )
                return _CDF(jdf, spark)
            probe = sc._jsc.sc().dagScheduler().nextJobId
            j0 = probe()
        except Exception:  # non-classic session / private-API drift:
            return fn(spark, sf_dir)  # plain construction, no memo
        from sentiflow_spark import tables as _tables

        m0 = _tables._MISS_COUNT
        df = fn(spark, sf_dir)
        try:
            if key in _PLAN_SKIP:
                return df
            jobs = probe() - j0
            if jobs:
                # Jobs during a build are either tables.load()'s
                # one-time parquet schema inference (first load of a
                # table this session — the table-memo miss counter
                # moved) or genuinely eager query work (counts,
                # index materialization). Only the former is worth a
                # probe rebuild: the table memo is now warm, so the
                # rebuild is job-free and memoizable. Rebuilding an
                # eager query just to discover it launches jobs again
                # would DOUBLE its one-shot cost — skip it outright.
                if jobs > 4 or _tables._MISS_COUNT == m0:
                    _PLAN_SKIP.add(key)
                    return df
                j1 = probe()
                df = fn(spark, sf_dir)
                if probe() != j1:
                    _PLAN_SKIP.add(key)
                    return df
            jplan = df._jdf.queryExecution().analyzed()
            s = jplan.toString()
            if "LogicalRDD" in s or "InMemoryRelation" in s:
                _PLAN_SKIP.add(key)
                return df
            _PLAN_MEMO[key] = jplan
        except Exception:
            _PLAN_SKIP.add(key)
        return df

    return wrapped


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    oracle_big: str | None = None,
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        wrapped = _prepared(name, tags, fn)
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle,
                               tags=tags,
                               doc=doc or (fn.__doc__ or ""),
                               oracle_big=oracle_big)
        return wrapped

    return deco


def _reverify_front() -> dict[str, int]:
    """name -> rank from ROTATION_PLAN.json (tools/rotation_plan.py):
    already-verified queries whose transitive implementing sources
    changed since their last driver row, most-recently-touched first.
    With the registry fully driver-verified (round 5), these fill the
    otherwise-idle CORRECTNESS window as a regression rotation."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    try:
        with open(os.path.join(root, "ROTATION_PLAN.json")) as fh:
            plan = json.load(fh)
        return {name: i for i, name in enumerate(plan.get("front", []))}
    except (OSError, ValueError):
        return {}


def load_all() -> dict[str, Query]:
    """Import every query module and return the full registry, ordered
    for the driver's ~50-entry CORRECTNESS window: never-checked first
    (see _ROTATION), then rows-only (weak check, re-exercised every
    round), then the ROTATION_PLAN.json regression-rotation picks
    (verified queries whose sources changed since their driver row),
    then the remaining verified set."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Allow partial builds while modules are still being added.
            if exc.name != mod:
                raise
    verified, rows_only = _driver_verified()
    refront = _reverify_front()
    insertion = {name: i for i, name in enumerate(REGISTRY)}

    def key(name: str) -> tuple[int, int, int, int]:
        q = REGISTRY[name]
        family = q.fn.__module__.rsplit(".", 1)[-1]
        fam_rank = (
            _ROTATION.index(family) if family in _ROTATION else len(_ROTATION)
        )
        # 0 = never driver-checked, 1 = rows-only (weak check: keep in
        # the window every round), 2 = verified but fronted for
        # re-verification by the committed rotation plan, 3 = verified
        if name not in verified:
            state = 1 if name in rows_only else 0
        elif name in refront:
            state = 2
            return (state, refront[name], 0, insertion[name])
        else:
            state = 3
        return (state, fam_rank, 0, insertion[name])

    return {name: REGISTRY[name] for name in sorted(REGISTRY, key=key)}
