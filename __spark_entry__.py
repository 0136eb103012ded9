"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's declared-query registry
(``sentiflow_spark.queries.registry``): every implemented operator from
SURVEY.md §2 (plus the large-scale training-data extensions) registers a
Spark callable and, where SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sentiflow_spark.queries.registry import load_all

FLAGSHIP = "pl_e2e_results"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    4-stage sentiment dataflow (route → summarize → score → join-back →
    shape) expressed as one batch DataFrame plan."""
    registry = load_all()
    return registry[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 / §7)."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    operators (driver falls back to a rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}


def oracle_sql_big() -> dict[str, str]:
    """Cheaper oracle overrides for LARGE scale factors (local sweeps
    at sf0.1+). Where `oracle_sql()` registers a deliberately
    brute-force proof-carrying oracle (e.g. dd_edit_prefix_pairs'
    all-pairs levenshtein), this returns an equivalent mirrored-
    blocking form so big-sf sweeps stay fast; the driver (sf0.01)
    keeps the proof-carrying originals."""
    return {
        name: q.oracle_big
        for name, q in load_all().items()
        if q.oracle_big is not None
    }
