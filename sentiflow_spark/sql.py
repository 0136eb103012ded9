"""Ad-hoc SQL surface: register the synthetic tables as temp views so
portable ANSI SQL runs directly on the engine (``spark.sql``), with
Catalyst planning it — predicate pushdown, column pruning and join
selection apply exactly as for the DataFrame API.

This is the "switch and keep your queries" path: point ``open_views``
at a scale-factor directory and query the same table names (``region
nation customer supplier part orders lineitem events documents
embeddings``). Note the registry's oracle strings are DuckDB dialect
(list_transform, generate_subscripts, quantile_cont, ...) and are NOT
guaranteed to parse here — they exist for the correctness gate; the
portable subset (joins, aggregates, windows, standard functions) runs
on both engines unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sentiflow_spark.tables import TABLE_NAMES, load


def open_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every synthetic table as a temp view named after the
    table. Returns the view names. Views are lazy — nothing is read
    until a query touches them, and per-query pruning/pushdown still
    reaches the parquet scan."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLE_NAMES)


def run_sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """One-shot: register views and run a statement."""
    open_views(spark, sf_dir)
    return spark.sql(statement)
