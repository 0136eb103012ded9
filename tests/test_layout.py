"""Storage-layout guardrails: bucketed joins must be shuffle-free and
partition-column filters must prune at the source — the two physical
properties that dominate cost at 100 TB."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sentiflow_spark.plans import introspect as I
from sentiflow_spark.sources.layout import (
    colocated_join,
    write_bucketed,
    write_partitioned,
)
from sentiflow_spark.tables import load


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    """Bucketed copies of orders + customer in a throwaway database."""
    loc = tempfile.mkdtemp(prefix="sf_warehouse_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    write_bucketed(
        load(spark, sf_dir, "orders"), "bucketdb.orders_b", "o_custkey", 8
    )
    write_bucketed(
        load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "bucketdb.customer_b",
        "o_custkey",
        8,
    )
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "bucketdb.orders_b", "bucketdb.customer_b", "o_custkey"
        )
        assert I.count_exchanges(joined) == 0, I.simple_plan(joined)
        # and it still computes the right thing
        expected = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer").withColumnRenamed(
                    "c_custkey", "o_custkey"
                ),
                "o_custkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_shuffle(spark, warehouse):
    agg = (
        spark.table("bucketdb.orders_b")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert I.count_exchanges(agg) == 0, I.simple_plan(agg)


def test_partition_filter_prunes_scan(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="sf_part_")
    try:
        write_partitioned(
            load(spark, sf_dir, "events"), path, ["event_type"]
        )
        df = spark.read.parquet(path).filter(F.col("event_type") == "click")
        plan = I.formatted_plan(df)
        part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert part_lines and any("event_type" in l for l in part_lines), plan
        expected = (
            load(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
        )
        assert df.count() == expected
    finally:
        shutil.rmtree(path, ignore_errors=True)
