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


def test_zorder_bounds_both_keys_per_file(spark, sf_dir):
    """Z-order layout: each output file covers a bounded range of BOTH
    interleaved keys, where a plain single-key sort leaves the second
    key spanning ~the whole domain in every file — the property that
    makes min/max skipping work for predicates on either column."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sentiflow_spark.sources.layout import write_zordered
    from sentiflow_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    zdir = tempfile.mkdtemp(prefix="sf_z_")
    sdir = tempfile.mkdtemp(prefix="sf_s_")
    try:
        write_zordered(li, zdir, ["l_partkey", "l_suppkey"], n_files=16, bits=11)
        (
            li.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(sdir)
        )

        def domain(col):
            lo, hi = li.agg(F.min(col), F.max(col)).collect()[0]
            return float(hi - lo)

        def avg_span(path, col):
            spans = (
                spark.read.parquet(path)
                .withColumn("f", F.input_file_name())
                .groupBy("f")
                .agg((F.max(col) - F.min(col)).alias("span"))
                .agg(F.avg("span"))
                .collect()[0][0]
            )
            return spans / domain(col)

        z_p = avg_span(zdir, "l_partkey")
        z_s = avg_span(zdir, "l_suppkey")
        s_p = avg_span(sdir, "l_partkey")
        s_s = avg_span(sdir, "l_suppkey")

        assert len(glob.glob(f"{zdir}/part-*")) == 16
        # single-key sort: partkey tight, suppkey unbounded
        assert s_p <= 0.15 and s_s >= 0.9
        # z-order: BOTH bounded well below the single-sort's loose key
        assert z_p <= 0.6 and z_s <= 0.6
        assert z_s < s_s / 1.5
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)


def test_versioned_snapshots_time_travel_and_crash_invisibility(spark, tmp_path):
    """write_snapshot commits via the _latest pointer: readers see the
    committed latest, any prior version stays readable (time travel),
    and a crashed write (data landed, pointer not advanced) is
    invisible."""
    import os

    from pyspark.sql import functions as F

    from sentiflow_spark.sources.layout import (
        latest_version,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "snap")
    os.makedirs(base)
    v0 = write_snapshot(spark.range(3).withColumn("tag", F.lit("a")), base)
    v1 = write_snapshot(spark.range(5).withColumn("tag", F.lit("b")), base)
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, base).count() == 5
    assert read_snapshot(spark, base, version=0).count() == 3
    # simulate a crashed writer: files for v=2 exist, pointer still at 1
    spark.range(9).withColumn("tag", F.lit("c")).write.parquet(f"{base}/v=2")
    assert latest_version(base) == 1
    assert read_snapshot(spark, base).count() == 5
    # the next committed write allocates past the orphan (v=3),
    # never colliding with it or resurrecting it
    v3 = write_snapshot(spark.range(1).withColumn("tag", F.lit("d")), base)
    assert v3 == 3
    assert read_snapshot(spark, base).count() == 1


def test_snapshot_diff_extracts_cdc(spark):
    """snapshot_diff between two committed versions yields exactly the
    added/removed/changed key sets, and diffing a version against
    itself is empty."""
    import shutil
    import tempfile

    from sentiflow_spark.sources.layout import snapshot_diff, write_snapshot

    d = tempfile.mkdtemp(prefix="sf_snapdiff_")
    try:
        v0_df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, name string, score long",
        )
        v0 = write_snapshot(v0_df, d)
        v1_df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 99), (4, "d", 40)],  # 2 changed, 3 gone, 4 new
            "id long, name string, score long",
        )
        v1 = write_snapshot(v1_df, d)

        diff = {
            r.id: r.change
            for r in snapshot_diff(spark, d, v0, v1, ["id"]).collect()
        }
        assert diff == {2: "changed", 3: "removed", 4: "added"}
        assert snapshot_diff(spark, d, v1, v1, ["id"]).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_diff_separator_values_not_confused(spark):
    """Round-3 fix: the diff hash length-prefixes each rendered value,
    so a value containing the old separator byte cannot shift content
    across column boundaries ((a='x\\x1fy', b='z') vs (a='x', b='y\\x1fz')
    must read as CHANGED), and a literal NUL string is distinct from
    NULL."""
    import tempfile

    from sentiflow_spark.sources.layout import snapshot_diff, write_snapshot

    d = tempfile.mkdtemp(prefix="sf_snaphash_")
    try:
        v0 = write_snapshot(
            spark.createDataFrame(
                [(1, "x\x1fy", "z"), (2, "\x00", "ok")],
                "id long, a string, b string",
            ),
            d,
        )
        v1 = write_snapshot(
            spark.createDataFrame(
                [(1, "x", "y\x1fz"), (2, None, "ok")],
                "id long, a string, b string",
            ),
            d,
        )
        diff = {
            r.id: r.change for r in snapshot_diff(spark, d, v0, v1, ["id"]).collect()
        }
        assert diff == {1: "changed", 2: "changed"}
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
