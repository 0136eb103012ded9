"""Negative controls for the correctness gate itself: compare() must
FAIL on wrong results, or every green query in test_parity is
meaningless. Each control perturbs one dimension the gate claims to
check (values, row count, column names, row multiplicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiflow_spark.oracle import compare
from sentiflow_spark.tables import load

ORACLE = "SELECT r_regionkey, r_name FROM region"


def test_gate_passes_on_equal(spark, sf_dir):
    df = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    assert compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_wrong_value(spark, sf_dir):
    df = load(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + 1).alias("r_regionkey"), "r_name"
    )
    assert not compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_missing_row(spark, sf_dir):
    df = (
        load(spark, sf_dir, "region")
        .filter("r_regionkey < 4")
        .select("r_regionkey", "r_name")
    )
    assert not compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_renamed_column(spark, sf_dir):
    df = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("regionkey"), "r_name"
    )
    assert not compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_duplicated_row(spark, sf_dir):
    """Order-insensitive must still be multiplicity-sensitive: a
    UNION ALL self-duplicate is NOT equal to the base table."""
    base = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df = base.union(base.limit(1))
    assert not compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_null_vs_value(spark, sf_dir):
    df = load(spark, sf_dir, "region").select(
        "r_regionkey",
        F.when(F.col("r_regionkey") == 0, None)
        .otherwise(F.col("r_name"))
        .alias("r_name"),
    )
    assert not compare("ctl", df, ORACLE, sf_dir).ok


def test_gate_catches_float_drift(spark, sf_dir):
    """A last-ulp float difference must fail — the determinism rules
    (decimal-exact aggregates) exist precisely so exact comparison is
    achievable; tolerance would mask real ordering bugs."""
    oracle = "SELECT r_regionkey, CAST(r_regionkey AS DOUBLE) / 7.0 AS x FROM region"
    good = load(spark, sf_dir, "region").select(
        "r_regionkey", (F.col("r_regionkey").cast("double") / 7.0).alias("x")
    )
    assert compare("ctl", good, oracle, sf_dir).ok
    import math

    drift = F.udf(lambda v: math.nextafter(v, math.inf), "double")
    # row-at-a-time UDF is fine here: 5 rows, test-only, not a plan
    bad = good.select("r_regionkey", drift("x").alias("x"))
    assert not compare("ctl", bad, oracle, sf_dir).ok
