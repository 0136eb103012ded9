"""df.observe pipeline metrics: collected as a by-product of the one
real action — no second scan — and numerically exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiflow_spark.pipeline.metrics import observed, quality_funnel
from sentiflow_spark.tables import load


def test_observed_matches_direct_aggregates(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    obs_df, obs = observed(
        docs,
        n=F.count(F.lit(1)),
        chars=F.sum(F.length("text")),
    )
    # one action drives both the result and the metrics
    survivors = obs_df.filter(F.col("n_chars") > 100).count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("chars")
    ).collect()[0]
    assert got["n"] == direct["n"]
    assert got["chars"] == direct["chars"]
    assert survivors <= got["n"]


def test_quality_funnel_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    obs_df, obs = quality_funnel(docs)
    obs_df.collect()
    got = obs.get
    assert got["n_rows"] == docs.count()
    assert got["n_empty"] == docs.filter(F.col("text") == "").count()
    assert got["total_chars"] == docs.agg(F.sum(F.length("text"))).collect()[0][0]


def test_observe_adds_no_extra_scan(spark, sf_dir):
    """The observed plan still contains exactly one file scan — the
    metrics ride the existing action (CollectMetrics node), they don't
    re-execute the source."""
    docs = load(spark, sf_dir, "documents")
    obs_df, _ = quality_funnel(docs)
    plan = obs_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "CollectMetrics" in plan
