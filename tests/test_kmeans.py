"""Invariants for the iterative k-means operator (registered without a
SQL oracle — these tests are its correctness surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiflow_spark.operators.similarity import kmeans_lite, with_quantized
from sentiflow_spark.tables import load


def _emb(spark, sf_dir):
    return with_quantized(load(spark, sf_dir, "embeddings"))


def test_kmeans_total_assignment(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = kmeans_lite(emb, k=8, iters=2)
    assert out.count() == emb.count()
    clusters = [r["cluster"] for r in out.select("cluster").distinct().collect()]
    assert all(0 <= c < 8 for c in clusters)
    assert len(clusters) > 1  # it actually partitions the space


def test_kmeans_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = sorted((r["vec_id"], r["cluster"]) for r in kmeans_lite(emb, k=4, iters=2).collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in kmeans_lite(emb, k=4, iters=2).collect())
    assert a == b


def test_kmeans_inertia_improves(spark, sf_dir):
    """More iterations can only shrink (or hold) total squared
    distance — the Lloyd's-algorithm monotonicity invariant."""
    emb = _emb(spark, sf_dir)
    inertia = []
    for iters in (0, 1, 3):
        out = kmeans_lite(emb, k=8, iters=iters)
        inertia.append(out.agg(F.sum("sq_dist")).collect()[0][0])
    assert inertia[1] <= inertia[0] + 1e-6
    assert inertia[2] <= inertia[1] + 1e-6
