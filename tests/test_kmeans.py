"""Invariants for the iterative k-means and DTW operators. Both got
SQL oracles in round 6 (unrolled-Lloyd CTEs / recursive row-frontier
CTE), so these tests are no longer the only correctness surface —
they remain the ENGINE-FREE third reference (pure-Python DP, Lloyd
monotonicity) that would catch a bug shared by both engines'
implementations of the same algorithm."""

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
    distance — Lloyd's monotonicity, relaxed by the FLOOR-mean bound:
    each update step's centroid differs from the true mean by < 1 per
    coordinate, so Σ‖x−c‖² ≤ Σ‖x−μ‖² + n·D per step (n·D ≪ the
    quantized-unit² inertia magnitudes)."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    dim = len(emb.select("qvec").first()["qvec"])
    slack = n * dim
    inertia = []
    for iters in (0, 1, 3):
        out = kmeans_lite(emb, k=8, iters=iters)
        inertia.append(out.agg(F.sum("sq_dist")).collect()[0][0])
    assert inertia[1] <= inertia[0] + slack
    assert inertia[2] <= inertia[1] + 2 * slack


def test_dtw_matches_reference_dp(spark, sf_dir):
    """sim_dtw_topk has no SQL oracle (per-pair dynamic programming);
    verify the distances against an independent pure-Python DP over
    the same series, and the ranking invariants."""
    from sentiflow_spark.queries.corpus_queries import (
        DTW_BAND,
        DTW_K,
        DTW_PROBES,
    )
    from sentiflow_spark.queries.registry import load_all
    from sentiflow_spark.tables import load as load_table

    import pyspark.sql.functions as F

    # independent series build: per-user daily counts in plain Python
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    ).collect()
    per_user: dict[int, dict[int, int]] = {}
    for r in ev:
        per_user.setdefault(r.user_id, {})[r.day] = (
            per_user.get(r.user_id, {}).get(r.day, 0) + 1
        )
    d0 = min(d for m in per_user.values() for d in m)
    d1 = max(d for m in per_user.values() for d in m)
    series = {
        u: [m.get(d, 0) for d in range(d0, d1 + 1)] for u, m in per_user.items()
    }

    def dtw(a, b, band=DTW_BAND):
        n, m = len(a), len(b)
        r = max(band, abs(n - m))
        INF = float("inf")
        prev = [0.0] + [INF] * m
        for i in range(1, n + 1):
            cur = [INF] * (m + 1)
            for j in range(max(1, i - r), min(m, i + r) + 1):
                cost = abs(a[i - 1] - b[j - 1])
                cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return prev[m]

    got = load_all()["sim_dtw_topk"].fn(spark, sf_dir).collect()
    assert got, "no DTW results"
    by_probe: dict[int, list] = {}
    for r in got:
        assert r.dtw == dtw(series[r.probe_id], series[r.cand_id]), (
            r.probe_id,
            r.cand_id,
        )
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(DTW_PROBES))
    for rows in by_probe.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, DTW_K + 1))
        # exhaustive check: these really are the k smallest distances
        pid = rows[0].probe_id
        all_d = sorted(
            (dtw(series[pid], series[c]), c)
            for c in series
            if c != pid
        )
        assert rows[-1].dtw <= all_d[DTW_K - 1][0] or rows[-1].dtw == all_d[
            DTW_K - 1
        ][0]
        assert [r.dtw for r in rows] == [d for d, _ in all_d[:DTW_K]]


def test_dtw_pruned_guards_small_prefilter_and_unequal_lengths(spark):
    """Round-3 exactness guards on dtw_topk_pruned: (a) prefilter_m < k
    is clamped up — previously wave 1 held fewer than k distances and
    the kth-distance fallback could prune true top-k members; (b)
    length-mismatched pairs take lb=0 (the envelope bound is only
    admissible at equal lengths) so they always reach the exact DP.
    Verified against a pure-Python DP over mixed-length series."""
    from sentiflow_spark.operators.similarity import dtw_topk_pruned

    BAND = 3
    series = {
        0: [1, 5, 2, 8, 3, 9, 4, 7, 2, 6],
        1: [1, 5, 2, 8, 3, 9, 4, 7, 2, 5],
        2: [9, 1, 8, 2, 7, 3, 6, 4, 5, 5],
        3: [2, 2, 2, 2, 2],              # shorter than the probe
        4: [1, 5, 2, 8, 3, 9, 4, 7, 2, 6, 1, 5, 2, 8, 3],  # longer
        5: [0, 0, 9, 9, 0, 0, 9, 9, 0, 0],
    }

    def dp(a, b, band=BAND):
        n, m = len(a), len(b)
        r = max(band, abs(n - m))
        INF = float("inf")
        prev = [0.0] + [INF] * m
        for i in range(1, n + 1):
            cur = [INF] * (m + 1)
            for j in range(max(1, i - r), min(m, i + r) + 1):
                cost = abs(a[i - 1] - b[j - 1])
                cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return prev[m]

    sdf = spark.createDataFrame(
        [(i, s) for i, s in series.items()], "cand_id long, series array<long>"
    )
    pdf = spark.createDataFrame(
        [(0, series[0])], "probe_id long, p_series array<long>"
    )
    K = 4
    got = dtw_topk_pruned(sdf, pdf, k=K, band=BAND, prefilter_m=1)
    rows = sorted(got.collect(), key=lambda r: r.rank)
    want = sorted((dp(series[0], s), c) for c, s in series.items() if c != 0)
    assert [(r.dtw, r.cand_id) for r in rows] == [
        (int(d), c) for d, c in want[:K]
    ]
