"""Similarity search over embedding columns (SURVEY §7.2 M5).

Two plan shapes:

- **Brute-force top-k** — broadcast the (small) probe set against the
  full corpus, score every pair, per-probe top-k via window row_number.
  The right baseline, and the *only* exact method; at 100 TB the scan
  is embarrassingly parallel and the top-k is a partial
  TakeOrdered per partition, so no global sort materializes.
- **IVF-style bucketed search** — restrict scoring to the probe's
  coarse partition (cluster/bucket id). Here the synthetic ``label``
  column plays the precomputed centroid assignment (a real deployment
  k-means-assigns offline and bucket-partitions the table on disk so
  bucket pruning happens at the parquet-partition level). Trades
  recall for a ~n_buckets× scan reduction.

Scoring uses quantized-int cosine (functions/vectors.py) — exact,
engine-reproducible, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sentiflow_spark.functions.vectors import cosine_q, dot_long, norm_sq, quantize


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    q = quantize(F.col(vec_col))
    return df.withColumn("qvec", q).withColumn("qnorm", norm_sq(F.col("qvec")))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per probe. probes/corpus must carry qvec+qnorm
    (see with_quantized); probe ids excluded from their own results."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm").alias("c_qnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "cand_id",
            cosine_q(
                dot_long(F.col("p_qvec"), F.col("c_qvec")),
                F.col("p_qnorm"),
                F.col("c_qnorm"),
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cosine", "rank")
    )


def bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style: score only candidates in the probe's bucket."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(bucket_col).alias("bucket"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(bucket_col).alias("bucket"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm").alias("c_qnorm"),
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "cand_id",
            cosine_q(
                dot_long(F.col("p_qvec"), F.col("c_qvec")),
                F.col("p_qnorm"),
                F.col("c_qnorm"),
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    bucket_col: str = "label",
) -> DataFrame:
    """Embedding near-duplicate pairs, blocked by the coarse bucket so
    the pair space is (n/b)² per bucket instead of n² global."""
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(bucket_col).alias("bucket"),
        F.col("qvec").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(bucket_col).alias("bucket"),
        F.col("qvec").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_q(
                dot_long(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def rph_neardup_pairs(
    corpus: DataFrame,
    planes: list[list[int]],
    threshold: float = 0.99,
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs: data-independent cosine
    blocking (vs the IVF/label blocking above, which needs a trained
    partitioner). With b planes the pair space shrinks ~2^b-fold while
    high-cosine pairs mostly share all sign bits. Candidate generation
    is an equi-join on the bucket id — the 100 TB path; recall is
    tunable via multiple independent bucket tables (OR-construction)."""
    from sentiflow_spark.functions.vectors import rp_bucket

    bucketed = corpus.withColumn("rp_bucket", rp_bucket(F.col("qvec"), planes))
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col("rp_bucket"),
        F.col("qvec").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col("rp_bucket"),
        F.col("qvec").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    return (
        a.join(b, "rp_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_q(
                dot_long(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_lite(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic distributed k-means over quantized embeddings —
    the trainer that produces real IVF centroid assignments (the
    ``label`` column stands in elsewhere). Iterative, so it is the one
    operator family that is genuinely not single-SQL-expressible
    (registered without an oracle; invariants are unit-tested instead).

    Shape per iteration (classic Spark k-means, driver-coordinated):
    - centroids live on the DRIVER (k × dim doubles — tiny) and enter
      the plan as a broadcast k-row DataFrame,
    - assignment = crossJoin(broadcast(centroids)) + per-point argmin
      via a min_by aggregate — a map-side-only pass over the corpus,
    - update = groupBy(cluster).avg — one small shuffle of k partials
      per partition (partial aggregation makes it k rows per task).

    Init is the k lowest-id vectors (deterministic, no RNG); distance
    is squared euclidean on the quantized ints, exact in double for
    this dimensionality."""
    dim_df = corpus.select(F.col(id_col).alias("vid"), F.col("qvec"))
    spark = corpus.sparkSession

    def assign(centroids_rows: list[tuple[int, list[float]]]) -> DataFrame:
        cent = spark.createDataFrame(
            [(c, [float(x) for x in vec]) for c, vec in centroids_rows],
            "cluster INT, cvec ARRAY<DOUBLE>",
        )
        dist = F.aggregate(
            F.zip_with(
                F.col("qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        scored = dim_df.crossJoin(F.broadcast(cent)).select(
            "vid", "cluster", dist.alias("dist")
        )
        # per-point argmin, ties to the lowest cluster id (deterministic)
        return scored.groupBy("vid").agg(
            F.min_by(
                F.struct("cluster", "dist"), F.struct("dist", "cluster")
            ).alias("best")
        ).select("vid", F.col("best.cluster").alias("cluster"),
                 F.col("best.dist").alias("dist"))

    init = [
        (i, [float(x) for x in row["qvec"]])
        for i, row in enumerate(
            dim_df.orderBy("vid").limit(k).collect()
        )
    ]
    centroids = init
    assigned = assign(centroids)
    for _ in range(iters):
        # per-dimension mean with map-side partial aggregation: the
        # shuffle carries k × dim partial rows per task, independent of
        # corpus size — the 100 TB-safe centroid update
        update = (
            assigned.join(dim_df, "vid")
            .select(
                "cluster",
                F.posexplode(F.col("qvec").cast("array<double>")).alias("pos", "x"),
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        centroids = [
            (row["cluster"], list(row["cvec"])) for row in update.collect()
        ]
        assigned = assign(centroids)
    return assigned.select(
        F.col("vid").alias(id_col), "cluster", F.col("dist").alias("sq_dist")
    )


def knn_graph(
    emb: DataFrame,
    planes: list[list[int]],
    k: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Bucketed k-NN graph: random-hyperplane blocking, then exact
    cosine rank within the bucket. ``emb`` must carry qvec+qnorm
    (with_quantized).

    ``planes`` is the caller-owned scale knob: bucket occupancy is
    n / 2^len(planes), and the within-bucket join is quadratic in
    occupancy, so plane count must grow with log2(n). Measured at a
    100k-vector corpus: 4 planes 259 s, 8 planes 13.5 s, 12 planes
    2.0 s — identical edge output (see BASELINE.md 20x sweep).
    """
    from sentiflow_spark.functions.vectors import rp_bucket

    e = emb.withColumn("rp_bucket", rp_bucket(F.col("qvec"), planes))
    a = e.select(
        "rp_bucket",
        F.col(id_col).alias("src"),
        F.col("qvec").alias("a_qvec"),
        F.col("qnorm").alias("a_qnorm"),
    )
    b = e.select(
        "rp_bucket",
        F.col(id_col).alias("dst"),
        F.col("qvec").alias("b_qvec"),
        F.col("qnorm").alias("b_qnorm"),
    )
    scored = (
        a.join(b, "rp_bucket")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            cosine_q(
                dot_long(F.col("a_qvec"), F.col("b_qvec")),
                F.col("a_qnorm"),
                F.col("b_qnorm"),
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cosine", "rank")
    )


def dtw_distances(
    pairs: DataFrame,
    band: int = 3,
    a_col: str = "p_series",
    b_col: str = "series",
) -> DataFrame:
    """Banded dynamic-time-warping distance per row — the custom
    operator Spark's built-ins genuinely cannot express (a dynamic
    program per pair), implemented the engine's sanctioned way:
    Arrow-batched ``mapInPandas``, integer |a-b| cell cost, Sakoe-Chiba
    band of half-width ``band`` (classic speed/accuracy trade: O(L*band)
    per pair instead of O(L^2), and a warping-path sanity constraint).

    Input rows carry two integer series columns; output replaces them
    with ``dtw`` (int64). All arithmetic is integer, so the distance is
    bit-deterministic at any batch size or partitioning. Scale shape:
    the DP runs where the pair row lives — no shuffle, no state, cost
    linear in pairs × L × band.
    """
    import pandas as pd  # noqa: F401 (schema side)

    out_fields = [
        f.name for f in pairs.schema.fields if f.name not in (a_col, b_col)
    ]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields
        if f.name not in (a_col, b_col)
    ) + ", dtw long"

    def batches(it):
        import numpy as np

        for pdf in it:
            dtws = []
            for a, b in zip(pdf[a_col], pdf[b_col]):
                a = np.asarray(a, dtype=np.int64)
                b = np.asarray(b, dtype=np.int64)
                n, m = len(a), len(b)
                r = max(band, abs(n - m))
                INF = np.int64(2**62)
                prev = np.full(m + 1, INF, dtype=np.int64)
                prev[0] = 0
                for i in range(1, n + 1):
                    cur = np.full(m + 1, INF, dtype=np.int64)
                    lo, hi = max(1, i - r), min(m, i + r)
                    for j in range(lo, hi + 1):
                        cost = abs(int(a[i - 1]) - int(b[j - 1]))
                        cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
                    prev = cur
                dtws.append(int(prev[m]))
            out = pdf[out_fields].copy()
            out["dtw"] = dtws
            yield out

    return pairs.mapInPandas(batches, schema=schema)
