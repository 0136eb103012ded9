"""Scale-headroom probe: replicate the sf0.1 corpus N× (default 20×,
~100k documents / ~100k embeddings) into .tmp/scale{N}/ and run a list
of declared queries against it, printing wall time + output rows.

This is the single-node stand-in for the 100 TB question: operators
whose cost curves bend quadratic (pair generation, windows over hot
keys) show it between 1× and 20× long before a cluster would. Results
are recorded in BASELINE.md's scale-headroom sections.

Run: python tools/scale_probe.py [N] [--overlap] [--tpch] [query ...]
Defaults: N=20, the corpus-family headline queries.

--tpch additionally replicates the star-schema fact tables with
COHERENT keys (customer/orders/lineitem get disjoint per-replica key
ranges, and every foreign key is remapped with the same stride as its
parent, so joins stay referentially intact at N x volume) and copies
the small dimensions (region/nation/supplier/part) through unchanged
— dimensional reuse across replicas is the realistic growth model.
This lets the relational/TPC-H headline queries be probed at
12M+-row lineitem scale, not just the corpus family.

Replication remaps ids (id + rep * 10_000_000) so keys stay unique;
text/embedding payloads repeat, which deliberately creates 20-way
duplicate clusters — the worst realistic case for dedup operators.

--overlap builds a documents variant (.tmp/scale{N}ov/) that ALSO
contains partner docs with genuine PARTIAL overlap: for every 100th
base doc, a partner shares its left half verbatim and ends in a
doc-unique tail. The replica corpus alone is adversarial for the
local-overlap pair operators (every gram hash is >=20-way duplicated,
so the df-cap drops them all and dd_winnow_pairs outputs 0 rows —
documented in BASELINE.md); partners share hashes at df = 2*reps,
under the cap of 50 at 20x, so the pair PATH produces real output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sentiflow_spark.queries.registry import load_all  # noqa: E402
from sentiflow_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10_000_000
# partner ids sit between base ids (<~100k) and the first replica
# stride so all three ranges stay disjoint
OVERLAP_STRIDE = 5_000_000

DEFAULT_QUERIES = (
    "dd_segment_dedup",
    "dd_duplicate_clusters",
    "dd_cluster_reps",
    "ret_query_likelihood",
    "ret_hybrid_rrf",
    "ret_phrase_match",
    "txt_robust_outliers",
)

TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


def build(spark, n: int, out_dir: str, overlap: bool = False) -> None:
    for table, id_col in TABLES.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(f"{BASE_SF}/{table}.parquet")
        if overlap and table == "documents":
            # Genuine partial overlap that SURVIVES the df-cap: the
            # corpus's own text is useless for this (synthetic vocab ->
            # median gram-hash df 300 at 20x, all capped away), so the
            # shared region is a doc-UNIQUE 256-char block (md5 hex
            # repeated) spliced into every 100th base doc and into a
            # partner doc. Each block's gram hashes then appear in
            # exactly 2*reps docs (40 at 20x, under the cap of 50) and
            # a ~256-char shared substring yields ~2/(w+1)*249 ~ 55
            # shared winnowed fingerprints >> shared_min 8.
            blk = F.repeat(F.md5(F.col("doc_id").cast("string")), 8)
            sampled = F.col("doc_id") % 100 == 0
            base = base.withColumn(
                "text",
                F.when(sampled, F.concat(F.col("text"), F.lit(" "), blk))
                .otherwise(F.col("text")),
            )
            partners = (
                base.filter(sampled)
                .withColumn(
                    "text",
                    F.concat(blk, F.lit(" ovltail"), F.col("doc_id").cast("string")),
                )
                .withColumn("doc_id", F.col("doc_id") + OVERLAP_STRIDE)
            )
            base = base.unionByName(partners)
        reps = spark.range(n).select(F.col("id").alias("_rep"))
        (
            base.crossJoin(reps)
            .withColumn(id_col, F.col(id_col) + F.col("_rep") * ID_STRIDE)
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(dst)
        )
    # events replicate along the TIME axis (each replica shifted +35
    # days) so per-hour density stays realistic and the series just
    # gets N× longer — the honest growth model for time-series ops
    # (replicating at identical timestamps would instead multiply
    # interval-overlap output quadratically).
    dst = f"{out_dir}/events.parquet"
    if not os.path.exists(dst):
        from sentiflow_spark.tables import load as _load

        base = _load(spark, BASE_SF, "events")
        reps = spark.range(n).select(F.col("id").alias("_rep"))
        (
            base.crossJoin(reps)
            .withColumn("event_id", F.col("event_id") + F.col("_rep") * ID_STRIDE)
            .withColumn("user_id", F.col("user_id") + F.col("_rep") * 100_000)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.col("_rep") * 35 * 86400
                ),
            )
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(dst)
        )


O_STRIDE = 10_000_000   # orderkey stride per replica
C_STRIDE = 1_000_000    # custkey stride per replica
_TPCH_DIMS = ("region", "nation", "supplier", "part")


def build_tpch(spark, n: int, out_dir: str) -> None:
    """Replicate customer/orders/lineitem N x with coherent keys;
    copy the dimension tables through unchanged."""
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    plans = {
        "customer": {"c_custkey": C_STRIDE},
        "orders": {"o_orderkey": O_STRIDE, "o_custkey": C_STRIDE},
        "lineitem": {"l_orderkey": O_STRIDE},
    }
    for table, remap in plans.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{BASE_SF}/{table}.parquet").crossJoin(reps)
        for col, stride in remap.items():
            df = df.withColumn(col, F.col(col) + F.col("_rep") * stride)
        df.drop("_rep").repartition(32).write.mode("overwrite").parquet(dst)
    for table in _TPCH_DIMS:
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        (
            spark.read.parquet(f"{BASE_SF}/{table}.parquet")
            .write.mode("overwrite")
            .parquet(dst)
        )


def main() -> None:
    args = sys.argv[1:]
    overlap = "--overlap" in args
    if overlap:
        args.remove("--overlap")
    tpch = "--tpch" in args
    if tpch:
        args.remove("--tpch")
    n = int(args[0]) if args else 20
    names = args[1:] or list(DEFAULT_QUERIES)
    suffix = f"scale{n}ov" if overlap else f"scale{n}"
    out_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".tmp", suffix)
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("scale-probe")
    build(spark, n, out_dir, overlap=overlap)
    if tpch:
        build_tpch(spark, n, out_dir)
    registry = load_all()
    for name in names:
        t0 = time.perf_counter()
        # .rdd.count(), NOT .count(): Catalyst rewrites DataFrame
        # count() aggressively — e.g. a row-preserving left join onto a
        # grouped subquery is ELIMINATED entirely, so count() returned
        # in 5 s for a query whose real plan runs 500+ s (measured on
        # dd_threshold_curve). The RDD boundary pins the physical plan
        # as written; the serialization overhead is uniform across
        # queries and tiny next to what the probe measures.
        rows = registry[name].fn(spark, out_dir).rdd.count()
        print(f"{name}: {rows} rows in {time.perf_counter() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
