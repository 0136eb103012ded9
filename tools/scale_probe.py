"""Scale-headroom probe: replicate the sf0.1 corpus N× (default 20×,
~100k documents / ~100k embeddings) into .tmp/scale{N}/ and run a list
of declared queries against it, printing wall time + output rows.

This is the single-node stand-in for the 100 TB question: operators
whose cost curves bend quadratic (pair generation, windows over hot
keys) show it between 1× and 20× long before a cluster would. Results
are recorded in BASELINE.md's scale-headroom sections.

Run: python tools/scale_probe.py [N] [--overlap] [--tpch] [--hotkey]
     [--manifest] [--merge] [--zorder] [--bloom] [--curate-delta]
     [--autocompact-policy] [--gen-count-ab] [--st-serve]
     [query ...]
Defaults: N=20, the corpus-family headline queries. The probe modes
(--hotkey/--manifest/--merge) take only an optional leading numeric
argument and reject query names.

--manifest drives the FULL ingest loop (streaming admission → K2
MERGE manifest sink) over the N× replica corpus as a multi-batch drip
(maxFilesPerTrigger), printing wall time, micro-batch count, and
final manifest rows — the end-to-end cost of the production ingest
path at N× volume.

--merge isolates the MERGE against a LARGE PRE-SEEDED manifest (N
fingerprints, default 10M, 64 buckets): a fixed-size incoming batch
is constrained to touch B buckets for B in 1/4/16/64 and each merge's
wall is printed, for the seeded manifest and for a 100× smaller one.
Proves the O(touched-buckets) claim where it matters: merge cost must
track the batch's bucket fanout (and per-bucket volume), never total
manifest size.

--zorder WRITES the two physical layouts rel_zorder_skipping reasons
about (z-order-clustered vs single-column-sorted lineitem at N×, 16
files each, directory-partitioned by file bucket) and measures REAL
skipping: per-file parquet footer min/max stats decide which files a
one-bucket probe on each dimension must touch, and the probe
aggregation is timed against each layout. Turns the declared query's
stats-level geometry into written-artifact evidence.

--bloom writes N× lineitem with and without PARQUET-NATIVE bloom
filters on l_orderkey, verifies the written footers carry the bloom
offsets, and measures point lookups for present and absent keys
against each — the point-lookup complement to --zorder's range
skipping (hash-distributed keys defeat min/max stats).

--hotkey probes the streaming admission path (st_curation_admit)
under ADVERSARIAL DUPLICATE SKEW instead of running queries: it
builds a replica corpus where HALF of all rows share ONE
gate-passing document (one fingerprint carrying 50% of the stream —
the hot-crawl worst case for a dedup keyed shuffle), runs the
admission flow against both the uniform replica corpus and the
hot-key variant at the same row count, and prints wall time, admitted
rows, and dedup state-store mark count for each. Verifies the
reference-parity claim that admission state is bounded by DISTINCT
CONTENT (internal/clients/valkey_client.go:126-159) and measures
whether the single hot state key bottlenecks the stateful shuffle.

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


# 60 canonical words, >=2 stopwords, mean word length in [3,10] — a
# document that PASSES the Gopher admission gate, so its fingerprint
# really becomes a hot state key (a gate-failing hot text would be
# filtered before the stateful dedup and measure nothing)
HOT_TEXT = " ".join(
    ["the", "quick", "brown", "fox", "and",
     "that", "have", "with", "to", "of"] * 6
)


def build_hotkey(spark, n: int, out_dir: str) -> None:
    """documents replicated n× with HALF of all rows' text replaced by
    the single hot document: one fingerprint carries 50% of the
    stream, the other half keeps the uniform n-way replica tail."""
    dst = f"{out_dir}/documents.parquet"
    if os.path.exists(dst):
        return
    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    (
        base.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * ID_STRIDE)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 2 == 0, F.lit(HOT_TEXT)).otherwise(
                F.col("text")
            ),
        )
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(dst)
    )


def run_admit_probe(spark, data_dir: str, label: str) -> None:
    """Run the streaming admission flow over data_dir's documents with
    a fresh checkpoint; print wall time, admitted rows, state marks."""
    import shutil
    import tempfile
    import uuid

    from sentiflow_spark.queries.streaming_queries import curation_admit_flow
    from sentiflow_spark.streaming.dag import load_stream, read_state_store

    ckpt = tempfile.mkdtemp(prefix="sf_probe_admit_ck_")
    name = f"probe_admit_{uuid.uuid4().hex[:8]}"
    try:
        t0 = time.perf_counter()
        q = (
            curation_admit_flow(load_stream(spark, data_dir, "documents"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        rows = spark.table(name).count()
        marks = read_state_store(spark, ckpt).count()
        n_docs = spark.read.parquet(f"{data_dir}/documents.parquet").count()
        print(
            f"admit[{label}]: {n_docs} docs -> {rows} admitted, "
            f"{marks} state marks, {wall:.1f} s",
            flush=True,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def run_manifest_probe(spark, data_dir: str, label: str, files_per_trigger: int = 8) -> None:
    """Drive the full ingest loop (admission → K2 MERGE manifest) over
    data_dir's documents as a MULTI-BATCH drip (maxFilesPerTrigger), so
    the merge path is exercised the way production runs it: several
    micro-batches upserting into the same bucketed table. Prints wall
    time, micro-batch count, and final manifest row count."""
    import shutil
    import tempfile

    from sentiflow_spark.queries.streaming_queries import curation_admit_flow
    from sentiflow_spark.streaming.sinks import curation_manifest_sink

    ckpt = tempfile.mkdtemp(prefix="sf_probe_mani_ck_")
    manifest = tempfile.mkdtemp(prefix="sf_probe_mani_tbl_") + "/manifest"
    try:
        path = f"{data_dir}/documents.parquet"
        schema = spark.read.parquet(path).schema
        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(files_per_trigger))
            .parquet(path)
        )
        t0 = time.perf_counter()
        q = (
            curation_admit_flow(reader)
            .writeStream.foreachBatch(curation_manifest_sink(manifest))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else -1
        rows = spark.read.parquet(manifest).count()
        n_docs = spark.read.parquet(path).count()
        print(
            f"manifest[{label}]: {n_docs} docs in {batches} micro-batches "
            f"-> {rows} manifest rows, {wall:.1f} s",
            flush=True,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(manifest), ignore_errors=True)


def run_merge_probe(spark, n_fp: int, n_buckets: int = 64) -> None:
    """Isolated K2 MERGE cost against a pre-seeded manifest: seed n_fp
    fingerprints across n_buckets bucket partitions, then merge a
    FIXED-SIZE incoming batch constrained to land in B buckets for
    growing B, printing each merge's wall. Repeats against a 100×
    smaller manifest: O(touched-buckets) means wall tracks B (and the
    per-bucket row volume), never total manifest size."""
    import shutil
    import tempfile

    from sentiflow_spark.streaming.sinks import (
        _bucket_of,
        merge_upsert,
        stamp_ttl,
    )

    batch_rows = 2048
    # candidate pool of NEW fps large enough that even B=1 (1/64 of the
    # pool lands in bucket 0) fills the batch
    pool = (
        spark.range(batch_rows * n_buckets * 4)
        .select(
            F.md5(F.concat(F.lit("new_"), F.col("id").cast("string"))).alias("fp"),
            (F.col("id") % 997).cast("int").alias("n_words"),
        )
        .withColumn("_b", _bucket_of("fp", n_buckets))
    )
    for rows in (n_fp // 100, n_fp):
        table = tempfile.mkdtemp(prefix="sf_probe_merge_") + "/manifest"
        try:
            seed = spark.range(rows).select(
                F.md5(F.col("id").cast("string")).alias("fp"),
                (F.col("id") % 997).cast("int").alias("n_words"),
            )
            (
                stamp_ttl(seed)
                .withColumn("_bucket", _bucket_of("fp", n_buckets))
                .repartition("_bucket")
                .write.partitionBy("_bucket")
                .parquet(table)
            )
            for b in (1, 4, 16, n_buckets):
                batch = (
                    pool.filter(F.col("_b") < b)
                    .drop("_b")
                    .limit(batch_rows)
                    .localCheckpoint(eager=True)  # exclude generation cost
                )
                t0 = time.perf_counter()
                merge_upsert(
                    spark, stamp_ttl(batch), table, "fp", n_buckets=n_buckets
                )
                wall = time.perf_counter() - t0
                print(
                    f"merge[{rows} fp manifest, {n_buckets} buckets]: "
                    f"{batch_rows}-fp batch -> {b} buckets touched, "
                    f"{wall:.2f} s",
                    flush=True,
                )
        finally:
            shutil.rmtree(os.path.dirname(table), ignore_errors=True)


def run_zorder_probe(spark, n: int) -> None:
    """Write z-order-clustered and x-sorted lineitem layouts at N× and
    measure the skipping rel_zorder_skipping computes from bucket-space
    stats — here from the REAL parquet footers of REAL files, plus the
    wall time of the probe aggregation against each layout."""
    import glob as _glob
    import math

    import pyarrow.parquet as pq

    from sentiflow_spark.queries.relational import _z_interleave_col

    out_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
    )
    os.makedirs(out_dir, exist_ok=True)
    build_tpch(spark, n, out_dir)
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("x"),
        F.col("l_suppkey").alias("y"),
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
    )
    mm = li.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count(F.lit(1))
    ).first()
    xmin, xmax, ymin, ymax, n_rows = mm
    w, h = xmax - xmin + 1, ymax - ymin + 1
    xb = F.floor(((F.col("x") - xmin) * 16.0) / w).cast("int")
    yb = F.floor(((F.col("y") - ymin) * 16.0) / h).cast("int")
    base = li.withColumn("xb", xb).withColumn("yb", yb)
    zv = _z_interleave_col(F.col("xb"), F.col("yb"))
    # each layout: (file-bucket column, within-file sort) — a real
    # OPTIMIZE ZORDER sorts by the z-value inside files too, which is
    # what gives row groups tight stats on BOTH dimensions
    layouts = {
        "zorder": (F.shiftright(zv, 4), [F.col("_zv"), F.col("x"), F.col("y")]),
        "linear": (F.col("xb"), [F.col("x"), F.col("y")]),
    }
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".tmp", f"zorder{n}")
    )
    paths = {}
    for name, (fcol, sort_cols) in layouts.items():
        dst = f"{root}/{name}"
        paths[name] = dst
        if not os.path.exists(dst):
            (
                base.withColumn("f", fcol)
                .withColumn("_zv", zv)
                .repartition(F.col("f"))  # one file per bucket value
                .sortWithinPartitions(*sort_cols)
                .drop("xb", "yb", "_zv")
                .write.partitionBy("f")
                .mode("overwrite")
                .parquet(dst)
            )
    print(f"lineitem {n}x: {n_rows} rows, x[{xmin},{xmax}] y[{ymin},{ymax}]")
    # bucket-7 value ranges (the declared query's probe, in raw values)
    xlo, xhi = xmin + math.ceil(7 * w / 16), xmin + math.ceil(8 * w / 16) - 1
    ylo, yhi = ymin + math.ceil(7 * h / 16), ymin + math.ceil(8 * h / 16) - 1
    probes = {"x": ("x", xlo, xhi), "y": ("y", ylo, yhi)}
    for name, dst in paths.items():
        files = sorted(_glob.glob(f"{dst}/f=*/*.parquet"))
        stats = []
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            cols = {
                md.row_group(0).column(j).path_in_schema: j
                for j in range(md.num_columns)
            }
            rng = {}
            for c in ("x", "y"):
                j = cols[c]
                mins = [md.row_group(i).column(j).statistics.min
                        for i in range(md.num_row_groups)]
                maxs = [md.row_group(i).column(j).statistics.max
                        for i in range(md.num_row_groups)]
                rng[c] = (min(mins), max(maxs))
            stats.append((rng, md.num_rows))
        for dim, (c, lo, hi) in probes.items():
            touched = [
                (rng, nr) for rng, nr in stats
                if rng[c][0] <= hi and rng[c][1] >= lo
            ]
            rows = sum(nr for _, nr in touched)
            # wall of the probe aggregation (best of 2: page cache and
            # session warm-up land on the first pass)
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                spark.read.parquet(dst).filter(
                    (F.col(c) >= lo) & (F.col(c) <= hi)
                ).agg(F.sum("l_extendedprice")).collect()
                walls.append(time.perf_counter() - t0)
            print(
                f"{name} probe {dim} in [{lo},{hi}]: footer-stats touch "
                f"{len(touched)}/{len(files)} files ({rows} rows), "
                f"probe agg {min(walls):.2f} s",
                flush=True,
            )


def run_bloom_probe(spark, n: int) -> None:
    """Write N× lineitem twice — with and without PARQUET-NATIVE bloom
    filters on l_orderkey (high-cardinality, hash-distributed across
    files, so min/max stats cannot prune a point lookup) — and measure
    equality lookups for PRESENT and ABSENT keys against each layout.
    The file-format complement to the --zorder probe: range predicates
    want clustering + min/max, point lookups on unclustered keys want
    blooms. Measures whether the read path actually consults them
    rather than assuming it."""
    import glob as _glob

    import pyarrow.parquet as pq

    out_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
    )
    os.makedirs(out_dir, exist_ok=True)
    build_tpch(spark, n, out_dir)
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    n_rows = li.count()
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".tmp", f"bloom{n}")
    )
    paths = {}
    for variant in ("plain", "bloom"):
        dst = f"{root}/{variant}"
        paths[variant] = dst
        if os.path.exists(dst):
            continue
        w = li.repartition(16).write.mode("overwrite")
        if variant == "bloom":
            w = w.option(
                "parquet.bloom.filter.enabled#l_orderkey", "true"
            ).option(
                "parquet.bloom.filter.expected.ndv#l_orderkey",
                str(max(n_rows // 4, 1)),
            )
        w.parquet(dst)
    # written-artifact verification: the bloom variant must carry the
    # filters — visible as extra bytes per column chunk (pyarrow does
    # not surface bloom offsets, so the size delta at identical data
    # is the artifact-level proof), and row-group geometry printed so
    # the skip unit is explicit
    sizes = {}
    for variant, dst in paths.items():
        files = sorted(_glob.glob(f"{dst}/*.parquet"))
        sizes[variant] = sum(os.path.getsize(f) for f in files)
        md = pq.ParquetFile(files[0]).metadata
        print(
            f"{variant}: {len(files)} files, {sizes[variant]/1e6:.1f} MB, "
            f"{md.num_row_groups} row groups / file 0, "
            f"{md.row_group(0).num_rows} rows / group"
        )
    print(f"bloom bytes overhead: {(sizes['bloom']-sizes['plain'])/1e6:.2f} MB")
    # lookups decode FULL rows (select *): without late
    # materialization every projected column of a non-skipped row
    # group is decoded, so row-group skipping — stats or bloom — is
    # the whole contest. The absent key must sit INSIDE every row
    # group's [min, max] (keys are hash-distributed, so each group
    # spans nearly the whole domain) or min/max stats answer it
    # without the bloom — a key in the dead zone between the base
    # key range and the first replica stride qualifies.
    present = li.select("l_orderkey").first()[0]
    absent = O_STRIDE - 7
    for variant, dst in paths.items():
        for label, key in (("present", present), ("absent", absent)):
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                got = len(
                    spark.read.parquet(dst)
                    .filter(F.col("l_orderkey") == key)
                    .collect()
                )
                walls.append(time.perf_counter() - t0)
            print(
                f"{variant} lookup {label} key: {got} rows, "
                f"{min(walls):.2f} s best-of-2",
                flush=True,
            )


def run_curate_delta_probe(spark, data_dir: str, label: str) -> None:
    """The incremental-curation cost claim, measured: run the ten-stage
    DAG as 8 ascending delta batches against standing manifests and
    print each batch's wall + admission stats — per-batch cost must
    track the DELTA (roughly flat walls batch-over-batch; standing
    state grows 8x across the run), never the cumulative corpus — then
    the publish wall, then the ONE-SHOT DAG wall on the same replica
    corpus for the total-cost comparison. (The delta total may exceed
    one-shot at small N — 8 rounds of merge/job overhead — the claim
    is the per-batch SHAPE, which is what survives to 100 TB where
    re-running the one-shot DAG per crawl is not an option.)"""
    import shutil

    from sentiflow_spark.queries.curation_delta import (
        _state_root,
        publish,
        run_delta_batches,
    )

    root = _state_root(data_dir)
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    stats = run_delta_batches(
        spark, data_dir, root, n_batches=8, collect_stats=True
    )
    t_batches = time.perf_counter() - t0
    for s in stats:
        print(
            f"curate-delta {label} batch {s['batch']}: {s['wall_s']} s, "
            f"{s['delta_docs']} delta docs, {s['stale_recomputed']} stale, "
            f"{s['boiler_crossers']} crossing segs",
            flush=True,
        )
    t0 = time.perf_counter()
    rows = publish(spark, data_dir, root).rdd.count()
    t_pub = time.perf_counter() - t0
    print(f"curate-delta {label}: publish {t_pub:.1f} s, {rows} rows; "
          f"8 batches total {t_batches:.1f} s", flush=True)
    # STEADY-STATE leg: admit one FIXED-SIZE delta (the base corpus,
    # ids shifted past every replica) against the now-full standing
    # state — compare this wall ACROSS probe scales (20x vs 100x): the
    # O(delta) claim is that it does not grow with state size.
    from sentiflow_spark.queries.curation_delta import admit_batch

    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    extra = base.withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000 * ID_STRIDE)
    )
    corpus = spark.read.parquet(f"{data_dir}/documents.parquet")
    raw = corpus.unionByName(extra)
    s = admit_batch(spark, extra, raw, root, collect_stats=True)
    print(
        f"curate-delta {label} STEADY-STATE extra batch: {s['wall_s']} s, "
        f"{s['delta_docs']} delta docs, {s['stale_recomputed']} stale, "
        f"{s['boiler_crossers']} crossing segs (state = {label} corpus)",
        flush=True,
    )
    # RETENTION-HORIZON COMPACTION leg (r11): collapse the first half
    # of the generations into the base, keep the rest addressable —
    # measure the compaction wall (manifest-bound: it rewrites resolved
    # narrow/latest-wins views, never re-touching corpus text beyond
    # the stored feature rows) and prove the publish is byte-identical
    # and a post-compaction steady-state batch admits at the same cost.
    from sentiflow_spark.queries.curation_delta import compact_state

    before = sorted(
        tuple(r) for r in publish(spark, data_dir, root).collect()
    )
    t0 = time.perf_counter()
    cc = compact_state(spark, root, horizon=4)
    t_cmp = time.perf_counter() - t0
    print(
        f"curate-delta {label} HORIZON COMPACTION (gens<=4 -> base): "
        f"{t_cmp:.1f} s; resolved rows {cc}",
        flush=True,
    )
    after = sorted(
        tuple(r) for r in publish(spark, data_dir, root).collect()
    )
    print(
        f"curate-delta {label} publish preserved by compaction: "
        f"{before == after}",
        flush=True,
    )
    extra2 = base.withColumn(
        "doc_id", F.col("doc_id") + F.lit(1001 * ID_STRIDE)
    )
    raw2 = raw.unionByName(extra2)
    s2 = admit_batch(spark, extra2, raw2, root, collect_stats=True)
    print(
        f"curate-delta {label} STEADY-STATE batch AFTER compaction: "
        f"{s2['wall_s']} s, {s2['delta_docs']} delta docs, "
        f"{s2['stale_recomputed']} stale",
        flush=True,
    )
    registry = load_all()
    t0 = time.perf_counter()
    rows1 = registry["txt_curation_dag"].fn(spark, data_dir).rdd.count()
    print(f"one-shot dag {label}: {rows1} rows in "
          f"{time.perf_counter() - t0:.1f} s", flush=True)


def run_autocompact_policy_probe(spark, data_dir: str, label: str) -> None:
    """The rolling-compaction POLICY curve the r11 cost law demands
    (steady-state admission cost grows with GENERATION COUNT, not
    corpus size: 17.5 s at 6 gens vs 9.8 s freshly compacted at the
    same 1M-doc state — BASELINE.md): ingest the replica corpus as 8
    delta batches under auto_compact_gens=K for K in {2, 4, inf} and
    report, per policy, the TOTAL ingestion wall (admissions + every
    in-loop compaction — the amortized figure an operator actually
    pays), the per-batch walls, the end-state generation count, a
    fixed-size steady-state admission against the final state (the
    cost the NEXT crawl drop pays under that policy), and the publish
    wall. Publishes must be identical across policies (rolling
    compaction is publish-preserving). Policies run coldest-first
    (K=2, the expected winner, pays any residual cache warming) in one
    session over one fixture so the OS page cache is comparable."""
    import shutil

    from sentiflow_spark.queries.curation_delta import (
        _paths,
        _state_root,
        admit_batch,
        publish,
        run_delta_batches,
    )

    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    corpus = spark.read.parquet(f"{data_dir}/documents.parquet")
    first_pub: list | None = None
    identical = True
    for K in (2, 4, None):
        tag = "inf" if K is None else str(K)
        root = _state_root(data_dir) + f"_policy{tag}"
        shutil.rmtree(root, ignore_errors=True)
        _print_host_sentinel(f"policy K={tag} start")
        t0 = time.perf_counter()
        stats = run_delta_batches(
            spark, data_dir, root, n_batches=8,
            collect_stats=True, auto_compact_gens=K,
        )
        total = time.perf_counter() - t0
        admit_sum = sum(s["wall_s"] for s in stats)
        gens = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(_paths(root)["features"])
            if d.startswith("_gen=")
        )
        walls = ", ".join(f"{s['wall_s']:.1f}" for s in stats)
        print(
            f"autocompact {label} K={tag}: total {total:.1f} s "
            f"(amortized {total / len(stats):.1f} s/batch; admit-only "
            f"sum {admit_sum:.1f} s, in-loop compaction "
            f"{total - admit_sum:.1f} s); per-batch [{walls}] s; "
            f"end gens={len(gens)} {gens}",
            flush=True,
        )
        t0 = time.perf_counter()
        pub = sorted(
            tuple(r) for r in publish(spark, data_dir, root).collect()
        )
        print(
            f"autocompact {label} K={tag}: publish "
            f"{time.perf_counter() - t0:.1f} s, {len(pub)} rows",
            flush=True,
        )
        # compare NOW and drop: retaining all three ~1M-row
        # publishes in driver memory risks OOM at larger N
        if first_pub is None:
            first_pub = pub
        else:
            identical = identical and pub == first_pub
        del pub
        extra = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000 * ID_STRIDE)
        )
        raw = corpus.unionByName(extra)
        s = admit_batch(spark, extra, raw, root, collect_stats=True)
        print(
            f"autocompact {label} K={tag} STEADY-STATE extra batch "
            f"(against {len(gens)} gens): {s['wall_s']} s, "
            f"{s['delta_docs']} delta docs, "
            f"{s['stale_recomputed']} stale",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    print(
        f"autocompact {label}: publishes identical across policies: "
        f"{identical}",
        flush=True,
    )


def run_gen_count_ab_probe(spark, data_dir: str, label: str) -> None:
    """Warmth-BALANCED A/B for the r11 generation-count cost law. The
    r12 --autocompact-policy probe read the steady-state 5k-doc
    admission FLAT (~9.2-9.5 s) at 3, 5 AND 8 generations, where r11
    had measured 17.5 s at 6 gens vs 9.8 s compacted — but in both
    r11 readings the multi-generation measurement came EARLIER in its
    session (warmth confound), while the policy probe's 8-gen reading
    came last (warmest). This probe removes ordering from the
    comparison: build the 8-generation state once, copy it and compact
    the copy to ONE generation, take one throwaway warm-up admission
    on a third copy, then INTERLEAVE steady-state admissions
    A(multi-gen), B(compacted), A, B, A, B — same fixture, same
    session, alternating positions, sentinel before each pair. If the
    gen-count slope is real, every A reads above every B; if the
    pairs straddle, the r11 law was a warmth artifact and BASELINE.md
    gets corrected.

    SPARK_GRAFT_AB_EXTRA_GENS=E (default 0) widens the generation gap:
    after the 8-batch ingest, E additional 5k-doc admissions spread the
    state to 8+E generations BEFORE the copy/compact — and each prints
    its wall against its own growing gen count, so the sequence itself
    traces the slope (the r12 question: is ~0.08 s/gen linear past 11
    generations, where the K≈12 policy recommendation extrapolates?)."""
    import shutil

    from sentiflow_spark.queries.curation_delta import (
        _state_root,
        admit_batch,
        compact_state,
        run_delta_batches,
    )

    root_a = _state_root(data_dir) + "_ab_multi"
    root_b = _state_root(data_dir) + "_ab_compact"
    root_w = _state_root(data_dir) + "_ab_warmup"
    for r in (root_a, root_b, root_w):
        shutil.rmtree(r, ignore_errors=True)
    t0 = time.perf_counter()
    run_delta_batches(spark, data_dir, root_a, n_batches=8)
    print(
        f"gen-ab {label}: 8-batch ingest {time.perf_counter() - t0:.1f} s",
        flush=True,
    )
    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    corpus = spark.read.parquet(f"{data_dir}/documents.parquet")
    # admit_batch's contract: raw must cover EVERY doc admitted so far
    # plus the delta — so each root's raw view accumulates its extras
    # (a crossing that stales a prior extra must find its text)
    raws = {root_a: corpus, root_b: corpus, root_w: corpus}

    def _steady(root, i, tag):
        extra = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit((1000 + i) * ID_STRIDE)
        )
        raws[root] = raws[root].unionByName(extra)
        s = admit_batch(spark, extra, raws[root], root, collect_stats=True)
        return s["wall_s"]

    extra_gens = int(os.environ.get("SPARK_GRAFT_AB_EXTRA_GENS", "0"))
    for j in range(extra_gens):
        w = _steady(root_a, 100 + j, "spread")
        print(
            f"gen-ab {label} spread admission {j}: {w} s "
            f"(gens {8 + j} -> {9 + j})",
            flush=True,
        )
    shutil.copytree(root_a, root_b)
    shutil.copytree(root_a, root_w)
    raws[root_b] = raws[root_a]
    raws[root_w] = raws[root_a]
    t0 = time.perf_counter()
    cc = compact_state(spark, root_b, horizon=None)
    print(
        f"gen-ab {label}: full compaction of copy B "
        f"{time.perf_counter() - t0:.1f} s; resolved rows {cc}",
        flush=True,
    )
    w = _steady(root_w, 0, "warmup")
    print(f"gen-ab {label}: warm-up admission (discarded): {w} s",
          flush=True)
    shutil.rmtree(root_w, ignore_errors=True)
    for i in range(1, 4):
        _print_host_sentinel(f"gen-ab pair {i}")
        wa = _steady(root_a, i, "A")
        wb = _steady(root_b, i, "B")
        # gen counts grow by one per admission: A starts at 8, B at 1
        print(
            f"gen-ab {label} pair {i}: "
            f"A(multi-gen, {7 + extra_gens + i}+1 gens) "
            f"{wa} s vs B(compacted, {i} gens) {wb} s",
            flush=True,
        )
    for r in (root_a, root_b):
        shutil.rmtree(r, ignore_errors=True)


def run_st_serve_probe(spark, data_dir: str, label: str) -> None:
    """Measures st_ivf_served's documented DPP negative and its
    fallback on a 64-coarse-bucket index (the testdata label column
    has only 10 distinct values, which caps the best possible pruning
    win at n_partitions/n_probed ~ 2x; a production IVF runs
    nlist >> nprobe, so the probe relabels vec_id % 64): (A) the plain
    stream-static join — NO dynamic pruning per micro-batch, every
    batch scans all 64 partitions; (B) ivf_pruned_serve_sink — the
    stream carries quantized probe rows and foreachBatch joins against
    an index read filtered to the batch's buckets with LITERAL
    partition values (static pruning, <= 5 of 64 partitions read).
    Outputs asserted row-identical; each variant runs twice."""
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from sentiflow_spark.functions.vectors import cosine_q, dot_long
    from sentiflow_spark.operators.similarity import with_quantized
    from sentiflow_spark.queries.similarity_queries import (
        N_PROBES,
        TOP_K,
        ivf_pruned_serve_sink,
    )
    from sentiflow_spark.streaming.dag import load_stream

    idx_path = f"{data_dir}/ivf64_index"
    if not os.path.isfile(os.path.join(idx_path, "_SUCCESS")):
        emb = with_quantized(spark.read.parquet(f"{data_dir}/embeddings.parquet"))
        (
            emb.select(
                "vec_id", "qvec", "qnorm",
                F.pmod(F.col("vec_id"), F.lit(64)).cast("int").alias("label"),
            )
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(idx_path)
        )
    n_vec = spark.read.parquet(idx_path).count()
    print(f"st-serve {label}: index {n_vec} vectors / 64 partitions, "
          f"{N_PROBES} probes", flush=True)

    def _probe_stream():
        return with_quantized(
            load_stream(spark, data_dir, "embeddings")
        ).filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("probe_id"),
            F.pmod(F.col("vec_id"), F.lit(64)).cast("int").alias("bucket"),
            F.col("qvec").alias("p_qvec"),
            F.col("qnorm").alias("p_qnorm"),
        )

    def _run(pruned: bool) -> str:
        scratch = tempfile.mkdtemp(prefix="sf_st_serve_")
        out, ckpt = f"{scratch}/topk", f"{scratch}/ckpt"
        if pruned:
            stream = _probe_stream()
            sink = ivf_pruned_serve_sink(idx_path, out, k=TOP_K)
        else:
            # the registered query's plain stream-static shape against
            # the same 64-bucket index: join in-stream, rank per batch
            index = spark.read.parquet(idx_path)
            c = index.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("bucket"),
                F.col("qvec").alias("c_qvec"),
                F.col("qnorm").alias("c_qnorm"),
            )
            stream = (
                _probe_stream()
                .join(c, "bucket")
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

            def sink(batch_df, batch_id):
                w = W.partitionBy("probe_id").orderBy(
                    F.desc("cosine"), F.asc("cand_id")
                )
                (
                    batch_df.withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= TOP_K)
                    .write.mode("append").parquet(out)
                )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return scratch

    outs = {}
    for name, pruned in (("plain", False), ("pruned", True)):
        last = None
        for i in (1, 2):
            t0 = time.perf_counter()
            scratch = _run(pruned)
            wall = time.perf_counter() - t0
            if last:
                shutil.rmtree(last, ignore_errors=True)
            last = scratch
            print(f"st-serve {label} {name} run {i}: {wall:.1f} s",
                  flush=True)
        outs[name] = last
    a = sorted(tuple(r) for r in
               spark.read.parquet(f"{outs['plain']}/topk").collect())
    b = sorted(tuple(r) for r in
               spark.read.parquet(f"{outs['pruned']}/topk").collect())
    for s in outs.values():
        shutil.rmtree(s, ignore_errors=True)
    print(f"st-serve {label}: outputs identical = {a == b} ({len(b)} rows)",
          flush=True)


def _probe_n(args: list[str], default: int) -> int:
    """Probe modes take ONE optional leading integer; a trailing query
    name would previously hit int(args[0]) and raise a bare
    ValueError — reject it with a usage error instead."""
    if args and args[0].lstrip("-").isdigit():
        return int(args.pop(0))
    if args:
        raise SystemExit(
            f"probe modes take only an optional numeric argument, got: {args!r}"
        )
    return default


def _print_host_sentinel(tag: str) -> None:
    """Contention sentinel around every probe run (the r10 finding:
    hypervisor-level contention can read 2x+ on the single-core probe
    while guest loadavg looks idle) — printed at start AND end so a
    BASELINE.md row can quote in-band machine evidence, not vibes."""
    from bench import _cpu_probe_s

    print(
        f"host sentinel ({tag}): load1={os.getloadavg()[0]:.2f} "
        f"cpu_probe_s={_cpu_probe_s()} (quiet band ~0.09-0.12)",
        flush=True,
    )


def main() -> None:
    _print_host_sentinel("probe start")
    import atexit

    atexit.register(_print_host_sentinel, "probe end")
    args = sys.argv[1:]
    overlap = "--overlap" in args
    if overlap:
        args.remove("--overlap")
    tpch = "--tpch" in args
    if tpch:
        args.remove("--tpch")
    merge = "--merge" in args
    if merge:
        args.remove("--merge")
        n_fp = _probe_n(args, 10_000_000)
        spark = get_spark("scale-probe")
        run_merge_probe(spark, n_fp)
        return
    bloomp = "--bloom" in args
    if bloomp:
        args.remove("--bloom")
        n = _probe_n(args, 100)
        spark = get_spark("scale-probe")
        run_bloom_probe(spark, n)
        return
    zorder = "--zorder" in args
    if zorder:
        args.remove("--zorder")
        n = _probe_n(args, 20)
        spark = get_spark("scale-probe")
        run_zorder_probe(spark, n)
        return
    stserve = "--st-serve" in args
    if stserve:
        args.remove("--st-serve")
        n = _probe_n(args, 100)
        out_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, out_dir)
        run_st_serve_probe(spark, out_dir, f"{n}x")
        return
    acp = "--autocompact-policy" in args
    if acp:
        args.remove("--autocompact-policy")
        n = _probe_n(args, 200)
        out_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, out_dir)
        run_autocompact_policy_probe(spark, out_dir, f"{n}x")
        return
    gab = "--gen-count-ab" in args
    if gab:
        args.remove("--gen-count-ab")
        n = _probe_n(args, 200)
        out_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, out_dir)
        run_gen_count_ab_probe(spark, out_dir, f"{n}x")
        return
    cdelta = "--curate-delta" in args
    if cdelta:
        args.remove("--curate-delta")
        n = _probe_n(args, 20)
        out_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, out_dir)
        run_curate_delta_probe(spark, out_dir, f"{n}x")
        return
    manifest = "--manifest" in args
    if manifest:
        args.remove("--manifest")
        n = _probe_n(args, 100)
        out_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        os.makedirs(out_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, out_dir)
        run_manifest_probe(spark, out_dir, f"{n}x drip")
        return
    hotkey = "--hotkey" in args
    if hotkey:
        args.remove("--hotkey")
        n = _probe_n(args, 100)
        uni_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}")
        )
        hot_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".tmp", f"scale{n}hot")
        )
        os.makedirs(uni_dir, exist_ok=True)
        os.makedirs(hot_dir, exist_ok=True)
        spark = get_spark("scale-probe")
        build(spark, n, uni_dir)
        build_hotkey(spark, n, hot_dir)
        # same total rows; uniform n-way duplicates vs one 50% hot key
        run_admit_probe(spark, uni_dir, f"uniform {n}x")
        run_admit_probe(spark, hot_dir, f"hotkey {n}x")
        return
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
