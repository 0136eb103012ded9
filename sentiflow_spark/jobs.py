"""Runnable job entry points — the reference's three binaries
(``cmd/producer``, ``cmd/consumer``, ``cmd/topic-generator``,
SURVEY §3) as one CLI:

    python -m sentiflow_spark.jobs ingest   --sf-dir D --out PATH
    python -m sentiflow_spark.jobs pipeline --sf-dir D --out PATH
    python -m sentiflow_spark.jobs stream   --sf-dir D --out PATH
    python -m sentiflow_spark.jobs topics   --sf-dir D --out PATH [--stored PATH]

- **ingest** (producer analog): documents → RawContent projection
  (sha256 content ids, nested metadata) → parquet append. With
  ``--kafka-brokers`` it writes the same rows to the raw-content topic
  instead (sources/kafka_io.py), which is the production wiring.
- **pipeline** (consumer DAG, batch deployment): RawContent → route →
  summarize → score → shape → TTL stamp → idempotent MERGE into the
  serving table (streaming/sinks.py) — replayable: re-running converges
  to the same table state.
- **stream** (consumer DAG, streaming deployment): the same transforms
  under Structured Streaming with an ``availableNow`` trigger and a
  ``foreachBatch`` MERGE sink; swap the file source for Kafka via
  ``--kafka-brokers`` in production.
- **topics** (topic-generator analog): headlines → stub/LLM topic
  extraction → dedup → anti-join vs the stored snapshot (read-once, the
  reference's staleness semantics) → MERGE upsert.

Every job prints one JSON line with row counts so orchestrators can
assert on output.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _spark(app: str) -> SparkSession:
    from sentiflow_spark.session import get_spark

    return get_spark(app)


def job_ingest(args: argparse.Namespace) -> dict:
    from sentiflow_spark.pipeline.batch import documents_as_raw_content
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-ingest")
    raw = documents_as_raw_content(load(spark, args.sf_dir, "documents"))
    if args.kafka_brokers:
        from sentiflow_spark.sources.kafka_io import TOPIC_RAW_CONTENT, keyed_json_payload

        # K1 batch publish: keyed JSON, at-least-once + deterministic
        # keys (downstream dedups by content_id, SURVEY §3.1)
        (
            keyed_json_payload(raw, "content_id")
            .write.format("kafka")
            .option("kafka.bootstrap.servers", args.kafka_brokers)
            .option("topic", TOPIC_RAW_CONTENT)
            .save()
        )
        return {"job": "ingest", "rows": raw.count(), "sink": "kafka"}
    n_batch = raw.count()
    raw.write.mode("append").parquet(args.out)
    # "rows" is ALWAYS this run's batch size (same semantics as the
    # Kafka branch). Append mirrors the producer's at-least-once publish
    # — replays duplicate content_ids and downstream dedups by key
    # (SURVEY §3.1). The cumulative table count costs a full re-scan of
    # the output, so it's opt-in (--report-total); the default path
    # never reads the table it just wrote.
    result = {"job": "ingest", "rows": n_batch, "sink": args.out}
    if args.report_total:
        result["rows_total"] = spark.read.parquet(args.out).count()
    return result


def job_pipeline(args: argparse.Namespace) -> dict:
    from sentiflow_spark.pipeline.batch import (
        documents_as_raw_content,
        sentiment_pipeline,
    )
    from sentiflow_spark.streaming.sinks import merge_upsert, stamp_ttl
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-pipeline")
    raw = documents_as_raw_content(load(spark, args.sf_dir, "documents"))
    results = stamp_ttl(sentiment_pipeline(raw, router_threshold=args.router_threshold))
    merge_upsert(spark, results, args.out, key="content_id")
    return {"job": "pipeline", "rows": spark.read.parquet(args.out).count(),
            "sink": args.out}


def run_gated_rounds(
    make_query,
    probe,
    rounds: int,
    poll_s: float = 15.0,
    sleep=None,
) -> list[str]:
    """F4 health gate around a sequence of ``availableNow`` runs: each
    round first asks ``probe()`` whether the model service is healthy;
    an unhealthy round is SKIPPED (no query started — pending input
    stays queued in the source/checkpoint, nothing is lost) and the
    loop sleeps one poll interval (the reference probes every 15 s,
    internal/monitoring/ai_healthchecks.go:12-48, and skips batches
    while unhealthy, internal/consumers/summary_consumer.go:67-71).
    Returns the per-round outcome list ("ran"/"skipped")."""
    import time as _time

    sleep = sleep or _time.sleep
    outcomes: list[str] = []
    for _ in range(rounds):
        if probe():
            q = make_query()
            q.awaitTermination()
            outcomes.append("ran")
        else:
            sleep(poll_s)
            outcomes.append("skipped")
    return outcomes


def job_stream(args: argparse.Namespace) -> dict:
    import tempfile

    from sentiflow_spark.pipeline.batch import documents_as_raw_content
    from sentiflow_spark.streaming.dag import load_stream, streaming_sentiment_flow
    from sentiflow_spark.streaming.sinks import results_sink

    spark = _spark("sentiflow-stream")
    ckpt = args.checkpoint or tempfile.mkdtemp(prefix="sf_ckpt_")

    def make_query():
        docs = load_stream(spark, args.sf_dir, "documents")
        flow = streaming_sentiment_flow(
            documents_as_raw_content(docs), router_threshold=args.router_threshold
        )
        return (
            flow.writeStream.foreachBatch(results_sink(args.out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    if args.health_url:
        from sentiflow_spark.pipeline.model_udfs import probe_health

        outcomes = run_gated_rounds(
            make_query,
            probe=lambda: probe_health(args.health_url),
            rounds=args.health_rounds,
        )
    else:
        outcomes = run_gated_rounds(make_query, probe=lambda: True, rounds=1)
    return {"job": "stream", "rows": spark.read.parquet(args.out).count(),
            "sink": args.out, "checkpoint": ckpt, "rounds": outcomes}


def job_topics(args: argparse.Namespace) -> dict:
    from sentiflow_spark.pipeline.topics import generate_topics
    from sentiflow_spark.streaming.sinks import merge_upsert
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-topics")
    headlines = load(spark, args.sf_dir, "documents")
    if args.stored and os.path.isdir(args.stored):
        stored = spark.read.parquet(args.stored)
    else:  # first run: empty snapshot with the right schema
        stored = spark.createDataFrame([], "url STRING")
    topics = generate_topics(headlines, stored)
    merge_upsert(spark, topics, args.out, key="url")
    return {"job": "topics", "rows": spark.read.parquet(args.out).count(),
            "sink": args.out}


def job_dedup(args: argparse.Namespace) -> dict:
    """Corpus dedup as a runnable job (the training-data-pipeline
    extension, SURVEY §7.2 M5): exact fingerprint dedup, then
    MinHash-LSH near-pair graph, connected-component clusters,
    keep-lowest-id-per-cluster; survivors written out with their
    cluster id for audit."""
    from pyspark.sql import functions as F

    from sentiflow_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-dedup")
    docs = load(spark, args.sf_dir, "documents")
    n_in = docs.count()
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).filter(
        F.col("est_jaccard") >= args.jaccard
    )
    clusters = connected_components(pairs)
    labeled = docs.join(
        clusters, docs.doc_id == clusters.node, "left"
    ).withColumn("cluster_id", F.coalesce("lbl", "doc_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy("doc_id")
    survivors = (
        labeled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*docs.columns, "cluster_id")
    )
    survivors.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    return {"job": "dedup", "rows_in": n_in, "rows_out": n_out,
            "removed": n_in - n_out, "sink": args.out}



def job_curate(args: argparse.Namespace) -> dict:
    """Full production curation DAG as a runnable job (SURVEY §7.2 M5,
    round-6 composition): NFC normalize → bench holdout → Gopher gates
    → exact dedup → MinHash near dedup → span decontamination → domain
    cap → grouped split → sequence packing
    (queries/curation_dag.py::txt_curation_dag, oracle-checked e2e).
    Writes TWO artifacts under --out: corpus/ (kept docs' clean text +
    shard assignment, partitioned by split) and disposition/ (one
    audit row per input doc), and returns the funnel counts."""
    from pyspark.sql import functions as F

    from sentiflow_spark.queries.curation_dag import (
        curation_stages,
        disposition,
    )
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-curate")
    n_in = load(spark, args.sf_dir, "documents").count()
    st = curation_stages(spark, args.sf_dir)  # ONE pipeline pass
    disp = disposition(st).localCheckpoint()
    # post-cut text is re-derived map-side from the shared spans + s5
    # stage objects (their winnow pins are reused): the query path's
    # cut pin is numbers-only, so the corpus text is materialized
    # exactly once, here at the write, instead of riding through the
    # domain-cap window for every disposition-only caller
    from sentiflow_spark.operators.dedup import cut_spans

    corpus_text = cut_spans(
        st["s5"].select("doc_id", "text"), st["spans"]
    ).select("doc_id", "clean_text")
    corpus = st["packed"].join(corpus_text, "doc_id")
    corpus.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.out}/corpus"
    )
    disp.write.mode("overwrite").parquet(f"{args.out}/disposition")
    funnel = {
        r["stage"]: r["n"]
        for r in disp.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {"job": "curate", "rows_in": n_in,
            "rows_out": funnel.get("kept", 0), "funnel": funnel,
            "sink": args.out}


def job_curate_delta(args: argparse.Namespace) -> dict:
    """The INCREMENTAL form of job_curate — the steady-state production
    arrangement (reference: the 300 s fetch loop,
    cmd/producer/main.go:43-49, at curation-DAG fidelity): admit the
    corpus as --batches ascending delta batches against standing
    manifest-backed state under --out/state (additive segment-count
    MERGE, bench-hash set union, per-doc feature MERGE for delta ∪
    boilerplate-stale docs), then PUBLISH the release disposition from
    the manifests. The feature manifest doubles as the curated-corpus
    text store (post-boilerplate text per admitted doc). Converges to
    job_curate exactly — proved by txt_curation_delta's oracle entry
    hash-matching the one-shot DAG oracle."""
    import shutil

    from pyspark.sql import functions as F

    from sentiflow_spark.queries.curation_delta import (
        compact_state,
        publish,
        run_delta_batches,
    )

    if args.compact and args.as_of_gen is not None and (
        args.horizon is None or args.as_of_gen < args.horizon
    ):
        raise SystemExit(
            "curate-delta: --compact vacuums generations below the "
            "retention horizon; pass --horizon H <= --as-of-gen to keep "
            "the release addressable (full --compact keeps no history)"
        )
    if (
        args.auto_compact_gens is not None
        and args.as_of_gen is not None
        and args.as_of_gen < args.batches - 1 - args.auto_compact_gens
    ):
        # fail BEFORE the ingestion, not with VacuumedGenerationError
        # after it: rolling compaction's final horizon is
        # (batches-1) - K, so any as-of read below that is vacuumed by
        # the time publish runs
        raise SystemExit(
            "curate-delta: --auto-compact-gens "
            f"{args.auto_compact_gens} leaves a final rolling horizon "
            f"of {args.batches - 1 - args.auto_compact_gens}; "
            f"--as-of-gen {args.as_of_gen} would be vacuumed before "
            "publish — raise --as-of-gen or --auto-compact-gens"
        )
    if (
        args.auto_compact_gens is not None
        and args.compact
        and args.horizon is not None
        and args.horizon < args.batches - 1 - args.auto_compact_gens
    ):
        # same fail-early rule for the post-ingestion compaction: a
        # re-compaction below the rolling horizon the loop already
        # advanced to raises VacuumedGenerationError only AFTER the
        # whole run
        raise SystemExit(
            "curate-delta: --horizon "
            f"{args.horizon} is below the final rolling horizon "
            f"{args.batches - 1 - args.auto_compact_gens} that "
            f"--auto-compact-gens {args.auto_compact_gens} reaches "
            "during ingestion; the closing --compact would refuse — "
            "raise --horizon (or drop it for a full compact)"
        )
    spark = _spark("sentiflow-curate-delta")
    state = f"{args.out}/state"
    shutil.rmtree(state, ignore_errors=True)
    stats = run_delta_batches(
        spark, args.sf_dir, state, n_batches=args.batches,
        collect_stats=True, auto_compact_gens=args.auto_compact_gens,
    )
    compacted = (
        compact_state(spark, state, horizon=args.horizon)
        if args.compact
        else None
    )
    # An as-of publish must restrict the document universe to the
    # batches <= G (publish()'s contract): docs admitted in later
    # batches have no feature row as of G and would fall through the
    # stage when-chain to a bogus 'exact_dup'. The bound is
    # run_delta_batches' own range arithmetic for batch G's upper edge.
    universe = None
    if args.as_of_gen is not None:
        from sentiflow_spark.tables import load

        docs = load(spark, args.sf_dir, "documents")
        hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        bound = hi * (args.as_of_gen + 1) // args.batches
        universe = docs.filter(F.col("doc_id") < bound)
    disp = publish(
        spark, args.sf_dir, state, as_of_gen=args.as_of_gen,
        universe=universe,
    ).localCheckpoint()
    disp.write.mode("overwrite").parquet(f"{args.out}/disposition")
    funnel = {
        r["stage"]: r["n"]
        for r in disp.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = {"job": "curate-delta", "batches": stats, "funnel": funnel,
           "rows_out": funnel.get("kept", 0), "sink": args.out}
    if compacted is not None:
        out["compacted"] = compacted
    if args.as_of_gen is not None:
        out["as_of_gen"] = args.as_of_gen
    return out


def job_gate_media(args: argparse.Namespace) -> dict:
    """Multimodal admission as a runnable job — the media twin of
    job_curate: run the composed gate (magic-byte container detection
    → builtin-only header parse → modality bounds;
    queries/multimodal_queries.py::mm_gate_flow, oracle-checked e2e
    batch AND streaming) and write TWO artifacts under --out:
    manifest/ (one dispositioned row per blob, partitioned by
    modality) and a rejects/ summary (drop counts per
    modality × reason — what a crawl operator tunes thresholds from).
    Returns the admission funnel."""
    from pyspark.sql import functions as F

    from sentiflow_spark.queries.multimodal_queries import mm_gate_flow
    from sentiflow_spark.tables import load

    spark = _spark("sentiflow-gate-media")
    docs = load(spark, args.sf_dir, "documents").select("doc_id")
    gate = mm_gate_flow(docs).localCheckpoint()
    gate.write.mode("overwrite").partitionBy("modality").parquet(
        f"{args.out}/manifest"
    )
    rejects = (
        gate.filter(~F.col("admitted"))
        .groupBy("modality", "reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rejects.write.mode("overwrite").parquet(f"{args.out}/rejects")
    funnel = {
        f"{r['modality']}/{r['reason']}": r["n"] for r in rejects.collect()
    }
    n_in = gate.count()
    n_ok = gate.filter(F.col("admitted")).count()
    return {"job": "gate-media", "rows_in": n_in, "rows_out": n_ok,
            "rejected": funnel, "sink": args.out}


def job_compact(args: argparse.Namespace) -> dict:
    """Small-file maintenance as a runnable job: rewrite --src into
    size-targeted files at --out (sources/files.py::compact), sorted
    by --sort-by when given for min/max file skipping."""
    from sentiflow_spark.sources.files import compact, dir_bytes

    spark = _spark("sentiflow-compact")
    if not args.src:
        raise SystemExit("compact requires --src")
    sort_by = args.sort_by.split(",") if args.sort_by else ()
    n = compact(
        spark, args.src, args.out,
        target_file_mb=args.target_file_mb, sort_by=sort_by,
    )
    return {"job": "compact", "files_out": n,
            "bytes": dir_bytes(spark, args.out), "sink": args.out}


def job_audit(args: argparse.Namespace) -> dict:
    """Data-quality gate as a runnable job: run the rel_dq_audit
    expectation suite, write the report, and fail (exit code 1) when
    any check reports violations — the publish gate a pipeline runs
    before promoting a snapshot."""
    from sentiflow_spark.queries.registry import load_all

    spark = _spark("sentiflow-audit")
    report = load_all()["rel_dq_audit"].fn(spark, args.sf_dir)
    report.write.mode("overwrite").parquet(args.out)
    # gate on the 6-row parquet just written — never re-execute the
    # five-table audit plan a second time
    rows = {
        r["check_name"]: r["n_violations"]
        for r in spark.read.parquet(args.out).collect()
    }
    failed = {k: v for k, v in rows.items() if v > 0}
    result = {"job": "audit", "checks": rows, "failed": sorted(failed),
              "ok": not failed, "sink": args.out}
    if failed and not args.allow_violations:
        print(json.dumps(result))
        raise SystemExit(1)
    return result


def job_sql(args: argparse.Namespace) -> dict:
    """Ad-hoc SQL as a runnable job: register the synthetic tables as
    views (sentiflow_spark/sql.py), run one statement, write the result
    to parquet. The switch-and-keep-your-SQL path for portable ANSI
    statements (the registry's oracle strings are DuckDB dialect and
    are not guaranteed to parse here — see sentiflow_spark/sql.py)."""
    from sentiflow_spark.sql import run_sql

    if not args.execute:
        raise SystemExit("sql job requires -e/--execute STATEMENT")
    spark = _spark("sentiflow-sql")
    df = run_sql(spark, args.sf_dir, args.execute)
    df.write.mode("overwrite").parquet(args.out)
    return {
        "job": "sql",
        "rows": spark.read.parquet(args.out).count(),
        "columns": df.columns,
        "sink": args.out,
    }


JOBS = {
    "audit": job_audit,
    "compact": job_compact,
    "curate": job_curate,
    "curate-delta": job_curate_delta,
    "gate-media": job_gate_media,
    "dedup": job_dedup,
    "ingest": job_ingest,
    "pipeline": job_pipeline,
    "sql": job_sql,
    "stream": job_stream,
    "topics": job_topics,
}


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="sentiflow_spark.jobs")
    ap.add_argument("job", choices=sorted(JOBS))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--out", required=True, help="output table path")
    ap.add_argument("--stored", default=None, help="stored-topics snapshot path")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--router-threshold", type=int, default=256)
    ap.add_argument("--kafka-brokers", default=None)
    ap.add_argument("--health-url", default=None,
                    help="model health endpoint; gates stream rounds (F4)")
    ap.add_argument("--health-rounds", type=int, default=1,
                    help="number of gated availableNow rounds (stream job)")
    ap.add_argument("--report-total", action="store_true",
                    help="ingest: also report cumulative table count (extra scan)")
    ap.add_argument("--jaccard", type=float, default=0.9, help="near-dup threshold (dedup job)")
    ap.add_argument("--batches", type=int, default=3,
                    help="delta batches (curate-delta job)")
    ap.add_argument("--as-of-gen", type=int, default=None,
                    help="publish the release as of admission "
                         "generation G (curate-delta job)")
    ap.add_argument("--compact", action="store_true",
                    help="LSM-compact the standing state before "
                         "publish (curate-delta job; without "
                         "--horizon, discards all as-of history)")
    ap.add_argument("--horizon", type=int, default=None,
                    help="retention horizon for --compact: collapse "
                         "generations <= H into the base, keep later "
                         "ones as-of addressable (curate-delta job)")
    ap.add_argument("--auto-compact-gens", type=int, default=None,
                    help="rolling LSM compaction during ingestion: "
                         "whenever the state exceeds K+1 generation "
                         "partitions, compact all but the newest K "
                         "into the base (curate-delta job)")
    ap.add_argument("--src", default=None, help="input directory (compact job)")
    ap.add_argument("--sort-by", default=None, help="comma-separated sort keys (compact job)")
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("-e", "--execute", default=None,
                    help="SQL statement to run over the table views (sql job)")
    ap.add_argument("--allow-violations", action="store_true",
                    help="audit: report violations without failing")
    args = ap.parse_args(argv)
    result = JOBS[args.job](args)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
