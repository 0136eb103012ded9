"""The job CLI (python -m sentiflow_spark.jobs ...) — the reference's
three binaries. Run in-process against temp sinks; idempotence of the
MERGE path is asserted by re-running."""

from __future__ import annotations

import shutil
import tempfile

from sentiflow_spark.jobs import main


def _run(argv):
    return main(argv)


def test_ingest_then_pipeline(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sf_jobs_")
    try:
        r1 = _run(["ingest", "--sf-dir", sf_dir, "--out", f"{d}/raw"])
        assert r1["rows"] == 500
        r2 = _run(["pipeline", "--sf-dir", sf_dir, "--out", f"{d}/results"])
        assert r2["rows"] == 500
        # MERGE idempotence: replaying the job converges, no duplicates
        r3 = _run(["pipeline", "--sf-dir", sf_dir, "--out", f"{d}/results"])
        assert r3["rows"] == 500
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_job_matches_batch(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sf_jobs_")
    try:
        rb = _run(["pipeline", "--sf-dir", sf_dir, "--out", f"{d}/batch"])
        rs = _run(["stream", "--sf-dir", sf_dir, "--out", f"{d}/stream"])
        assert rs["rows"] == rb["rows"]
        b = spark.read.parquet(f"{d}/batch").select(
            "content_id", "sentiment_score", "sentiment_label", "was_summarized"
        )
        s = spark.read.parquet(f"{d}/stream").select(
            "content_id", "sentiment_score", "sentiment_label", "was_summarized"
        )
        assert b.exceptAll(s).count() == 0
        assert s.exceptAll(b).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_topics_job_anti_join_semantics(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sf_jobs_")
    try:
        r1 = _run(["topics", "--sf-dir", sf_dir, "--out", f"{d}/topics"])
        assert r1["rows"] > 0
        # second run with the first run's output as the stored snapshot:
        # every url is already stored → anti-join drops everything, and
        # the MERGE leaves the table unchanged
        r2 = _run([
            "topics", "--sf-dir", sf_dir, "--out", f"{d}/topics",
            "--stored", f"{d}/topics",
        ])
        assert r2["rows"] == r1["rows"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_job_rewrites_fragmented_dir(spark, sf_dir):
    """CLI wiring for the maintenance job: a 64-file fragmented copy of
    lineitem is rewritten to size-targeted files with rows preserved."""
    d = tempfile.mkdtemp(prefix="sf_jobs_")
    try:
        src = f"{d}/fragmented"
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li.repartition(64).write.parquet(src)
        r = _run([
            "compact", "--src", src, "--out", f"{d}/compacted",
            "--sort-by", "l_shipdate", "--target-file-mb", "128",
        ])
        assert r["files_out"] >= 1
        assert r["bytes"] > 0
        out = spark.read.parquet(f"{d}/compacted")
        assert out.count() == li.count()
        import glob

        assert len(glob.glob(f"{d}/compacted/*.parquet")) == r["files_out"] < 64
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_job_matches_cluster_query(spark, sf_dir):
    """The dedup job's survivor set = one doc per cluster of the
    oracle-checked dd_duplicate_clusters query (lowest doc_id wins),
    and survivors carry their cluster_id for audit."""
    from pyspark.sql import functions as F

    from sentiflow_spark.queries.registry import load_all

    d = tempfile.mkdtemp(prefix="sf_jobs_")
    try:
        r = _run(["dedup", "--sf-dir", sf_dir, "--out", f"{d}/dedup"])
        assert r["rows_in"] == r["rows_out"] + r["removed"]

        clusters = load_all()["dd_duplicate_clusters"].fn(spark, sf_dir)
        expected = {
            row["m"]
            for row in clusters.groupBy("cluster_id")
            .agg(F.min("doc_id").alias("m"))
            .collect()
        }
        out = spark.read.parquet(f"{d}/dedup")
        got = {row["doc_id"] for row in out.select("doc_id").collect()}
        assert got == expected
        # every survivor is the minimum of its own cluster label
        assert out.filter(F.col("doc_id") != F.col("cluster_id")).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
