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
