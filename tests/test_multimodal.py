"""Multimodal binary plumbing: the parts SQL oracles can't check —
exact resized byte content and Arrow-input pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiflow_spark.operators.multimodal import (
    attach_binary,
    resample_bytes,
    resize_images,
)
from sentiflow_spark.plans import introspect as I
from sentiflow_spark.tables import load


def test_resize_payload_bytes_exact(spark, sf_dir):
    """The resized BINARY column is byte-for-byte the deterministic
    resample of the source payload (truncate-or-tile to 32*24)."""
    media = attach_binary(load(spark, sf_dir, "documents")).filter(
        "doc_id < 20"
    )
    src = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_images(media, width=32, height=24).collect()
    assert len(out) == len(src)
    for r in out:
        expected = resample_bytes(src[r["doc_id"]], 32 * 24)
        assert bytes(r["payload"]) == expected
        assert r["out_bytes"] == 768
        assert r["in_bytes"] == len(src[r["doc_id"]])


def test_resize_empty_payload(spark):
    """Zero-length media must not crash the batch: it resamples to a
    zero-filled buffer of the target size."""
    assert resample_bytes(b"", 12) == b"\x00" * 12
    df = spark.createDataFrame([(1, b""), (2, b"ab")], "doc_id: long, payload: binary")
    rows = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(df, 2, 3).collect()}
    assert rows[1] == b"\x00" * 6
    assert rows[2] == b"ababab"


def test_resize_prunes_scan_to_udf_inputs(spark, sf_dir):
    """Arrow ships only (doc_id, payload-source) columns to the UDF."""
    media = attach_binary(load(spark, sf_dir, "documents"))
    df = resize_images(media)
    cols = I.scan_read_columns(df)[0]
    assert set(cols) == {"doc_id", "text"}
    assert I.python_eval_count(df) == 0  # mapInPandas, not a row UDF
