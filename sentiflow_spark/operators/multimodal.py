"""Multimodal column plumbing (SURVEY §7.2 M5).

Convention for opaque media in a 100 TB corpus: a ``binary`` payload
column + typed metadata struct, processed with Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-by-row.
Real decoders (PIL/ffmpeg/torchaudio) are not in this environment —
the decode step is a clearly-marked deterministic stand-in behind an
import-try (``_decode_image``), while everything Spark-side (schema,
batch iteration, partitioning, column pruning before the UDF) is real.

Scale notes:
- the UDF input is pruned to (id, payload) *before* mapInPandas so
  Arrow only ships the bytes that are needed,
- feature extraction is per-row independent → embarrassingly parallel,
  no shuffle; repartition upstream only to balance payload-size skew,
- output schema is declared, so downstream stays fully relational.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """documents → multimodal record: payload as binary + typed metadata.
    (In production the payload column comes from the storage layer;
    here the text bytes stand in as the opaque media blob.)"""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("image/x-fake").alias("mime"),
            F.octet_length("text").alias("size_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _decode_image(payload: bytes) -> tuple[int, int, int]:
    """Decode stub. A real deployment plugs PIL/ffmpeg in here; this
    environment has neither, so dimensions are a deterministic pure
    function of the bytes (keeps the full pipeline oracle-checkable)."""
    try:  # pragma: no cover - decoder libs absent in this environment
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally out of scope here; "
            "swap _decode_image for a PIL-based implementation"
        )
    except ImportError:
        n = len(payload)
        width = 1 + n % 64
        height = 1 + n % 48
        n_frames = 1 + n % 16
        return width, height, n_frames


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload."""
    pruned = media.select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_decode_image(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return pruned.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit every ``every``-th
    frame (a 1→N row explosion inside mapInPandas, the UDTF shape).
    The frame decode is the same deterministic stand-in as
    ``_decode_image`` — frame count derives from the byte length and
    each frame's content hash from (payload, index) — so the whole
    explode+hash round trip stays oracle-checkable. Scale note: output
    is at most ``ceil(16 / every)×`` the input row count (4× at the
    default; 16× only at every=1) and each output row is tiny
    (id + hash), so no repartition is needed before downstream
    aggregation."""
    pruned = media.select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(p)
                n_frames = 1 + len(blob) % 16  # mirrors _decode_image
                for i in range(0, n_frames, every):
                    ids.append(did)
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(blob + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return pruned.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("in_bytes", T.LongType(), False),
        T.StructField("out_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resample_bytes(payload: bytes, n: int) -> bytes:
    """Deterministic stand-in for pixel resampling: cycle the source
    bytes to exactly ``n`` (truncate when shrinking, tile when
    growing). Swap for a PIL ``Image.resize`` in a real deployment —
    the Spark-side contract (binary in, binary out, exact target
    size) is what this module pins."""
    if not payload:
        return b"\x00" * n
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(media: DataFrame, width: int = 32, height: int = 24) -> DataFrame:
    """Arrow-batched 'resize': every payload becomes exactly
    ``width*height`` bytes. Input pruned to (doc_id, payload) so the
    Arrow exchange ships only what the UDF reads; output carries the
    REAL resized binary plus size metadata, so downstream operators
    (storage, hashing, further UDFs) exercise true binary columns."""
    pruned = media.select("doc_id", "payload")
    n = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            out = [resample_bytes(p, n) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                    "in_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "out_bytes": pd.Series([len(o) for o in out], dtype="int64"),
                    "payload": out,
                }
            )

    return pruned.mapInPandas(batches, RESIZE_SCHEMA)
