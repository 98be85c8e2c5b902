"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio/video libraries (Pillow, ffmpeg, ...),
so the decode step is a clearly marked STUB — a deterministic fake that
exercises the REAL Spark plumbing end to end: binary column handling,
Arrow batch transfer of bytes into pandas, mapInPandas batch shape,
output schema, and partition-preserving metadata extraction.

Swap `_fake_decode_image` for a real decoder (e.g. PIL + numpy) on a
cluster with the libs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, modality string, n_bytes int, payload_sha string, "
    "width int, height int, n_frames int, decode_ok boolean"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload column (here: utf-8 bytes of the
    text — in production this is the real image/audio bytes column) plus a
    modality tag."""
    return docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake dimensions from the byte length.

    A real implementation would do:
        raise NotImplementedError("install pillow/av for real decode")
    then decode to numpy and measure. The arithmetic fake keeps the
    pipeline testable offline.
    """
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)


def decode_metadata_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: whole Arrow batches of binary payloads in, typed
    metadata out. Vectorized where possible (lengths, hashes via pandas
    map over bytes objects — C-level per element)."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        sha = pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": n_bytes.astype("int32"),
                "payload_sha": sha,
                "width": (n_bytes % 640 + 1).astype("int32"),
                "height": (n_bytes * 7 % 480 + 1).astype("int32"),
                "n_frames": (n_bytes % 30 + 1).astype("int32"),
                "decode_ok": True,
            }
        )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> binary payload -> stub decode -> typed metadata rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_payload(docs).mapInPandas(decode_metadata_map, META_SCHEMA)


FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes int, mean_byte double, "
    "hist_str string, pooled_str string, sampled_sha string"
)
HIST_BINS = 8  # byte-value histogram: code // 32 -> bins 0..7
POOL_BUCKETS = 8  # 'resize': block-mean pool the byte raster to 8 buckets
FRAME_STRIDE = 16  # 'frame-sample': every 16th byte


def features_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature-extraction stage over the (fake-)decoded byte
    raster — REAL vectorized numpy per payload: histogram (np.bincount),
    block-mean pooling (the 1-D analog of image resize), stride frame
    sampling + hash. Only the format decode is faked (np.frombuffer
    instead of PIL/av — this sandbox has neither); every downstream
    array op is exactly what a real raster would get."""
    import numpy as np

    for pdf in batches:
        out_rows = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            arr = np.frombuffer(payload, dtype=np.uint8)
            n = arr.size
            if n:
                mean_byte = round(float(arr.mean()), 6)
                hist = np.bincount(arr // 32, minlength=HIST_BINS)[:HIST_BINS]
                hist_str = ",".join(str(int(c)) for c in hist)
                bucket = np.arange(n, dtype=np.int64) * POOL_BUCKETS // n
                # pooled block SUMS (integer-exact — no FP formatting to
                # keep bit-identical across engines; mean = sum/count is
                # derivable, counts are n//8-balanced by construction)
                sums = np.bincount(bucket, weights=arr, minlength=POOL_BUCKETS)
                pooled_str = ",".join(str(int(s)) for s in sums[:POOL_BUCKETS])
            else:
                mean_byte = None
                hist_str = ",".join(["0"] * HIST_BINS)
                pooled_str = ",".join(["0"] * POOL_BUCKETS)
            sampled_sha = hashlib.sha256(bytes(arr[::FRAME_STRIDE])).hexdigest()
            out_rows.append(
                (doc_id, modality, n, mean_byte, hist_str, pooled_str, sampled_sha)
            )
        yield pd.DataFrame(
            out_rows,
            columns=[
                "doc_id", "modality", "n_bytes", "mean_byte",
                "hist_str", "pooled_str", "sampled_sha",
            ],
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> payload -> decode(raster) -> feature extraction:
    byte-value histogram, block-mean 'resize' pooling, stride 'frame
    sampling' + content hash. The DuckDB oracle replays the identical
    arithmetic over char codes (the corpus is ASCII, so char codes ==
    payload bytes — asserted cheaply by n_bytes matching length())."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_payload(docs).mapInPandas(features_map, FEATURES_SCHEMA)
