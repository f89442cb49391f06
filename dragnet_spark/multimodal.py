"""Multimodal (binary) column plumbing: opaque media payloads with
typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas`` — the pattern a 100 TB training-data pipeline uses for
image/audio/video columns.

Real codec libraries (PIL/ffmpeg/torchaudio) are not in this container,
so the *decode step* is stubbed two ways, both clearly marked:

* payloads with the deterministic ``FIMG`` magic are decoded by
  :func:`_decode_fimg` (a real binary parse with NumPy — the Spark-side
  plumbing under test: schema, batching, vectorized byte handling);
* any other magic routes to :func:`decode_with_library`, which raises
  ``NotImplementedError`` unless a real image library is importable.

At scale the payload column lives in parquet/Iceberg as ``binary`` next
to its metadata struct; scans prune it unless the decode stage is in
the plan, and ``maxPartitionBytes``/``columnarReaderBatchSize`` are
sized for MB-wide rows (see session.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MAGIC = b"FIMG"
_FRAME_BYTES = 16

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("byte_len", IntegerType(), False),
    StructField("payload", BinaryType(), False),
])

FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("n_frames", IntegerType(), False),
    StructField("aspect_micro", LongType(), False),
    StructField("mean_byte", DoubleType(), False),
    StructField("byte_len", IntegerType(), False),
])


def fake_payload(doc_id: int) -> bytes:
    """Deterministic synthetic media blob for doc_id: FIMG magic,
    uint16 width/height, uint8 frame count, then n_frames*16 bytes of a
    constant fill byte (the stand-in for pixel data)."""
    width = 64 + (doc_id * 7) % 192
    height = 64 + (doc_id * 13) % 128
    n_frames = 1 + doc_id % 8
    fill = (doc_id * 31) % 251
    header = MAGIC + struct.pack("<HHB", width, height, n_frames)
    return header + bytes([fill]) * (n_frames * _FRAME_BYTES)


def decode_with_library(payload: bytes) -> dict:
    """Decode a REAL media payload (PNG/JPEG/...).  STUB: the container
    has no imaging libraries; the Spark-side plumbing is exercised via
    the FIMG path instead."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media decode requires an imaging library not present "
            "in this environment; only FIMG synthetic payloads are "
            "decodable here") from exc
    raise NotImplementedError("real decode path not wired yet")


def _decode_fimg(payload: bytes) -> tuple[int, int, int, float]:
    width, height, n_frames = struct.unpack_from("<HHB", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8, offset=9)
    return width, height, n_frames, float(body.mean())


def attach_media_payload(docs: DataFrame) -> DataFrame:
    """Ingest stage: synthesize the binary media column (in production
    this is the parquet/Iceberg binary column as written by ingest)."""
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [fake_payload(int(i)) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": ["image/fimg"] * len(pdf),
                "byte_len": [len(p) for p in payloads],
                "payload": payloads,
            })

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


def decode_media_features(media: DataFrame) -> DataFrame:
    """Decode stage: vectorized batch parse of the binary column into
    typed features.  Unknown magics raise via decode_with_library."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:4] == MAGIC:
                    w, h, nf, mean = _decode_fimg(raw)
                else:  # pragma: no cover - stub path
                    decode_with_library(raw)
                    continue
                rows.append({
                    "doc_id": int(doc_id), "width": w, "height": h,
                    "n_frames": nf,
                    "aspect_micro": (w * 1_000_000) // h, "mean_byte": mean,
                    "byte_len": len(raw)})
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA])

    return media.mapInPandas(decode, FEATURES_SCHEMA)


def q_media_features(spark, sf_dir: str) -> DataFrame:
    """documents -> synthetic binary media column -> decoded features.
    The oracle recomputes the features arithmetically from doc_id, so
    equality proves the pack -> binary -> parse roundtrip."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_media_features(attach_media_payload(docs))


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_mean", DoubleType(), False),
    StructField("out_width", IntegerType(), False),
    StructField("out_height", IntegerType(), False),
])


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sample + resize stage (the video-pipeline pattern): every
    ``stride``-th frame of each payload is sliced out of the binary
    body (a per-frame NumPy view, no copy of the rest), its pixel mean
    computed, and the 'resized' half-resolution dims emitted — one
    output row per sampled frame (a UDTF-shaped 1->N mapInPandas).
    The real resample kernel is the same stubbed decode boundary as
    decode_with_library; the Spark-side plumbing (binary slicing,
    batch fan-out, schema) is real and oracle-checked."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:4] != MAGIC:  # pragma: no cover - stub path
                    decode_with_library(raw)
                    continue
                w, h, nf = struct.unpack_from("<HHB", raw, 4)
                body = np.frombuffer(raw, dtype=np.uint8,
                                     offset=9).reshape(nf, _FRAME_BYTES)
                for i in range(0, nf, stride):
                    rows.append({
                        "doc_id": int(doc_id), "frame_idx": i,
                        "frame_mean": float(body[i].mean()),
                        "out_width": max(1, w // 2),
                        "out_height": max(1, h // 2)})
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return media.mapInPandas(fn, FRAME_SCHEMA)


def q_media_frame_sample(spark, sf_dir: str) -> DataFrame:
    """documents -> binary media column -> stride-2 frame sampling with
    half-resolution resize dims; oracle recomputes arithmetically from
    doc_id (frames are deterministic fill bytes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_frames(attach_media_payload(docs))
