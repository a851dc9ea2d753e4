"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video columns are carried as ``binary`` with typed
metadata columns alongside. The Spark-side machinery here is real —
schemas, Arrow batch iteration via ``mapInPandas``, partition-friendly
batch shapes — while the actual codec step is STUBBED: the container
has no image/audio libraries, so ``decode_image_meta`` derives
deterministic fake dimensions from the payload bytes and
``decode_image_pixels`` raises ``NotImplementedError`` where a real
pipeline would call PIL/ffmpeg. Swapping the stub for a real decoder
changes nothing about the Spark plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def attach_payload(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload —
    the schema/partitioning shape a real image column would have."""
    return docs.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload")
    )


def decode_image_meta(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, channels) from
    the byte length. A real implementation would parse the container
    header (PNG IHDR / JPEG SOF) — not available in this environment."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, 3


def decode_image_pixels(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "pixel decode requires an image library (PIL/libjpeg) not present "
        "in this container; the Spark plumbing around it is real and tested"
    )


def image_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column
    (mapInPandas: one pandas batch per Arrow chunk — the real plan
    shape for any codec UDF at scale)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [decode_image_meta(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "channels": pd.Series([m[2] for m in meta], dtype="int32"),
                }
            )

    return docs_with_payload.mapInPandas(batches, IMAGE_META_SCHEMA)


def audio_chunk_plan(
    docs_with_payload: DataFrame,
    *,
    sample_rate: int = 16_000,
    chunk_seconds: int = 30,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio-style chunking PLAN: treat the payload as 16-bit mono PCM
    and emit one row per fixed-duration chunk with its sample range —
    the row-explosion shape of a whisper-style segmenter. The codec
    step (actual resample/decode) stays behind the stub boundary."""
    samples = (F.length("payload") / bytes_per_sample).cast("long")
    chunk = sample_rate * chunk_seconds
    n_chunks = F.ceil(samples / F.lit(chunk)).cast("int")
    start = F.col("chunk_idx").cast("long") * chunk
    return (
        docs_with_payload.select(
            "doc_id",
            samples.alias("n_samples"),
            F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("start_sample"),
            F.least(start + chunk, F.col("n_samples")).alias("end_sample"),
        )
    )


def resize_spec(
    docs_with_payload: DataFrame, *, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize + letterbox SPEC from the (stubbed)
    decoded dimensions: pure column math producing the geometry a
    vision-preprocessing UDF would apply per image."""
    n = F.length("payload")
    w = (n % 640 + 1).cast("double")
    h = (n % 480 + 1).cast("double")
    scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
    new_w = F.floor(w * scale).cast("int")
    new_h = F.floor(h * scale).cast("int")
    return docs_with_payload.select(
        "doc_id",
        w.cast("int").alias("src_w"),
        h.cast("int").alias("src_h"),
        F.round(scale, 6).alias("scale"),
        new_w.alias("dst_w"),
        new_h.alias("dst_h"),
        ((F.lit(target_w) - new_w) / 2).cast("int").alias("pad_left"),
        ((F.lit(target_h) - new_h) / 2).cast("int").alias("pad_top"),
    )


def frame_sample_plan(docs_with_payload: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-style frame sampling PLAN: explodes deterministic frame
    indices per payload (the partition/row-explosion shape of a frame
    sampler) with the decode left to the stubbed codec."""
    n_frames = (F.length("payload") % 100 + 1).cast("int")
    return docs_with_payload.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))).alias("frame_idx"),
    )
