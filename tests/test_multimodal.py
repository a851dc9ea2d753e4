"""Multimodal plumbing: binary payload attach, Arrow-batched metadata
extraction, frame/audio-chunk explosion plans, resize geometry, and
the documented codec stub boundary."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.extensions import multimodal
from tests.conftest import load


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return multimodal.attach_payload(load(spark, sf_dir, "documents"))


def test_payload_is_binary(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"


def test_image_metadata_arrow_batches(payloads):
    meta = multimodal.image_metadata(payloads)
    rows = meta.collect()
    assert len(rows) == payloads.count()
    for r in rows[:20]:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["channels"] == 3 and r["byte_len"] > 0


def test_pixel_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_pixels(b"\x89PNG")


def test_audio_chunks_cover_all_samples(spark, payloads):
    chunks = multimodal.audio_chunk_plan(
        payloads, sample_rate=16_000, chunk_seconds=30
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.max("end_sample").alias("last_end"),
            F.min("start_sample").alias("first_start"),
            F.count("*").alias("n_chunks"),
        )
        .join(
            payloads.select(
                "doc_id", (F.length("payload") / 2).cast("long").alias("n_samples")
            ),
            "doc_id",
        )
    )
    bad = agg.filter(
        (F.col("first_start") != 0) | (F.col("last_end") != F.col("n_samples"))
    ).count()
    assert bad == 0
    # chunk ranges never overlap and are 480000 samples except the tail
    sizes = chunks.select(
        (F.col("end_sample") - F.col("start_sample")).alias("sz")
    ).agg(F.max("sz")).collect()[0][0]
    assert sizes <= 480_000


def test_resize_spec_fits_target(payloads):
    spec = multimodal.resize_spec(payloads, target_w=224, target_h=224)
    bad = spec.filter(
        (F.col("dst_w") > 224)
        | (F.col("dst_h") > 224)
        | (F.col("pad_left") < 0)
        | (F.col("pad_top") < 0)
    ).count()
    assert bad == 0
    # aspect preserved within rounding: the larger side hits the target
    off = spec.filter((F.col("dst_w") < 223) & (F.col("dst_h") < 223)).count()
    assert off == 0
