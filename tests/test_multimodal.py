"""Multimodal plumbing: binary payload attach, real PNG/JPEG header
parsing, Arrow-batched metadata extraction, frame/audio-chunk explosion
plans, resize geometry, and the documented pixel-codec stub boundary."""

import struct

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.extensions import multimodal
from tests.conftest import load


def png_bytes(w: int, h: int, color_type: int = 6, bit_depth: int = 8) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", w, h)
        + bytes([bit_depth, color_type, 0, 0, 0])
    )


def jpeg_bytes(w: int, h: int, ncomp: int = 3) -> bytes:
    sof_payload = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + b"\x00" * (3 * ncomp)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"  # skippable segment
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof0


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return multimodal.attach_payload(load(spark, sf_dir, "documents"))


def test_payload_is_binary(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"


class TestHeaderParse:
    """Golden-bytes tests for the struct-based container-header parser
    (no image library involved)."""

    def test_png_ihdr(self):
        assert multimodal.decode_image_meta(png_bytes(640, 480)) == (640, 480, 4)
        assert multimodal.decode_image_meta(png_bytes(1, 1, color_type=0)) == (1, 1, 1)
        assert multimodal.decode_image_meta(png_bytes(65535, 2, color_type=2)) == (65535, 2, 3)

    def test_jpeg_sof_marker_walk(self):
        assert multimodal.decode_image_meta(jpeg_bytes(1920, 1080)) == (1920, 1080, 3)
        assert multimodal.decode_image_meta(jpeg_bytes(8, 8, ncomp=1)) == (8, 8, 1)

    def test_unrecognized_payload_is_null_not_fake(self):
        assert multimodal.decode_image_meta(b"just some text bytes") == (None, None, None)
        assert multimodal.decode_image_meta(b"") == (None, None, None)
        # truncated PNG signature only — no IHDR to read
        assert multimodal.decode_image_meta(b"\x89PNG\r\n\x1a\n\x00\x00") == (None, None, None)
        # JPEG SOI but stream ends before any SOF
        assert multimodal.decode_image_meta(b"\xff\xd8\xff\xe0\x00\x04JF") == (None, None, None)

    def test_png_header_expr_roundtrips_through_parser(self, spark):
        """The JVM-side header synthesizer and the Python parser agree
        bit-for-bit: build headers from columns, decode them back."""
        df = spark.range(1, 50).select(
            F.col("id").alias("doc_id"),
            multimodal.png_header_expr(
                (F.col("id") % 640 + 1).cast("int"), (F.col("id") % 480 + 1).cast("int")
            ).alias("payload"),
        )
        meta = multimodal.image_metadata(df)
        rows = meta.collect()
        assert len(rows) == 49
        for r in rows:
            assert r["width"] == r["doc_id"] % 640 + 1
            assert r["height"] == r["doc_id"] % 480 + 1
            assert r["channels"] == 4 and r["byte_len"] == 29


def test_image_metadata_arrow_batches(payloads):
    # text payloads are not image containers: dims must be NULL
    meta = multimodal.image_metadata(payloads)
    rows = meta.collect()
    assert len(rows) == payloads.count()
    for r in rows[:20]:
        assert r["width"] is None and r["height"] is None and r["channels"] is None
        assert r["byte_len"] > 0


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


def test_resize_spec_fits_target(spark):
    meta = spark.range(1, 200).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 1920 + 1).cast("int").alias("width"),
        ((F.col("id") * 53) % 1080 + 1).cast("int").alias("height"),
    )
    spec = multimodal.resize_spec(meta, target_w=224, target_h=224)
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


def test_jpeg_fill_bytes_before_marker(spark=None):
    """ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code; the SOF walk must skip them."""
    import struct as _s

    sof_payload = bytes([8]) + _s.pack(">HH", 1080, 1920) + bytes([3]) + b"\x00" * 9
    padded = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xe0" + _s.pack(">H", 4) + b"JF"   # APP0 with 2 fill bytes
        + b"\xff\xff\xc0" + _s.pack(">H", 2 + len(sof_payload)) + sof_payload
    )
    assert multimodal.decode_image_meta(padded) == (1920, 1080, 3)


class TestWavHeader:
    def test_canonical_44_byte_header(self):
        import struct as _s

        hdr = (
            b"RIFF" + _s.pack("<I", 36 + 8000) + b"WAVE"
            + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
            + b"data" + _s.pack("<I", 8000)
        )
        assert multimodal.decode_audio_meta(hdr) == (44100, 2, 16, 2000, 45)

    def test_chunk_walk_skips_odd_sized_list_chunk(self):
        """RIFF chunks are word-aligned: an odd-sized chunk pads one
        byte, and the walk must honor it to land on fmt/data."""
        import struct as _s

        hdr = (
            b"RIFF" + _s.pack("<I", 0) + b"WAVE"
            + b"LIST" + _s.pack("<I", 3) + b"abc\x00"  # odd size + pad
            + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            + b"data" + _s.pack("<I", 32000)
        )
        assert multimodal.decode_audio_meta(hdr) == (16000, 1, 16, 16000, 1000)

    def test_unrecognized_payload_is_null_not_fake(self):
        assert multimodal.decode_audio_meta(b"not audio at all") == (
            None, None, None, None, None,
        )
        assert multimodal.decode_audio_meta(b"RIFFxxxxWAVE") == (
            None, None, None, None, None,
        )

    def test_wav_header_expr_roundtrips_through_parser(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, 16000, 1, 16000), (2, 44100, 2, 441)],
            "doc_id long, rate int, ch int, n long",
        ).select(
            "doc_id",
            multimodal.wav_header_expr(
                F.col("rate"), F.col("ch"), F.col("n")
            ).alias("payload"),
        )
        rows = {r.doc_id: r for r in multimodal.audio_metadata(df).collect()}
        assert (
            rows[1].sample_rate, rows[1].channels, rows[1].n_samples,
            rows[1].duration_ms, rows[1].byte_len,
        ) == (16000, 1, 16000, 1000, 44)
        assert (rows[2].sample_rate, rows[2].channels, rows[2].n_samples) == (
            44100, 2, 441,
        )
        assert rows[2].duration_ms == 441 * 1000 // 44100


class TestMp4Header:
    def test_hand_built_boxes(self):
        import struct as _s

        mvhd = _s.pack(">I", 108) + b"mvhd" + b"\x00" * 12 + _s.pack(">II", 90000, 180000) + b"\x00" * 80
        p = (
            _s.pack(">I", 16) + b"ftyp" + b"avc1" + _s.pack(">I", 512)
            + _s.pack(">I", 8 + 108) + b"moov" + mvhd
        )
        assert multimodal.decode_video_meta(p) == ("avc1", 90000, 180000, 2000)

    def test_unknown_boxes_are_skipped(self):
        import struct as _s

        free = _s.pack(">I", 12) + b"free" + b"abcd"
        mvhd = _s.pack(">I", 108) + b"mvhd" + b"\x00" * 12 + _s.pack(">II", 600, 1234) + b"\x00" * 80
        p = (
            _s.pack(">I", 16) + b"ftyp" + b"isom" + _s.pack(">I", 0)
            + free
            + _s.pack(">I", 8 + 12 + 108) + b"moov" + free + mvhd
        )
        assert multimodal.decode_video_meta(p) == ("isom", 600, 1234, 1234 * 1000 // 600)

    def test_garbage_yields_nulls(self):
        assert multimodal.decode_video_meta(b"definitely not mp4") == (
            None, None, None, None,
        )

    def test_mp4_header_expr_roundtrips_through_parser(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, 90000, 450000), (2, 600, 600)], "doc_id long, ts long, dur long"
        ).select(
            "doc_id",
            multimodal.mp4_header_expr(F.col("ts"), F.col("dur")).alias("payload"),
        )
        rows = {r.doc_id: r for r in multimodal.video_metadata(df).collect()}
        assert (rows[1].brand, rows[1].timescale, rows[1].duration, rows[1].duration_ms) == (
            "isom", 90000, 450000, 5000,
        )
        assert (rows[2].duration_ms, rows[2].byte_len) == (1000, 132)


def test_header_field_overflow_is_null_not_corrupt(spark):
    """A value too wide for its header field must null the whole
    synthesized header (decoding to Nones) — lpad would otherwise keep
    the high-order hex digits and silently encode an unrelated size."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 44100, 2, 4_800_000_000)], "doc_id long, rate long, ch long, n long"
    ).select(
        "doc_id",
        multimodal.wav_header_expr(F.col("rate"), F.col("ch"), F.col("n")).alias(
            "payload"
        ),
    )
    assert df.filter(F.col("payload").isNull()).count() == 1


def test_null_payloads_yield_null_metadata(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,)], "doc_id long").select(
        "doc_id", F.lit(None).cast("binary").alias("payload")
    )
    for fn in (multimodal.image_metadata, multimodal.audio_metadata,
               multimodal.video_metadata):
        rows = fn(df).collect()
        assert len(rows) == 2
        assert all(r.byte_len == 0 for r in rows)


def test_payload_exact_duplicates_drop_list(spark):
    from change_data_capture_spark.extensions import multimodal

    rows = [
        (1, bytearray(b"\x89PNG-ish-bytes-A")),
        (2, bytearray(b"\x89PNG-ish-bytes-B")),
        (3, bytearray(b"\x89PNG-ish-bytes-A")),  # dup of 1
        (4, bytearray(b"\x89PNG-ish-bytes-A")),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sorted(
        (r.dup_id, r.keeper_id)
        for r in multimodal.payload_exact_duplicates(df).collect()
    )
    assert out == [(3, 1), (4, 1)]


def test_payload_simhash_finds_patched_reencodes(spark):
    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    # 40 distinct pseudo-binary payloads; every 4th reappears with a
    # trailing 8-byte "tool tag" -> byte-level near-dup. Recall floor:
    # all patched pairs found, no cross-payload false positives.
    base = spark.range(1, 41).select(
        F.col("id").alias("doc_id"),
        F.encode(
            F.concat(
                F.lit("payload-"),
                F.col("id").cast("string"),
                F.repeat(F.concat(F.lit("-block-"), F.sha2(F.col("id").cast("string"), 256)), 8),
            ),
            "UTF-8",
        ).cast("binary").alias("payload"),
    )
    patched = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("payload"), F.lit(b"XTOOLTAG")).alias("payload"),
    )
    out = multimodal.payload_simhash_duplicates(base.unionByName(patched)).collect()
    pairs = {(r.a_id, r.b_id) for r in out}
    want = {(i, i + 1000) for i in range(4, 41, 4)}
    assert want <= pairs, f"missed true near-dups: {want - pairs}"
    for r in out:
        # every verified pair is genuinely near-identical
        assert r.jaccard >= 0.5
    # no pair of two distinct base payloads sneaks through
    assert not any(a <= 40 and b <= 40 for a, b in pairs)


def test_payload_simhash_bucket_cap(spark):
    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    # 25 identical template payloads + one patched near-dup pair
    template = spark.range(1, 26).select(
        F.col("id").alias("doc_id"),
        F.encode(F.repeat(F.lit("same-template-bytes-"), 16), "UTF-8").cast("binary").alias("payload"),
    )
    uniq = spark.range(100, 101).select(
        F.col("id").alias("doc_id"),
        F.encode(F.repeat(F.lit("unique-payload-body-"), 16), "UTF-8").cast("binary").alias("payload"),
    )
    patched = uniq.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("payload"), F.lit(b"TAG")).alias("payload"),
    )
    docs = template.unionByName(uniq).unionByName(patched)
    capped = multimodal.payload_simhash_duplicates(docs, max_bucket_size=5)
    pairs = {(r.a_id, r.b_id) for r in capped.collect()}
    assert (100, 1100) in pairs
    assert not any(a <= 25 for a, _ in pairs), "capped template family leaked pairs"


def test_payload_jaccard_exact_recall_one_and_integer_counts(spark):
    """payload_jaccard_duplicates: EXACT prefix-filtered self-join —
    every pair at or above the threshold is found (recall 1, no
    banding), counts are exact integers, and a pair just below the
    threshold is excluded. Hand-checkable fixture: identical payloads
    except trailing tags of different lengths."""
    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    block = "-".join(f"segment{i:03d}" for i in range(40))  # 479 ASCII bytes
    df = spark.createDataFrame(
        [
            (1, block),
            (2, block + "X" * 8),        # near-identical: high jaccard
            (3, block[: len(block) // 3]),  # prefix third: low jaccard vs 1
            (4, "totally unrelated content " * 16),
        ],
        "doc_id long, text string",
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = {
        (r.a_id, r.b_id): (r.inter_shingles, r.union_shingles)
        for r in multimodal.payload_jaccard_duplicates(
            df, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert (1, 2) in out
    i, u = out[(1, 2)]
    assert isinstance(i, int) and isinstance(u, int) and 5 * i >= 4 * u
    assert (1, 3) not in out and (1, 4) not in out
    # recall check against brute force at a LOW threshold: every pair
    # the quadratic truth finds, the prefix join finds too
    import itertools

    def shingles(payload: bytes):
        top = max(len(payload) - 7, 1)
        return {payload[p : p + 8] for p in range(0, top, 4)}

    rows = {r.doc_id: bytes(r.payload) for r in df.collect()}
    truth = set()
    for a, b in itertools.combinations(sorted(rows), 2):
        sa, sb = shingles(rows[a]), shingles(rows[b])
        inter = len(sa & sb)
        uni = len(sa | sb)
        if 5 * inter >= 1 * uni:  # t = 1/5
            truth.add((a, b))
    got = {
        (r.a_id, r.b_id)
        for r in multimodal.payload_jaccard_duplicates(
            df, threshold_num=1, threshold_den=5
        ).collect()
    }
    assert got == truth


def test_fake_codec_and_downstream_plumbing_real(spark):
    """The codec boundary: decode_image_pixels raises (documented
    stub); decode_image_pixels_fake is a DETERMINISTIC stand-in that
    honors the real header dims, and everything downstream —
    feature-extract pooling, nearest-neighbor resize + letterbox,
    Arrow batch shape, schemas — runs for real against it."""
    import numpy as np
    import pytest

    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_pixels(b"anything")

    docs = spark.range(1, 9).select(
        F.col("id").alias("doc_id"),
        F.concat(
            multimodal.png_header_expr(
                (F.col("id") % 5 + 8).cast("int"), (F.col("id") % 3 + 6).cast("int")
            ),
            F.encode(F.repeat(F.concat(F.lit("px"), F.col("id").cast("string")), 20), "UTF-8"),
        ).alias("payload"),
    ).repartition(3)  # multiple Arrow batches: the mapInPandas shape is real

    # fake decoder: deterministic, honors header dims, None on junk
    (row,) = docs.filter(F.col("doc_id") == 1).collect()
    px1 = multimodal.decode_image_pixels_fake(bytes(row["payload"]))
    px2 = multimodal.decode_image_pixels_fake(bytes(row["payload"]))
    assert px1.shape == (7, 9, 4) and (px1 == px2).all()  # RGBA header
    assert multimodal.decode_image_pixels_fake(b"not a png") is None

    feats = {
        r["doc_id"]: r["feature"]
        for r in multimodal.image_feature_extract(
            docs, decode=multimodal.decode_image_pixels_fake, grid=4
        ).collect()
    }
    assert len(feats) == 8
    assert all(f is not None and len(f) == 4 * 4 * 3 + 3 for f in feats.values())
    # deterministic across runs
    feats2 = {
        r["doc_id"]: r["feature"]
        for r in multimodal.image_feature_extract(
            docs, decode=multimodal.decode_image_pixels_fake, grid=4
        ).collect()
    }
    assert feats == feats2

    out = {
        r["doc_id"]: r
        for r in multimodal.image_resize(
            docs, target_w=32, target_h=16, decode=multimodal.decode_image_pixels_fake
        ).collect()
    }
    r1 = out[1]  # src 9x7 -> scale min(32/9, 16/7) = 16/7 -> 20x16
    assert (r1["dst_w"], r1["dst_h"]) == (20, 16)
    assert r1["pad_left"] == (32 - 20) // 2 and r1["pad_top"] == 0
    assert len(bytes(r1["pixels"])) == 16 * 32 * 4
    # letterbox columns outside the placed region are zero
    a = np.frombuffer(bytes(r1["pixels"]), dtype=np.uint8).reshape(16, 32, 4)
    assert (a[:, : r1["pad_left"]] == 0).all()
    assert (a[:, r1["pad_left"] + r1["dst_w"]:] == 0).all()
    # geometry agrees with the declarative resize_spec on the same meta
    spec = {
        r["doc_id"]: r
        for r in multimodal.resize_spec(
            multimodal.image_metadata(docs), target_w=32, target_h=16
        ).collect()
    }
    for d, r in out.items():
        assert (r["dst_w"], r["dst_h"]) == (spec[d]["dst_w"], spec[d]["dst_h"])
        assert r["pad_left"] == spec[d]["pad_left"] and r["pad_top"] == spec[d]["pad_top"]


def test_fake_pcm_codec_and_chunk_features(spark):
    """Audio twin of the fake-codec test: decode_audio_pcm raises;
    decode_audio_pcm_fake honors the real RIFF header (rate, channels,
    n_samples) deterministically; audio_chunk_features computes real
    RMS/zero-cross math per chunk with the same geometry
    audio_chunk_plan declares."""
    import pytest

    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_pcm(b"anything")

    # 2 docs: 16 kHz mono, 40k and 75k samples -> 30 s chunks of 480k
    # samples won't split; use chunk_seconds=1 (16k samples) instead
    docs = spark.createDataFrame([(1, 40_000), (2, 75_000)], "doc_id long, n long").select(
        "doc_id",
        multimodal.wav_header_expr(F.lit(16_000), F.lit(1), F.col("n")).alias("payload"),
    )
    (r1,) = docs.filter(F.col("doc_id") == 1).collect()
    d1 = multimodal.decode_audio_pcm_fake(bytes(r1["payload"]))
    d2 = multimodal.decode_audio_pcm_fake(bytes(r1["payload"]))
    assert d1 is not None and d1[1] == 16_000 and d1[0].shape == (40_000, 1)
    assert (d1[0] == d2[0]).all()
    assert multimodal.decode_audio_pcm_fake(b"junk") is None

    out = multimodal.audio_chunk_features(
        docs, chunk_seconds=1, decode=multimodal.decode_audio_pcm_fake
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 5  # ceil(n/16k)
    last = sorted(by_doc[2], key=lambda r: r["chunk_idx"])[-1]
    assert last["start_sample"] == 64_000 and last["end_sample"] == 75_000
    for r in out:
        assert r["rms"] > 0 and 0.0 <= r["zero_cross_rate"] <= 1.0
    # chunk geometry: every chunk is exactly [i*16k, min((i+1)*16k, n))
    # against an independent Python computation of the declared rate
    for doc_id, n in ((1, 40_000), (2, 75_000)):
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        for i, r in enumerate(rows):
            assert r["chunk_idx"] == i
            assert r["start_sample"] == i * 16_000
            assert r["end_sample"] == min((i + 1) * 16_000, n)


def test_feature_extract_fixed_dim_across_channel_counts(spark):
    """Review regression: grayscale (color type 0) and RGBA payloads
    must emit the SAME feature dim — gray planes repeat to 3 channels,
    alpha drops — so downstream fixed-dim consumers never misalign."""
    from change_data_capture_spark.extensions import multimodal
    from pyspark.sql import functions as F

    body = F.encode(F.repeat(F.lit("pix"), 40), "UTF-8")
    gray = spark.range(1, 3).select(
        F.col("id").alias("doc_id"),
        F.concat(
            multimodal.png_header_expr(F.lit(8), F.lit(6), color_type=0), body
        ).alias("payload"),
    )
    rgba = spark.range(3, 5).select(
        F.col("id").alias("doc_id"),
        F.concat(
            multimodal.png_header_expr(F.lit(8), F.lit(6), color_type=6), body
        ).alias("payload"),
    )
    out = multimodal.image_feature_extract(
        gray.unionByName(rgba), decode=multimodal.decode_image_pixels_fake, grid=4
    ).collect()
    dims = {len(r["feature"]) for r in out}
    assert dims == {4 * 4 * 3 + 3}
