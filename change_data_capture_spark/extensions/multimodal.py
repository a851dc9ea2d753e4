"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video columns are carried as ``binary`` with typed
metadata columns alongside. The Spark-side machinery is real —
schemas, Arrow batch iteration via ``mapInPandas``, partition-friendly
batch shapes — and so is the container-header metadata step:
``decode_image_meta`` parses PNG IHDR and JPEG SOF headers from raw
bytes with ``struct`` (no image library involved). Only the PIXEL
codec is stubbed: the container has no PIL/libjpeg/ffmpeg, so
``decode_image_pixels`` raises ``NotImplementedError`` at the exact
point a real pipeline would hand the bytes to a decoder. Swapping that
stub for a real decoder changes nothing about the Spark plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG standalone markers that carry no length segment
_JPEG_BARE = {0xD8, 0x01, *range(0xD0, 0xD8)}


def decode_image_meta(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, channels) parsed straight from the container
    header bytes — PNG IHDR (signature + first chunk, fixed offsets)
    or JPEG SOF (marker walk to the first frame header). No image
    library: both headers are fixed-layout big-endian ``struct``
    territory. Unrecognized payloads yield (None, None, None)."""
    p = bytes(payload)
    if p[:8] == _PNG_SIG and len(p) >= 26 and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        color_type = p[25]
        return int(w), int(h), _PNG_CHANNELS.get(color_type)
    if p[:2] == b"\xff\xd8":
        i = 2
        while i + 2 <= len(p) and p[i] == 0xFF:
            # spec-legal fill bytes: any number of 0xFF may pad before
            # the marker code (ITU T.81 B.1.1.2)
            while i + 1 < len(p) and p[i + 1] == 0xFF:
                i += 1
            if i + 2 > len(p):
                break
            marker = p[i + 1]
            if marker in _JPEG_BARE:
                i += 2
                continue
            if i + 4 > len(p):
                break
            (seg_len,) = struct.unpack(">H", p[i + 2 : i + 4])
            # SOF0-SOF15 minus DHT/JPG/DAC hold the frame dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 <= len(p):
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return int(w), int(h), int(p[i + 9])
                break
            i += 2 + seg_len
    return None, None, None


def png_header_expr(width: Column, height: Column, *, color_type: int = 6, bit_depth: int = 8) -> Column:
    """Synthesize the 29-byte PNG signature + IHDR prefix as a pure
    column expression (int -> 4-byte big-endian via hex/lpad/unhex):
    lets tests and oracle-paired queries build REAL decodable headers
    JVM-side, no Python in the generation path."""
    def be4(c: Column) -> Column:
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))

    return F.concat(
        F.unhex(F.lit(_PNG_SIG.hex().upper())),
        F.unhex(F.lit("0000000D")),  # IHDR length = 13
        F.unhex(F.lit(b"IHDR".hex().upper())),
        be4(width),
        be4(height),
        # bit depth, color type, compression, filter, interlace
        F.unhex(F.lit(f"{bit_depth:02X}{color_type:02X}000000")),
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits_per_sample", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def decode_audio_meta(
    payload: bytes,
) -> tuple[int | None, int | None, int | None, int | None, int | None]:
    """(sample_rate, channels, bits_per_sample, n_samples, duration_ms)
    parsed straight from a RIFF/WAVE container: the fmt chunk is
    fixed-layout little-endian ``struct`` territory and the data chunk
    size plus block align give the sample count — no audio library.
    Chunk walk honors word alignment (odd-sized chunks pad one byte).
    duration_ms uses integer math (n * 1000 // rate) so it is exact
    and engine-reproducible. Unrecognized payloads yield Nones."""
    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None, None, None, None, None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        (sz,) = struct.unpack("<I", p[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(p):
            _, ch, sr = struct.unpack("<HHI", p[i + 8 : i + 16])
            block_align, bits = struct.unpack("<HH", p[i + 20 : i + 24])
            fmt = (sr, ch, bits, block_align)
        elif cid == b"data":
            data_size = int(sz)
        if fmt is not None and data_size is not None:
            break
        i += 8 + sz + (sz & 1)
    if fmt is None:
        return None, None, None, None, None
    sr, ch, bits, block_align = fmt
    n = dur = None
    if data_size is not None and block_align:
        n = data_size // block_align
        dur = n * 1000 // sr if sr else None
    return int(sr), int(ch), int(bits), n, dur


def _fit(c: Column, nbytes: int) -> Column:
    """NULL out values that don't fit the field width: lpad would
    otherwise truncate the hex keeping the HIGH-order digits and encode
    an unrelated value silently. A null field nulls the whole
    synthesized header (concat propagates), which decodes to Nones —
    visible, never corrupt."""
    limit = 1 << (8 * nbytes)
    return F.when(
        (c >= 0) & (c < F.lit(limit)), c.cast("bigint")
    ).otherwise(F.lit(None).cast("bigint"))


def _le_bytes(c: Column, nbytes: int) -> Column:
    """Little-endian fixed-width bytes from an int column (hex/lpad/
    unhex with the byte pairs reversed — the LE twin of
    png_header_expr's big-endian helper)."""
    hexs = F.lpad(F.hex(_fit(c, nbytes)), nbytes * 2, "0")
    pairs = [F.substring(hexs, i * 2 + 1, 2) for i in reversed(range(nbytes))]
    return F.unhex(F.concat(*pairs))


def wav_header_expr(
    sample_rate: Column, channels: Column, n_samples: Column, *, bits: int = 16
) -> Column:
    """Synthesize a VALID 44-byte RIFF/WAVE header (canonical PCM fmt +
    data chunk declaration) as a pure column expression, so tests and
    oracle-paired queries build real decodable audio headers JVM-side.
    The payload carries the header only; the data chunk size field
    declares ``n_samples`` exactly as a streamed-out file would."""
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    return F.concat(
        F.unhex(F.lit(b"RIFF".hex().upper())),
        _le_bytes(data_size + 36, 4),
        F.unhex(F.lit(b"WAVEfmt ".hex().upper())),
        _le_bytes(F.lit(16), 4),  # fmt chunk size
        _le_bytes(F.lit(1), 2),  # PCM
        _le_bytes(channels, 2),
        _le_bytes(sample_rate, 4),
        _le_bytes(byte_rate, 4),
        _le_bytes(block_align, 2),
        _le_bytes(F.lit(bits), 2),
        F.unhex(F.lit(b"data".hex().upper())),
        _le_bytes(data_size, 4),
    )


def audio_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched WAV metadata extraction over the binary column —
    the audio twin of ``image_metadata``, same mapInPandas plan
    shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [
                decode_audio_meta(p) if p is not None else (None,) * 5
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "sample_rate": pd.Series([m[0] for m in meta], dtype="Int32"),
                    "channels": pd.Series([m[1] for m in meta], dtype="Int32"),
                    "bits_per_sample": pd.Series([m[2] for m in meta], dtype="Int32"),
                    "n_samples": pd.Series([m[3] for m in meta], dtype="Int64"),
                    "duration_ms": pd.Series([m[4] for m in meta], dtype="Int64"),
                }
            )

    return docs_with_payload.mapInPandas(batches, AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("brand", StringType(), True),
        StructField("timescale", LongType(), True),
        StructField("duration", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def decode_video_meta(
    payload: bytes,
) -> tuple[str | None, int | None, int | None, int | None]:
    """(major_brand, timescale, duration, duration_ms) parsed straight
    from an ISO-BMFF (MP4) container: top-level box walk (size+type,
    big-endian) to ftyp for the brand and into moov for the mvhd
    movie header, whose version-0 layout puts timescale/duration at
    fixed offsets — pure ``struct``, no video library. duration_ms is
    exact integer math. Unrecognized payloads yield Nones."""
    p = bytes(payload)
    brand = timescale = duration = None

    def walk(lo: int, hi: int):
        nonlocal brand, timescale, duration
        i = lo
        while i + 8 <= hi:
            (sz,) = struct.unpack(">I", p[i : i + 4])
            typ = p[i + 4 : i + 8]
            if sz < 8 or i + sz > hi:
                return
            if typ == b"ftyp" and sz >= 12:
                brand = p[i + 8 : i + 12].decode("ascii", "replace")
            elif typ == b"moov":
                walk(i + 8, i + sz)
            elif typ == b"mvhd" and sz >= 28 and p[i + 8] == 0:
                ts, dur = struct.unpack(">II", p[i + 20 : i + 28])
                timescale, duration = int(ts), int(dur)
            i += sz

    walk(0, len(p))
    if timescale is None:
        return brand, None, None, None
    dur_ms = duration * 1000 // timescale if timescale else None
    return brand, timescale, duration, dur_ms


def _be_bytes(c: Column, nbytes: int) -> Column:
    """Big-endian fixed-width bytes from an int column."""
    return F.unhex(F.lpad(F.hex(_fit(c, nbytes)), nbytes * 2, "0"))


def mp4_header_expr(timescale: Column, duration: Column) -> Column:
    """Synthesize a VALID minimal MP4 prefix (ftyp + moov/mvhd v0) as a
    pure column expression: 16-byte ftyp(isom) then a moov box holding
    the standard 108-byte mvhd whose timescale/duration come from the
    given columns (remaining mvhd fields zeroed). Real decodable ISO-
    BMFF structure, JVM-side, no Python in the generation path."""
    mvhd = F.concat(
        _be_bytes(F.lit(108), 4),
        F.unhex(F.lit(b"mvhd".hex().upper())),
        F.unhex(F.lit("00" * 12)),  # version, flags, ctime, mtime
        _be_bytes(timescale, 4),
        _be_bytes(duration, 4),
        F.unhex(F.lit("00" * 80)),  # rate/volume/reserved/matrix/next
    )
    return F.concat(
        _be_bytes(F.lit(16), 4),
        F.unhex(F.lit(b"ftyp".hex().upper())),
        F.unhex(F.lit(b"isom".hex().upper())),
        _be_bytes(F.lit(512), 4),  # minor version
        _be_bytes(F.lit(8 + 108), 4),
        F.unhex(F.lit(b"moov".hex().upper())),
        mvhd,
    )


def video_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched MP4 metadata extraction — same mapInPandas plan
    shape as image/audio."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [
                decode_video_meta(p) if p is not None else (None,) * 4
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "brand": pd.Series([m[0] for m in meta], dtype="object"),
                    "timescale": pd.Series([m[1] for m in meta], dtype="Int64"),
                    "duration": pd.Series([m[2] for m in meta], dtype="Int64"),
                    "duration_ms": pd.Series([m[3] for m in meta], dtype="Int64"),
                }
            )

    return docs_with_payload.mapInPandas(batches, VIDEO_META_SCHEMA)


def decode_image_pixels(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "pixel decode requires an image library (PIL/libjpeg) not present "
        "in this container; the Spark plumbing around it is real and tested"
    )


def decode_image_pixels_fake(payload: bytes):
    """DETERMINISTIC FAKE pixel decoder — explicitly not a codec.

    Parses the REAL header (``decode_image_meta``) for the image's
    true (width, height, channels), then fills the pixel buffer with a
    blake2b keystream of the payload bytes: same payload -> same
    pixels, different payloads -> uncorrelated pixels. Exists so every
    stage DOWNSTREAM of the codec boundary (feature extraction,
    resize, batch shape, schema) runs for real in a container with no
    image library; a deployment swaps ``decode_image_pixels`` in
    without touching any Spark plumbing. Returns a numpy uint8 array
    of shape (height, width, channels), or None for unparseable
    headers (mirroring the NULL-dims contract of image_metadata)."""
    import hashlib

    import numpy as np

    w, h, c = decode_image_meta(payload) if payload is not None else (None, None, None)
    if not w or not h or not c:
        return None
    need = int(w) * int(h) * int(c)
    # hash the payload ONCE to a seed, then stream cheap fixed-size
    # hashes of the seed — O(payload + pixels), not O(payload * pixels)
    seed = hashlib.blake2b(payload, digest_size=64).digest()
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            seed, digest_size=64, salt=counter.to_bytes(8, "little")
        ).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(
        int(h), int(w), int(c)
    )


def image_feature_extract(
    docs_with_payload: DataFrame,
    *,
    decode=decode_image_pixels,
    grid: int = 4,
) -> DataFrame:
    """Pooled-pixel feature vectors over the binary column — the
    vision-embedding UDF shape: Arrow-batched ``mapInPandas``, one
    pandas batch per chunk, decode -> numpy pooling, emits
    ``array<float>`` features of fixed dim grid*grid*channels-capped
    (grid x grid average pooling over up to 3 channels + 3 global
    moments). The pooling math is REAL numpy; only ``decode`` sits on
    the codec boundary (default raises per the stub contract — pass
    ``decode_image_pixels_fake`` in codec-less environments, a PIL
    decoder in production). Undecodable payloads emit NULL features,
    never fake numbers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                px = decode(p) if p is not None else None
                if px is None:
                    feats.append(None)
                    continue
                h, w, c = px.shape
                # fixed-dim contract: pool over EXACTLY 3 channels —
                # gray/gray-alpha planes repeat to fill (grayscale's
                # RGB form), RGBA drops alpha
                a = px[:, :, :min(c, 3)].astype("float32")
                if a.shape[2] < 3:
                    a = np.concatenate(
                        [a[:, :, i % a.shape[2]][..., None] for i in range(3)],
                        axis=2,
                    )
                c = 3
                # grid x grid average pooling: integer-stride crop so
                # every cell is the mean of a real pixel block
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                a_c = a[: gh * grid if h >= grid else h, : gw * grid if w >= grid else w]
                if h >= grid and w >= grid:
                    pooled = a_c.reshape(grid, gh, grid, gw, c).mean(axis=(1, 3))
                else:
                    pooled = np.broadcast_to(a_c.mean(axis=(0, 1)), (grid, grid, c))
                vec = np.concatenate(
                    [pooled.ravel(), [a.mean(), a.std(), float(h) / max(w, 1)]]
                )
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return docs_with_payload.mapInPandas(
        batches, "doc_id long, feature array<float>"
    )


def image_resize(
    docs_with_payload: DataFrame,
    *,
    target_w: int = 224,
    target_h: int = 224,
    decode=decode_image_pixels,
) -> DataFrame:
    """Aspect-preserving nearest-neighbor resize + letterbox over the
    binary column — applies exactly the geometry ``resize_spec``
    computes, as the Arrow-batched UDF a vision pipeline runs. The
    resample is REAL numpy index arithmetic (nearest neighbor needs no
    image library); only ``decode`` sits on the codec boundary. Emits
    the letterboxed (target_h x target_w x channels) buffer as raw
    bytes plus the placed geometry; undecodable payloads emit NULLs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {"doc_id": [], "dst_w": [], "dst_h": [], "pad_left": [],
                    "pad_top": [], "pixels": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                px = decode(p) if p is not None else None
                rows["doc_id"].append(int(doc_id))
                if px is None:
                    rows["dst_w"].append(None); rows["dst_h"].append(None)
                    rows["pad_left"].append(None); rows["pad_top"].append(None)
                    rows["pixels"].append(None)
                    continue
                h, w, c = px.shape
                scale = min(target_w / w, target_h / h)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                yi = (np.arange(nh) / scale).astype(int).clip(0, h - 1)
                xi = (np.arange(nw) / scale).astype(int).clip(0, w - 1)
                resized = px[yi][:, xi]
                canvas = np.zeros((target_h, target_w, c), dtype=np.uint8)
                pl, pt = (target_w - nw) // 2, (target_h - nh) // 2
                canvas[pt : pt + nh, pl : pl + nw] = resized
                rows["dst_w"].append(nw); rows["dst_h"].append(nh)
                rows["pad_left"].append(pl); rows["pad_top"].append(pt)
                rows["pixels"].append(canvas.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "dst_w": pd.Series(rows["dst_w"], dtype="Int32"),
                    "dst_h": pd.Series(rows["dst_h"], dtype="Int32"),
                    "pad_left": pd.Series(rows["pad_left"], dtype="Int32"),
                    "pad_top": pd.Series(rows["pad_top"], dtype="Int32"),
                    "pixels": pd.Series(rows["pixels"], dtype="object"),
                }
            )

    return docs_with_payload.mapInPandas(
        batches,
        "doc_id long, dst_w int, dst_h int, pad_left int, pad_top int, pixels binary",
    )


def image_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column
    (mapInPandas: one pandas batch per Arrow chunk — the real plan
    shape for any codec UDF at scale)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [
                decode_image_meta(p) if p is not None else (None, None, None)
                for p in payloads
            ]
            # nullable Int32: unrecognized containers surface as NULL
            # dims, never fake numbers
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="Int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="Int32"),
                    "channels": pd.Series([m[2] for m in meta], dtype="Int32"),
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
    image_meta: DataFrame, *, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize + letterbox SPEC over decoded image
    metadata (``image_metadata`` output or any frame with
    ``doc_id``/``width``/``height``): pure column math producing the
    geometry a vision-preprocessing UDF would apply per image."""
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
    new_w = F.floor(w * scale).cast("int")
    new_h = F.floor(h * scale).cast("int")
    return image_meta.select(
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


def decode_audio_pcm(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "PCM decode of compressed audio requires a codec (ffmpeg) not "
        "present in this container; raw RIFF/WAVE PCM needs none — see "
        "decode_audio_pcm_fake for the deterministic stand-in and the "
        "real struct-parse path it shares"
    )


def decode_audio_pcm_fake(payload: bytes):
    """DETERMINISTIC FAKE PCM decoder — the audio twin of
    ``decode_image_pixels_fake``. Parses the REAL RIFF/WAVE header
    (``decode_audio_meta``) for the true (rate, channels, bits,
    n_samples), then synthesizes an int16 sample buffer from a blake2b
    keystream of the payload: same payload -> same samples. Lets every
    stage downstream of the codec boundary (chunk energy features,
    batch shape, schema) run for real without ffmpeg. Returns
    (samples int16 ndarray of shape (n_samples, channels),
    sample_rate), or None for unparseable headers."""
    import hashlib

    import numpy as np

    rate, ch, _bits, n, _ms = (
        decode_audio_meta(payload) if payload is not None else (None,) * 5
    )
    if not rate or not ch or not n:
        return None
    need = int(n) * int(ch) * 2
    seed = hashlib.blake2b(payload, digest_size=64).digest()
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            seed, digest_size=64, salt=counter.to_bytes(8, "little")
        ).digest()
        counter += 1
    samples = np.frombuffer(bytes(out[:need]), dtype="<i2").reshape(int(n), int(ch))
    return samples, int(rate)


def audio_chunk_features(
    docs_with_payload: DataFrame,
    *,
    chunk_seconds: int = 30,
    decode=decode_audio_pcm,
) -> DataFrame:
    """Per-chunk audio features over the binary column — the
    whisper-style segmenter's feature pass: Arrow-batched
    ``mapInPandas``, decode -> numpy per fixed-duration chunk, emitting
    (doc_id, chunk_idx, start_sample, end_sample, rms, zero_cross_rate)
    — the same chunk geometry ``audio_chunk_plan`` declares. RMS and
    zero-crossing rate are REAL numpy over the sample buffer; only
    ``decode`` sits on the codec boundary (default raises per the stub
    contract — pass ``decode_audio_pcm_fake`` in codec-less
    environments). Undecodable payloads emit no rows (the dead-letter
    pattern is the caller's metadata pass)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {"doc_id": [], "chunk_idx": [], "start_sample": [],
                    "end_sample": [], "rms": [], "zero_cross_rate": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                decoded = decode(p) if p is not None else None
                if decoded is None:
                    continue
                samples, rate = decoded
                mono = samples.astype("float64").mean(axis=1)
                step = rate * chunk_seconds
                for ci, s in enumerate(range(0, len(mono), step)):
                    seg = mono[s : s + step]
                    rows["doc_id"].append(int(doc_id))
                    rows["chunk_idx"].append(ci)
                    rows["start_sample"].append(s)
                    rows["end_sample"].append(s + len(seg))
                    rows["rms"].append(float(np.sqrt((seg ** 2).mean())))
                    rows["zero_cross_rate"].append(
                        float((np.diff(np.signbit(seg)) != 0).mean())
                        if len(seg) > 1
                        else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "chunk_idx": pd.Series(rows["chunk_idx"], dtype="int32"),
                    "start_sample": pd.Series(rows["start_sample"], dtype="int64"),
                    "end_sample": pd.Series(rows["end_sample"], dtype="int64"),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                    "zero_cross_rate": pd.Series(rows["zero_cross_rate"], dtype="float64"),
                }
            )

    return docs_with_payload.mapInPandas(
        batches,
        "doc_id long, chunk_idx int, start_sample long, end_sample long, "
        "rms double, zero_cross_rate double",
    )


def payload_exact_duplicates(
    docs_with_payload: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact binary-payload dedup — the image/audio dedup step every
    multimodal pipeline runs BEFORE training, and the one that needs
    no codec at all: two files with identical bytes are the same
    sample regardless of what they decode to. (dup_id, keeper_id)
    pairs with keeper = smallest id sharing md5(payload) — the same
    drop-list contract as ``dedup.exact_duplicates``, so downstream
    ``duplicate_clusters`` / keeper filters compose unchanged.

    Scale: one hash-shuffle on the 32-hex-char digest (the window
    partitions by the hash, never moves payload bytes beyond the local
    md5 pass) — identical shape to text exact dedup, so the 100 TB
    story is the same: O(corpus) scan + one shuffle of (id, digest)."""
    from pyspark.sql import Window

    keeper = F.min(id_col).over(Window.partitionBy(F.md5(F.col(payload_col))))
    return (
        docs_with_payload.select(F.col(id_col), keeper.alias("keeper_id"))
        .filter(F.col(id_col) != F.col("keeper_id"))
        .select(F.col(id_col).alias("dup_id"), "keeper_id")
    )


def payload_jaccard_duplicates(
    docs_with_payload: DataFrame,
    *,
    n: int = 8,
    stride: int = 4,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """EXACT near-duplicate binary payloads: every pair whose
    byte-shingle Jaccard is >= threshold_num/threshold_den, with
    integer (intersection, union) shingle counts — no banding, no
    recall loss, so an independent engine can reproduce the output
    bit-for-bit (the oracle-checkable sibling of
    ``payload_simhash_duplicates``; use that one when approximate
    recall is acceptable and this one when the drop list must be
    auditable).

    Algorithm is the standard PREFIX-FILTERED set-similarity
    self-join (AllPairs/PPJoin family): rank each document's distinct
    ``n``-byte shingles (every ``stride`` bytes) by global document
    frequency (rarest first, ties on the shingle bytes for a total
    order), keep each document's prefix of |S| - ceil(t*|S|) + 1
    shingles, and join on prefix shingles only. Recall is exactly 1:
    J(A,B) >= t implies |A∩B| >= ceil(t*|A|) (since the union is at
    least |A|), and the globally-smallest common shingle then sits
    inside BOTH prefixes — rare shingles generate few candidates, the
    frequent shingles that would blow up an inverted-index join never
    enter a prefix. Candidates are verified with exact shingle-set
    intersection; the threshold comparison is pure integer
    cross-multiplication (den*inter >= num*union), so the DuckDB
    oracle hashes bit-exact.

    Scale: shingle explode is O(bytes/stride) narrow rows; one
    doc-grain shuffle for the distinct + df rank, the prefix equi-join
    (no broadcast hints, no all-pairs), and a verify bounded to
    candidate docs. Driver sees nothing but the final pairs."""
    t_frac = threshold_num / threshold_den
    if not 0.0 < t_frac <= 1.0:
        raise ValueError(
            f"threshold {threshold_num}/{threshold_den} must be in (0, 1]"
        )
    from pyspark.sql import Window

    from .dedup import spread

    shingle_pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(payload_col) - (n - 1), F.lit(1)),
            F.lit(stride),
        )
    )
    # spread() before the high-expansion shingle explode (CLAUDE.md
    # rule: the scan sizer can't see the expansion factor)
    sh = (
        spread(docs_with_payload).select(
            F.col(id_col), F.col(payload_col), shingle_pos.alias("i")
        )
        .select(F.col(id_col), F.expr(f"substring({payload_col}, i, {n})").alias("sh"))
        .distinct()
        .persist()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("__sz"))
    df_tbl = sh.groupBy("sh").agg(F.count("*").alias("__df"))
    # prefix length p = |S| - ceil(t|S|) + 1, all-integer:
    # ceil(num*|S|/den) = floor((num*|S| + den - 1) / den)
    need = F.floor(
        (F.lit(threshold_num) * F.col("__sz") + F.lit(threshold_den - 1))
        / F.lit(threshold_den)
    )
    w = Window.partitionBy(id_col).orderBy("__df", "sh")
    pref = (
        sh.join(df_tbl, "sh")
        .withColumn("__rk", F.row_number().over(w))
        .join(sizes, id_col)
        .filter(F.col("__rk") <= F.col("__sz") - need + 1)
        .select(F.col(id_col), "sh", "__sz")
    )
    # try/finally around everything that runs jobs while sh (and later
    # candidates) are persisted: a mid-job failure (executor OOM during
    # the verify count) must not leak two corpus-scale caches in a
    # long-lived session (ADVICE r5; same discipline as
    # refresh_signature_index).
    candidates = None
    try:
        # PPJoin length filter, applied INSIDE the prefix join: J >= t
        # implies |A∩B| >= t*max(|A|,|B|) and the intersection is at most
        # min(|A|,|B|), so den*min >= num*max — pairs outside the size
        # ratio can't reach the threshold and never leave the join. Sound
        # (no recall loss), and it prunes the bulk of small-vs-large
        # collisions a shared rare shingle would otherwise emit.
        candidates = (
            pref.select(F.col(id_col).alias("a_id"), "sh", F.col("__sz").alias("__sa"))
            .join(
                pref.select(F.col(id_col).alias("b_id"), "sh", F.col("__sz").alias("__sb")),
                "sh",
            )
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(
                F.lit(threshold_den) * F.least("__sa", "__sb")
                >= F.lit(threshold_num) * F.greatest("__sa", "__sb")
            )
            .select("a_id", "b_id")
            .distinct()
            .persist()
        )
        candidates.count()
        ids = (
            candidates.select(F.col("a_id").alias(id_col))
            .unionByName(candidates.select(F.col("b_id").alias(id_col)))
            .distinct()
        )
        # exact verify over candidate docs only; shingles are raw n-byte
        # binaries (same 8-byte footprint as a hash, zero collision risk)
        sets = (
            sh.join(ids, id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("sh").alias("hs"))
        )
        a_sets = sets.select(F.col(id_col).alias("a_id"), F.col("hs").alias("ha"))
        b_sets = sets.select(F.col(id_col).alias("b_id"), F.col("hs").alias("hb"))
        inter = F.size(F.array_intersect("ha", "hb")).cast("bigint")
        out = (
            candidates.join(a_sets, "a_id")
            .join(b_sets, "b_id")
            .select(
                "a_id",
                "b_id",
                inter.alias("inter_shingles"),
                (F.size("ha") + F.size("hb") - inter).cast("bigint").alias("union_shingles"),
            )
            .filter(
                F.lit(threshold_den) * F.col("inter_shingles")
                >= F.lit(threshold_num) * F.col("union_shingles")
            )
            .persist()
        )
        out.count()
        return out
    finally:
        if candidates is not None:
            candidates.unpersist()
        sh.unpersist()


def payload_simhash_duplicates(
    docs_with_payload: DataFrame,
    *,
    n: int = 8,
    stride: int = 4,
    hamming_max: int = 3,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate binary payloads via byte-shingle SimHash — the
    codec-free near-dup pass for multimodal corpora (re-encoded or
    metadata-patched files share almost all byte n-grams even when a
    few bytes differ; true for PNG chunks, JPEG segments, WAV data
    blocks alike).

    Pipeline mirrors ``dedup.simhash_duplicates``, over BYTES instead
    of tokens: overlapping ``n``-byte shingles every ``stride`` bytes
    (substring on the binary column — JVM codegen, no Python),
    xxhash64 per shingle, 64-bit majority-vote SimHash, four 16-bit
    band buckets for candidates (Hamming<=3 guarantees at least one
    exact band match), Hamming filter, then EXACT byte-shingle Jaccard
    verification of survivors (collect_set of shingle hashes +
    array_intersect — candidate docs only). Output: (a_id, b_id,
    jaccard). Candidate recall < 1 by design (banded SimHash), hence
    rows-only at the oracle gate, same as ``dedup_simhash``.

    Scale: shingle explode is O(bytes/stride) narrow rows; the only
    shuffles are the per-doc signature aggregation and the band-bucket
    equi-join — no all-pairs path, no broadcast hints."""
    shingle_pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(payload_col) - (n - 1), F.lit(1)),
            F.lit(stride),
        )
    )
    sh = docs_with_payload.select(F.col(id_col), F.col(payload_col), shingle_pos.alias("i")).select(
        F.col(id_col),
        F.xxhash64(F.expr(f"substring({payload_col}, i, {n})")).alias("h"),
    )
    votes = [
        F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{i}")
        for i in range(64)
    ]
    agg = sh.groupBy(id_col).agg(*votes)
    sig_expr = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig_expr = term if sig_expr is None else sig_expr.bitwiseXOR(term)
    sig = agg.select(F.col(id_col), sig_expr.alias("simhash")).persist()
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
        )
        for i in range(4)
    ]
    from .dedup import _cap_buckets

    # Same quadratic-blowup guard as every text LSH path: one template
    # image re-uploaded M times lands all M payloads in one band
    # bucket -> M^2 candidate pairs without the cap (exact payload
    # dedup catches those families far cheaper). Default off.
    buckets = _cap_buckets(
        sig.select(
            F.col(id_col), F.col("simhash"), F.explode(F.array(*bands)).alias("bk")
        ).select(id_col, "simhash", "bk.band", "bk.bh"),
        max_bucket_size,
    )
    a = buckets.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("sa"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("sb"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= hamming_max)
        .select("a_id", "b_id")
        .distinct()
        .persist()
    )
    # Materialize the pair list; the set folds below stay lazy in the
    # final action (identical subplans -> exchange reuse; O(candidate
    # docs) work) — same job structure as dedup._verify_pairs.
    candidates.count()
    ids = (
        candidates.select(F.col("a_id").alias(id_col))
        .unionByName(candidates.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    # Exact verify over candidate docs only: semi-join BEFORE the
    # shingle explode (same Generate-above-LeftSemi rule as
    # dedup._verify_pairs), sets of shingle HASHES (longs) so the
    # array_intersect compares 8-byte values, not binary blobs.
    cand_sh = (
        docs_with_payload.join(ids, id_col, "left_semi")
        .select(F.col(id_col), F.col(payload_col), shingle_pos.alias("i"))
        .select(
            F.col(id_col),
            F.xxhash64(F.expr(f"substring({payload_col}, i, {n})")).alias("h"),
        )
    )
    sets = cand_sh.groupBy(id_col).agg(F.collect_set("h").alias("hs"))
    a_sets = sets.select(F.col(id_col).alias("a_id"), F.col("hs").alias("ha"))
    b_sets = sets.select(F.col(id_col).alias("b_id"), F.col("hs").alias("hb"))
    k = F.size(F.array_intersect("ha", "hb"))
    jac = k / (F.size("ha") + F.size("hb") - k)
    out = (
        candidates.join(a_sets, "a_id")
        .join(b_sets, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )
    # Materialize + release caches (see dedup._verify_pairs): the
    # returned frame must not pin per-call cache entries beyond the
    # few verified rows themselves.
    out = out.persist()
    out.count()
    candidates.unpersist()
    sig.unpersist()
    return out
