"""Multimodal (binary) column plumbing — SURVEY §2.12 E5.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (MEDIA_SCHEMA). This container has no decode libraries, so
the decode step is a clearly-marked deterministic stub — but the
Spark-side plumbing is real: binary column construction, Arrow-batched
``mapInPandas`` feature extraction with an explicit output schema,
and partition-parallel execution.

At 100 TB: payloads dominate storage — keep them OUT of shuffle keys,
extract features early (column pruning drops the payload as soon as
the extractor has run), and size ``maxPartitionBytes`` so one Arrow
batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_data_lakehouse_spark.queries.catalog import load, register

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_KINDS = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a media table: payload = utf-8 bytes of
    the text (deterministic fake blob), kind cycles by doc_id."""
    docs = load(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extractor over binary payloads.

    A real deployment would decode image dims / audio duration here
    (PIL / libsndfile are NOT in this container). The stub derives
    deterministic pseudo-features from the payload length so the
    plumbing — batch iteration, binary access, typed output — is
    fully exercised and oracle-checkable.
    """
    for pdf in batches:
        byte_len = pdf["payload"].map(len)
        out = pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": byte_len,
            }
        )
        is_img = pdf["kind"] == "image"
        is_aud = pdf["kind"] == "audio"
        is_vid = pdf["kind"] == "video"
        out["width"] = (byte_len % 640 + 1).where(is_img | is_vid)
        out["height"] = (byte_len % 480 + 1).where(is_img | is_vid)
        out["duration_ms"] = (byte_len * 10).where(is_aud | is_vid)
        yield out


def decode_media(payload: bytes, kind: str):
    """Real decode entry point. Audio (PCM WAV) and uncompressed
    images (24-bit BMP) decode for real — neither needs an external
    codec (see ``decode_wav`` / ``e5_audio_decode`` and
    ``decode_bmp`` / ``e5_image_decode``). Compressed formats
    (JPEG/PNG/video) remain unimplemented here: the container ships
    no PIL/pyav; wire them in a real deployment and call from
    ``extract_features``.
    """
    if kind == "audio" and payload[:4] == b"RIFF":
        return decode_wav(payload)
    if kind == "image" and payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image / video decoding requires codec libraries "
        "not present in this environment; extract_features uses a "
        "deterministic stub for those kinds (WAV audio and BMP images "
        "decode for real)"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("out_bytes", T.LongType()),
    ]
)


def resize_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize stage (stub): fit into a 224x224 box preserving aspect
    ratio. A real deployment decodes with PIL and re-encodes; the
    geometry math and the Arrow plumbing here are the real thing —
    the pixel work is behind ``decode_media`` (NotImplementedError)."""
    target = 224
    for pdf in batches:
        byte_len = pdf["payload"].map(len)
        w = (byte_len % 640 + 1).astype("int64")
        h = (byte_len % 480 + 1).astype("int64")
        scale = (target / w).combine(target / h, min).clip(upper=1.0)
        out_w = (w * scale).astype("int64").clip(lower=1)
        out_h = (h * scale).astype("int64").clip(lower=1)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": w,
                "height": h,
                "out_w": out_w,
                "out_h": out_h,
                "out_bytes": out_w * out_h * 3,
            }
        )


@register(
    "e5_media_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS bl
      FROM documents WHERE doc_id % 3 = 0),
    g AS (SELECT media_id, bl % 640 + 1 AS w, bl % 480 + 1 AS h FROM m),
    s AS (SELECT *, LEAST(224.0 / w, 224.0 / h, 1.0) AS scale FROM g)
    SELECT media_id, 'image' AS kind,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           GREATEST(CAST(FLOOR(w * scale) AS BIGINT), 1) AS out_w,
           GREATEST(CAST(FLOOR(h * scale) AS BIGINT), 1) AS out_h,
           GREATEST(CAST(FLOOR(w * scale) AS BIGINT), 1)
             * GREATEST(CAST(FLOOR(h * scale) AS BIGINT), 1) * 3
             AS out_bytes
    FROM s
    """,
)
def e5_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline stage over binary media (E5): filter to
    images (payload pruned into the Arrow batch only for matching
    rows), mapInPandas geometry, typed output.

    Oracle-exact since r8 (was rows-only): the fit-into-224-box
    geometry is two correctly-rounded IEEE-double ops (one division
    in the scale, one multiplication before the floor), so pandas
    and DuckDB compute bit-identical scales and the floored output
    dims hash-match exactly — the same single-rounding argument as
    e6_weighted_sample's priorities."""
    media = media_table(spark, sf_dir).filter(F.col("kind") == "image")
    return media.mapInPandas(resize_images, schema=RESIZE_SCHEMA)


@register(
    "e5_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2)
    SELECT media_id, duration_ms,
           CAST(gs.f AS BIGINT) AS frame_idx,
           CAST(gs.f * (duration_ms // 8) AS BIGINT) AS frame_offset_ms
    FROM v, generate_series(0, 7) AS gs(f)
    """,
)
def e5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (E5): 8 uniformly-spaced frame
    offsets per video — the explode produces one row per frame for a
    downstream (stubbed) decoder. Pure JVM: posexplode of a sequence,
    no Python."""
    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    dur = (F.octet_length("payload") * 10).cast("long")
    frames = media.select(
        "media_id",
        dur.alias("duration_ms"),
        F.posexplode(F.sequence(F.lit(0), F.lit(7))).alias("frame_idx", "_f"),
    )
    return frames.select(
        "media_id",
        "duration_ms",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * F.expr("duration_ms div 8")).cast("long").alias(
            "frame_offset_ms"
        ),
    )


@register(
    "e5_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS byte_len,
           CASE WHEN doc_id % 3 IN (0, 2)
                THEN octet_length(encode(text)) % 640 + 1 END AS width,
           CASE WHEN doc_id % 3 IN (0, 2)
                THEN octet_length(encode(text)) % 480 + 1 END AS height,
           CASE WHEN doc_id % 3 IN (1, 2)
                THEN octet_length(encode(text)) * 10 END AS duration_ms
    FROM documents
    """,
)
def e5_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: build media table -> mapInPandas
    feature extraction (Arrow batches) -> typed feature rows. The
    payload column is pruned away after extraction."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real audio decode (r6): PCM16 WAV is decodable with the Python
# STDLIB (`wave` + numpy) — no external codec needed — so the audio
# third of the multimodal story is genuinely implemented end-to-end:
# real RIFF/WAVE containers are synthesized as the binary payloads,
# and the extractor parses the actual container + PCM samples.
# Image/video stay stubbed behind decode_media (no PIL/pyav here).
# ---------------------------------------------------------------------------

AUDIO_SAMPLE_RATE = 16_000

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def _wav_params(media_id: int) -> tuple[int, int, int]:
    """Deterministic (n_frames, amplitude, half_period) per id — the
    closed-form contract the DuckDB oracle recomputes."""
    dur_ms = media_id % 50 + 10
    n_frames = dur_ms * (AUDIO_SAMPLE_RATE // 1000)
    amp = media_id % 8_000 + 1_000
    half_period = media_id % 20 + 2
    return n_frames, amp, half_period


def synth_wav(media_id: int) -> bytes:
    """A real RIFF/WAVE container: PCM16 mono square wave at
    ``amp`` alternating every ``half_period`` frames. Square, not
    sine, so RMS == peak == amp EXACTLY in integer arithmetic — the
    decoded stats are oracle-checkable with no float tolerance."""
    import io
    import wave

    import numpy as np

    n_frames, amp, half = _wav_params(media_id)
    idx = np.arange(n_frames)
    samples = np.where((idx // half) % 2 == 0, amp, -amp).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_SAMPLE_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL decode of any PCM16 mono WAV: parses the RIFF container
    with the stdlib ``wave`` reader and the samples with numpy."""
    import io
    import math
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    return {
        "sample_rate": rate,
        "n_frames": n,
        "duration_ms": n * 1000 // rate,
        "rms": int(round(math.sqrt(float((s * s).mean())))) if n else 0,
        "peak": int(np.abs(s).max()) if n else 0,
    }


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio slice of the media table with REAL WAV payloads
    (synthesized per media_id inside the Arrow batches — the payload
    column holds genuine RIFF containers, not pseudo-bytes)."""
    ids = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)  # the 'audio' residue class
        .select(F.col("doc_id").alias("media_id"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        synth_wav(int(m)) for m in pdf["media_id"]
                    ],
                }
            )

    return ids.mapInPandas(
        gen, schema="media_id long, payload binary"
    )


@register(
    "e5_audio_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16000 AS BIGINT) AS sample_rate,
           CAST((doc_id % 50 + 10) * 16 AS BIGINT) AS n_frames,
           CAST(doc_id % 50 + 10 AS BIGINT) AS duration_ms,
           CAST(doc_id % 8000 + 1000 AS BIGINT) AS rms,
           CAST(doc_id % 8000 + 1000 AS BIGINT) AS peak
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def e5_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode pipeline (E5, de-stubbed r6): synthesize
    genuine PCM16 WAV containers as the binary payload column, then
    decode them — RIFF header AND samples — in an Arrow-batched
    extractor using only the stdlib ``wave`` reader + numpy. The
    oracle recomputes every decoded stat from the synthesis contract
    in closed form (square wave: RMS == peak == amplitude exactly),
    so a single corrupted byte, header misparse, or sample-order bug
    diverges the hash. Image/video decode remain stubbed
    (``decode_media``) — no codecs in this container; WAV needs
    none."""
    audio = audio_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return audio.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image decode (r7 de-stub): 24-bit BMP is decodable with struct +
# numpy alone — like WAV, it needs no codec library, so the image leg
# of the pipeline can be genuine end-to-end. Only compressed formats
# (JPEG/PNG/video) remain behind the decode_media stub.
# ---------------------------------------------------------------------------


def _bmp_params(media_id: int) -> tuple[int, int]:
    """(width, height) for the synthesized bitmap — small enough that
    the gradient pattern never wraps mod 256, keeping every channel
    sum in closed form."""
    return media_id % 40 + 8, media_id % 25 + 8


def synth_bmp(media_id: int) -> bytes:
    """A real 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows with 4-byte padding. Pixel
    (x, y): B = x, G = y, R = x + y — sums have exact closed forms
    (sum_b = h*w*(w-1)/2, sum_g = w*h*(h-1)/2, sum_r = sum_b+sum_g),
    so the decoded stats are oracle-checkable in integer arithmetic."""
    import struct

    import numpy as np

    w, h = _bmp_params(media_id)
    x = np.arange(w, dtype=np.uint8)
    row_pad = (-3 * w) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        bgr = np.empty((w, 3), dtype=np.uint8)
        bgr[:, 0] = x  # B
        bgr[:, 1] = y  # G
        bgr[:, 2] = x + y  # R (no wrap: w + h < 256)
        rows.append(bgr.tobytes() + b"\x00" * row_pad)
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    )
    return header + info + pixels


def decode_bmp(payload: bytes) -> dict:
    """REAL decode of any 24-bit uncompressed BMP: parses both
    headers with struct, validates magic/bpp/compression, and reads
    the padded bottom-up pixel rows with numpy."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} "
            f"comp={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    s = rows.astype(np.int64).sum(axis=(0, 1))
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_b": int(s[0]),
        "sum_g": int(s[1]),
        "sum_r": int(s[2]),
    }


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
    ]
)


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image slice of the media table with REAL BMP payloads
    (synthesized per media_id inside the Arrow batches)."""
    ids = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)  # the 'image' residue class
        .select(F.col("doc_id").alias("media_id"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        synth_bmp(int(m)) for m in pdf["media_id"]
                    ],
                }
            )

    return ids.mapInPandas(gen, schema="media_id long, payload binary")


@register(
    "e5_image_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(doc_id % 40 + 8 AS BIGINT) AS w,
             CAST(doc_id % 25 + 8 AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 = 0)
    SELECT doc_id AS media_id, w AS width, h AS height,
           w * h AS n_pixels,
           h * (w * (w - 1) // 2) AS sum_b,
           w * (h * (h - 1) // 2) AS sum_g,
           h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS sum_r
    FROM dims
    """,
)
def e5_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode pipeline (E5, de-stubbed r7 — the image twin
    of r6's WAV de-stub): synthesize genuine 24-bit BMP containers as
    the binary payload column, then decode them — headers, row
    padding, bottom-up order AND pixels — in an Arrow-batched
    extractor using struct + numpy only. The oracle recomputes every
    decoded stat from the synthesis contract in closed form (gradient
    pattern: exact integer channel sums), so a single padding slip,
    row-order bug, or channel swap diverges the hash. Compressed
    formats (JPEG/PNG/video) remain honestly stubbed in
    ``decode_media`` — they need codec libraries this container
    lacks; BMP, like WAV, needs none."""
    imgs = image_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_bmp(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return imgs.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)
