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
    """Real decode entry point — intentionally unimplemented here.

    The container ships no image/audio/video codecs; wire PIL /
    torchaudio / pyav in a real deployment and call it from
    ``extract_features``.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this environment; extract_features uses a deterministic stub"
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


@register("e5_media_resize")  # rows-only: float geometry in pandas
def e5_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline stage over binary media (E5): filter to
    images (payload pruned into the Arrow batch only for matching
    rows), mapInPandas geometry, typed output."""
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
