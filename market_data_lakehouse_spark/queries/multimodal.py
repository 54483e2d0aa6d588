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
