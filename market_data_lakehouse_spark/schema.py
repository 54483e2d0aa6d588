"""Canonical schemas for the engine.

The reference declares its record shape as a frozen dataclass
(``OHLCVBar``, lakehouse.py:50-71) and hand-builds an Arrow schema at
write time (lakehouse.py:549-558) — storing timestamps as ISO-8601
*strings*. We fix that quirk (SURVEY.md §1.4-1): timestamps are real
``TimestampType`` columns; observable query semantics are unchanged
because the reference parses back to ``datetime`` before comparing.

A derived ``date`` column is the partition key, mirroring the
reference's ``base_path/YYYY-MM-DD/`` directory-per-day layout
(lakehouse.py:22, 156-178) as a Hive-style partition column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Asset-class domain (reference lakehouse.py:41-47).
ASSET_CLASSES = ("equity", "option", "future", "forex", "crypto")

# OHLCVBar (reference lakehouse.py:50-71; Arrow types at 549-558).
BAR_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), False),
        T.StructField("high", T.DoubleType(), False),
        T.StructField("low", T.DoubleType(), False),
        T.StructField("close", T.DoubleType(), False),
        T.StructField("volume", T.LongType(), False),
        T.StructField("asset_class", T.StringType(), False),
    ]
)

# TickData (reference README.md:72-73): int64-ns timestamp, symbol,
# price, volume. We use TimestampType for ts.
TICK_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("volume", T.LongType(), False),
    ]
)

# Quote table for as-of joins (FIXTURES.md §3).
QUOTE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("bid", T.DoubleType(), False),
        T.StructField("ask", T.DoubleType(), False),
    ]
)

# Multimodal blob column family (north-star E5): opaque binary payload
# plus typed metadata. Decode is a stub in this container (no image /
# audio libs) — the schema and plumbing are the real, tested part.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

# Driver star-schema table names (TESTDATA.md).
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str, raw: bool = False):
    """Read one driver parquet table (TESTDATA.md layout).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as a
    nanos-since-epoch long under ``legacy.parquet.nanosAsLong``; we
    convert to a real TimestampType (micros — lossless here, the
    generator emits microsecond precision).

    ``raw=True`` skips that conversion: the projection wrapping ``ts``
    in ``timestamp_micros(ts div 1000)`` makes any time predicate
    un-pushable (the scan shows it as a post-scan DataFilter, never a
    PushedFilter). Time-range queries filter the raw nanos long first
    — plain int64 comparisons the parquet reader can evaluate against
    row-group statistics — then convert the survivors.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if raw:
        return df
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division, NOT `/`: float division promotes the ns
        # epoch (~1.75e18) past double's 53-bit exact range and can be
        # off by ~0.1 µs vs the DuckDB oracle (VERDICT r1 item 1).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def epoch_us(col, dtype: str | None = None):
    """Epoch-microseconds of a timestamp column, robust to the three
    shapes driver testdata has shipped: TIMESTAMP (LTZ), TIMESTAMP_NTZ
    (parquet ``timestamp[us]`` without UTC adjustment), and the legacy
    nanos-as-long read.

    Pass ``dtype`` (the column's Spark ``simpleString``, e.g.
    ``dict(df.dtypes)["ts"]``) to select an exact branch:

    - ``"timestamp"`` — ``unix_micros`` directly: an absolute instant,
      timezone-free.
    - ``"timestamp_ntz"`` — ``timestamp_diff`` against the NTZ epoch
      literal: wall clock interpreted as UTC *independent of the
      session timezone* (an NTZ->LTZ cast would shift by the session
      offset; verified +5h under America/New_York).
    - ``"bigint"`` — exact integer ns->µs through decimal. A long cast
      straight to TIMESTAMP is interpreted as SECONDS since epoch and
      saturates at Long.MAX — silently wrong (ADVICE r2).

    Without ``dtype`` the legacy cast path is used, which is correct
    only under a UTC session timezone (session.get_spark pins it); the
    helper raises on a non-UTC session rather than silently shifting,
    and cannot detect bigint input — resolve the dtype at the call
    site when the column may be a raw nanos long.
    """
    from pyspark.sql import functions as F

    if dtype in ("bigint", "long", "int"):
        return (col.cast("decimal(38,0)") / 1000).cast("long")
    if dtype == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            col,
        )
    if dtype == "timestamp":
        return F.unix_micros(col)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise ValueError(
                "epoch_us without an explicit dtype requires a UTC "
                f"session timezone (got {tz!r}): the NTZ->LTZ cast "
                "would shift wall-clock by the session offset. Pass "
                'dtype=dict(df.dtypes)["<col>"] for the exact branch.'
            )
    return F.unix_micros(col.cast("timestamp"))


def register_views(spark, sf_dir: str, tables=STAR_TABLES) -> None:
    """Register the driver tables as temp views for spark.sql()."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
