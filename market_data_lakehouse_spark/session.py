"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set per-job on a real
cluster; the scale-sensitive knobs (AQE, shuffle partitions, Arrow)
are the ones that matter at 100 TB:

- AQE on: runtime coalescing of shuffle partitions + skew-join
  splitting means one static ``shuffle.partitions`` value survives a
  1000x scale-up (AQE re-plans per stage from actual map output
  sizes).
- Arrow on: every pandas_udf / applyInPandas boundary is Arrow-batched
  instead of pickled rows.
- UTC session timezone: parquet timestamps compare identically across
  engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "market_data_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # COUNT/MIN/MAX over parquet resolve from footer metadata
        # instead of scanning data pages (used by the lazy
        # rows-scanned metric, among others).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # driver testdata events.parquet stores TIMESTAMP(NANOS) which
        # Spark's vectorized reader rejects; read as long and convert
        # (lossless for this data: ns % 1000 == 0).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
