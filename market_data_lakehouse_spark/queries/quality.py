"""Data-quality pipeline operators — SURVEY §2.6 (V2).

The reference README's pre-write quality stage names "price sanity,
sequence gaps, dedup" (/root/reference/README.md:41) with no code
behind it. Here it is a declared, oracle-checked operator: exact
dedup on the event key + lag-based sequence-gap detection, producing
a per-stream quality report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_lakehouse_spark.queries.catalog import load, register
from market_data_lakehouse_spark.schema import epoch_us

GAP_US = 3_600_000_000  # 1 hour


@register(
    "v2_quality_stage",
    oracle=f"""
    WITH dedup AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id)
               AS _rn
      FROM events),
    kept AS (SELECT * FROM dedup WHERE _rn = 1),
    gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM kept)
    SELECT k.event_type,
           COUNT(*) AS n_rows,
           (SELECT COUNT(*) FROM dedup d
             WHERE d._rn > 1 AND d.event_type = k.event_type) AS n_dups_removed,
           (SELECT COUNT(*) FROM gaps g
             WHERE g.gap_us > {GAP_US} AND g.event_type = k.event_type)
             AS n_big_gaps
    FROM kept k GROUP BY k.event_type
    """,
)
def v2_quality_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-write quality stage: dedup by (user_id, ts) keeping the
    lowest event_id (deterministic), then flag inter-event gaps over
    1 hour per user. One shuffle on user_id serves both the dedup
    window and the lag window (same partitioning, Catalyst reuses
    the exchange)."""
    ev = load(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy("event_id")
    dedup = ev.withColumn("_rn", F.row_number().over(w_dedup))
    kept = dedup.filter(F.col("_rn") == 1)
    us = epoch_us(F.col("ts"), dict(ev.dtypes).get("ts"))
    w_seq = Window.partitionBy("user_id").orderBy("ts")
    gapped = kept.withColumn("gap_us", us - F.lag(us).over(w_seq))
    dups = (
        dedup.filter(F.col("_rn") > 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_dups_removed"))
    )
    report = gapped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("gap_us") > GAP_US).cast("long")).alias("n_big_gaps"),
    )
    return (
        report.join(dups, "event_type", "left")
        .select(
            "event_type",
            "n_rows",
            F.coalesce("n_dups_removed", F.lit(0)).alias("n_dups_removed"),
            "n_big_gaps",
        )
    )
