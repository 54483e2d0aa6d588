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


@register(
    "v4_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ABS(ROUND((e.value - s.mu) / s.sigma, 6)) > 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(MAX(ABS((e.value - s.mu) / s.sigma)), 4) AS max_abs_z
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
)
def v4_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-spike anomaly detection: per-instrument z-score against
    the instrument's own mean/stddev, flagging |z| > 3 (the README's
    "price sanity" check made statistical). Two-pass shape that
    scales: pass one is a map-side-combined groupBy producing one
    (mu, sigma) row per instrument; the tiny stats table broadcasts
    back onto the scan, so the big side is touched exactly twice with
    no wide shuffle — same plan at 100 TB with a 10k-symbol universe.
    The threshold compares the z-score ROUNDed to 6 in both engines
    so last-ulp drift in mu/sigma can't flip membership at the
    boundary."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.abs(F.round(z, 6)) > 3).cast("long")
            ).alias("n_anomalies"),
            F.round(F.max(F.abs(z)), 4).alias("max_abs_z"),
        )
    )


@register(
    "v5_drift_psi",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 'a' ELSE 'b' END AS period,
             LEAST(9, GREATEST(0, CAST(FLOOR(value / 50) AS INT))) AS bin
      FROM events),
    c AS (SELECT event_type, period, bin, COUNT(*) AS n
          FROM ev GROUP BY 1, 2, 3),
    t AS (SELECT event_type, period, SUM(n) AS tot FROM c GROUP BY 1, 2),
    grid AS (SELECT DISTINCT ev.event_type, gs.b AS bin
             FROM ev, (SELECT UNNEST(range(0, 10)) AS b) gs),
    p AS (SELECT g.event_type, g.bin,
            (COALESCE(ca.n, 0) + 1.0) / (ta.tot + 10.0) AS pa,
            (COALESCE(cb.n, 0) + 1.0) / (tb.tot + 10.0) AS pb
          FROM grid g
          JOIN t ta ON ta.event_type = g.event_type AND ta.period = 'a'
          JOIN t tb ON tb.event_type = g.event_type AND tb.period = 'b'
          LEFT JOIN c ca ON ca.event_type = g.event_type
                        AND ca.bin = g.bin AND ca.period = 'a'
          LEFT JOIN c cb ON cb.event_type = g.event_type
                        AND cb.bin = g.bin AND cb.period = 'b')
    SELECT event_type,
           ROUND(SUM((pa - pb) * LN(pa / pb)), 6) AS psi,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM p GROUP BY event_type
    """,
)
def v5_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection via Population Stability Index:
    per event_type, compare the value distribution of the first half
    of the month against the second over 10 fixed-width bins
    (Laplace-smoothed so empty bins never divide by zero; PSI > 0.2
    is the conventional 'investigate' threshold). The data-quality
    gate a feature pipeline runs before refreshing a training set.
    Scale shape: everything reduces to per-(type, period, bin)
    counts — one map-side-combined aggregate over the scan; the bin
    grid and per-period totals are dim-sized broadcasts; no row-level
    join anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "a"
        )
        .otherwise("b")
        .alias("period"),
        F.least(
            F.lit(9),
            F.greatest(F.lit(0), F.floor(F.col("value") / 50).cast("int")),
        ).alias("bin"),
    )
    c = ev.groupBy("event_type", "period", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("event_type", "period").agg(F.sum("n").alias("tot"))
    bins = ev.sparkSession.range(10).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(bins))
    ta = t.filter(F.col("period") == "a").select("event_type", F.col("tot").alias("tot_a"))
    tb = t.filter(F.col("period") == "b").select("event_type", F.col("tot").alias("tot_b"))
    ca = c.filter(F.col("period") == "a").select("event_type", "bin", F.col("n").alias("n_a"))
    cb = c.filter(F.col("period") == "b").select("event_type", "bin", F.col("n").alias("n_b"))
    p = (
        grid.join(F.broadcast(ta), "event_type")
        .join(F.broadcast(tb), "event_type")
        .join(F.broadcast(ca), ["event_type", "bin"], "left")
        .join(F.broadcast(cb), ["event_type", "bin"], "left")
        .select(
            "event_type",
            ((F.coalesce(F.col("n_a"), F.lit(0)) + 1.0) / (F.col("tot_a") + 10.0)).alias("pa"),
            ((F.coalesce(F.col("n_b"), F.lit(0)) + 1.0) / (F.col("tot_b") + 10.0)).alias("pb"),
        )
    )
    return p.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 6
        ).alias("psi"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )


def expectation_report(
    df: DataFrame, expectations: dict[str, str]
) -> DataFrame:
    """Declarative data-quality expectations (the Great-Expectations
    / dbt-test pattern as one operator): each entry is a NAME -> SQL
    boolean expression evaluated per row; the report has one row per
    expectation with pass/fail counts and the pass rate. SQL
    three-valued semantics: a NULL verdict counts as neither pass
    nor fail (tracked separately) — "95% of rows have a valid email"
    must not be poisoned by rows where the column is legitimately
    absent.

    ONE aggregate pass computes every expectation (conditional sums,
    map-side combined), then a tiny unpivot of the single result row
    — cost is one table scan regardless of expectation count, the
    only shape that survives a 100 TB nightly audit."""
    verdicts = {n: F.expr(e).cast("boolean") for n, e in expectations.items()}
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            m
            for n, v in verdicts.items()
            for m in (
                F.sum(v.cast("int")).alias(f"_p_{n}"),
                F.sum((~v).cast("int")).alias(f"_f_{n}"),
            )
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("expectation"),
                F.coalesce(F.col(f"_p_{n}"), F.lit(0)).cast("long").alias(
                    "n_pass"
                ),
                F.coalesce(F.col(f"_f_{n}"), F.lit(0)).cast("long").alias(
                    "n_fail"
                ),
            )
            for n in expectations
        ]
    )
    ex = agg.select(
        F.col("_n").cast("long").alias("n_rows"), F.explode(pairs).alias("e")
    )
    return ex.select(
        F.col("e.expectation").alias("expectation"),
        "n_rows",
        F.col("e.n_pass").alias("n_pass"),
        F.col("e.n_fail").alias("n_fail"),
        (F.col("n_rows") - F.col("e.n_pass") - F.col("e.n_fail"))
        .cast("long")
        .alias("n_null"),
        F.round(
            F.col("e.n_pass")
            / F.greatest(F.col("e.n_pass") + F.col("e.n_fail"), F.lit(1)),
            6,
        ).alias("pass_rate"),
    )


@register(
    "v6_expectation_suite",
    oracle="""
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        CAST(SUM(CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        CAST(SUM(CASE WHEN event_type IN ('click','view','purchase','signup','refund')
                 THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        CAST(SUM(CASE WHEN NOT (event_type IN ('click','view','purchase','signup','refund'))
                 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        CAST(SUM(CASE WHEN NOT (ts >= TIMESTAMP '2024-01-01') THEN 1 ELSE 0 END) AS BIGINT) AS f3,
        CAST(SUM(CASE WHEN user_id BETWEEN 0 AND 10000 THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        CAST(SUM(CASE WHEN NOT (user_id BETWEEN 0 AND 10000) THEN 1 ELSE 0 END) AS BIGINT) AS f4,
        CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS p5,
        CAST(SUM(CASE WHEN NOT json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS f5
      FROM events
    )
    SELECT u.expectation, a.n_rows, u.n_pass, u.n_fail,
           CAST(a.n_rows - u.n_pass - u.n_fail AS BIGINT) AS n_null,
           ROUND(u.n_pass * 1.0 /
                 GREATEST(u.n_pass + u.n_fail, 1), 6) AS pass_rate
    FROM agg a, LATERAL (
      SELECT * FROM (VALUES
        ('value_non_negative', a.p1, a.f1),
        ('known_event_type',   a.p2, a.f2),
        ('ts_in_2024',         a.p3, a.f3),
        ('user_id_in_range',   a.p4, a.f4),
        ('props_is_json',      a.p5, a.f5)
      ) AS v(expectation, n_pass, n_fail)
    ) u
    """,
)
def v6_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over the events stream (V-family
    r6): five expectations — range, domain membership, temporal
    bound, key range, JSON validity — evaluated in ONE scan with
    per-expectation pass/fail/null counts and rates. The oracle
    recomputes every cell with explicit CASE sums."""
    ev = load(spark, sf_dir, "events")
    return expectation_report(
        ev,
        {
            "value_non_negative": "value >= 0",
            "known_event_type": (
                "event_type IN ('click','view','purchase','signup','refund')"
            ),
            "ts_in_2024": "ts >= TIMESTAMP '2024-01-01'",
            "user_id_in_range": "user_id BETWEEN 0 AND 10000",
            "props_is_json": "get_json_object(props, '$') IS NOT NULL",
        },
    )
