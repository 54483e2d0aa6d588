"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "headline_queries_total", "value": <sum sec>,
     "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with a noop sink (full execution, no
driver collect). Per-query time is the minimum over INTERLEAVED
passes of the whole set (3 for the headline set, 2 for the heavy
set): the first pass pays one-time costs (codegen, file listing) and
later passes are the steady state a warmed cluster sees — matching
how BASELINE.md's numbers (50 ms filter / 2 s full agg / 350 ms
100-key agg) were measured — while the pass separation keeps a
transient host-pressure window from inflating every repeat of the
same query at once.

CLEAN-WINDOW PROTOCOL (r10 VERDICT #7, standing practice): numbers
recorded round-over-round must come from an uncontended host window.
Every run self-certifies via two controls — the job-floor probe
(cheapest possible Spark action, band calibrated in AB_BENCH.json)
and the fixed-work CPU-throughput probe (sum over range(5e8), 32
parts, band [0.10, 0.30] s) — and the result line carries
``contamination.contaminated`` / ``cpu_contended``. Before a run
whose numbers you intend to KEEP, check the CPU control first
(``python bench.py --preflight`` — prints the control median and a
CLEAN/CONTENDED verdict in ~30 s without running any query);
if its median sits above the band max, the host is carrying ambient
load — defer the run rather than adjudicate 20 phantom drifts
(r10's ambient-load episode cost five reruns). A contaminated run's
per-query flags are suppressed automatically, but the honest fix is
a clean window, not suppression.

The result JSON is guaranteed to be the FINAL stdout line (gates run
before it, the Spark session is stopped, and the line re-parses
itself) — the driver's parser reads the tail of merged output.
"""

from __future__ import annotations

import atexit
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_lakehouse_spark.queries import REGISTRY  # noqa: E402
from market_data_lakehouse_spark.session import get_spark  # noqa: E402

# BASELINE.md mapping:
#   single-stock filter (50 ms)  -> q_filter_range / q_scan_project
#   aggregate-all (2 s)          -> q_agg_full
#   100-key aggregation (350 ms) -> q_agg_100key
# plus the flagship VWAP and one representative per operator family.
HEADLINE = {
    "q_scan_project": "s1_scan_project",
    "q_filter_range": "f2_time_range",
    "q_agg_full": "a3_full_table_agg",
    "q_agg_100key": "a4_multikey_100",
    "q_vwap_top10": "a2_vwap_top10",
    "q_pricing_summary": "a4_pricing_summary",
    "q_ohlcv_resample": "a5_ohlcv_resample",
    "q_join_broadcast": "j3_broadcast_join",
    "q_join_shuffle": "j1_inner_join",
    "q_topk": "o2_topk",
    "q_window_rank": "w2_rank_topn",
    "q_asof_join": "j6_asof_join",
    "q_dedup_hash": "e1_dedup_by_hash",
    "q_knn_cosine": "e3_knn_bruteforce",
    "q_json_extract": "x7_json_extract",
}

# Round 3+: LLM-pipeline + sessionization cost shapes tracked
# round-over-round. Run AFTER the shared-16 set and the ingest pass —
# the multi-stage LSH queries churn the JVM (GC pressure, codegen
# cache) enough to pollute cheap neighbors' timings when interleaved.
HEAVY = {
    "q_sessionize": "w6_sessionize",
    "q_corpus_clean": "e4_corpus_clean",
    "q_minhash_lsh": "e2_minhash_lsh",
    "q_lsh_verified": "e2_lsh_verified_jaccard",
    "q_ann_lsh": "e3_ann_lsh",
    # round 4: market-risk + analytics additions (cheap, tracked for
    # round-over-round drift like the rest)
    "q_ewma": "w9_ewma",
    "q_corr_matrix": "a12_corr_matrix",
    "q_anomaly_zscore": "v4_anomaly_zscore",
    "q_funnel": "a13_funnel",
    # round 4b: multi-join warehouse shapes + sequence packing
    "q_tpch_q3": "j11_shipping_priority",
    "q_tpch_q5": "j12_regional_revenue",
    "q_tpch_q18": "a14_big_orders",
    "q_pack_sequences": "e7_pack_sequences",
    # round 4c: PQ two-stage ANN and the 8-table market-share join
    "q_pq_knn": "e3_pq_knn",
    "q_tpch_q8": "j15_market_share",
    # round 6: the new hard shapes tracked for drift from now on —
    # Q21's exists+not-exists pair, the nearest as-of (two window
    # carries over one shuffle), and 5-iteration PageRank
    "q_tpch_q21": "j17_waiting_suppliers",
    "q_asof_nearest": "j6_asof_nearest",
    "q_pagerank": "g1_pagerank",
    # round 7: the new hard shapes — degree-oriented triangle
    # counting (3 shuffles over the co-purchase graph), the Q9
    # 5-table snowflake, the Q6 pure-pushdown row, the SCD2 window
    # kernel, and the deletion-vector DELETE end-to-end (lake build
    # + 2 dv commits + vectored read)
    "q_triangle_count": "g2_triangle_count",
    "q_tpch_q9": "a22_nation_profit",
    "q_tpch_q6": "a19_forecast_revenue",
    "q_scd2_rebuild": "t12_scd2_rebuild",
    "q_deletion_vectors": "s12_deletion_vectors",
    # round 8: merge-on-read UPDATE end-to-end (lake build + dv
    # update + vectored read), the k-core peel (4 iterative
    # shuffle rounds over a shrinking subgraph), and the zero-shuffle
    # radius search
    "q_dv_update": "s14_dv_update",
    "q_kcore": "g4_kcore",
    "q_range_search": "e3_range_search",
    "q_connected_components": "g5_connected_components",
    # round 10: the new lake subsystems tracked for drift from now
    # on — type widening (widen + mixed-era reads + DML) and row
    # tracking (enable + compaction-stable ids + dv delete + CoW
    # update + id-join read), each end-to-end lake builds
    "q_type_widening": "s21_type_widening",
    "q_row_tracking": "s22_row_tracking",
    # r11: lifecycle exerciser — build lake, cluster, incremental
    # maintenance pass, dv delete, skipping-verified range read
    "q_liquid_clustering": "s23_liquid_clustering",
}


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# Job-floor control (r8 VERDICT directive 1): the cheapest possible
# Spark action on this host — range(1) through a noop write — was
# calibrated in a controlled JVM at 50-193 ms (AB_BENCH.json
# `absolute_job_floor_sec`, 10 samples, median 76 ms). Its cost has
# no data, no shuffle, and no codegen dependence on this repo's code,
# so an elevated control sample can ONLY mean host pressure
# (concurrent load, CPU contention) during that window. Interleaving
# control samples through the run makes a hot invocation
# self-labeling: per-query flags from a run whose controls sit above
# the band are contamination, not regression.
CONTROL_BAND_SEC = (0.05, 0.193)  # calibrated band, this host
CONTROL_LIMIT_SEC = 0.25  # band max + margin; above = hot window


def job_floor_control(spark) -> float:
    t0 = time.perf_counter()
    spark.range(1).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# CPU-throughput control (r10): the job-floor probe catches LAUNCH
# contention but is blind to sustained CPU steal — an external tenant
# burning 30% of every core lifts 0.4 s queries by 40% while 70 ms
# floor probes stay inside their band (observed: a loadavg-9 episode
# benched 1.4x across the board with a clean floor control). This
# probe is FIXED CPU-bound work (codegen'd sum over an arithmetic
# map, 32 static partitions, no data, no shuffle): its duration is
# inversely proportional to the CPU share Spark actually got in that
# window. Band calibrated on this host at idle (see AB_BENCH.json
# `cpu_control_calibration` and `cpu_control_calibration_r13`: the
# r10 band max of 0.30 sat INSIDE this host's current idle variance
# — two r13 idle bursts at loadavg 0.4-0.9 measured medians
# 0.255-0.280 with single samples to 0.37, and it cost r12 a full
# driver run on a 0.3006 median — so the band was RE-CALIBRATED with
# the same protocol, not widened ad hoc: idle median ~0.28 + the
# original 50% headroom).
CPU_CONTROL_N = 500_000_000
CPU_BAND_SEC = (0.10, 0.42)  # recalibrated band, this host (r13)
CPU_LIMIT_SEC = 0.55  # band max + margin; above = contended window


def cpu_throughput_control(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, CPU_CONTROL_N, 1, 32).selectExpr(
        "sum(id * 2 + 1) as s"
    ).collect()
    return time.perf_counter() - t0


# Parquet-WRITE control (r14, VERDICT r13 directive 1): the job-floor
# and CPU probes are both blind to DISK throughput — r13's two
# unadjudicated flags were exactly the write-path queries (stream
# ingest 3.7x, q_ingest_batch 1.88x; the r14 cross-rev A/B proved
# both were the host, AB_BENCH.json `r14_writepath_ab`). This probe
# is FIXED write work: 2M rows x 2 bigint cols to snappy parquet
# (8 files, ~16 MB) in a throwaway dir — its duration tracks the
# write path (task commit + codec + filesystem) and nothing in this
# repo's code. Calibrated at idle (AB_BENCH.json
# `write_control_calibration_r14`): warm median 0.269 s, spread
# 0.255-0.37, with a long cold warm-in (first samples to ~1.3 s) —
# hence 3 untimed warmups at session start and a deliberately
# generous band max (~2x warm median): the probe exists to catch the
# gross write-collapse class (a 3.7x step reads >1 s), not 10% drift.
WRITE_CONTROL_ROWS = 2_000_000
# Calibrated band, THIS host (r14). The numbers are host-specific by
# nature (they measure this machine's disk), so they are overridable
# without a code edit (r14 ADVICE: on any other machine the bench
# would read contaminated even at idle): set
# SPARK_GRAFT_WRITE_BAND="lo,hi[,limit]" after recalibrating with the
# write_control_calibration protocol (3 untimed warmups, >=12 timed
# samples at idle; band max ~2x warm median, limit = max + margin).
WRITE_BAND_SEC = (0.10, 0.55)
WRITE_LIMIT_SEC = 0.75  # band max + margin; above = hot write window
if os.environ.get("SPARK_GRAFT_WRITE_BAND"):
    try:
        _wb = [float(x) for x in
               os.environ["SPARK_GRAFT_WRITE_BAND"].split(",")]
    except ValueError:
        _wb = []  # non-numeric -> the same loud refusal below
    # limit must sit at or above the band max, or a sample in
    # (limit, hi] would read in-band and over-limit at once
    if (
        len(_wb) not in (2, 3)
        or _wb[0] >= _wb[1]
        or (len(_wb) == 3 and _wb[2] < _wb[1])
    ):
        raise SystemExit(
            "SPARK_GRAFT_WRITE_BAND must be numeric 'lo,hi[,limit]' "
            "with lo < hi <= limit, got "
            f"{os.environ['SPARK_GRAFT_WRITE_BAND']!r}"
        )
    WRITE_BAND_SEC = (_wb[0], _wb[1])
    WRITE_LIMIT_SEC = _wb[2] if len(_wb) == 3 else _wb[1] + 0.2


def write_throughput_control(spark) -> float:
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="bench_wrctl_")
    try:
        t0 = time.perf_counter()
        spark.range(0, WRITE_CONTROL_ROWS, 1, 8).selectExpr(
            "id", "id * 2 as v"
        ).write.mode("overwrite").parquet(os.path.join(d, "p"))
        return time.perf_counter() - t0
    finally:
        _shutil.rmtree(d, ignore_errors=True)


def _git_identity() -> dict:
    """``{"git_sha": <HEAD sha>, "git_dirty": bool}`` for the repo
    this file lives in, or ``{}`` when git is unavailable — the
    stamp is forensic metadata, never a bench failure."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not re.fullmatch(r"[0-9a-f]{40}", sha):
            return {}
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        # bench artifacts the run itself rewrites are not code drift
        code_dirty = any(
            not re.search(
                r"(BENCH|AB_BENCH|PLAN_AUDIT|SCALE_PROBE|CORRECTNESS"
                r"|LEAKCHECK|COPYCHECK|PROGRESS)", ln
            )
            for ln in dirty.splitlines()
        )
        return {"git_sha": sha, "git_dirty": code_dirty}
    except Exception:
        return {}


def bench_ingest(spark, sf_dir: str) -> float:
    """Validated partitioned ingest of the full lineitem table as
    bars (~600k rows at sf0.1) — the BASELINE.md ingestion-throughput
    analog (reference README.md:86-91)."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from market_data_lakehouse_spark.lakehouse import DataLakehouse
    from market_data_lakehouse_spark.schema import load_table

    li = load_table(spark, sf_dir, "lineitem")
    # Realistic feed shape: the batch spans ~30 calendar days (a
    # market-data ingest is a dense daily stream, not lineitem's
    # 7-year sparse spread — 2500 partition dirs of 240 rows each is
    # the small-files pathology date partitioning exists to avoid).
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01
        + (F.col("l_orderkey") % 30) * 86400
        + F.col("l_partkey") % 86400
    )
    bars = li.select(
        F.col("l_returnflag").alias("symbol"),
        ts.alias("timestamp"),
        F.col("l_extendedprice").alias("open"),
        (F.col("l_extendedprice") + 1).alias("high"),
        (F.col("l_extendedprice") - 1).alias("low"),
        F.col("l_extendedprice").alias("close"),
        F.col("l_orderkey").alias("volume"),
        F.lit("equity").alias("asset_class"),
    )
    # Best of two, matching the per-query policy above: the first
    # run pays one-time codegen for the observe+rebalance write plan;
    # the second is the steady state. Each run writes a fresh lake.
    best = float("inf")
    for _ in range(2):
        d = os.path.join(
            tempfile.gettempdir(), f"bench_{uuid.uuid4().hex[:8]}"
        )
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        lake = DataLakehouse(spark, d)
        t0 = time.perf_counter()
        stats = lake.ingest_batch(bars)
        best = min(best, time.perf_counter() - t0)
        assert stats.rows_ingested > 0
    return best


def bench_ingest_stream(spark, sf_dir: str) -> dict:
    """Streaming-ingest throughput — BASELINE.md's headline row
    (reference README.md:86-92 claims 10.2 M events/s, 150 ms flush
    latency for an in-memory ring buffer): the honest comparable here
    is `stream_ingest_transactional` draining a pre-generated tick
    set with availableNow over multiple micro-batches, every batch an
    atomic exactly-once commit to a TransactionalLake. Reports
    elapsed, rows/s, and mean per-batch latency.

    Best of two full stream runs (fresh lake + checkpoint each),
    matching the per-query policy: the first run's batch 0 pays the
    write plan's one-time codegen, which a long-lived streaming job
    pays once per JVM, not once per trigger — the second run is the
    steady per-batch commit cost this metric tracks."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from market_data_lakehouse_spark.schema import load_table
    from market_data_lakehouse_spark.streaming import (
        stream_ingest_transactional,
    )
    from market_data_lakehouse_spark.txnlog import TransactionalLake

    li = load_table(spark, sf_dir, "lineitem")
    ts = F.timestamp_seconds(
        F.lit(1704067200)
        + (F.col("l_orderkey") % 30) * 86400
        + F.col("l_partkey") % 86400
    )
    bars = li.select(
        F.col("l_returnflag").alias("symbol"),
        ts.alias("timestamp"),
        F.col("l_extendedprice").alias("open"),
        (F.col("l_extendedprice") + 1).alias("high"),
        (F.col("l_extendedprice") - 1).alias("low"),
        F.col("l_extendedprice").alias("close"),
        F.col("l_orderkey").alias("volume"),
        F.lit("equity").alias("asset_class"),
    )
    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(root, "src")
        # 8 source files, 2 per trigger -> 4 micro-batches: measures
        # the steady per-batch commit cost, not one giant batch
        bars.repartition(8).write.parquet(src)
        static = spark.read.parquet(src)
        n_rows = static.count()

        def one_run(tag: str) -> dict:
            lake = TransactionalLake(
                spark, os.path.join(root, f"lake_{tag}"), partition_by=("date",)
            )
            stream = (
                spark.readStream.schema(static.schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(src)
            )
            t0 = time.perf_counter()
            q = stream_ingest_transactional(
                stream,
                lake,
                os.path.join(root, f"ckpt_{tag}"),
                available_now=True,
            )
            try:
                q.awaitTermination()
            finally:
                q.stop()
            elapsed = time.perf_counter() - t0
            progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
            batch_ms = [
                p["durationMs"]["triggerExecution"] for p in progress
            ]
            assert lake.snapshot().count() == n_rows
            return {
                "elapsed_sec": round(elapsed, 4),
                "rows": n_rows,
                "rows_per_sec": round(n_rows / elapsed, 1),
                "batches": len(batch_ms),
                "mean_batch_ms": round(sum(batch_ms) / len(batch_ms), 1)
                if batch_ms
                else None,
            }

        return min(
            (one_run("a"), one_run("b")),
            key=lambda s: s["mean_batch_ms"] or float("inf"),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    times: dict[str, float] = {}
    controls: list[dict] = []

    cpu_controls: list[dict] = []
    write_controls: list[dict] = []

    def control(at: str) -> None:
        controls.append({"at": at, "sec": round(job_floor_control(spark), 4)})
        cpu_controls.append(
            {"at": at, "sec": round(cpu_throughput_control(spark), 4)}
        )
        write_controls.append(
            {"at": at, "sec": round(write_throughput_control(spark), 4)}
        )

    # untimed warmup: pay the session's one-time costs (executor
    # spin-up, first codegen, parquet footer caching) outside any
    # query's measurement; the first control is likewise untimed so
    # the noop-writer codegen never inflates a recorded sample
    run_once(spark, REGISTRY["o2_topk"].fn, sf_dir)
    job_floor_control(spark)
    cpu_throughput_control(spark)
    # the write probe's cold warm-in spans several samples (page
    # cache + parquet-writer JIT, calibration receipts) — 3 untimed
    for _ in range(3):
        write_throughput_control(spark)
    # INTERLEAVED passes (r7 VERDICT item 7): consecutive repeats of
    # one query all land inside the same host-pressure window, so
    # min-of-3-consecutive still over-reads when the whole invocation
    # runs hot (A/B-proven: 0.289 s real vs 0.637 s benched). Passing
    # over the full set and keeping per-query minima separates each
    # query's repeats by ~the set's span, so a transient hot window
    # can inflate one pass but not every repeat of a query.
    for _pass in range(3):
        control(f"headline_pass{_pass}")
        for label, qname in HEADLINE.items():
            fn = REGISTRY[qname].fn
            spark._jvm.System.gc()
            t = run_once(spark, fn, sf_dir)
            times[label] = round(min(times.get(label, float("inf")), t), 4)
    spark._jvm.System.gc()
    control("pre_ingest")
    # bench_ingest is best-of-2 internally (fresh lake per run)
    times["q_ingest_batch"] = round(bench_ingest(spark, sf_dir), 4)
    spark._jvm.System.gc()
    # reported ONLY under the separate "stream_ingest" key — folding
    # its elapsed into `times` would shift the headline total vs
    # rounds <= 4 (ADVICE r5); cross-round totals compare via
    # bench_compare's shared-query subset either way
    stream_stats = bench_ingest_stream(spark, sf_dir)
    # same interleaving for the heavy set (2 passes — these queries
    # are multi-second, and the LSH family's JVM churn makes
    # BETWEEN-pass separation matter more than a third sample)
    for _pass in range(2):
        for i, (label, qname) in enumerate(HEAVY.items()):
            # heavy passes run multi-second queries for minutes —
            # sample the floor control every 8 queries so a transient
            # hot window inside a pass is visible, not just at its
            # start (adds ~0.4 s/pass against a ~60 s pass)
            if i % 8 == 0:
                control(f"heavy_pass{_pass}_q{i}")
            fn = REGISTRY[qname].fn
            spark._jvm.System.gc()
            t = run_once(spark, fn, sf_dir)
            times[label] = round(min(times.get(label, float("inf")), t), 4)
    control("final")
    # LSH candidate-volume observability (r6 VERDICT directive 4):
    # q_minhash_lsh is the steepest 16x scaler and its cost tracks
    # band-collision pair volume — record the pair counts from the
    # timed runs so sf1+ extrapolation is arithmetic
    from market_data_lakehouse_spark.queries import dedup

    lsh_metrics = {
        q: dedup.pair_metrics(q)
        for q in ("e2_minhash_lsh", "e2_lsh_verified_jaccard")
    }
    # Contamination self-verdict (r8 VERDICT directive 1): the run is
    # whole-invocation hot — the signature that produced r8's 20 false
    # flags — when the MEDIAN control sits above the calibrated band's
    # max: a uniform multiplier lifts every sample, while a transient
    # window (which the interleaved minima already absorb) lifts a few.
    # Any individual hot sample is still listed for forensics.
    ctrl_secs = sorted(c["sec"] for c in controls)
    ctrl_median = ctrl_secs[len(ctrl_secs) // 2]
    hot = [c for c in controls if c["sec"] > CONTROL_LIMIT_SEC]
    cpu_secs = sorted(c["sec"] for c in cpu_controls)
    cpu_median = cpu_secs[len(cpu_secs) // 2]
    cpu_hot = [c for c in cpu_controls if c["sec"] > CPU_LIMIT_SEC]
    wr_secs = sorted(c["sec"] for c in write_controls)
    wr_median = wr_secs[len(wr_secs) // 2]
    wr_hot = [c for c in write_controls if c["sec"] > WRITE_LIMIT_SEC]
    contamination = {
        "control": "spark.range(1) noop write (job floor; code-independent)",
        "calibrated_band_sec": list(CONTROL_BAND_SEC),
        "limit_sec": CONTROL_LIMIT_SEC,
        "samples": controls,
        "median_sec": round(ctrl_median, 4),
        "hot_samples": [c["at"] for c in hot],
        # r10: sustained CPU steal is invisible to the launch-floor
        # probe — the fixed-work throughput control catches it
        "cpu_control": {
            "work": f"sum(id*2+1) over range({CPU_CONTROL_N}), 32 parts",
            "calibrated_band_sec": list(CPU_BAND_SEC),
            "limit_sec": CPU_LIMIT_SEC,
            "samples": cpu_controls,
            "median_sec": round(cpu_median, 4),
            "hot_samples": [c["at"] for c in cpu_hot],
            "contended": cpu_median > CPU_BAND_SEC[1],
        },
        # r14: the write-path probe — launch-floor and CPU-share
        # probes are blind to disk; r13's only unadjudicated flags
        # were write-path queries
        "write_control": {
            "work": (
                f"range({WRITE_CONTROL_ROWS}) x 2 bigint -> parquet, "
                "8 files, fresh temp dir"
            ),
            "calibrated_band_sec": list(WRITE_BAND_SEC),
            "limit_sec": WRITE_LIMIT_SEC,
            "samples": write_controls,
            "median_sec": round(wr_median, 4),
            "hot_samples": [c["at"] for c in wr_hot],
            "contended": wr_median > WRITE_BAND_SEC[1],
        },
        "contaminated": (
            ctrl_median > CONTROL_BAND_SEC[1]
            or cpu_median > CPU_BAND_SEC[1]
            or wr_median > WRITE_BAND_SEC[1]
        ),
    }
    # The driver failed to parse r8's stdout line once it crossed
    # ~2 kB (BENCH_r08.json `parsed: null`, tail-truncated) — keep
    # the ONE JSON line compact and put full forensics (per-sample
    # controls, LSH candidate metrics) in BENCH_DETAIL.json next to
    # the other bench artifacts.
    detail = {
        "contamination": contamination,
        "lsh_candidates": lsh_metrics,
        "stream_ingest": stream_stats,
    }
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "stream_ingest": stream_stats,
        "contamination": {
            "contaminated": contamination["contaminated"],
            "median_sec": contamination["median_sec"],
            "band_sec": list(CONTROL_BAND_SEC),
            "n_hot": len(hot),
            "n_samples": len(controls),
            "cpu_median_sec": round(cpu_median, 4),
            "cpu_band_sec": list(CPU_BAND_SEC),
            "cpu_contended": cpu_median > CPU_BAND_SEC[1],
            "wr_median_sec": round(wr_median, 4),
            "wr_contended": wr_median > WRITE_BAND_SEC[1],
        },
        "detail": "BENCH_DETAIL.json",
        "sf": sf,
    }
    # Code-identity stamp (r16, VERDICT r15 directive 2): two runs
    # whose artifacts record the SAME clean sha are code-identical by
    # construction — bench_compare's sibling adjudication classifies
    # on this FIRST, before any statistical uniformity test (the r15
    # driver-run-vs-record pair was heteroscedastic host pressure the
    # flat-median test under-classified).
    out.update(_git_identity())
    # Self-running gates (VERDICT r5 item 3): refresh the plan audit
    # and the round-over-round comparison as part of EVERY bench run,
    # so neither artifact can go stale against the bench set. Gates
    # run BEFORE the result line is printed (VERDICT r10 item 2: the
    # driver's capture merges streams, and gate/stage chatter landing
    # after the JSON made its parser record `parsed: null`) — the
    # result JSON must be the FINAL line this process emits.
    try:
        run_gates(spark, sf_dir, out)
    except Exception as exc:  # gates must never fail the bench line
        print(f"bench gates failed: {exc!r}", file=sys.stderr)
    # silence any straggling JVM/console-progress output, then emit
    spark.stop()
    line = json.dumps(out)
    assert json.loads(line)["metric"] == "headline_queries_total"
    if len(line) > 1900:
        # the driver tails ~2 kB of stdout: a longer line risks
        # truncation — trim forensics (full detail stays on disk)
        print(
            f"bench: result line {len(line)} B > 1900 B guard",
            file=sys.stderr,
        )
    sys.stderr.flush()
    print(line, flush=True)


def _run_inline_tripwire(
    spark, sf_dir: str, flagged: dict[str, tuple[float, float]], repo: str
) -> None:
    """Lean in-run A/B for tripwire-eligible flags (>=1.3x AND
    >=0.5s — matched to tools/ab_tripwire.py's standalone bar in r12;
    the r11 driver run produced two 1.32x flags at 0.75/0.93 s that
    the old 1 s inline bar let land unadjudicated):
    interleaved round-robin over the flagged queries + the
    q_dedup_hash control in the LIVE session, 5 samples each,
    classified by bench_ab.classify_drift. Code identity is NOT
    checked here (the old rev isn't known inside a bench run) — the
    verdict distinguishes noise from reproducible drift; a
    reproducible one still needs tools/ab_tripwire.py with --old-rev
    for the identity chain. Merges into AB_BENCH.json under
    'bench_inline_tripwire' so the receipt exists even if nobody
    runs the standalone tool."""
    import bench_ab

    from market_data_lakehouse_spark.queries import REGISTRY

    label_to_query = {**HEADLINE, **HEAVY}
    plan = {q: label_to_query[q] for q in flagged if q in label_to_query}
    plan["q_dedup_hash"] = HEADLINE["q_dedup_hash"]
    samples: dict[str, list[float]] = {q: [] for q in plan}
    for _ in range(5):
        for label, qname in plan.items():
            spark._jvm.System.gc()
            samples[label].append(
                run_once(spark, REGISTRY[qname].fn, sf_dir)
            )
    per_query = {}
    for label, vals in samples.items():
        rec = flagged.get(label, (None, None))
        per_query[label] = bench_ab.classify_drift(
            vals, rec[0], rec[1], True,
            is_control=label == "q_dedup_hash",
        )
        per_query[label]["code_identity"] = {
            "depth": "not-checked-inline",
        }
    entry = {
        "protocol": (
            "bench-run inline tripwire: flagged>=1.3x AND >=1s; live "
            "session, 5 interleaved samples/query, GC between; NO "
            "identity check — follow up with tools/ab_tripwire.py "
            "--old-rev for a reproducible (non-noise) verdict"
        ),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "queries": per_query,
    }
    path = os.path.join(repo, "AB_BENCH.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["bench_inline_tripwire"] = entry
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)


def run_gates(spark, sf_dir: str, bench_line: dict) -> None:
    """Write PLAN_AUDIT.json and BENCH_COMPARE_r{N}.json next to the
    bench artifacts. N = 1 + the highest committed BENCH_r{N}.json,
    i.e. the round this run's numbers will be recorded as."""
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import bench_compare
    import plan_audit

    rounds = sorted(
        int(m.group(1))
        for f in os.listdir(repo)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    )
    this_round = (rounds[-1] + 1) if rounds else 1
    plan_audit.write_report(
        spark,
        sf_dir,
        os.path.join(repo, "PLAN_AUDIT.json"),
        # restored plan-dump contract (r17, VERDICT r16 directive 3):
        # formatted explains for every benched query land in
        # plans/r{N}/ at the sha the bench stamps
        dump_dir=os.path.join(repo, "plans", f"r{this_round}"),
    )
    print(
        f"gate: PLAN_AUDIT.json refreshed + plans/r{this_round}/ dumped",
        file=sys.stderr,
    )
    if not rounds:
        return
    prev = os.path.join(repo, f"BENCH_r{rounds[-1]:02d}.json")
    rep = bench_compare.compare(
        bench_compare.load_queries(prev),
        dict(bench_line["queries"]),
        1.3,
        old_cpu=bench_compare.load_cpu_median(prev),
        new_cpu=bench_line.get("contamination", {}).get("cpu_median_sec"),
    )
    rep = {"old": os.path.basename(prev), "new": "this run", **rep}
    # r8 VERDICT directive 1: a run whose job-floor controls sit above
    # the calibrated band cannot distinguish regression from host
    # pressure — emit the contamination marker INSTEAD of per-query
    # flags (the flag list moves to a clearly-unreliable key so the
    # forensic detail survives without reading as 20 regressions).
    contam = bench_line.get("contamination", {})
    rep["contamination"] = contam
    if contam.get("contaminated"):
        rep["flagged_unreliable_contaminated_run"] = rep.pop("flagged")
        rep["flagged"] = []
        rep["note"] = (
            "job-floor controls above calibrated band for the median "
            "sample: whole-invocation host contamination; per-query "
            "flags suppressed (per-sample controls in BENCH_DETAIL.json)"
        )
    cmp_path = os.path.join(repo, f"BENCH_COMPARE_r{rounds[-1] + 1:02d}.json")
    with open(cmp_path, "w") as fh:
        json.dump(rep, fh, indent=1)
    print(
        f"gate: {os.path.basename(cmp_path)} vs {os.path.basename(prev)}: "
        f"shared_total_ratio={rep['shared_total_ratio']} "
        f"flagged={[r['query'] for r in rep['flagged']]}",
        file=sys.stderr,
    )
    # r9 VERDICT directive 4, standing (bar lowered r12 per VERDICT
    # directive 2): any flagged entry that ALSO crossed the 0.5 s
    # absolute bar gets the interleaved same-JVM A/B in THIS run
    # (reusing the live session; bounded: the eligible set is the
    # flag list, each sampled 5x round-robin). The bar now MATCHES
    # tools/ab_tripwire.py's standalone default, so no flag can sit
    # in the adjudication gap between the two tools. Sub-0.5 s flags
    # stay letter-only — the job-floor band covers them.
    eligible = [
        r["query"] for r in rep["flagged"] if r["new_sec"] >= 0.5
    ]
    if eligible:
        old_q = bench_compare.load_queries(prev)
        new_q = dict(bench_line["queries"])
        flagged = {
            q: (old_q[q], new_q[q]) for q in eligible
        }
        _run_inline_tripwire(spark, sf_dir, flagged, repo)
        print(
            f"gate: tripwire A/B ran for {eligible} -> AB_BENCH.json",
            file=sys.stderr,
        )


def preflight() -> int:
    """Clean-window check without running any query: boot a session,
    sample the CPU-throughput control 3x, print median + verdict.
    Exit 0 = CLEAN (safe to record a bench run), 1 = CONTENDED."""
    spark = get_spark("bench-preflight")
    spark.range(1).count()  # warm
    cpu_throughput_control(spark)  # untimed first sample (codegen)
    samples = [round(cpu_throughput_control(spark), 4) for _ in range(3)]
    med = sorted(samples)[1]
    contended = med > CPU_BAND_SEC[1]
    print(
        f"preflight: cpu_control median={med}s samples={samples} "
        f"band={list(CPU_BAND_SEC)} -> "
        f"{'CONTENDED — defer the bench' if contended else 'CLEAN'}"
    )
    spark.stop()
    return 1 if contended else 0


if __name__ == "__main__":
    if "--preflight" in sys.argv:
        sys.exit(preflight())
    main()
