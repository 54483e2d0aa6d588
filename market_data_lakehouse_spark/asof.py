"""As-of (point-in-time) join — SURVEY.md §2.3 J6/J7.

The signature market-data operation: for every left ("trade") row,
attach the most recent right ("quote") row with ``quote.ts <=
trade.ts`` within the same key. The reference has no join machinery at
all (grep: no `join` token in /root/reference/src/market_data_lakehouse/
lakehouse.py); this is the north-star extension (SURVEY §4.3-1).

Spark has no built-in as-of join, so this is the union+window
composition:

1. tag both sides and ``unionByName`` (right's value columns are null
   on left rows and vice versa);
2. one window per key ordered by ``(ts, side)`` — right rows sort
   before left rows at equal timestamps so a same-instant quote is
   visible to the trade, matching DuckDB/kdb ASOF semantics
   (``t.ts >= q.ts``);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding frame
   carries the latest right value forward;
4. keep only left rows.

Scale: one shuffle on the join key (the window's partitionBy), no
row explosion — strictly better than the join+filter+row_number
alternative whose intermediate is |trades| x |matching quotes|.

Skew: AQE splits skewed partitions for JOINS, not windows, so one
hot key serializes ``asof_join`` into a single task. For that shape
use ``asof_join_bucketed``: it salts the window key with a coarse
time bucket (parallelism = keys x buckets) and stitches bucket
boundaries with a second window over the tiny per-bucket summary
table — same results, verified against the same DuckDB ASOF oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_data_lakehouse_spark.schema import epoch_us


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None,
):
    """Tag both sides and union. The right row's payload travels as
    ONE struct column ``_r`` (quote ts + value columns): the struct is
    non-null exactly when a quote row exists, so a quote whose VALUE
    is genuinely NULL is still carried (and shadows older quotes) —
    per-column null encoding would conflate "no quote" with "quote
    with null value" and resurrect stale prices. Right rows get
    _side=0 so they sort before a left row at the same timestamp (a
    same-instant quote is visible to the trade — DuckDB/kdb ASOF
    semantics)."""
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload_type = T.StructType(
        [T.StructField("_rts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_values]
    )
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in keys],
        F.lit(None).cast(payload_type).alias("_r"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in right_values],
        ).alias("_r"),
    )
    return keys, right_values, l_tag.unionByName(r_tag)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, append the as-of right values (per key).
    Left rows keep all their columns.

    ``direction`` (pandas ``merge_asof`` semantics):
      - ``"backward"`` (default): latest right row with
        ``right.ts <= left.ts`` — the market-data staleness join.
      - ``"forward"``: earliest right row with ``right.ts >= left.ts``
        — "next quote/fill after the order".
      - ``"nearest"``: whichever of the two is closer in time; exact
        ties (including a same-instant right row, distance 0 both
        ways) resolve BACKWARD, matching pandas.

    Forward is the mirrored window: ordered ``(ts, side DESC)`` so a
    same-instant right row sorts after the left row and lands in the
    ``[current, unbounded following]`` frame; ``first(ignorenulls)``
    replaces ``last``. Nearest computes both carries — the two
    windows share one hash partitioning, so it is still ONE shuffle
    (two sorts) — and picks per row by integer microsecond distance.

    ``right_values``: right columns to carry (default: all non-key,
    non-ts columns). ``tolerance``: optional max distance as an SQL
    interval string (e.g. ``'1 hour'``) — right rows further than
    this (in the match direction; either way for nearest) become
    null."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    keys, right_values, unioned = _tag_union(
        left, right, on, left_ts, right_ts, right_values
    )
    rts_type = dict(unioned.dtypes).get("_ts")
    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None

    carried = unioned
    if direction in ("backward", "nearest"):
        w_b = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cb = F.last("_r", ignorenulls=True).over(w_b)
        if tol is not None:
            cb = F.when(cb["_rts"] < F.col("_ts") - tol, F.lit(None)).otherwise(cb)
        carried = carried.withColumn("_cb", cb)
    if direction in ("forward", "nearest"):
        w_f = (
            Window.partitionBy(*keys)
            .orderBy("_ts", F.desc("_side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        cf = F.first("_r", ignorenulls=True).over(w_f)
        if tol is not None:
            cf = F.when(cf["_rts"] > F.col("_ts") + tol, F.lit(None)).otherwise(cf)
        carried = carried.withColumn("_cf", cf)

    if direction == "backward":
        carried = carried.withColumn("_c", F.col("_cb"))
    elif direction == "forward":
        carried = carried.withColumn("_c", F.col("_cf"))
    else:
        t_us = epoch_us(F.col("_ts"), rts_type)
        d_b = t_us - epoch_us(F.col("_cb._rts"), rts_type)
        d_f = epoch_us(F.col("_cf._rts"), rts_type) - t_us
        carried = carried.withColumn(
            "_c",
            F.when(F.col("_cb").isNull(), F.col("_cf"))
            .when(F.col("_cf").isNull(), F.col("_cb"))
            .when(d_f < d_b, F.col("_cf"))
            .otherwise(F.col("_cb")),  # ties resolve backward (pandas)
        )

    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        *[F.col(f"_c.{c}").alias(c) for c in right_values],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    bucket_minutes: int = 60,
) -> DataFrame:
    """Skew-safe as-of join: identical results to :func:`asof_join`,
    parallelism ``keys x time-buckets`` instead of ``keys``.

    Two passes:

    1. Window per (key, time bucket): within-bucket carry of the
       latest right value — a hot key's work now spreads across its
       buckets.
    2. Per-bucket summary (one row per key x bucket — tiny): the
       bucket's LAST right value; a prefix window over buckets
       (frame ... -1) yields each bucket's carry-in from all earlier
       buckets, joined back on (key, bucket).

    Final value = coalesce(within-bucket carry, bucket carry-in).
    The summary window also partitions by key, but it touches
    O(buckets) rows, not O(events) — the skew is gone where it
    matters.
    """
    keys, right_values, unioned = _tag_union(
        left, right, on, left_ts, right_ts, right_values
    )
    bucket_us = bucket_minutes * 60_000_000
    unioned = unioned.withColumn(
        "_bkt",
        (
            epoch_us(F.col("_ts"), dict(unioned.dtypes).get("_ts"))
            / bucket_us
        ).cast("long"),
    )

    w_in = (
        Window.partitionBy(*keys, "_bkt")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_c", F.last("_r", ignorenulls=True).over(w_in)
    )

    # per-(key, bucket) latest quote payload: max over (ts, payload)
    # structs ignores left rows (null) and picks the latest quote row
    # even when its VALUE columns are null (the payload struct itself
    # is non-null for every quote row)
    summary = unioned.groupBy(*keys, "_bkt").agg(
        F.max(
            F.when(
                F.col("_side") == 0,
                F.struct(F.col("_ts").alias("t"), F.col("_r").alias("r")),
            )
        )["r"].alias("_last")
    )
    w_prefix = (
        Window.partitionBy(*keys)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = summary.select(
        *keys,
        "_bkt",
        F.last("_last", ignorenulls=True).over(w_prefix).alias("_in"),
    )

    joined = carried.join(carry_in, [*keys, "_bkt"], "left")
    out = joined.filter(F.col("_side") == 1).withColumn(
        "_f", F.coalesce(F.col("_c"), F.col("_in"))
    )
    return out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        *[F.col(f"_f.{c}").alias(c) for c in right_values],
    )
