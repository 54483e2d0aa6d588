"""Slowly-changing-dimension (SCD Type 2) maintenance.

The reference README sells the lakehouse as the system of record for
reference/market data (/root/reference/README.md:28-43); the standard
warehouse pattern for "what did this attribute look like AT trade
time" is an SCD2 dimension — one row per (key, version) with
``valid_from`` / ``valid_to`` / ``is_current``, maintained from a
change feed (Delta Live Tables' ``APPLY CHANGES ... STORED AS SCD
TYPE 2``; Kimball's type-2 dimension).

Two tiers, matching the repo's view machinery:

- :func:`scd2_rebuild` — the BATCH shape: derive the full version
  history from a complete change log in one pass. Pure window
  algebra (lag for no-op collapse, lead for interval close), one
  shuffle on the key, codegen'd end to end. This is also the oracle
  for the incremental tier.
- :func:`scd2_apply` — the INCREMENTAL shape: fold one ordered batch
  of changes into a TransactionalLake holding the dimension. The
  lake's CURRENT rows for affected keys are re-expressed as change
  records, unioned with the batch, re-run through the same rebuild
  kernel (so no-op collapsing against the stored value is inherited,
  not re-implemented), and MERGEd back on (key, valid_from) — closed
  historical versions are never touched, so the merge rewrites only
  files holding affected keys' current rows.

Out-of-order changes (a batch row at or before an affected key's
current ``valid_from``) raise: silently splicing history would
corrupt closed intervals. Late data belongs in a full rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_data_lakehouse_spark.txnlog import TransactionalLake


def _cols(keys, ts_col, tiebreak):
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    return list(keys), order


def scd2_rebuild(
    changes: DataFrame,
    keys: list[str] | tuple[str, ...],
    ts_col: str,
    value_cols: list[str] | tuple[str, ...],
    tiebreak: str | None = None,
) -> DataFrame:
    """Full SCD2 history from a change log: one row per version with
    ``valid_from`` (the change's timestamp), ``valid_to`` (the next
    version's timestamp, NULL while current) and ``is_current``.
    Consecutive no-op changes (same values, null-safe) collapse into
    the open version — re-stating a value does not cut a new one.

    Both windows share the same (keys, order) spec, so Catalyst plans
    ONE shuffle + sort for the whole kernel."""
    keys, order = _cols(keys, ts_col, tiebreak)
    w = Window.partitionBy(*keys).orderBy(*order)
    vals = F.struct(*[F.col(c) for c in value_cols])
    kept = (
        changes.withColumn(
            "_changed", ~vals.eqNullSafe(F.lag(vals).over(w))
        )
        .filter(F.col("_changed"))
        .drop("_changed")
    )
    return (
        kept.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *keys, *value_cols, "valid_from", "valid_to", "is_current",
            *([tiebreak] if tiebreak else []),
        )
    )


def scd2_apply(
    lake: TransactionalLake,
    batch: DataFrame,
    keys: list[str] | tuple[str, ...],
    ts_col: str,
    value_cols: list[str] | tuple[str, ...],
    tiebreak: str | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Fold one ordered change batch into the SCD2 dimension held by
    ``lake``. Returns the committed version.

    Correctness comes from REUSING the rebuild kernel instead of
    hand-maintaining intervals: affected keys' current rows are
    converted back into change records (value at ``valid_from``),
    unioned with the batch, rebuilt, and merged on (key, valid_from).
    A current row whose value the batch merely re-states stays open
    (the rebuild collapses the no-op); a changed value closes it (the
    rebuilt seed row carries the new ``valid_to``) and inserts the new
    version. Closed versions never appear in the union, so they are
    never rewritten.

    Scale: the union is O(batch + affected current rows); the merge
    rewrites only files containing affected keys (txnlog merge's
    affected-file semi-join); nothing is collected."""
    keys = list(keys)
    sel = [*keys, *value_cols, ts_col] + ([tiebreak] if tiebreak else [])
    batch = batch.select(*sel)
    if txn is not None and txn[1] <= lake.last_txn_version(txn[0]):
        return lake.version  # replayed batch: already folded
    if lake.version < 0:
        hist = scd2_rebuild(batch, keys, ts_col, value_cols, tiebreak)
        return lake.append(
            hist.drop(*([tiebreak] if tiebreak else [])), txn=txn
        )
    cur = lake.snapshot().filter(F.col("is_current"))
    bkeys = batch.select(*keys).distinct()
    affected = cur.join(F.broadcast(bkeys), keys, "left_semi")
    # out-of-order guard: a change at or before the current version's
    # valid_from cannot be spliced into closed history
    stale = (
        batch.join(
            affected.select(
                *keys, F.col("valid_from").alias("_cur_from")
            ),
            keys,
        )
        .filter(F.col(ts_col) <= F.col("_cur_from"))
        .limit(1)
        .count()
    )
    if stale:
        raise ValueError(
            "out-of-order SCD2 change: batch contains a row at or "
            "before an affected key's current valid_from; late data "
            "requires a full scd2_rebuild"
        )
    seed = affected.select(
        *keys,
        *value_cols,
        F.col("valid_from").alias(ts_col),
        *(
            [F.lit(None).cast(dict(batch.dtypes)[tiebreak]).alias(tiebreak)]
            if tiebreak
            else []
        ),
    )
    # NULL tiebreak sorts first: the seed wins ties against a batch
    # row at the same timestamp, which would be rejected above anyway
    union = seed.unionByName(batch)
    hist = scd2_rebuild(union, keys, ts_col, value_cols, tiebreak)
    out = hist.drop(*([tiebreak] if tiebreak else []))
    return lake.merge(out, on=[*keys, "valid_from"], txn=txn)
