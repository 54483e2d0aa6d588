"""Incremental materialized views over a TransactionalLake — the
consumer side of the CDC feed (reference README.md:174's "stream new
commits to downstream consumers" made concrete).

A view holds a pre-aggregated state table (sum/count-style partial
aggregates per key) plus the last lake version applied. ``refresh()``
reads only the commits AFTER that version via ``read_changes``,
folds inserts positively and deletes negatively, and merges the
delta into the stored state — O(changed rows), never a full
recompute. Derived metrics (averages, VWAP) are computed from the
partials at read time, so the maintained state stays additive.

Scale posture: the delta aggregation is a map-side-combined groupBy
over only the changed rows; the merge is a groupBy over
O(state keys + delta keys). State is rewritten atomically (write
temp + swap via the lake's own pattern); the applied version is
recorded WITH the state so a crashed refresh replays idempotently
(the version file and state directory swap together).

Only commutative-invertible aggregates (SUM/COUNT) can be maintained
this way — MIN/MAX are not invertible under deletes; a view over them
would need a full recompute on delete commits. ``AdditiveView``
maintains an arbitrary set of SUM(expr) partials (plus the row count
``n``); ``VwapView`` is the flagship specialization.

This is the LIGHTWEIGHT tier: each refresh rewrites the whole state
(old state union delta, regrouped) — the right trade while key
cardinality is small (thousands of symbols). For large group
cardinality (millions of users/documents) use
:class:`market_data_lakehouse_spark.mv.IncrementalAggView`, whose
state is itself a TransactionalLake and whose refresh MERGEs only
the files containing affected groups, with exactly-once refreshes
via the lake's app-txn contract.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F

from market_data_lakehouse_spark.txnlog import TransactionalLake


class AdditiveView:
    """Incrementally-maintained additive aggregate: state =
    (keys..., one column per SUM(expr), n). ``sums`` maps output
    column name -> SQL expression evaluated against the base table's
    rows; every entry folds incrementally through inserts AND deletes
    because SUM is invertible. Keys whose row count reaches zero drop
    out of the state (a fully-deleted group disappears, as a
    recompute would show)."""

    def __init__(
        self,
        lake: TransactionalLake,
        path: str,
        keys: tuple[str, ...] | list[str],
        sums: dict[str, str],
    ) -> None:
        if not sums:
            raise ValueError("sums must name at least one SUM expression")
        overlap = (set(keys) | {"n"}) & set(sums)
        if overlap or "n" in keys:
            # "n" is the reserved row-count column; a SUM (or key)
            # named "n" would collide with it downstream and die with
            # an opaque AMBIGUOUS_REFERENCE at refresh time
            raise ValueError(
                f"key/aggregate name collision: "
                f"{sorted(overlap | ({'n'} if 'n' in keys else set()))}"
            )
        self.lake = lake
        self.path = path.rstrip("/")
        self.keys = list(keys)
        self.sums = dict(sums)
        os.makedirs(self.path, exist_ok=True)

    # ------------------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_view_meta.json")

    @property
    def _state_cols(self) -> list[str]:
        return [*self.keys, *self.sums, "n"]

    def _meta(self) -> dict | None:
        """Current meta, or None when absent OR when the persisted
        state schema doesn't match this view definition (older code,
        or the definition changed) — a mismatched state can't be
        folded into, so the view self-heals by rebuilding from the
        full CDC feed instead of dying in unionByName."""
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            meta = json.load(fh)
        if meta.get("state_cols") != self._state_cols:
            return None
        return meta

    @property
    def last_applied_version(self) -> int:
        meta = self._meta()
        return -1 if meta is None else meta["applied_version"]

    def _state_dir(self) -> str | None:
        meta = self._meta()
        if meta is None:
            return None
        return os.path.join(self.path, meta["state_dir"])

    def _delta(self, changes: DataFrame) -> DataFrame:
        """Signed partial aggregates from a CDC frame: inserts count
        +1, deletes -1 — SUMs fold either direction."""
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return changes.groupBy(*self.keys).agg(
            *[
                F.sum(sign * F.expr(expr)).alias(name)
                for name, expr in self.sums.items()
            ],
            F.sum(sign).alias("n"),
        )

    def refresh(self) -> int:
        """Fold commits since ``last_applied_version`` into the state.
        Returns the lake version now reflected. No-op (no jobs beyond
        the CDC read) when already current."""
        target = self.lake.version
        applied = self.last_applied_version
        if target <= applied:
            return applied
        changes = self.lake.read_changes(starting_version=applied + 1)
        delta = self._delta(changes)
        old_dir = self._state_dir()
        if old_dir is None:
            merged = delta
        else:
            spark = self.lake.spark
            merged = (
                spark.read.parquet(old_dir)
                .unionByName(delta)
                .groupBy(*self.keys)
                .agg(
                    *[F.sum(c).alias(c) for c in self.sums],
                    F.sum("n").alias("n"),
                )
            )
        merged = merged.filter(F.col("n") > 0)  # fully-deleted keys drop out
        new_name = f"state_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, new_name)
        )
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "applied_version": target,
                    "state_dir": new_name,
                    "state_cols": self._state_cols,
                },
                fh,
            )
        os.replace(tmp, self._meta_path)  # state + version swap together
        # reclaim every unreferenced state dir — the replaced one AND
        # any orphan left behind by a schema-mismatch rebuild
        for entry in os.listdir(self.path):
            if entry.startswith("state_") and entry != new_name:
                shutil.rmtree(
                    os.path.join(self.path, entry), ignore_errors=True
                )
        return target

    def read(self) -> DataFrame:
        """(keys..., sums..., n) from the maintained partials — no
        scan of the base table."""
        d = self._state_dir()
        if d is None:
            raise ValueError("view never refreshed: call refresh() first")
        return self.lake.spark.read.parquet(d).select(
            *self.keys, *self.sums, "n"
        )


class VwapView(AdditiveView):
    """Incrementally-maintained per-key VWAP (the flagship metric) —
    state = (key, sum_pv, sum_v, n); vwap = sum_pv / sum_v derived on
    read."""

    def __init__(
        self,
        lake: TransactionalLake,
        path: str,
        key: str = "symbol",
        price: str = "price",
        volume: str = "volume",
    ) -> None:
        super().__init__(
            lake,
            path,
            keys=(key,),
            # backtick-quoted: the fragments go through F.expr, and an
            # unquoted non-identifier name ("bid price", "order")
            # would parse as something else entirely
            sums={
                "sum_pv": f"`{price}` * `{volume}`",
                "sum_v": f"`{volume}`",
            },
        )
        self.key = key

    def read(self) -> DataFrame:
        """(key, vwap, total_volume, n) derived from the partials."""
        s = super().read()
        return s.select(
            F.col(self.key),
            F.try_divide(F.col("sum_pv"), F.col("sum_v")).alias("vwap"),
            F.col("sum_v").alias("total_volume"),
            "n",
        )
