"""Incremental materialized view over the CDC feed: refresh folds
only new commits; results match a full recompute after appends,
deletes, and idempotent re-refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.txnlog import TransactionalLake
from market_data_lakehouse_spark.views import VwapView


def _ticks(spark, rows):
    return spark.createDataFrame(
        [(s, float(p), int(v)) for s, p, v in rows],
        "symbol string, price double, volume long",
    )


def _full_vwap(df):
    return {
        r.symbol: (r.vwap, r.tv)
        for r in df.groupBy("symbol")
        .agg(
            (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")).alias("vwap"),
            F.sum("volume").alias("tv"),
        )
        .collect()
    }


@pytest.fixture()
def lake(spark, tmp_path):
    return TransactionalLake(spark, str(tmp_path / "lake"), partition_by=())


def test_incremental_refresh_matches_full_recompute(spark, lake, tmp_path):
    view = VwapView(lake, str(tmp_path / "view"))
    lake.append(_ticks(spark, [("AAPL", 100, 10), ("AAPL", 110, 10), ("MSFT", 50, 4)]))
    v1 = view.refresh()
    assert v1 == lake.version
    got = {r.symbol: (r.vwap, r.total_volume) for r in view.read().collect()}
    assert got == _full_vwap(lake.snapshot())
    assert got["AAPL"][0] == pytest.approx(105.0)

    # second batch folds incrementally (CDC from v1+1 only)
    lake.append(_ticks(spark, [("AAPL", 130, 20), ("GOOG", 70, 1)]))
    view.refresh()
    got = {r.symbol: (r.vwap, r.total_volume) for r in view.read().collect()}
    assert got == _full_vwap(lake.snapshot())
    assert got["AAPL"][1] == 40

    # refresh with no new commits is a no-op
    assert view.refresh() == lake.version


def test_deletes_fold_negatively_and_empty_keys_drop(spark, lake, tmp_path):
    view = VwapView(lake, str(tmp_path / "view"))
    lake.append(_ticks(spark, [("AAPL", 100, 10), ("MSFT", 50, 4)]))
    view.refresh()
    lake.delete_where("symbol = 'MSFT'")
    view.refresh()
    got = {r.symbol for r in view.read().collect()}
    assert got == {"AAPL"}  # fully-deleted key dropped from state
    full = _full_vwap(lake.snapshot())
    read = {r.symbol: (r.vwap, r.total_volume) for r in view.read().collect()}
    assert read == full


def test_merge_and_update_commits_fold_through_view(spark, lake, tmp_path):
    """MERGE and update_where emit delete+insert pairs in the CDC
    feed; the view's signed fold must net them to the post-DML truth
    without any special-casing of the new commit types."""
    view = VwapView(lake, str(tmp_path / "view"))
    lake.append(
        _ticks(
            spark, [("AAPL", 100, 10), ("AAPL", 110, 10), ("MSFT", 50, 4)]
        ).coalesce(1)
    )
    view.refresh()
    # upsert: replace MSFT (matched) and insert GOOG
    lake.merge(
        _ticks(spark, [("MSFT", 60, 8), ("GOOG", 70, 2)]), on="symbol"
    )
    view.refresh()
    got = {r.symbol: (r.vwap, r.total_volume) for r in view.read().collect()}
    assert got == _full_vwap(lake.snapshot())
    assert got["MSFT"] == (pytest.approx(60.0), 8)
    # in-place update: double AAPL volumes
    lake.update_where("symbol = 'AAPL'", {"volume": "volume * 2"})
    view.refresh()
    got = {r.symbol: (r.vwap, r.total_volume) for r in view.read().collect()}
    assert got == _full_vwap(lake.snapshot())
    assert got["AAPL"][1] == 40
