"""API parity with the reference public surface — mirrors the
reference's own test groups (reference tests/test_core.py:67-166:
TestOHLCVBar, TestPartitionManager)."""

from __future__ import annotations

from datetime import datetime

import pytest

from market_data_lakehouse_spark import (
    AssetClass,
    OHLCVBar,
    PartitionManager,
)


def make_bar(**over) -> OHLCVBar:
    kw = dict(
        symbol="AAPL",
        timestamp=datetime(2024, 6, 15, 10, 30),
        open=150.0,
        high=155.0,
        low=149.0,
        close=153.0,
        volume=1_000_000,
        asset_class=AssetClass.EQUITY,
    )
    kw.update(over)
    return OHLCVBar(**kw)


class TestOHLCVBar:
    def test_valid_bar_passes(self):
        make_bar().validate()

    def test_high_below_low_rejected(self):
        with pytest.raises(ValueError, match="High"):
            make_bar(high=140.0, low=149.0).validate()

    def test_open_outside_range_rejected(self):
        with pytest.raises(ValueError, match="Open"):
            make_bar(open=200.0).validate()

    def test_close_outside_range_rejected(self):
        with pytest.raises(ValueError, match="Close"):
            make_bar(close=100.0).validate()

    def test_negative_volume_rejected(self):
        with pytest.raises(ValueError, match="Volume"):
            make_bar(volume=-1).validate()

    def test_to_dict_roundtrip(self):
        d = make_bar().to_dict()
        assert d["timestamp"] == "2024-06-15T10:30:00"
        assert d["asset_class"] == "equity"
        assert d["symbol"] == "AAPL" and d["volume"] == 1_000_000

    @pytest.mark.parametrize(
        "ac", [AssetClass.EQUITY, AssetClass.OPTION, AssetClass.FUTURE,
               AssetClass.FOREX, AssetClass.CRYPTO]
    )
    def test_all_asset_classes(self, ac):
        bar = make_bar(asset_class=ac)
        bar.validate()
        assert bar.to_dict()["asset_class"] == ac.value

    def test_nan_bar_passes_like_reference(self):
        # reference validate() with NaN prices raises nothing (all
        # comparisons false) — SURVEY §1.4-5
        make_bar(open=float("nan")).validate()


class TestPartitionManager:
    def test_key_format(self, tmp_path):
        pm = PartitionManager(tmp_path / "lake")
        assert pm.partition_key(datetime(2024, 6, 15, 23, 59)) == "2024-06-15"

    def test_partition_path_hive_layout(self, tmp_path):
        pm = PartitionManager(tmp_path / "lake")
        p = pm.partition_path("2024-06-15")
        assert p.name == "date=2024-06-15" and p.is_dir()

    def test_empty_list(self, tmp_path):
        pm = PartitionManager(tmp_path / "lake")
        assert pm.list_partitions() == []

    def test_range_inclusive(self, tmp_path):
        pm = PartitionManager(tmp_path / "lake")
        for d in ("2024-06-14", "2024-06-15", "2024-06-16", "2024-06-17"):
            pm.partition_path(d)
        got = pm.partitions_in_range(
            datetime(2024, 6, 15), datetime(2024, 6, 16, 23, 0)
        )
        assert got == ["2024-06-15", "2024-06-16"]


class TestIngestOHLCVBar:
    def test_lakehouse_accepts_dataclass_bars(self, spark, tmp_path):
        from market_data_lakehouse_spark import DataLakehouse

        lake = DataLakehouse(spark, str(tmp_path / "lake"))
        assert lake.ingest(make_bar()) is True
        assert lake.ingest(make_bar(open=999.0)) is False  # invalid
        stats = lake.ingest_batch([make_bar(volume=7)])
        assert stats.rows_ingested == 1
        assert lake.total_errors == 1
        lake.flush()
        assert lake.query().count == 2
