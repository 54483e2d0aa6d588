"""Zero-copy clone: hardlinked data files + a fresh v0 log."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.txnlog import TransactionalLake


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("sym"),
        (F.col("id") * 2.0).alias("price"),
        F.to_date(F.lit("2024-06-15")).alias("date"),
    )


def _ids(lake, version=None):
    return sorted(r.k for r in lake.snapshot(version=version).collect())


class TestClone:
    def test_clone_equals_source_and_diverges(self, spark, tmp_path):
        src = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=("date",)
        )
        src.append(_rows(spark, 0, 10))
        src.delete_where("k = 3")
        clone = src.clone(str(tmp_path / "clone"))
        assert _ids(clone) == _ids(src)
        assert clone.version == 0  # fresh history
        # divergence is two-way independent
        clone.append(_rows(spark, 100, 103))
        src.delete_where("k = 5")
        assert _ids(src) == [0, 1, 2, 4, 6, 7, 8, 9]
        assert _ids(clone) == [0, 1, 2, 4, 5, 6, 7, 8, 9, 100, 101, 102]

    def test_clone_carries_deletion_vectors(self, spark, tmp_path):
        src = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=()
        )
        src.append(_rows(spark, 0, 8).coalesce(1))
        src.delete_where("k in (2, 6)", mode="dv")
        clone = src.clone(str(tmp_path / "clone"))
        assert _ids(clone) == [0, 1, 3, 4, 5, 7]
        # CDC of the clone's v0 inserts only the VISIBLE rows
        ch = clone.read_changes(0)
        ins = sorted(
            r.k
            for r in ch.filter(F.col("_change_type") == "insert").collect()
        )
        assert ins == [0, 1, 3, 4, 5, 7]
        assert ch.filter(F.col("_change_type") == "delete").count() == 0

    def test_source_vacuum_cannot_break_clone(self, spark, tmp_path):
        src = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=()
        )
        src.append(_rows(spark, 0, 6).coalesce(1))
        clone = src.clone(str(tmp_path / "clone"))
        # source rewrites everything, then vacuums its old files NOW
        src.overwrite(_rows(spark, 50, 52).coalesce(1))
        src.set_properties({"retentionDurationCheck.enabled": "false"})
        assert src.vacuum(retention_seconds=0.0) > 0
        # the clone owns its hardlinks: still fully readable
        assert _ids(clone) == [0, 1, 2, 3, 4, 5]

    def test_clone_refuses_nonempty_target(self, spark, tmp_path):
        src = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=()
        )
        src.append(_rows(spark, 0, 3).coalesce(1))
        tgt = TransactionalLake(
            spark, str(tmp_path / "tgt"), partition_by=()
        )
        tgt.append(_rows(spark, 9, 10).coalesce(1))
        with pytest.raises(ValueError, match="not empty"):
            src.clone(str(tmp_path / "tgt"))

    def test_clone_shares_bytes(self, spark, tmp_path):
        src = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=()
        )
        src.append(_rows(spark, 0, 1000).coalesce(1))
        clone = src.clone(str(tmp_path / "clone"))
        (src_file,) = [
            os.path.join(src.path, f)
            for f in src._snapshot_state()[0]
        ]
        (cl_file,) = [
            os.path.join(clone.path, f)
            for f in clone._snapshot_state()[0]
        ]
        assert os.path.samefile(src_file, cl_file)  # one inode


class TestCloneAtVersion:
    """r10: CLONE ... VERSION AS OF — a historical clone carries the
    file set AND the table metadata as of that version."""

    def test_clone_historical_snapshot(self, spark, tmp_path):
        from pyspark.sql import functions as F  # noqa: F401

        lake = TransactionalLake(
            spark, str(tmp_path / "src"), partition_by=())
        lake.append(spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id bigint, v double"))
        lake.add_check_constraint("v_pos", "v >= 0")
        v_old = lake.version
        lake.delete_where("id < 4")
        lake.set_properties({"stage": "post-delete"})
        clone = lake.clone(str(tmp_path / "hist"), version=v_old)
        assert clone.snapshot().count() == 8  # pre-delete state
        assert clone.check_constraints() == {"v_pos": "v >= 0"}
        assert clone.properties() == {}  # property set AFTER v_old
        # head clone for contrast
        head = lake.clone(str(tmp_path / "head"))
        assert head.snapshot().count() == 4
        assert head.properties() == {"stage": "post-delete"}

    def test_clone_at_version_keeps_row_ids(self, spark, tmp_path):
        lake = TransactionalLake(
            spark, str(tmp_path / "rtsrc"), partition_by=())
        lake.append(spark.createDataFrame(
            [(i,) for i in range(6)], "id bigint").coalesce(1))
        lake.enable_row_tracking()
        v_old = lake.version
        before = {
            r["_row_id"]: r.id
            for r in lake.snapshot(with_row_ids=True).collect()
        }
        lake.delete_where("id >= 3")
        clone = lake.clone(str(tmp_path / "rthist"), version=v_old)
        got = {
            r["_row_id"]: r.id
            for r in clone.snapshot(with_row_ids=True).collect()
        }
        assert got == before


class TestDeepClone:
    """r12: Delta DEEP CLONE — byte-independent copy (the shallow
    clone's hardlinks already survive source vacuum; deep buys
    storage independence)."""

    def test_deep_clone_owns_separate_inodes(self, spark, tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "s"), partition_by=())
        src.append(_rows(spark, 0, 500).coalesce(1))
        clone = src.clone(str(tmp_path / "d"), deep=True)
        assert _ids(clone) == _ids(src)
        (sf,) = [os.path.join(src.path, f) for f in src._snapshot_state()[0]]
        (cf,) = [
            os.path.join(clone.path, f)
            for f in clone._snapshot_state()[0]
        ]
        assert not os.path.samefile(sf, cf)
        assert os.stat(sf).st_nlink == 1 and os.stat(cf).st_nlink == 1
        assert clone.history()[-1]["clone_mode"] == "deep"

    def test_deep_clone_survives_source_removal(self, spark, tmp_path):
        import shutil

        src = TransactionalLake(spark, str(tmp_path / "s2"), partition_by=())
        src.append(_rows(spark, 0, 100).coalesce(1))
        want = _ids(src)
        clone = src.clone(str(tmp_path / "d2"), deep=True)
        shutil.rmtree(src.path)
        assert _ids(clone) == want
