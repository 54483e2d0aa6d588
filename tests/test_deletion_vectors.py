"""Deletion vectors: merge-on-read DELETE (Delta DV / Iceberg
positional-delete semantics).

The invariant that matters: for ANY interleaving of appends, dv
deletes, rewrite deletes, updates, optimize and checkpoints, every
read surface (snapshot, time-travel, scan_between, CDC) must equal
what the copy-on-write path would have produced — vectors change the
physical strategy, never the answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.txnlog import TransactionalLake


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("sym"),
        (F.col("id") * 1.5).alias("price"),
    )


@pytest.fixture()
def lake(spark, tmp_path):
    return TransactionalLake(spark, str(tmp_path / "dv"), partition_by=())


def _ids(df):
    return sorted(r.k for r in df.select("k").collect())


class TestDvDelete:
    def test_dv_delete_filters_without_rewrite(self, spark, lake):
        lake.append(_rows(spark, 0, 10).coalesce(1))
        files_before, _, _ = lake.prune_files({})
        lake.delete_where("k >= 7", mode="dv")
        files_after, _, _ = lake.prune_files({})
        # merge-on-read: the file set is untouched
        assert sorted(files_before) == sorted(files_after)
        assert _ids(lake.snapshot()) == [0, 1, 2, 3, 4, 5, 6]

    def test_dv_accumulates_across_commits(self, spark, lake):
        lake.append(_rows(spark, 0, 10).coalesce(1))
        lake.delete_where("k = 3", mode="dv")
        lake.delete_where("k = 5", mode="dv")
        assert _ids(lake.snapshot()) == [0, 1, 2, 4, 6, 7, 8, 9]

    def test_dv_time_travel(self, spark, lake):
        lake.append(_rows(spark, 0, 6).coalesce(1))  # v0
        lake.delete_where("k < 2", mode="dv")  # v1
        lake.delete_where("k = 4", mode="dv")  # v2
        assert _ids(lake.snapshot(version=0)) == [0, 1, 2, 3, 4, 5]
        assert _ids(lake.snapshot(version=1)) == [2, 3, 4, 5]
        assert _ids(lake.snapshot(version=2)) == [2, 3, 5]

    def test_dv_then_rewrite_delete(self, spark, lake):
        """A later copy-on-write delete must not resurrect dv-deleted
        rows (the rewrite input is dv-filtered) and drops the file's
        vector with the file."""
        lake.append(_rows(spark, 0, 10).coalesce(1))
        lake.delete_where("k = 2", mode="dv")
        lake.delete_where("k >= 8")  # rewrite mode
        assert _ids(lake.snapshot()) == [0, 1, 3, 4, 5, 6, 7]
        # vector went with the rewritten file
        assert lake._snapshot_state()[3] == {}

    def test_dv_matching_already_deleted_is_noop(self, spark, lake):
        lake.append(_rows(spark, 0, 5).coalesce(1))
        v1 = lake.delete_where("k = 1", mode="dv")
        v2 = lake.delete_where("k = 1", mode="dv")  # already gone
        assert v2 == v1 + 1  # still a commit (predicate recorded)
        assert _ids(lake.snapshot()) == [0, 2, 3, 4]

    def test_dv_update_sees_visible_rows_only(self, spark, lake):
        lake.append(_rows(spark, 0, 4).coalesce(1))
        lake.delete_where("k = 1", mode="dv")
        lake.update_where("k >= 0", {"price": "price * 0"})
        got = lake.snapshot().select("k", "price").collect()
        assert sorted((r.k, r.price) for r in got) == [
            (0, 0.0), (2, 0.0), (3, 0.0),
        ]

    def test_optimize_materializes_vectors(self, spark, lake):
        lake.append(_rows(spark, 0, 10).coalesce(1))
        lake.delete_where("k % 2 = 1", mode="dv")
        lake.optimize()
        assert lake._snapshot_state()[3] == {}  # vectors gone
        assert _ids(lake.snapshot()) == [0, 2, 4, 6, 8]

    def test_scan_between_applies_vectors(self, spark, lake):
        lake.append(_rows(spark, 0, 10).coalesce(1))
        lake.delete_where("k = 4", mode="dv")
        got = _ids(lake.scan_between({"k": (2, 6)}))
        assert got == [2, 3, 5, 6]

    def test_restore_clears_vectors_to_pre_dv_state(self, spark, lake):
        """r8: restore with active vectors works — rolling back past a
        dv delete clears the vector (dv_reset) and the hidden rows
        come back."""
        lake.append(_rows(spark, 0, 5).coalesce(1))  # v0
        lake.delete_where("k = 0", mode="dv")  # v1
        lake.delete_where("k = 3", mode="dv")  # v2
        v = lake.restore(version=0)
        assert _ids(lake.snapshot()) == [0, 1, 2, 3, 4]
        assert lake._snapshot_state()[3] == {}  # vectors cleared
        # row-exact CDC: the restore re-inserts exactly the two
        # previously-hidden rows
        ch = lake.read_changes(v).collect()
        assert sorted((r.k, r._change_type) for r in ch) == [
            (0, "insert"), (3, "insert"),
        ]

    def test_restore_to_dv_carrying_version(self, spark, lake):
        """Restoring TO a version that itself had vectors re-adopts
        exactly the target's vector state."""
        lake.append(_rows(spark, 0, 6).coalesce(1))  # v0
        lake.delete_where("k = 1", mode="dv")  # v1
        lake.delete_where("k in (2, 4)", mode="dv")  # v2
        v = lake.restore(version=1)
        assert _ids(lake.snapshot()) == [0, 2, 3, 4, 5]
        _f, _s, _v, dvs = lake._snapshot_state()
        assert sum(len(p) for p in dvs.values()) == 1  # only k=1 hidden
        ch = lake.read_changes(v).collect()
        assert sorted((r.k, r._change_type) for r in ch) == [
            (2, "insert"), (4, "insert"),
        ]

    def test_restore_past_dv_update_reverts_postimage(self, spark, lake):
        """Rolling back a dv UPDATE removes the postimage file AND
        clears the vector — CDC nets to the preimage rows."""
        lake.append(_rows(spark, 0, 4).coalesce(1))  # v0
        lake.update_where("k = 2", {"sym": "'up'"}, mode="dv")  # v1
        v = lake.restore(version=0)
        got = {(r.k, r.sym) for r in lake.snapshot().collect()}
        assert got == {(k, f"s{k % 3}") for k in range(4)}
        ch = lake.read_changes(v).collect()
        by = sorted((r.k, r.sym, r._change_type) for r in ch)
        assert by == [(2, "s2", "insert"), (2, "up", "delete")]

    def test_restore_dv_reset_survives_checkpoint_fold(
        self, spark, tmp_path
    ):
        lake = TransactionalLake(
            spark, str(tmp_path / "rcp"), partition_by=(),
            checkpoint_every=2,
        )
        lake.append(_rows(spark, 0, 5).coalesce(1))  # v0
        lake.delete_where("k = 1", mode="dv")  # v1
        lake.restore(version=0)  # v2 (dv_reset clears) -> checkpoint
        lake.append(_rows(spark, 5, 6).coalesce(1))  # v3
        assert lake.vacuum_log() > 0
        fresh = TransactionalLake(spark, str(tmp_path / "rcp"),
                                  partition_by=())
        assert _ids(fresh.snapshot()) == [0, 1, 2, 3, 4, 5]
        assert fresh._snapshot_state()[3] == {}


class TestDvCdc:
    def test_dv_commit_emits_exact_deletes(self, spark, lake):
        lake.append(_rows(spark, 0, 6).coalesce(1))
        v = lake.delete_where("k in (1, 4)", mode="dv")
        ch = lake.read_changes(v).filter(F.col("_change_type") == "delete")
        assert sorted(r.k for r in ch.collect()) == [1, 4]

    def test_rewrite_after_dv_does_not_double_delete(self, spark, lake):
        """The CDC contract the MV fold depends on: net change per
        row is exact. dv-deletes k=1; a later rewrite-delete of k=3
        must NOT re-emit k=1 as deleted (it already left the table)."""
        lake.append(_rows(spark, 0, 5).coalesce(1))
        lake.delete_where("k = 1", mode="dv")
        lake.delete_where("k = 3")  # rewrite of the whole file
        ch = lake.read_changes(0)
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        net = (
            ch.groupBy("k")
            .agg(F.sum(sign).alias("n"))
            .collect()
        )
        net_by_k = {r.k: r.n for r in net}
        assert net_by_k == {0: 1, 1: 0, 2: 1, 3: 0, 4: 1}

    def test_incremental_mv_over_dv_deletes(self, spark, lake, tmp_path):
        """End-to-end consumer check: the incremental aggregate view
        folds dv-deletes exactly like rewrites."""
        from market_data_lakehouse_spark.mv import IncrementalAggView

        mv = IncrementalAggView(
            spark,
            lake,
            str(tmp_path / "mv"),
            group_by=["sym"],
            sum_cols=["price"],
        )
        lake.append(_rows(spark, 0, 12).coalesce(1))
        mv.refresh()
        lake.delete_where("k % 3 = 0", mode="dv")
        mv.refresh()
        got = {
            r.sym: (r.n_rows, round(r.sum_price, 4))
            for r in mv.view().collect()
        }
        want = {
            r.sym: (r.n, round(r.s, 4))
            for r in lake.snapshot()
            .groupBy("sym")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("s"))
            .collect()
        }
        assert got == want


class TestDvLifecycle:
    def test_vectors_fold_through_checkpoint_and_vacuum(
        self, spark, tmp_path
    ):
        lake = TransactionalLake(
            spark,
            str(tmp_path / "cp"),
            partition_by=(),
            checkpoint_every=2,
        )
        lake.append(_rows(spark, 0, 8).coalesce(1))  # v0
        lake.delete_where("k = 1", mode="dv")  # v1
        lake.delete_where("k = 2", mode="dv")  # v2 -> checkpoint
        lake.append(_rows(spark, 8, 10).coalesce(1))  # v3
        assert lake.vacuum_log() > 0
        assert _ids(lake.snapshot()) == [0, 3, 4, 5, 6, 7, 8, 9]

    def test_cdc_dv_state_survives_vacuum(self, spark, tmp_path):
        """After vacuum_log removes the dv commits, a rewrite's
        remove-emission still must not re-delete those rows — the
        running dv state seeds from the checkpoint."""
        lake = TransactionalLake(
            spark,
            str(tmp_path / "cdc"),
            partition_by=(),
            checkpoint_every=2,
        )
        lake.append(_rows(spark, 0, 5).coalesce(1))  # v0
        lake.delete_where("k = 1", mode="dv")  # v1
        lake.delete_where("k = 2", mode="dv")  # v2 -> checkpoint
        lake.vacuum_log()
        v3 = lake.delete_where("k = 3")  # rewrite
        ch = lake.read_changes(v3)
        deleted = sorted(
            r.k
            for r in ch.filter(
                F.col("_change_type") == "delete"
            ).collect()
        )
        assert 1 not in deleted and 2 not in deleted
        assert 3 in deleted


class TestDvUpdate:
    def test_dv_update_no_rewrite_same_answer(self, spark, lake):
        """mode='dv' UPDATE must equal copy-on-write UPDATE on every
        read surface while touching NO existing data file."""
        lake.append(_rows(spark, 0, 10).coalesce(1))
        files_before, _, _ = lake.prune_files({})
        lake.update_where("k >= 7", {"price": "price * 2"}, mode="dv")
        files_after, _, _ = lake.prune_files({})
        # old files untouched; postimage rows arrive as NEW files
        assert set(files_before) <= set(files_after)
        snap = lake.snapshot()
        assert _ids(snap) == list(range(10))
        got = {r.k: r.price for r in snap.collect()}
        assert got == {k: k * 1.5 * (2 if k >= 7 else 1) for k in range(10)}

    def test_dv_update_time_travel_and_changes(self, spark, lake):
        lake.append(_rows(spark, 0, 6).coalesce(1))  # v0
        lake.update_where("k = 2", {"sym": "'up'"}, mode="dv")  # v1
        assert {r.sym for r in lake.snapshot(version=0).collect()} == {
            "s0", "s1", "s2"
        }
        assert [
            r.sym for r in lake.snapshot(version=1).filter("k = 2").collect()
        ] == ["up"]
        # CDC is EXACT for dv updates: only the changed row emits,
        # as one delete (preimage) + one insert (postimage)
        ch = lake.read_changes(starting_version=1).collect()
        by_type = {}
        for r in ch:
            by_type.setdefault(r._change_type, []).append(r)
        assert [r.k for r in by_type["delete"]] == [2]
        assert [r.k for r in by_type["insert"]] == [2]
        assert by_type["delete"][0].sym == "s2"
        assert by_type["insert"][0].sym == "up"

    def test_dv_update_respects_prior_vectors(self, spark, lake):
        """Rows hidden by an earlier deletion vector must not be
        resurrected or re-updated."""
        lake.append(_rows(spark, 0, 8).coalesce(1))
        lake.delete_where("k = 4", mode="dv")
        lake.update_where("k >= 3", {"price": "0.0"}, mode="dv")
        snap = lake.snapshot()
        assert _ids(snap) == [0, 1, 2, 3, 5, 6, 7]
        got = {r.k: r.price for r in snap.collect()}
        assert got == {
            k: (0.0 if k >= 3 else k * 1.5) for k in [0, 1, 2, 3, 5, 6, 7]
        }

    def test_dv_update_unknown_column_raises(self, spark, lake):
        lake.append(_rows(spark, 0, 3))
        with pytest.raises(ValueError, match="unknown columns"):
            lake.update_where("k = 1", {"nope": "1"}, mode="dv")

    def test_dv_update_no_match_is_noop_commit(self, spark, lake):
        lake.append(_rows(spark, 0, 3).coalesce(1))
        v = lake.update_where("k = 99", {"price": "0.0"}, mode="dv")
        assert v == 1
        assert _ids(lake.snapshot()) == [0, 1, 2]
        assert lake._read_commit(1)["dv"] == {}

    def test_dv_update_then_optimize_materializes(self, spark, lake):
        lake.append(_rows(spark, 0, 10).coalesce(1))
        lake.update_where("k < 3", {"price": "-1.0"}, mode="dv")
        lake.optimize()
        assert lake.detail()["num_deletion_vectors"] == 0
        got = {r.k: r.price for r in lake.snapshot().collect()}
        assert got == {
            k: (-1.0 if k < 3 else k * 1.5) for k in range(10)
        }


class TestDvMerge:
    def test_dv_merge_equals_rewrite_merge(self, spark, lake):
        """mode='dv' MERGE must produce the same table state as the
        copy-on-write MERGE while leaving every pre-merge data file
        untouched."""
        lake.append(_rows(spark, 0, 10).coalesce(1))
        src = spark.createDataFrame(
            [(3, "up", 99.0), (7, "up", 88.0), (42, "new", 1.0)],
            "k bigint, sym string, price double",
        )
        files_before, _, _ = lake.prune_files({})
        lake.merge(src, on="k", mode="dv")
        files_after, _, _ = lake.prune_files({})
        assert set(files_before) <= set(files_after)
        got = {(r.k, r.sym, r.price) for r in lake.snapshot().collect()}
        want = {
            (k, f"s{k % 3}", k * 1.5) for k in range(10) if k not in (3, 7)
        } | {(3, "up", 99.0), (7, "up", 88.0), (42, "new", 1.0)}
        assert got == want

    def test_dv_merge_delete_mode(self, spark, lake):
        lake.append(_rows(spark, 0, 6).coalesce(1))
        src = spark.createDataFrame([(1,), (4,), (99,)], "k bigint")
        files_before, _, _ = lake.prune_files({})
        lake.merge(
            src, on="k", when_matched="delete",
            when_not_matched="ignore", mode="dv",
        )
        files_after, _, _ = lake.prune_files({})
        # pure delete: no postimage files at all
        assert sorted(files_before) == sorted(files_after)
        assert _ids(lake.snapshot()) == [0, 2, 3, 5]

    def test_dv_merge_cdc_exact(self, spark, lake):
        """CDC for a dv merge is row-exact: only matched rows emit
        delete+insert, inserts emit insert — no rewritten-survivor
        churn."""
        lake.append(_rows(spark, 0, 6).coalesce(1))
        v = lake.merge(
            spark.createDataFrame(
                [(2, "up", 0.0), (50, "new", 5.0)],
                "k bigint, sym string, price double",
            ),
            on="k",
            mode="dv",
        )
        ch = lake.read_changes(v).collect()
        by = {}
        for r in ch:
            by.setdefault(r._change_type, []).append((r.k, r.sym))
        assert sorted(by["delete"]) == [(2, "s2")]
        assert sorted(by["insert"]) == [(2, "up"), (50, "new")]

    def test_dv_merge_respects_prior_vectors(self, spark, lake):
        """A dv-hidden row must not match (it left the table): its
        key inserts as new instead of updating a ghost."""
        lake.append(_rows(spark, 0, 5).coalesce(1))
        lake.delete_where("k = 2", mode="dv")
        lake.merge(
            spark.createDataFrame(
                [(2, "back", 7.0)], "k bigint, sym string, price double"
            ),
            on="k",
            mode="dv",
        )
        got = {(r.k, r.sym) for r in lake.snapshot().collect()}
        assert (2, "back") in got and (2, "s2") not in got
        assert _ids(lake.snapshot()) == [0, 1, 2, 3, 4]

    def test_dv_merge_idempotent_txn(self, spark, lake):
        lake.append(_rows(spark, 0, 4).coalesce(1))
        src = spark.createDataFrame(
            [(1, "u", 0.0)], "k bigint, sym string, price double"
        )
        v1 = lake.merge(src, on="k", mode="dv", txn=("app", 5))
        v2 = lake.merge(src, on="k", mode="dv", txn=("app", 5))
        assert v1 == v2 == lake.version
        assert [r.sym for r in lake.snapshot().filter("k=1").collect()] == [
            "u"
        ]

    def test_dv_merge_duplicate_source_keys_raise(self, spark, lake):
        lake.append(_rows(spark, 0, 3).coalesce(1))
        src = spark.createDataFrame(
            [(1, "a", 0.0), (1, "b", 0.0)],
            "k bigint, sym string, price double",
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            lake.merge(src, on="k", mode="dv")

    def test_dv_merge_then_optimize_materializes(self, spark, lake):
        lake.append(_rows(spark, 0, 8).coalesce(1))
        lake.merge(
            spark.createDataFrame(
                [(0, "z", -1.0)], "k bigint, sym string, price double"
            ),
            on="k",
            mode="dv",
        )
        lake.optimize()
        assert lake.detail()["num_deletion_vectors"] == 0
        got = {(r.k, r.sym) for r in lake.snapshot().collect()}
        assert (0, "z") in got and len(got) == 8

    def test_incremental_mv_folds_restore_across_dv(
        self, spark, lake, tmp_path
    ):
        """The MV consumes the restore's dv_reset CDC emissions like
        any other row change: after rolling back past a dv delete and
        a dv update, the incrementally-folded view must equal a from-
        scratch aggregate of the restored table."""
        from market_data_lakehouse_spark.mv import IncrementalAggView

        mv = IncrementalAggView(
            spark,
            lake,
            str(tmp_path / "mvr"),
            group_by=["sym"],
            sum_cols=["price"],
        )
        lake.append(_rows(spark, 0, 12).coalesce(1))  # v0
        mv.refresh()
        lake.delete_where("k % 4 = 1", mode="dv")  # v1
        lake.update_where("k % 4 = 2", {"price": "price + 50"},
                          mode="dv")  # v2
        mv.refresh()
        lake.restore(version=0)  # v3: dv_reset clears both vectors
        mv.refresh()
        got = {
            r.sym: (r.n_rows, round(r.sum_price, 4))
            for r in mv.view().collect()
        }
        want = {
            r.sym: (r.n, round(r.s, 4))
            for r in lake.snapshot()
            .groupBy("sym")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("s"))
            .collect()
        }
        assert got == want


class TestDvPropertyPythonApi:
    """r15: mode=None (the new default) honors the table's
    delta.enableDeletionVectors property — Delta's own resolution —
    so the Python API and the SQL front agree on the strategy. An
    explicit mode always wins, and explicit dv + BY SOURCE keeps the
    loud refusal while the implicit path falls back."""

    def _opted(self, spark, tmp_path, name="dvp"):
        t = TransactionalLake(spark, str(tmp_path / name),
                              partition_by=())
        t.append(_rows(spark, 0, 10).coalesce(1))
        t.set_properties({"delta.enableDeletionVectors": "true"})
        return t

    def _files(self, t):
        files, _, _ = t.prune_files({})
        return set(files)

    def test_implicit_delete_rides_dv(self, spark, tmp_path):
        t = self._opted(spark, tmp_path)
        before = self._files(t)
        t.delete_where("k >= 7")
        assert self._files(t) == before
        assert t.history(limit=1)[0]["op"] == "delete_dv"
        assert _ids(t.snapshot()) == [0, 1, 2, 3, 4, 5, 6]

    def test_implicit_update_rides_dv(self, spark, tmp_path):
        t = self._opted(spark, tmp_path)
        before = self._files(t)
        t.update_where("k < 3", {"k": "k + 100"})
        assert before <= self._files(t)
        assert t.history(limit=1)[0]["op"] == "update_dv"
        assert _ids(t.snapshot()) == [3, 4, 5, 6, 7, 8, 9, 100, 101,
                                      102]

    def test_implicit_merge_rides_dv(self, spark, tmp_path):
        t = self._opted(spark, tmp_path)
        before = self._files(t)
        t.merge(_rows(spark, 8, 12), on=["k"])
        assert before <= self._files(t)
        assert t.history(limit=1)[0]["op"] == "merge_dv"
        assert _ids(t.snapshot()) == list(range(12))

    def test_implicit_by_source_falls_back(self, spark, tmp_path):
        t = self._opted(spark, tmp_path)
        t.merge(
            _rows(spark, 0, 5), on=["k"], when_matched=None,
            when_not_matched="ignore",
            when_not_matched_by_source="delete",
        )
        assert t.history(limit=1)[0]["op"] == "merge"
        assert _ids(t.snapshot()) == [0, 1, 2, 3, 4]

    def test_explicit_dv_by_source_still_refuses(self, spark,
                                                 tmp_path):
        t = self._opted(spark, tmp_path)
        with pytest.raises(ValueError, match="rewrite"):
            t.merge(
                _rows(spark, 0, 5), on=["k"], when_matched=None,
                when_not_matched="ignore",
                when_not_matched_by_source="delete", mode="dv",
            )

    def test_explicit_rewrite_wins_over_property(self, spark,
                                                 tmp_path):
        t = self._opted(spark, tmp_path)
        before = self._files(t)
        t.delete_where("k >= 7", mode="rewrite")
        assert self._files(t) != before
        assert t.history(limit=1)[0]["op"] == "delete"

    def test_unset_table_defaults_to_rewrite(self, spark, tmp_path):
        t = TransactionalLake(spark, str(tmp_path / "plain"),
                              partition_by=())
        t.append(_rows(spark, 0, 10).coalesce(1))
        before = self._files(t)
        t.delete_where("k >= 7")
        assert self._files(t) != before
        assert t.history(limit=1)[0]["op"] == "delete"

    def test_bad_property_value_refuses(self, spark, tmp_path):
        t = TransactionalLake(spark, str(tmp_path / "bad"),
                              partition_by=())
        t.append(_rows(spark, 0, 5).coalesce(1))
        t.set_properties({"delta.enableDeletionVectors": "maybe"})
        with pytest.raises(ValueError, match="enableDeletionVectors"):
            t.delete_where("k = 1")
