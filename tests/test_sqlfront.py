"""LakeSQL — the SQL utility front-end (S31, r12).

Round-trip every supported verb: the SQL statement must reach the
same txnlog state the Python API call reaches, and the returned
DataFrame must carry the documented shape. Grammar errors must raise
``ValueError`` naming the supported form (never fall through to
``spark.sql``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_lakehouse_spark.sqlfront import LakeSQL
from market_data_lakehouse_spark.txnlog import TransactionalLake


@pytest.fixture()
def lake(spark, tmp_path):
    tx = TransactionalLake(spark, str(tmp_path / "t"), partition_by=())
    tx.append(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    return tx


@pytest.fixture()
def front(spark, lake):
    fr = LakeSQL(spark)
    fr.register("t", lake)
    return fr


class TestSelectPassthrough:
    def test_select_over_snapshot(self, front):
        got = front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
        assert got == 100

    def test_view_tracks_log(self, front, lake, spark):
        lake.delete_where("k < 50")
        got = front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
        assert got == 50

    def test_unknown_table(self, front):
        with pytest.raises(ValueError, match="unknown table"):
            front.table("nope")


class TestLifecycleVerbs:
    def test_describe_history_and_limit(self, front, lake):
        lake.append(lake.spark.range(5).select(F.col("id").alias("k"),
                                               F.lit(0).alias("grp"),
                                               F.lit(0.0).alias("v")))
        hist = front.sql("DESCRIBE HISTORY t").collect()
        assert [r["version"] for r in hist] == list(
            range(lake.version, -1, -1)
        )
        assert hist[0]["operation"] == "append"
        lim = front.sql("DESCRIBE HISTORY t LIMIT 1").collect()
        assert len(lim) == 1 and lim[0]["version"] == lake.version

    def test_describe_detail(self, front, lake):
        row = front.sql("DESCRIBE DETAIL t").collect()[0]
        d = lake.detail()
        assert row["version"] == d["version"]
        assert row["num_files"] == d["num_files"]
        assert row["size_bytes"] == d["size_bytes"]

    def test_set_unset_show_tblproperties(self, front, lake):
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'ops', 'tier'='gold')"
        )
        props = {
            r["key"]: r["value"]
            for r in front.sql("SHOW TBLPROPERTIES t").collect()
        }
        assert props["owner"] == "ops" and props["tier"] == "gold"
        front.sql("ALTER TABLE t UNSET TBLPROPERTIES ('tier')")
        assert "tier" not in lake.properties()

    def test_optimize_and_zorder(self, front, lake):
        for _ in range(3):
            lake.append(
                lake.spark.range(10).select(
                    F.col("id").alias("k"),
                    F.lit(1).alias("grp"),
                    F.lit(2.0).alias("v"),
                )
            )
        before = lake.detail()["num_files"]
        rec = front.sql("OPTIMIZE t ZORDER BY (k)").collect()[0]
        assert rec["num_removed_files"] == before  # all compacted
        assert rec["num_added_files"] < before
        assert lake.detail()["num_files"] < before
        assert lake.history(limit=1)[0]["zorder_by"] == ["k"]

    def test_optimize_where_bounds(self, front, lake):
        # scoped form parses into prune_files bounds; outside-scope
        # files untouched is txnlog-tested — here: parse + dispatch
        rec = front.sql("OPTIMIZE t WHERE k BETWEEN 0 AND 10").collect()[0]
        assert rec["version"] >= 1 or rec["version"] == lake.version

    def test_vacuum_dry_run_then_real(self, front, lake):
        lake.optimize()
        dry = front.sql("VACUUM t RETAIN 0 HOURS DRY RUN")
        paths = [r["path"] for r in dry.collect()]
        assert paths, "post-compaction old files should be vacuum-eligible"
        # real vacuum at 0 retention needs the floor override
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('retentionDurationCheck.enabled' = 'false')"
        )
        front.sql("VACUUM t RETAIN 0 HOURS")
        assert front.sql("VACUUM t RETAIN 0 HOURS DRY RUN").count() == 0

    def test_restore_version_as_of(self, front, lake):
        v0 = lake.version
        lake.delete_where("k < 90")
        front.sql(f"RESTORE TABLE t TO VERSION AS OF {v0}")
        assert lake.snapshot().count() == 100

    def test_schema_evolution_verbs(self, front, lake):
        front.sql("ALTER TABLE t ADD COLUMN tag STRING")
        assert "tag" in lake.snapshot().columns
        front.sql("ALTER TABLE t ADD COLUMNS (a1 INT, a2 DOUBLE)")
        assert {"a1", "a2"} <= set(lake.snapshot().columns)
        front.sql("ALTER TABLE t RENAME COLUMN tag TO label")
        cols = set(lake.snapshot().columns)
        assert "label" in cols and "tag" not in cols
        front.sql("ALTER TABLE t DROP COLUMN a2")
        assert "a2" not in lake.snapshot().columns
        front.sql("ALTER TABLE t ALTER COLUMN a1 TYPE BIGINT")
        assert dict(lake.snapshot().dtypes)["a1"] == "bigint"

    def test_defaults_and_constraints(self, front, lake, spark):
        front.sql("ALTER TABLE t ADD COLUMN src STRING")
        front.sql("ALTER TABLE t ALTER COLUMN src SET DEFAULT 'batch'")
        lake.append(
            spark.range(3).select(
                (F.col("id") + 1000).alias("k"),
                F.lit(9).alias("grp"),
                F.lit(0.0).alias("v"),
            )
        )
        got = (
            lake.snapshot().filter("k >= 1000").select("src").distinct().collect()
        )
        assert [r["src"] for r in got] == ["batch"]
        front.sql("ALTER TABLE t ALTER COLUMN src DROP DEFAULT")
        assert lake.column_defaults() == {}
        front.sql("ALTER TABLE t ADD CONSTRAINT pos CHECK (k >= 0)")
        assert "pos" in lake.check_constraints()
        with pytest.raises(Exception, match="pos"):
            lake.append(
                spark.range(1).select(
                    F.lit(-5).alias("k"),
                    F.lit(0).alias("grp"),
                    F.lit(0.0).alias("v"),
                    F.lit("x").alias("src"),
                )
            )
        front.sql("ALTER TABLE t DROP CONSTRAINT pos")
        assert "pos" not in lake.check_constraints()

    def test_cluster_by_and_optimize_full(self, front, lake):
        front.sql("ALTER TABLE t CLUSTER BY (grp)")
        assert lake.clustering_info()["cluster_by"] == ["grp"]
        front.sql("OPTIMIZE t")  # incremental liquid pass
        assert lake.clustering_info()["unclustered_files"] == 0
        front.sql("OPTIMIZE t FULL")
        assert lake.clustering_info()["unclustered_files"] == 0
        front.sql("ALTER TABLE t CLUSTER BY NONE")
        info = lake.clustering_info()
        assert info is None or info["cluster_by"] == []

    def test_analyze_and_stats(self, front, lake):
        front.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, grp")
        st = lake.table_stats()
        assert st["rows"] == 100
        assert set(st["columns"]) == {"k", "grp"}

    def test_generate_manifest(self, front, lake):
        paths = [r["path"] for r in front.sql(
            "GENERATE symlink_format_manifest FOR TABLE t"
        ).collect()]
        assert sorted(paths) == sorted(lake.manifest_paths())

    def test_reorg_purge(self, front, lake):
        front.sql("ALTER TABLE t RENAME COLUMN v TO val")
        rec = front.sql("REORG TABLE t APPLY (PURGE)").collect()[0]
        assert rec["operation"] == "REORG"
        assert "val" in lake.snapshot().columns


class TestGrammarErrors:
    def test_utility_head_never_falls_through(self, front):
        with pytest.raises(ValueError, match="OPTIMIZE"):
            front.sql("OPTIMIZE t CLUSTER ALL THE THINGS")

    def test_alter_unknown_form(self, front):
        with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
            front.sql("ALTER TABLE t FROBNICATE")

    def test_bad_where_atom(self, front):
        with pytest.raises(ValueError, match="unsupported OPTIMIZE WHERE"):
            front.sql("OPTIMIZE t WHERE k LIKE 'x%'")

    def test_trailing_semicolon_ok(self, front):
        assert front.sql("DESCRIBE DETAIL t;").count() == 1


class TestDML:
    """r12: transactional DML through SQL strings — INSERT / DELETE /
    UPDATE / MERGE INTO dispatch onto the log's methods, and SELECT
    understands VERSION AS OF."""

    def test_insert_into_and_overwrite(self, front, lake, spark):
        front.sql(
            "INSERT INTO t SELECT k + 1000 AS k, grp, v FROM t WHERE k < 5"
        )
        assert lake.snapshot().count() == 105
        front.sql("INSERT OVERWRITE t SELECT 1 AS k, 2 AS grp, 3.0 AS v")
        assert lake.snapshot().count() == 1

    def test_insert_values(self, front, lake):
        front.sql(
            "INSERT INTO t VALUES (500, 1, 0.5), (501, 2, 1.5)"
        )
        assert lake.snapshot().filter("k >= 500").count() == 2

    def test_delete_from(self, front, lake):
        front.sql("DELETE FROM t WHERE k % 2 = 0")
        assert lake.snapshot().count() == 50
        assert lake.snapshot().filter("k % 2 = 0").count() == 0
        front.sql("DELETE FROM t")
        assert lake.snapshot().count() == 0

    def test_update_set_where(self, front, lake):
        front.sql("UPDATE t SET v = v * 2, grp = 99 WHERE k < 10")
        got = lake.snapshot().filter("k < 10")
        assert got.filter("grp = 99").count() == 10
        assert got.agg({"v": "sum"}).first()[0] == sum(i * 1.5 * 2 for i in range(10))
        assert lake.snapshot().filter("k >= 10 AND grp = 99").count() == 0

    def test_merge_upsert(self, front, lake, spark):
        front.sql(
            "MERGE INTO t USING ("
            "  SELECT k, grp, CAST(0.0 AS DOUBLE) AS v FROM t WHERE k < 3"
            "  UNION ALL SELECT CAST(777 AS BIGINT) AS k,"
            "  CAST(7 AS BIGINT) AS grp, CAST(7.0 AS DOUBLE) AS v"
            ") AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        snap = lake.snapshot()
        assert snap.count() == 101
        assert snap.filter("k < 3 AND v = 0.0").count() == 3
        assert snap.filter("k = 777 AND grp = 7").count() == 1

    def test_merge_delete_matched(self, front, lake):
        front.sql(
            "MERGE INTO t USING (SELECT k FROM t WHERE grp = 0) s "
            "ON t.k = s.k WHEN MATCHED THEN DELETE"
        )
        assert lake.snapshot().filter("grp = 0").count() == 0

    def test_merge_grammar_errors(self, front):
        with pytest.raises(ValueError, match="share a name"):
            front.sql(
                "MERGE INTO t USING (SELECT 1 AS x) s ON t.k = s.x "
                "WHEN MATCHED THEN UPDATE SET *"
            )
        # r13: per-column SET and named-column INSERT are now
        # supported — the remaining refusals are a VALUES-less named
        # insert and a malformed assignment list
        with pytest.raises(ValueError, match="INSERT"):
            front.sql(
                "MERGE INTO t USING (SELECT 1 AS k) s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (k)"
            )
        with pytest.raises(ValueError, match="col = expr"):
            front.sql(
                "MERGE INTO t USING (SELECT 1 AS k) s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET v"
            )

    def test_select_version_as_of(self, front, lake):
        front.sql("DELETE FROM t WHERE k >= 50")
        assert front.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 50
        got = front.sql(
            "SELECT COUNT(*) AS n FROM t VERSION AS OF 0"
        ).first()["n"]
        assert got == 100

    def test_create_table_as_select_and_drop(self, front, lake, spark, tmp_path):
        front.sql(
            f"CREATE TABLE t2 LOCATION '{tmp_path / 'u'}' "
            "AS SELECT k, v FROM t WHERE k < 7"
        )
        assert front.sql("SELECT COUNT(*) AS n FROM t2").first()["n"] == 7
        tables = {r["table"] for r in front.sql("SHOW TABLES").collect()}
        assert tables == {"t", "t2"}
        front.sql("DROP TABLE t2")
        assert front.sql("SHOW TABLES").count() == 1
        # data survives the unregister (catalog-only drop)
        import os
        assert os.path.isdir(str(tmp_path / "u" / "_txn_log"))

    def test_dml_emits_cdc(self, front, lake):
        """SQL DML rides the same commits: the CDC feed sees it."""
        v0 = lake.version
        front.sql("DELETE FROM t WHERE k = 1")
        ch = lake.read_changes(v0 + 1)
        rows = [(r["_change_type"], r["k"]) for r in ch.collect()]
        assert ("delete", 1) in rows


class TestDropFeatureSQL:
    def test_drop_feature_statement(self, front, lake):
        lake.delete_where("k = 1", mode="dv")
        assert "deletion-vectors" in lake.table_features()
        with pytest.raises(ValueError, match="deletion vector"):
            front.sql("ALTER TABLE t DROP FEATURE deletion-vectors")
        lake.reorg_purge()
        front.sql(
            "ALTER TABLE t DROP FEATURE deletion-vectors TRUNCATE HISTORY"
        )
        assert "deletion-vectors" not in lake.table_features()
        # TRUNCATE HISTORY checkpointed at the drop and vacuumed the
        # log: every commit is subsumed (history empties), the head
        # resolves from the checkpoint, and the DROPPED feature set
        # survives the checkpoint fold (newest-wins, not union)
        assert lake.history() == []
        assert lake.snapshot().count() == 99
        reopened = TransactionalLake(
            lake.spark, lake.path, partition_by=())
        assert "deletion-vectors" not in reopened.table_features()


class TestTableChangesTVF:
    def test_table_changes_in_select(self, front, lake):
        v0 = lake.version
        front.sql("DELETE FROM t WHERE k = 3")
        front.sql("INSERT INTO t VALUES (900, 1, 1.0)")
        got = front.sql(
            f"SELECT _change_type, k FROM table_changes('t', {v0 + 1}) "
            "WHERE k IN (3, 900) ORDER BY k"
        ).collect()
        assert [(r["_change_type"], r["k"]) for r in got] == [
            ("delete", 3), ("insert", 900),
        ]

    def test_table_changes_joins_with_snapshot(self, front, lake):
        v0 = lake.version
        front.sql("UPDATE t SET v = 0.0 WHERE k < 2")
        n = front.sql(
            f"SELECT COUNT(*) AS n FROM table_changes('t', {v0 + 1}) c "
            "JOIN t ON c.k = t.k "
            # rewrite-mode CDC is file-grained (survivors emit
            # delete+insert pairs with their original values), so pin
            # the POST-update rows by value: only k=0,1 carry v=0.0
            "WHERE c._change_type = 'insert' AND c.v = 0.0"
        ).first()["n"]
        assert n == 2


class TestNewVerbsR12:
    def test_describe_table(self, front, lake):
        front.sql("ALTER TABLE t CLUSTER BY (grp)")
        rows = {
            r["col_name"]: (r["data_type"], r["comment"])
            for r in front.sql("DESCRIBE TABLE t").collect()
        }
        assert rows["k"][0] == "bigint"
        assert rows["grp"][1] == "cluster by"

    def test_vacuum_lite_statement(self, front, lake):
        lake.optimize()
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('retentionDurationCheck.enabled' = 'false')"
        )
        dry = front.sql("VACUUM t LITE RETAIN 0 HOURS DRY RUN")
        assert dry.count() > 0
        front.sql("VACUUM t LITE RETAIN 0 HOURS")
        assert front.sql("VACUUM t LITE RETAIN 0 HOURS DRY RUN").count() == 0

    def test_sync_identity_statement(self, front, spark, tmp_path):
        from market_data_lakehouse_spark.txnlog import TransactionalLake

        tx = TransactionalLake(spark, str(tmp_path / "sid"), partition_by=())
        tx.set_identity("id")
        tx.append(spark.createDataFrame([("a",)], "v string"))
        tx.merge(
            spark.createDataFrame([(50, "b")], "id long, v string"),
            on="id",
        )
        front.register("ti", tx)
        front.sql("ALTER TABLE ti ALTER COLUMN id SYNC IDENTITY")
        assert tx.identity_state() == ("id", 51)
        with pytest.raises(ValueError, match="IDENTITY"):
            front.sql("ALTER TABLE ti ALTER COLUMN v SYNC IDENTITY")


class TestMergeBySource:
    def test_by_source_delete_statement(self, front, lake):
        front.sql(
            "MERGE INTO t USING ("
            "  SELECT k, grp, CAST(0.0 AS DOUBLE) AS v FROM t WHERE k < 3"
            ") AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        )
        got = lake.snapshot()
        assert got.count() == 3
        assert got.filter("v = 0.0").count() == 3

    def test_by_source_update_rejected(self, front):
        with pytest.raises(ValueError, match="BY SOURCE"):
            front.sql(
                "MERGE INTO t USING (SELECT 1 AS k) s ON t.k = s.k "
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"
            )


class TestNotNull:
    def test_set_not_null_validates_and_enforces(self, front, lake, spark):
        front.sql("ALTER TABLE t ADD COLUMN opt STRING")
        # existing rows are NULL in opt -> SET must refuse
        with pytest.raises(ValueError, match="violate"):
            front.sql("ALTER TABLE t ALTER COLUMN opt SET NOT NULL")
        front.sql("UPDATE t SET opt = 'x'")
        front.sql("ALTER TABLE t ALTER COLUMN opt SET NOT NULL")
        with pytest.raises(Exception, match="not_null_opt"):
            lake.append(spark.sql(
                "SELECT CAST(5000 AS BIGINT) AS k, "
                "CAST(1 AS BIGINT) AS grp, "
                "CAST(1.0 AS DOUBLE) AS v, CAST(NULL AS STRING) AS opt"
            ))
        front.sql("ALTER TABLE t ALTER COLUMN opt DROP NOT NULL")
        lake.append(spark.sql(
            "SELECT CAST(5000 AS BIGINT) AS k, CAST(1 AS BIGINT) AS grp, "
            "CAST(1.0 AS DOUBLE) AS v, CAST(NULL AS STRING) AS opt"
        ))
        assert lake.snapshot().count() == 101

    def test_drop_not_null_noop_when_absent(self, front, lake):
        rec = front.sql("ALTER TABLE t ALTER COLUMN v DROP NOT NULL")
        assert rec.first()["version"] == lake.version


class TestCommandMetrics:
    def test_restore_metrics_shape(self, front, lake):
        v0 = lake.version
        front.sql("DELETE FROM t WHERE k < 50")
        row = front.sql(
            f"RESTORE TABLE t TO VERSION AS OF {v0}"
        ).collect()[0]
        assert row["num_restored_files"] > 0
        assert row["num_of_files_after_restore"] == lake.detail()["num_files"]
        assert row["table_size_after_restore"] == lake.detail()["size_bytes"]
        # no-op restore: zero metrics, same version
        again = front.sql(
            f"RESTORE TABLE t TO VERSION AS OF {lake.version}"
        ).collect()[0]
        assert again["num_restored_files"] == 0
        assert again["version"] == lake.version


class TestCreateTableDDL:
    """r12: CREATE TABLE with a column list — declared schema commits
    via an empty seed append; GENERATED / IDENTITY / NOT NULL markers
    wire the corresponding log features; INSERT's positional list
    excludes engine-derived columns."""

    def test_full_ddl_lifecycle(self, front, spark, tmp_path):
        front.sql(
            f"CREATE TABLE ev ("
            "  id BIGINT GENERATED ALWAYS AS IDENTITY,"
            "  k BIGINT NOT NULL,"
            "  ts TIMESTAMP,"
            "  d DATE GENERATED ALWAYS AS (to_date(ts)),"
            "  v DOUBLE"
            f") PARTITIONED BY (d) LOCATION '{tmp_path / 'ev'}'"
        )
        lake = front.table("ev")
        assert set(lake.snapshot().columns) == {"id", "k", "ts", "d", "v"}
        assert lake.snapshot().count() == 0
        # positional INSERT supplies only the non-derived columns
        front.sql(
            "INSERT INTO ev VALUES "
            "(1, TIMESTAMP '2024-06-15 10:00:00', 1.5), "
            "(2, TIMESTAMP '2024-06-16 11:00:00', 2.5)"
        )
        rows = {
            r["k"]: (r["id"], str(r["d"]), r["v"])
            for r in lake.snapshot().collect()
        }
        assert rows[1][1] == "2024-06-15" and rows[2][1] == "2024-06-16"
        assert sorted(x[0] for x in rows.values()) == [0, 1]  # identity
        # NOT NULL enforced
        with pytest.raises(Exception, match="not_null_k"):
            front.sql(
                "INSERT INTO ev VALUES "
                "(NULL, TIMESTAMP '2024-06-15 10:00:00', 1.0)"
            )
        # generated partition column prunes
        kept, total, _ = lake.prune_files(
            {"d": ("2024-06-15", "2024-06-15")}
        )
        assert total >= 1 and len(kept) < total or total == 1

    def test_column_list_and_as_select_conflict(self, front, tmp_path):
        with pytest.raises(ValueError, match="not both"):
            front.sql(
                f"CREATE TABLE x (k INT) LOCATION '{tmp_path / 'x'}' "
                "AS SELECT 1 AS k"
            )

    def test_bad_coldef(self, front, tmp_path):
        with pytest.raises(ValueError, match="column definition"):
            front.sql(
                f"CREATE TABLE y (k INT PRIMARY KEY) "
                f"LOCATION '{tmp_path / 'y'}'"
            )


def _jobs_so_far(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


class TestConvertCloneSQL:
    """r12 late additions: CONVERT TO LAKE and the SQL clone forms."""

    def _raw(self, spark, tmp_path):
        raw = str(tmp_path / "raw")
        (
            spark.range(60)
            .selectExpr(
                "id", "cast(id % 3 as string) as part",
                "cast(id * 2 as double) as val",
            )
            .coalesce(2)
            .write.partitionBy("part")
            .parquet(raw)
        )
        return raw

    def test_convert_and_register(self, spark, tmp_path):
        fr = LakeSQL(spark)
        raw = self._raw(spark, tmp_path)
        rec = fr.sql(f"CONVERT TO LAKE parquet.`{raw}` AS adopted").collect()
        assert rec[0]["operation"] == "CONVERT TO LAKE"
        assert rec[0]["version"] == 0 and rec[0]["num_files"] >= 3
        got = fr.sql("SELECT COUNT(*) AS n FROM adopted").collect()[0]["n"]
        assert got == 60
        parts = fr.sql("SHOW PARTITIONS adopted").collect()
        assert sorted(r["part"] for r in parts) == ["0", "1", "2"]
        # the adopted table is fully transactional from v0
        fr.sql("DELETE FROM adopted WHERE val >= 100")
        assert (
            fr.sql("SELECT COUNT(*) AS n FROM adopted").collect()[0]["n"]
            == 50
        )

    def test_convert_refuses_registered_name(self, spark, tmp_path, front):
        raw = self._raw(spark, tmp_path)
        with pytest.raises(ValueError, match="already registered"):
            front.sql(f"CONVERT TO LAKE parquet.`{raw}` AS t")

    def test_clone_shallow_and_versioned(self, spark, tmp_path, front, lake):
        lake.delete_where("k >= 50")  # v1: 50 rows live
        loc = str(tmp_path / "c1")
        rec = front.sql(
            f"CREATE TABLE c1 SHALLOW CLONE t VERSION AS OF 0 "
            f"LOCATION '{loc}'"
        ).collect()[0]
        assert rec["clone_mode"] == "shallow" and rec["version"] == 0
        # the clone is the table as it WAS at v0 (100 rows)
        assert (
            front.sql("SELECT COUNT(*) AS n FROM c1").collect()[0]["n"]
            == 100
        )
        # bare CLONE defaults to DEEP (Databricks' default)
        loc2 = str(tmp_path / "c2")
        rec2 = front.sql(
            f"CREATE TABLE c2 CLONE t LOCATION '{loc2}'"
        ).collect()[0]
        assert rec2["clone_mode"] == "deep"
        assert (
            front.sql("SELECT COUNT(*) AS n FROM c2").collect()[0]["n"]
            == 50
        )

    def test_clone_name_collision(self, front, tmp_path):
        with pytest.raises(ValueError, match="already registered"):
            front.sql(
                f"CREATE TABLE t SHALLOW CLONE t "
                f"LOCATION '{tmp_path / 'x'}'"
            )


class TestShowPartitionsColumns:
    def test_show_partitions_unpartitioned_refuses(self, front):
        with pytest.raises(ValueError, match="not partitioned"):
            front.sql("SHOW PARTITIONS t")

    def test_show_columns(self, front):
        cols = [r["col_name"] for r in
                front.sql("SHOW COLUMNS IN t").collect()]
        assert cols == ["k", "grp", "v"]
        cols2 = [r["col_name"] for r in
                 front.sql("SHOW COLUMNS FROM t").collect()]
        assert cols2 == cols


class TestTruncateSQL:
    def test_truncate_is_metadata_only(self, spark, front, lake):
        """The remove-all commit must run ZERO Spark jobs — that is
        the whole point vs DELETE FROM t (which scans to discover
        that every file matches)."""
        before = _jobs_so_far(spark)
        rec = front.sql("TRUNCATE TABLE t").collect()
        # .collect() on the local receipt DataFrame runs 1 job; the
        # truncate itself must add none beyond that
        used = _jobs_so_far(spark) - before
        assert used <= 1, f"TRUNCATE ran {used} jobs (expected <= 1)"
        assert rec[0]["num_removed_files"] >= 1
        assert (
            front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 0
        )
        # schema/metadata survive: the table is empty, not reset
        assert [r["col_name"] for r in
                front.sql("SHOW COLUMNS IN t").collect()] == [
            "k", "grp", "v"]

    def test_truncate_time_travel_and_cdc(self, front, lake):
        v_before = lake.version
        front.sql("TRUNCATE TABLE t")
        tt = front.sql(
            f"SELECT COUNT(*) AS n FROM t VERSION AS OF {v_before}"
        ).collect()[0]["n"]
        assert tt == 100
        feed = lake.read_changes(v_before + 1)
        rows = feed.groupBy("_change_type").count().collect()
        assert {r["_change_type"]: r["count"] for r in rows} == {
            "delete": 100
        }

    def test_append_after_truncate(self, front, lake, spark):
        front.sql("TRUNCATE TABLE t")
        lake.append(
            spark.range(7).select(
                F.col("id").alias("k"),
                F.lit(0).alias("grp"),
                F.lit(1.0).alias("v"),
            )
        )
        assert (
            front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 7
        )


class TestCommentSQL:
    def test_table_and_column_comments(self, front, lake):
        front.sql("COMMENT ON TABLE t IS 'tick bars'")
        front.sql("COMMENT ON COLUMN t.v IS 'value = 1.5k'")
        props = {
            r["key"]: r["value"]
            for r in front.sql("SHOW TBLPROPERTIES t").collect()
        }
        assert props["comment"] == "tick bars"
        assert props["comment.column.v"] == "value = 1.5k"
        desc = {
            r["col_name"]: r["comment"]
            for r in front.sql("DESCRIBE TABLE t").collect()
        }
        assert desc["v"] == "value = 1.5k"
        # unset
        front.sql("COMMENT ON TABLE t IS NULL")
        props = {
            r["key"]: r["value"]
            for r in front.sql("SHOW TBLPROPERTIES t").collect()
        }
        assert "comment" not in props

    def test_comment_survives_restore(self, front, lake):
        """Comments are table properties, and like Delta, RESTORE
        does NOT roll properties back (the pinned semantics of
        TestPropertiesRestoreInteraction) — a rollback of data must
        not silently erase documentation."""
        v0 = lake.version
        front.sql("COMMENT ON TABLE t IS 'late comment'")
        front.sql(f"RESTORE TABLE t TO VERSION AS OF {v0}")
        props = {
            r["key"]: r["value"]
            for r in front.sql("SHOW TBLPROPERTIES t").collect()
        }
        assert props.get("comment") == "late comment"

    def test_unknown_column_refuses(self, front):
        with pytest.raises(ValueError, match="no column"):
            front.sql("COMMENT ON COLUMN t.nope IS 'x'")


class TestCopyIntoSQL:
    def test_copy_into_lifecycle(self, spark, front, lake, tmp_path):
        src = tmp_path / "in"
        src.mkdir()
        spark.createDataFrame(
            [(200, 0, 1.0), (201, 1, 2.0)], "k long, grp long, v double"
        ).coalesce(1).write.parquet(str(src / "b0"))
        rec = front.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
        ).collect()[0]
        assert rec["num_rows_loaded"] == 2 and rec["num_files_skipped"] == 0
        assert (
            front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
            == 102
        )
        # idempotent re-run through SQL
        rec2 = front.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
        ).collect()[0]
        assert rec2["num_files_loaded"] == 0 and rec2["num_files_skipped"] >= 1

    def test_copy_into_csv_options_and_bad_copt(self, spark, front, lake,
                                                tmp_path):
        src = tmp_path / "csvin"
        src.mkdir()
        (src / "x.csv").write_text("k,grp,v\n500,0,9.5\n")
        rec = front.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = CSV "
            "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')"
        ).collect()[0]
        assert rec["num_rows_loaded"] == 1
        with pytest.raises(ValueError, match="unsupported COPY_OPTIONS"):
            front.sql(
                f"COPY INTO t FROM '{src}' FILEFORMAT = CSV "
                "COPY_OPTIONS ('mergeSchema' = 'true')"
            )


class TestSmallParityForms:
    """r12 late: @v time-travel shorthand, bounded table_changes,
    single-key SHOW TBLPROPERTIES."""

    def test_at_version_shorthand(self, front, lake):
        v0 = lake.version
        lake.delete_where("k < 50")
        got = front.sql(
            f"SELECT COUNT(*) AS n FROM t@v{v0}"
        ).collect()[0]["n"]
        assert got == 100
        assert (
            front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
            == 50
        )

    def test_table_changes_window(self, front, lake, spark):
        lake.append(spark.range(5).select(
            (F.col("id") + 500).alias("k"),
            F.lit(0).alias("grp"), F.lit(0.0).alias("v")))     # v1
        lake.append(spark.range(3).select(
            (F.col("id") + 900).alias("k"),
            F.lit(0).alias("grp"), F.lit(0.0).alias("v")))     # v2
        n_window = front.sql(
            "SELECT COUNT(*) AS n FROM table_changes('t', 1, 1)"
        ).collect()[0]["n"]
        assert n_window == 5  # v2's 3 inserts excluded
        n_open = front.sql(
            "SELECT COUNT(*) AS n FROM table_changes('t', 1)"
        ).collect()[0]["n"]
        assert n_open == 8

    def test_show_tblproperties_single_key(self, front, lake):
        front.sql("ALTER TABLE t SET TBLPROPERTIES ('owner' = 'ops')")
        row = front.sql("SHOW TBLPROPERTIES t ('owner')").collect()
        assert row == [("owner", "ops")] or (
            row[0]["key"] == "owner" and row[0]["value"] == "ops"
        )
        miss = front.sql("SHOW TBLPROPERTIES t ('nope')").collect()[0]
        assert "does not have property" in miss["value"]

    def test_cdc_invalid_range_raises(self, lake):
        with pytest.raises(ValueError, match="range invalid"):
            lake.read_changes(5, ending_version=2).collect()


class TestDetailEnriched:
    def test_detail_full_column_set(self, front, lake):
        lake.set_clustering(("grp",))
        lake.delete_where("k = 3", mode="dv")
        row = front.sql("DESCRIBE DETAIL t").collect()[0]
        assert row["clustering_columns"] == ["grp"]
        assert row["num_deletion_vectors"] == 1
        assert "deletion-vectors" in row["table_features"]
        assert row["created_at"] is not None
        assert row["last_modified"] >= row["created_at"]


class TestFsckSQL:
    def test_fsck_dry_run_then_repair(self, spark, front, lake):
        import os as _os
        rel = lake._snapshot_state()[0][0]
        _os.unlink(_os.path.join(lake.path, rel))
        dry = front.sql("FSCK REPAIR TABLE t DRY RUN").collect()
        assert [r["path"] for r in dry] == [rel]
        front.sql("FSCK REPAIR TABLE t")
        assert front.sql("SELECT COUNT(*) AS n FROM t").collect()[0][
            "n"] < 100


class TestIdentityDDLOptions:
    def test_start_with_increment_by(self, spark, tmp_path):
        fr = LakeSQL(spark)
        fr.sql(
            f"CREATE TABLE sid (rid BIGINT GENERATED ALWAYS AS IDENTITY "
            f"(START WITH 1000 INCREMENT BY 5), s STRING) "
            f"LOCATION '{tmp_path / 'sid'}'"
        )
        fr.sql("INSERT INTO sid VALUES ('a'), ('b'), ('c')")
        ids = sorted(
            r["rid"] for r in fr.sql("SELECT rid FROM sid").collect()
        )
        assert ids == [1000, 1005, 1010]

    def test_negative_increment_refuses(self, spark, tmp_path):
        fr = LakeSQL(spark)
        with pytest.raises(ValueError, match="step must be >= 1"):
            fr.sql(
                f"CREATE TABLE nid (rid BIGINT GENERATED ALWAYS AS "
                f"IDENTITY (START WITH 0 INCREMENT BY -1), s STRING) "
                f"LOCATION '{tmp_path / 'nid'}'"
            )


class TestCreateOrReplaceAndReplaceWhere:
    def test_create_or_replace_keeps_history(self, spark, tmp_path):
        fr = LakeSQL(spark)
        loc = tmp_path / "crt"
        fr.sql(
            f"CREATE OR REPLACE TABLE crt LOCATION '{loc}' "
            "AS SELECT 1 AS a, 'x' AS b"
        )
        fr.sql(
            f"CREATE OR REPLACE TABLE crt LOCATION '{loc}' "
            "AS SELECT 7 AS a"  # narrower: b really drops
        )
        assert [r["col_name"] for r in
                fr.sql("SHOW COLUMNS IN crt").collect()] == ["a"]
        assert fr.sql("SELECT a FROM crt").collect()[0]["a"] == 7
        # history retained: v0 still answers with both columns
        old = fr.sql("SELECT * FROM crt VERSION AS OF 0").collect()[0]
        assert old["a"] == 1 and old["b"] == "x"

    def test_create_or_replace_refuses_repointing(self, spark, front,
                                                  tmp_path):
        with pytest.raises(ValueError, match="re-pointing"):
            front.sql(
                f"CREATE OR REPLACE TABLE t LOCATION "
                f"'{tmp_path / 'elsewhere'}' AS SELECT 1 AS k"
            )

    def test_insert_replace_where(self, spark, front, lake):
        rec = front.sql(
            "INSERT INTO t REPLACE WHERE grp = 3 "
            "SELECT CAST(900 + id AS BIGINT) AS k, "
            "CAST(3 AS BIGINT) AS grp, CAST(0.5 AS DOUBLE) AS v "
            "FROM RANGE(2)"
        ).collect()[0]
        assert rec["operation"] == "INSERT REPLACE WHERE"
        got = front.sql(
            "SELECT COUNT(*) AS n FROM t WHERE grp = 3"
        ).collect()[0]["n"]
        assert got == 2  # the old grp-3 rows were swapped out
        total = front.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
        assert total == 100 - 100 // 7 - (1 if 100 % 7 > 3 else 0) + 2

    def test_replace_where_validates_rows(self, front):
        with pytest.raises(Exception):
            front.sql(
                "INSERT INTO t REPLACE WHERE grp = 3 "
                "SELECT CAST(1 AS BIGINT) AS k, CAST(4 AS BIGINT) AS grp, "
                "CAST(0.0 AS DOUBLE) AS v"
            )


class TestCreateDDLExtras:
    """r12 late: DEFAULT column marker, CLUSTER BY and TBLPROPERTIES
    clauses in CREATE TABLE."""

    def test_default_cluster_props(self, spark, tmp_path):
        fr = LakeSQL(spark)
        fr.sql(
            f"CREATE TABLE ext ("
            "  k BIGINT NOT NULL,"
            "  src STRING DEFAULT 'batch',"
            "  v DOUBLE"
            ") CLUSTER BY (k) "
            f"LOCATION '{tmp_path / 'ext'}' "
            "TBLPROPERTIES ('owner' = 'ops', 'checkpoint.partSize' = '100')"
        )
        lake = fr.table("ext")
        assert lake.clustering_info()["cluster_by"] == ["k"]
        props = lake.properties()
        assert props["owner"] == "ops"
        # positional INSERT still takes every non-derived column
        # (standard SQL without a column list); the DEFAULT serves
        # BY-NAME batches that omit the column (next test)
        fr.sql("INSERT INTO ext VALUES (1, 'x', 9.5)")
        assert fr.sql("SELECT COUNT(*) AS n FROM ext").collect()[0]["n"] == 1

    def test_default_materializes_on_append(self, spark, tmp_path):
        fr = LakeSQL(spark)
        fr.sql(
            f"CREATE TABLE dft (k BIGINT, src STRING DEFAULT 'batch') "
            f"LOCATION '{tmp_path / 'dft'}'"
        )
        lake = fr.table("dft")
        lake.append(spark.range(2).selectExpr("id as k"))
        got = sorted(
            (r["k"], r["src"]) for r in fr.sql(
                "SELECT * FROM dft").collect()
        )
        assert got == [(0, "batch"), (1, "batch")]


class TestShowCreateTable:
    def test_roundtrippable_ddl(self, spark, tmp_path):
        fr = LakeSQL(spark)
        fr.sql(
            f"CREATE TABLE sct ("
            "  rid BIGINT GENERATED ALWAYS AS IDENTITY "
            "(START WITH 0 INCREMENT BY 3),"
            "  k BIGINT NOT NULL,"
            "  src STRING DEFAULT 'batch',"
            "  v DOUBLE"
            ") CLUSTER BY (k) "
            f"LOCATION '{tmp_path / 'sct'}' "
            "TBLPROPERTIES ('owner' = 'ops')"
        )
        stmt = fr.sql("SHOW CREATE TABLE sct").collect()[0][
            "createtab_stmt"]
        assert "GENERATED ALWAYS AS IDENTITY" in stmt
        assert "INCREMENT BY 3" in stmt
        assert "k BIGINT NOT NULL" in stmt
        assert "DEFAULT 'batch'" in stmt
        assert "CLUSTER BY (k)" in stmt
        assert "'owner' = 'ops'" in stmt
        # the emitted DDL round-trips through the same front-end
        stmt2 = stmt.replace("sct", "sct2").replace(
            str(tmp_path / "sct"), str(tmp_path / "sct2"))
        fr.sql(" ".join(stmt2.split("\n")))
        assert [r["col_name"] for r in
                fr.sql("SHOW COLUMNS IN sct2").collect()] == [
            "k", "src", "v", "rid"]


def test_utility_heads_match_dispatch_table():
    """_UTILITY_HEADS documents the owned-verb contract; it must
    stay in sync with the dispatch table's actual heads."""
    from market_data_lakehouse_spark.sqlfront import _UTILITY_HEADS

    heads = {h for h, _spec in LakeSQL._HANDLERS}
    assert heads == set(_UTILITY_HEADS), (
        heads.symmetric_difference(_UTILITY_HEADS)
    )


class TestCdfTimestampArgs:
    def test_timestamp_start_and_end(self, spark, front, lake):
        from datetime import datetime, timezone
        import time as _t

        v1_ts = float(lake._read_commit(lake.version)["timestamp"])
        _t.sleep(0.05)  # real gaps: isoformat truncates microseconds
        lake.append(spark.range(5).select(
            (F.col("id") + 500).alias("k"),
            F.lit(0).alias("grp"), F.lit(0.0).alias("v")))   # v1
        v1_commit_ts = float(
            lake._read_commit(lake.version)["timestamp"])
        _t.sleep(0.05)
        lake.append(spark.range(3).select(
            (F.col("id") + 900).alias("k"),
            F.lit(0).alias("grp"), F.lit(0.0).alias("v")))   # v2
        mid = datetime.fromtimestamp(
            (v1_ts + v1_commit_ts) / 2, tz=timezone.utc
        ).isoformat()
        end_at_v1 = datetime.fromtimestamp(
            v1_commit_ts + 0.001, tz=timezone.utc  # isoformat
            # round-trip can lose a ulp; still < v2 (0.05s later)
        ).isoformat()
        n = front.sql(
            f"SELECT COUNT(*) AS n FROM "
            f"table_changes('t', '{mid}', '{end_at_v1}')"
        ).collect()[0]["n"]
        assert n == 5  # v1's inserts only: start after v0, end at v1
        # version/timestamp args mix (Delta allows it)
        n2 = front.sql(
            f"SELECT COUNT(*) AS n FROM "
            f"table_changes('t', 1, '{end_at_v1}')"
        ).collect()[0]["n"]
        assert n2 == 5

    def test_future_timestamp_raises(self, front, lake):
        with pytest.raises(ValueError, match="no commit at or after"):
            front.sql(
                "SELECT * FROM table_changes('t', '2999-01-01')"
            ).collect()


class TestIdempotentDDL:
    def test_create_if_not_exists_and_drop_if_exists(self, spark,
                                                     tmp_path):
        fr = LakeSQL(spark)
        loc = tmp_path / "idm"
        fr.sql(f"CREATE TABLE idm LOCATION '{loc}' AS SELECT 1 AS k")
        rec = fr.sql(
            f"CREATE TABLE IF NOT EXISTS idm LOCATION '{loc}' "
            "AS SELECT 2 AS k"
        ).collect()[0]
        assert "exists" in rec["operation"]
        # the second select did NOT run: still one row, value 1
        assert fr.sql("SELECT k FROM idm").collect()[0]["k"] == 1
        assert fr.sql("SELECT COUNT(*) AS n FROM idm").collect()[0][
            "n"] == 1
        fr.sql("DROP TABLE IF EXISTS idm")
        rec2 = fr.sql("DROP TABLE IF EXISTS idm").collect()[0]
        assert rec2["status"] == "not registered"
        with pytest.raises(ValueError, match="unknown table"):
            fr.sql("DROP TABLE idm")

    def test_show_tables_like(self, spark, front, lake, tmp_path):
        front.sql(
            f"CREATE TABLE t_audit LOCATION '{tmp_path / 'a'}' "
            "AS SELECT 1 AS k"
        )
        names = [r["table"] for r in
                 front.sql("SHOW TABLES LIKE 't_*'").collect()]
        assert names == ["t_audit"]
        names = [r["table"] for r in
                 front.sql("SHOW TABLES LIKE 't|t_audit'").collect()]
        assert names == ["t", "t_audit"]


class TestSqlDvMode:
    """r15: ``delta.enableDeletionVectors = true`` flips SQL DML to
    merge-on-read (VERDICT r14 directive 2 — the engine's dv modes
    were unreachable from SQL). The physical invariant that proves
    dv ran: the pre-DML file set is UNTOUCHED (dv delete) or a
    superset survives (dv update/merge append postimages, never
    rewrite); copy-on-write replaces matched files."""

    def _files(self, lake):
        files, _, _ = lake.prune_files({})
        return set(files)

    def _opt_in(self, front):
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.enableDeletionVectors' = 'true')"
        )

    def test_plain_delete_rides_dv(self, front, lake):
        self._opt_in(front)
        before = self._files(lake)
        front.sql("DELETE FROM t WHERE k >= 90")
        assert self._files(lake) == before  # no file touched
        assert front.sql(
            "SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 90

    def test_default_stays_copy_on_write(self, front, lake):
        before = self._files(lake)
        front.sql("DELETE FROM t WHERE k >= 90")
        # rewrite mode: the matched file(s) were replaced
        assert self._files(lake) != before

    def test_false_property_stays_copy_on_write(self, front, lake):
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.enableDeletionVectors' = 'false')"
        )
        before = self._files(lake)
        front.sql("DELETE FROM t WHERE k >= 90")
        assert self._files(lake) != before

    def test_second_writer_property_flip_invalidates_memo(
        self, spark, front, lake, tmp_path
    ):
        """r16 (VERDICT r15 directive 8): the dml_default_mode memo
        keys on the head VERSION, not the writer object — a property
        flip committed through a SECOND writer on the same path
        advances the head, so the first writer's next statement
        re-reads the property instead of serving its cached
        strategy (the cross-process stale-cache hole the memo
        design could theoretically have)."""
        # prime writer1's memo in rewrite mode
        front.sql("DELETE FROM t WHERE k >= 95")
        assert lake.dml_default_mode() == "rewrite"
        w2 = TransactionalLake(
            spark, str(tmp_path / "t"), partition_by=()
        )
        w2.set_properties({"delta.enableDeletionVectors": "true"})
        before = self._files(lake)
        front.sql("DELETE FROM t WHERE k >= 90")
        assert self._files(lake) == before  # dv: file set untouched
        ops = [r["operation"]
               for r in front.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "delete_dv"
        assert lake.dml_default_mode() == "dv"

    def test_bad_property_value_refuses(self, front):
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.enableDeletionVectors' = 'maybe')"
        )
        with pytest.raises(ValueError, match="enableDeletionVectors"):
            front.sql("DELETE FROM t WHERE k = 1")

    def test_plain_update_rides_dv(self, front, lake):
        self._opt_in(front)
        before = self._files(lake)
        front.sql("UPDATE t SET v = 0.0 WHERE k < 10")
        # merge-on-read: originals survive, postimages appended
        assert before <= self._files(lake)
        got = front.sql(
            "SELECT SUM(CAST(v = 0.0 AS INT)) AS z FROM t"
        ).collect()[0]["z"]
        assert got == 10

    def test_in_subquery_delete_rides_dv(self, spark, front, lake,
                                         tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "s"),
                                partition_by=())
        src.append(spark.range(5).select(F.col("id").alias("k")))
        front.register("s", src)
        self._opt_in(front)
        before = self._files(lake)
        front.sql("DELETE FROM t WHERE k IN (SELECT k FROM s)")
        assert self._files(lake) == before
        assert front.sql(
            "SELECT MIN(k) AS m FROM t").collect()[0]["m"] == 5

    def test_exists_update_rides_dv(self, spark, front, lake, tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "s2"),
                                partition_by=())
        src.append(spark.range(3).select(F.col("id").alias("k")))
        front.register("s2", src)
        self._opt_in(front)
        before = self._files(lake)
        front.sql(
            "UPDATE t SET v = -1.0 WHERE EXISTS "
            "(SELECT 1 FROM s2 s WHERE s.k = t.k)"
        )
        assert before <= self._files(lake)
        got = front.sql(
            "SELECT COUNT(*) AS n FROM t WHERE v = -1.0"
        ).collect()[0]["n"]
        assert got == 3

    def test_not_exists_delete_falls_back_to_rewrite(self, spark,
                                                     front, lake,
                                                     tmp_path):
        """BY SOURCE shapes are rewrite-only in the engine; the
        front must fall back silently, not refuse, on a dv table."""
        src = TransactionalLake(spark, str(tmp_path / "s3"),
                                partition_by=())
        src.append(
            spark.range(100).filter(F.col("id") < 95)
            .select(F.col("id").alias("k"))
        )
        front.register("s3", src)
        self._opt_in(front)
        front.sql(
            "DELETE FROM t WHERE NOT EXISTS "
            "(SELECT 1 FROM s3 s WHERE s.k = t.k)"
        )
        assert front.sql(
            "SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 95

    def test_merge_rides_dv(self, spark, front, lake, tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "s4"),
                                partition_by=())
        src.append(
            spark.range(98, 103).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("grp"),
                F.lit(9.9).alias("v"),
            )
        )
        front.register("s4", src)
        self._opt_in(front)
        before = self._files(lake)
        front.sql(
            "MERGE INTO t USING s4 ON t.k = s4.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        # merge-on-read: no pre-merge file rewritten
        assert before <= self._files(lake)
        got = front.sql(
            "SELECT COUNT(*) AS n, SUM(CAST(v = 9.9 AS INT)) AS hit "
            "FROM t"
        ).collect()[0]
        assert (got["n"], got["hit"]) == (103, 5)

    def test_merge_by_source_falls_back(self, spark, front, lake,
                                        tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "s5"),
                                partition_by=())
        src.append(
            spark.range(50).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("grp"),
                F.lit(1.0).alias("v"),
            )
        )
        front.register("s5", src)
        self._opt_in(front)
        front.sql(
            "MERGE INTO t USING s5 ON t.k = s5.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        )
        got = front.sql(
            "SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
        assert got == 50

    def test_show_tblproperties_documents_the_opt_in(self, front):
        self._opt_in(front)
        rows = front.sql(
            "SHOW TBLPROPERTIES t ('delta.enableDeletionVectors')"
        ).collect()
        assert rows[0]["value"] == "true"


@pytest.fixture()
def cs_front(spark, tmp_path):
    """Target t (k unique, grp 0-3, v=k) + source s (j, x) with
    groups 0 and 1 only — groups 2/3 exercise the unmatched arm."""
    t = TransactionalLake(spark, str(tmp_path / "cs_t"), partition_by=())
    t.append(spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(12)],
        "k long, grp long, v double",
    ))
    s = TransactionalLake(spark, str(tmp_path / "cs_s"), partition_by=())
    s.append(spark.createDataFrame(
        [(0, 10.0), (0, 20.0), (1, 100.0), (5, 7.0)],
        "j long, x double",
    ))
    fr = LakeSQL(spark)
    fr.register("t", t)
    fr.register("s", s)
    return fr, t


def _cs_state(fr):
    return sorted(
        (r.k, r.grp, r.v) for r in fr.sql("SELECT * FROM t").collect()
    )


class TestCorrScalarDML:
    """r15 correlated scalar subqueries in DML (VERDICT r14
    directive 3): decorrelated to a per-key aggregate + merge probe;
    unmatched keys take the aggregate's empty-input value."""

    def test_set_position_unmatched_null(self, cs_front):
        fr, _ = cs_front
        fr.sql("UPDATE t SET v = (SELECT max(s.x) FROM s "
               "WHERE s.j = t.grp)")
        exp = sorted(
            (i, i % 4, {0: 20.0, 1: 100.0}.get(i % 4))
            for i in range(12)
        )
        assert _cs_state(fr) == exp

    def test_set_position_count_empty_is_zero(self, cs_front):
        fr, _ = cs_front
        fr.sql("UPDATE t SET v = (SELECT count(*) FROM s "
               "WHERE s.j = t.grp) WHERE k < 10")
        exp = sorted(
            (i, i % 4,
             float({0: 2, 1: 1}.get(i % 4, 0)) if i < 10 else float(i))
            for i in range(12)
        )
        assert _cs_state(fr) == exp

    def test_where_position_deletes_matched_only(self, cs_front):
        fr, _ = cs_front
        fr.sql("UPDATE t SET v = v * 5")
        fr.sql("DELETE FROM t WHERE v > (SELECT min(s.x) FROM s "
               "WHERE s.j = t.grp)")
        # grp0 min=10: v in {0,20,40} -> k=4,8 go; grp1 min=100:
        # none; unmatched grps compare v > NULL -> kept
        exp = sorted(
            (i, i % 4, float(i * 5))
            for i in range(12)
            if not (i % 4 == 0 and 5 * i > 10)
        )
        assert _cs_state(fr) == exp

    def test_where_count_zero_hits_unmatched(self, cs_front):
        fr, _ = cs_front
        fr.sql("DELETE FROM t WHERE (SELECT count(*) FROM s "
               "WHERE s.j = t.grp) = 0")
        exp = sorted(
            (i, i % 4, float(i)) for i in range(12) if i % 4 in (0, 1)
        )
        assert _cs_state(fr) == exp

    def test_alias_and_source_filter(self, cs_front):
        fr, _ = cs_front
        fr.sql("UPDATE t AS tt SET tt.v = (SELECT sum(s.x) FROM s "
               "WHERE s.j = tt.grp AND s.x < 50) WHERE tt.k % 2 = 0")
        # x<50 removes grp1's only row ENTIRELY -> grp1 unmatched
        exp = sorted(
            (i, i % 4,
             (30.0 if i % 4 == 0 else None) if i % 2 == 0
             else float(i))
            for i in range(12)
        )
        assert _cs_state(fr) == exp

    def test_null_skip_shape_rides_dv(self, cs_front):
        fr, t = cs_front
        fr.sql("ALTER TABLE t SET TBLPROPERTIES "
               "('delta.enableDeletionVectors' = 'true')")
        fr.sql("UPDATE t SET v = v * 5")
        before, _, _ = t.prune_files({})
        fr.sql("DELETE FROM t WHERE v > (SELECT min(s.x) FROM s "
               "WHERE s.j = t.grp)")
        after, _, _ = t.prune_files({})
        assert set(before) <= set(after)
        ops = [r["operation"]
               for r in fr.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "merge_dv"

    def test_count_shape_needs_rewrite_arm(self, cs_front):
        fr, t = cs_front
        fr.sql("ALTER TABLE t SET TBLPROPERTIES "
               "('delta.enableDeletionVectors' = 'true')")
        fr.sql("DELETE FROM t WHERE (SELECT count(*) FROM s "
               "WHERE s.j = t.grp) = 0")
        ops = [r["operation"]
               for r in fr.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "merge"  # BY SOURCE arm = copy-on-write

    def test_compose_with_uncorrelated_scalar(self, cs_front):
        fr, _ = cs_front
        fr.sql("DELETE FROM t WHERE v <= (SELECT max(s.x) FROM s "
               "WHERE s.j = t.grp) AND v >= (SELECT min(x) FROM s)")
        # corr max: grp0=20, grp1=100; uncorr min(x)=7
        exp = sorted(
            (i, i % 4, float(i)) for i in range(12)
            if not (i % 4 == 0 and 7 <= i <= 20)
            and not (i % 4 == 1 and 7 <= i <= 100)
        )
        assert _cs_state(fr) == exp

    def test_refuses_non_aggregate(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError, match="non-aggregate"):
            fr.sql("UPDATE t SET v = (SELECT s.x FROM s "
                   "WHERE s.j = t.grp)")

    def test_refuses_two_correlated(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError,
                           match="at most one correlated scalar"):
            fr.sql("UPDATE t SET v = (SELECT max(s.x) FROM s WHERE "
                   "s.j = t.grp), grp = (SELECT min(s.x) FROM s "
                   "WHERE s.j = t.k)")

    def test_refuses_combined_with_in(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError, match="combining"):
            fr.sql("DELETE FROM t WHERE v > (SELECT max(s.x) FROM s "
                   "WHERE s.j = t.grp) AND k IN (SELECT j FROM s)")

    def test_refuses_combined_with_exists(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError, match="combining"):
            fr.sql("UPDATE t SET v = (SELECT max(s.x) FROM s WHERE "
                   "s.j = t.grp) WHERE EXISTS (SELECT 1 FROM s "
                   "WHERE s.j = t.k)")

    def test_refuses_non_equality_correlation(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError, match="equality"):
            fr.sql("DELETE FROM t WHERE v > (SELECT max(s.x) FROM s "
                   "WHERE s.j > t.grp)")

    def test_refuses_conflicting_correlation_keys(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError,
                           match="two different source columns"):
            fr.sql("DELETE FROM t WHERE v > (SELECT max(s.x) FROM s "
                   "WHERE s.j = t.grp AND s.x = t.grp)")

    def test_refuses_target_ref_in_select_item(self, cs_front):
        fr, _ = cs_front
        with pytest.raises(ValueError, match="select item"):
            fr.sql("DELETE FROM t WHERE v > (SELECT max(s.x) + t.v "
                   "FROM s WHERE s.j = t.grp)")

    def test_corr_set_plus_uncorrelated_set(self, cs_front):
        """Two SET columns: one correlated (merge-arm substitution),
        one uncorrelated (inlined once as a literal) — both arms must
        carry both assignments."""
        fr, _ = cs_front
        fr.sql("UPDATE t SET v = (SELECT max(s.x) FROM s WHERE "
               "s.j = t.grp), grp = (SELECT count(*) FROM s) "
               "WHERE k < 6")
        got = {r.k: (r.grp, r.v) for r in
               fr.sql("SELECT k, grp, v FROM t WHERE k < 6").collect()}
        exp = {i: (4, {0: 20.0, 1: 100.0}.get(i % 4)) for i in range(6)}
        assert got == exp

    def test_set_position_with_in_value_list_residual(self, cs_front):
        """r15 review find: a plain value-list IN residual must not
        trip the combined-subquery refusal (only IN (SELECT does)."""
        fr, _ = cs_front
        fr.sql("UPDATE t SET v = (SELECT max(s.x) FROM s "
               "WHERE s.j = t.grp) WHERE k IN (0, 1)")
        got = {r.k: r.v for r in
               fr.sql("SELECT k, v FROM t WHERE k < 3").collect()}
        assert got == {0: 20.0, 1: 100.0, 2: 2.0}


@pytest.fixture
def ci_front(spark, tmp_path):
    """Correlated-IN fixture (r16): target t (k unique incl. one
    NULL, grp 0-3, v=k) + source s (j, x) where x values alias into
    t.k's range — incl. a NULL element (must contribute nothing to a
    positive IN) and a j=5 group no target row carries."""
    t = TransactionalLake(spark, str(tmp_path / "ci_t"), partition_by=())
    rows = [(i, i % 4, float(i)) for i in range(12)]
    rows.append((None, 1, 99.0))  # NULL key: IN is UNKNOWN -> kept
    t.append(spark.createDataFrame(rows, "k long, grp long, v double"))
    s = TransactionalLake(spark, str(tmp_path / "ci_s"), partition_by=())
    s.append(spark.createDataFrame(
        [(0, 4), (0, 8), (1, 5), (1, 20), (1, None), (5, 2)],
        "j long, x long",
    ))
    fr = LakeSQL(spark)
    fr.register("t", t)
    fr.register("s", s)
    return fr, t


def _ci_state(fr):
    return sorted(
        ((r.k if r.k is not None else -99), r.grp, r.v)
        for r in fr.sql("SELECT * FROM t").collect()
    )


class TestCorrInDML:
    """r16 correlated IN-subquery DML (VERDICT r15 directive 5):
    ``k IN (SELECT s.x FROM s WHERE s.j = t.g)`` is EXISTS with one
    more correlation equality, decorrelated onto the same key-MERGE
    probe (matched-only arm — dv-eligible). NOT IN stays refused."""

    # matched set with the fixture: grp0 -> x in {4,8} deletes k=4,8;
    # grp1 -> x in {5,20,NULL} deletes k=5 (NULL element inert)
    _HIT = {4, 5, 8}

    def test_delete_matched_only(self, ci_front):
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
               "WHERE s.j = t.grp)")
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12)
             if i not in self._HIT] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_update_with_residual(self, ci_front):
        fr, _ = ci_front
        fr.sql("UPDATE t SET v = -1 WHERE k IN (SELECT s.x FROM s "
               "WHERE s.j = t.grp) AND k > 4")
        exp = sorted(
            [(i, i % 4, -1.0 if (i in self._HIT and i > 4)
              else float(i)) for i in range(12)] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_alias_and_qualified_in_column(self, ci_front):
        fr, _ = ci_front
        fr.sql("DELETE FROM t AS tt WHERE tt.k IN (SELECT s.x "
               "FROM s WHERE s.j = tt.grp)")
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12)
             if i not in self._HIT] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_source_side_filter_stays_inside(self, ci_front):
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
               "WHERE s.j = t.grp AND s.x > 4)")
        # x>4 drops the (0,4) element: only k=5,8 delete
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12)
             if i not in (5, 8)] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_distinct_in_subquery_accepted(self, ci_front):
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT DISTINCT s.x "
               "FROM s WHERE s.j = t.grp)")
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12)
             if i not in self._HIT] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_rides_dv_when_opted(self, ci_front):
        fr, t = ci_front
        fr.sql("ALTER TABLE t SET TBLPROPERTIES "
               "('delta.enableDeletionVectors' = 'true')")
        before, _, _ = t.prune_files({})
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
               "WHERE s.j = t.grp)")
        after, _, _ = t.prune_files({})
        assert set(before) <= set(after)  # dv: no file rewritten away
        ops = [r["operation"]
               for r in fr.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "merge_dv"

    def test_matches_duckdb_lifecycle(self, ci_front):
        import duckdb

        fr, _ = ci_front
        fr.sql("UPDATE t SET v = v * 10 WHERE k IN (SELECT s.x "
               "FROM s WHERE s.j = t.grp)")
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
               "WHERE s.j = t.grp AND s.x > 4) AND v < 60")
        got = _ci_state(fr)
        con = duckdb.connect()
        con.execute("CREATE TABLE t (k BIGINT, grp BIGINT, v DOUBLE)")
        rows = [(i, i % 4, float(i)) for i in range(12)]
        rows.append((None, 1, 99.0))
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        con.execute("CREATE TABLE s (j BIGINT, x BIGINT)")
        con.executemany(
            "INSERT INTO s VALUES (?, ?)",
            [(0, 4), (0, 8), (1, 5), (1, 20), (1, None), (5, 2)],
        )
        # replay through DuckDB's SELECT evaluator, not its native
        # DML: DuckDB 1.0.0's UPDATE..WHERE k IN (correlated) applies
        # the SET to a NULL-key row even though its own SELECT
        # evaluator scores that predicate UNKNOWN there (probed
        # r16) — the CASE/COALESCE chain is the standard-semantics
        # reading both engines must agree on
        exp = sorted(
            ((k if k is not None else -99), g, v)
            for k, g, v in con.execute("""
                WITH u AS (
                  SELECT k, grp,
                         CASE WHEN k IN (SELECT s.x FROM s
                                         WHERE s.j = t.grp)
                              THEN v * 10 ELSE v END AS v
                  FROM t
                )
                SELECT * FROM u t2
                WHERE NOT COALESCE(
                  k IN (SELECT s.x FROM s
                        WHERE s.j = t2.grp AND s.x > 4)
                  AND v < 60, FALSE)
            """).fetchall()
        )
        assert got == exp

    def test_uncorrelated_in_still_old_path(self, ci_front):
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.j FROM s)")
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12)
             if i not in (0, 1, 5)] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_refuses_correlated_not_in(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="NOT IN"):
            fr.sql("DELETE FROM t WHERE k NOT IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp)")

    def test_refuses_two_correlated_in(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError,
                           match="at most one correlated IN"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp) AND grp IN (SELECT s.j "
                   "FROM s WHERE s.x = t.k)")

    def test_refuses_correlated_plus_uncorrelated_in(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="at most one IN"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp) AND grp IN (SELECT j FROM s)")

    def test_refuses_combined_with_exists(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="combining"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp) AND EXISTS (SELECT 1 FROM s "
                   "WHERE s.j = t.grp)")

    def test_refuses_combined_with_corr_scalar(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="combining"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp) AND v > (SELECT max(s.x) "
                   "FROM s WHERE s.j = t.grp)")

    def test_computed_select_item_fails_loud_unresolved(self, ci_front):
        """A correlated IN whose select item is COMPUTED does not
        match the provable-correlation grammar, so it falls back to
        the r13 standalone-subquery path — where spark.sql's real
        scoping fails LOUD on the unresolved outer ref (exactly the
        pre-r16 behavior; never a silent rebind, because
        _strip_qualifier won't reach inside subquery spans)."""
        from pyspark.errors.exceptions.captured import AnalysisException

        fr, _ = ci_front
        with pytest.raises(AnalysisException, match="t.*grp"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x + 1 FROM s "
                   "WHERE s.j = t.grp)")

    def test_refuses_non_equality_correlation(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="equality"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j > t.grp)")

    def test_refuses_or_correlation(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="cannot decorrelate"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp OR s.x = t.grp)")

    def test_refuses_conflicting_key_bind(self, ci_front):
        fr, _ = ci_front
        # select item x AND the equality bind t.k to different cols
        with pytest.raises(ValueError,
                           match="two different source columns"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.k)")

    def test_refuses_foreign_in_qualifier(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="target column"):
            fr.sql("DELETE FROM t WHERE zz.k IN (SELECT s.x FROM s "
                   "WHERE s.j = t.grp)")

    def test_refuses_foreign_item_qualifier(self, ci_front):
        fr, _ = ci_front
        with pytest.raises(ValueError, match="select item"):
            fr.sql("DELETE FROM t WHERE k IN (SELECT zz.x FROM s "
                   "WHERE s.j = t.grp)")

    def test_self_subquery_shadows_target_uncorrelated(self, ci_front):
        """r16 review find: `k IN (SELECT t.k FROM t WHERE ...)` is a
        SELF-subquery — SQL scoping binds the inner t refs to the
        subquery's own FROM t, shadowing the outer target — and it
        executed fine before the correlated-IN extractor landed. The
        extractor must classify it uncorrelated and leave it to the
        r13 path."""
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT t.k FROM t "
               "WHERE t.v > 9.5)")
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(10)] + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_inner_alias_shadowing_target_uncorrelated(self, ci_front):
        """Aliasing the SOURCE as the target's name shadows the outer
        scope too: `k IN (SELECT t.x FROM s t WHERE t.j = 1)` is
        uncorrelated (inner t = s) and must run the r13 path."""
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT t.x FROM s t "
               "WHERE t.j = 1)")
        # s rows with j=1: x in {5, 20, NULL} -> k=5 deletes
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12) if i != 5]
            + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_unparseable_target_mention_falls_back_loud(self, ci_front):
        """A subquery the simple-inner grammar cannot parse (a JOIN
        against the target view) keeps its r13 behavior: evaluated
        standalone by spark.sql with real scoping — here the join
        against t resolves and the statement executes."""
        fr, _ = ci_front
        fr.sql("DELETE FROM t WHERE k IN (SELECT s.x FROM s "
               "JOIN t ON s.j = t.grp WHERE s.x < 6)")
        # pairs (j,x) with x<6: (0,4),(1,5); join finds matching grp
        # rows in t for j=0 and j=1 -> key set {4, 5}
        exp = sorted(
            [(i, i % 4, float(i)) for i in range(12) if i not in (4, 5)]
            + [(-99, 1, 99.0)]
        )
        assert _ci_state(fr) == exp

    def test_randomized_vs_duckdb_select_evaluator(self, spark,
                                                   tmp_path):
        """Property pin (r16): random NULL-seeded data through random
        correlated-IN DELETE shapes must match DuckDB's SELECT
        evaluator (the standard three-valued reading — NOT DuckDB
        1.0.0's native UPDATE/DELETE..IN, which mis-applies DML to
        NULL-key rows its own SELECT scores UNKNOWN)."""
        import random

        import duckdb

        rnd = random.Random(20260817)
        con = duckdb.connect()
        for it in range(6):
            t_rows = [
                (
                    rnd.choice([None] + list(range(12))),
                    rnd.choice([None, 0, 1, 2, 3]),
                    float(i),
                )
                for i in range(15)
            ]
            s_rows = [
                (
                    rnd.choice([None, 0, 1, 2, 3, 7]),
                    rnd.choice([None] + list(range(12))),
                )
                for _ in range(8)
            ]
            lake = TransactionalLake(
                spark, str(tmp_path / f"prop{it}"), partition_by=()
            )
            lake.append(spark.createDataFrame(
                t_rows, "k long, grp long, v double"))
            srcl = TransactionalLake(
                spark, str(tmp_path / f"props{it}"), partition_by=()
            )
            srcl.append(spark.createDataFrame(s_rows, "j long, x long"))
            fr = LakeSQL(spark)
            fr.register("pt", lake)
            fr.register("ps", srcl)
            inner_filter = rnd.choice(
                ["", " AND s.x > 4", " AND s.x % 2 = 0"]
            )
            residual = rnd.choice(["", " AND v < 12", " AND k % 2 = 0"])
            pred = (
                f"k IN (SELECT s.x FROM ps s WHERE s.j = pt.grp"
                f"{inner_filter}){residual}"
            )
            fr.sql(f"DELETE FROM pt WHERE {pred}")

            def _key(row):
                return tuple(
                    (x is None, -1 if x is None else x) for x in row
                )

            got = sorted(
                ((r.k, r.grp, r.v)
                 for r in fr.sql("SELECT * FROM pt").collect()),
                key=_key,
            )
            con.execute("CREATE OR REPLACE TABLE t (k BIGINT, "
                        "grp BIGINT, v DOUBLE)")
            con.executemany("INSERT INTO t VALUES (?, ?, ?)", t_rows)
            con.execute("CREATE OR REPLACE TABLE s (j BIGINT, x BIGINT)")
            con.executemany("INSERT INTO s VALUES (?, ?)", s_rows)
            duck_pred = pred.replace("ps s", "s s").replace(
                "pt.grp", "t.grp"
            )
            exp = sorted(
                (tuple(r)
                 for r in con.execute(
                     f"SELECT * FROM t WHERE NOT COALESCE("
                     f"{duck_pred}, FALSE)"
                 ).fetchall()),
                key=_key,
            )
            assert got == exp, (it, pred, got, exp)


class TestSqlDvModeEdges:
    """r15 post-record pins: dv interplay with the richer DML
    grammar — multi-clause MERGE rides dv, SET-position correlated
    scalars fall back to copy-on-write (their BY SOURCE arm), and
    the property round-trips through UNSET."""

    def _opt_in(self, front):
        front.sql(
            "ALTER TABLE t SET TBLPROPERTIES "
            "('delta.enableDeletionVectors' = 'true')"
        )

    def test_multi_clause_merge_rides_dv(self, spark, front, lake,
                                         tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "mc"),
                                partition_by=())
        src.append(
            spark.range(10).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("grp"),
                F.lit(5.0).alias("v"),
                (F.col("id") % 2 == 0).alias("dead"),
            )
        )
        front.register("mc", src)
        self._opt_in(front)
        before, _, _ = lake.prune_files({})
        front.sql(
            "MERGE INTO t USING mc ON t.k = mc.k "
            "WHEN MATCHED AND mc.dead THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = mc.v "
            "WHEN NOT MATCHED THEN INSERT (k, grp, v) "
            "VALUES (mc.k, mc.grp, mc.v)"
        )
        after, _, _ = lake.prune_files({})
        assert set(before) <= set(after)  # merge-on-read
        ops = [r["operation"]
               for r in front.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "merge_dv"
        got = front.sql(
            "SELECT COUNT(*) AS n, SUM(CAST(v = 5.0 AS INT)) AS u "
            "FROM t"
        ).first()
        # 5 even keys deleted, 5 odd keys updated to 5.0
        assert (got["n"], got["u"]) == (95, 5)

    def test_set_position_corr_scalar_falls_back(self, spark, front,
                                                 lake, tmp_path):
        src = TransactionalLake(spark, str(tmp_path / "cs2"),
                                partition_by=())
        src.append(spark.createDataFrame(
            [(0, 10.0)], "j long, x double"))
        front.register("cs2", src)
        self._opt_in(front)
        front.sql("UPDATE t SET v = (SELECT max(s.x) FROM cs2 s "
                  "WHERE s.j = t.grp) WHERE k < 8")
        ops = [r["operation"]
               for r in front.sql("DESCRIBE HISTORY t").collect()]
        assert ops[0] == "merge"  # BY SOURCE arm = copy-on-write
        got = {r.k: r.v for r in front.sql(
            "SELECT k, v FROM t WHERE k < 8").collect()}
        # the fixture's grp is k % 7: only grp 0 (k = 0, 7) matches
        # the source key; the rest take MAX's empty-input NULL
        assert got == {i: (10.0 if i % 7 == 0 else None)
                       for i in range(8)}

    def test_unset_property_restores_copy_on_write(self, front, lake):
        self._opt_in(front)
        front.sql(
            "ALTER TABLE t UNSET TBLPROPERTIES "
            "('delta.enableDeletionVectors')"
        )
        before, _, _ = lake.prune_files({})
        front.sql("DELETE FROM t WHERE k >= 90")
        after, _, _ = lake.prune_files({})
        assert set(before) != set(after)  # rewrite again


class TestNullSkipSoundness:
    """Property pin for _null_scalar_never_true (r15): whenever the
    classifier claims a predicate with a NULL scalar slot can never
    be TRUE (the dv-eligible skip), DuckDB must agree under random
    column assignments. The classifier may be conservative (False on
    safe inputs) — only its True claims carry semantics, so only
    those are checked. The generator mixes allowed grammar (columns,
    ints, arithmetic, comparisons, AND) with disallowed wrappers
    (COALESCE/GREATEST/CASE/OR/IS) to exercise both directions."""

    def _gen_pred(self, rnd, depth=0):
        import random

        def arith(d):
            r = rnd.random()
            if d < 2 and r < 0.4:
                op = rnd.choice(["+", "-", "*"])
                return f"({arith(d + 1)} {op} {arith(d + 1)})"
            if r < 0.55:
                return "\x01"
            if r < 0.7:
                return rnd.choice(["a", "b"])
            if r < 0.8 and d < 2:
                # disallowed wrappers: classifier must say False
                fn = rnd.choice(["COALESCE", "GREATEST", "LEAST"])
                return f"{fn}({arith(d + 1)}, {rnd.randint(-3, 3)})"
            return str(rnd.randint(-5, 5))

        def atom(d):
            r = rnd.random()
            if r < 0.1:
                return f"{arith(d)} IS NULL"  # disallowed
            cmp_op = rnd.choice(["<", ">", "<=", ">=", "=", "<>"])
            return f"{arith(d)} {cmp_op} {arith(d)}"

        parts = [atom(depth) for _ in range(rnd.randint(1, 3))]
        joiner = " OR " if rnd.random() < 0.15 else " AND "
        return joiner.join(parts)

    def test_true_claims_agree_with_duckdb(self):
        import random

        import duckdb

        from market_data_lakehouse_spark.sqlfront import LakeSQL

        con = duckdb.connect()
        rnd = random.Random(20260816)
        n_true_claims = 0
        for _ in range(400):
            pred = self._gen_pred(rnd)
            if "\x01" not in pred:
                continue
            if not LakeSQL._null_scalar_never_true(pred):
                continue  # conservative False: no claim to check
            n_true_claims += 1
            sql_pred = pred.replace("\x01", "NULL")
            for a in (-3, 0, 2, 7):
                for b in (-2, 0, 5):
                    got = con.sql(
                        f"SELECT COALESCE(({sql_pred}), FALSE) AS t "
                        f"FROM (SELECT {a} AS a, {b} AS b)"
                    ).fetchone()[0]
                    assert got is False, (pred, a, b, got)
        # the generator must actually produce checkable claims
        assert n_true_claims >= 30, n_true_claims

    def test_known_unsafe_shapes_keep_the_arm(self):
        from market_data_lakehouse_spark.sqlfront import LakeSQL

        unsafe = [
            "COALESCE(\x01, 0) > 5",
            "GREATEST(a, \x01) > 0",
            "\x01 IS NULL",
            "a > 1 OR \x01 < 2",
            "CASE WHEN \x01 > 5 THEN 1 ELSE 1 END = 1",
            "NOT (\x01 > 5)",
            "\x01 IN (1, 2)",
        ]
        for p in unsafe:
            assert not LakeSQL._null_scalar_never_true(p), p

    def test_known_safe_shapes_skip(self):
        from market_data_lakehouse_spark.sqlfront import LakeSQL

        safe = [
            "v > \x01",
            "\x01 <= (a + 1) * 2",
            "a > 1 AND b - \x01 < 2",
            "(a + \x01) * 3 >= b",
        ]
        for p in safe:
            assert LakeSQL._null_scalar_never_true(p), p
