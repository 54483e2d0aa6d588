"""The SQL-only workflow: one language for everything (r12).

The reference's documented interface is a SQL string
(``lake.query("SELECT AVG(close) ...")`` — reference
README.md:77-81). This tour drives a transactional table's ENTIRE
life through :class:`LakeSQL` statements — create, load, evolve,
mutate, maintain, audit, time-travel — without touching the Python
API after registration.

Run:  python examples/sql_interface.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    from market_data_lakehouse_spark.session import get_spark
    from market_data_lakehouse_spark.sqlfront import LakeSQL

    spark = get_spark(app_name="sql_interface", shuffle_partitions=8)
    fr = LakeSQL(spark)
    root = tempfile.mkdtemp(prefix="sql_tour_")

    # source rows as a plain temp view the CTAS can read
    spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").alias("k"),
        F.col("event_type").alias("etype"),
        F.col("value").alias("x"),
    ).createOrReplaceTempView("src_events")

    fr.sql(
        f"CREATE TABLE trades LOCATION '{root}/trades' "
        "AS SELECT k, etype, CAST(x AS DOUBLE) AS x FROM src_events"
    )
    n0 = fr.sql("SELECT COUNT(*) AS n FROM trades").first()["n"]
    print(f"created: {n0} rows")

    # column-list DDL: markers wire the log features (r12)
    fr.sql(
        f"CREATE TABLE audit ("
        "  id BIGINT GENERATED ALWAYS AS IDENTITY,"
        "  k BIGINT NOT NULL,"
        "  note STRING"
        f") LOCATION '{root}/audit'"
    )
    fr.sql("INSERT INTO audit VALUES (10, 'first'), (20, 'second')")
    ids = sorted(r["id"] for r in fr.sql("SELECT id FROM audit").collect())
    assert ids == [0, 1], ids
    print(f"audit table: identity ids {ids}")

    # evolve + mutate, SQL only
    fr.sql("ALTER TABLE trades ADD COLUMN note STRING")
    fr.sql("ALTER TABLE trades ALTER COLUMN note SET DEFAULT 'none'")
    fr.sql("UPDATE trades SET x = x * 100 WHERE etype = 'click'")
    fr.sql("DELETE FROM trades WHERE k % 10 = 9")
    fr.sql(
        "MERGE INTO trades USING ("
        "  SELECT k, 'merged' AS etype, CAST(0.0 AS DOUBLE) AS x,"
        "         'hot' AS note FROM trades WHERE k % 97 = 0"
        ") AS s ON trades.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # subquery DML (r13/r14): IN, correlated [NOT] EXISTS, and
    # uncorrelated scalars — all decorrelated/inlined onto the engine
    fr.sql(
        "UPDATE trades SET note = 'audited' WHERE EXISTS "
        "(SELECT 1 FROM audit a WHERE a.id = trades.k)"
    )
    fr.sql(
        "DELETE FROM trades WHERE k IN "
        "(SELECT id FROM audit WHERE id < 0)"
    )  # empty key set: deletes nothing, still one merge commit
    fr.sql(
        "UPDATE trades SET x = x - (SELECT avg(x) FROM trades) "
        "WHERE etype = 'merged'"
    )  # scalar evaluates once driver-side and inlines
    # correlated scalar subqueries (r15): decorrelated to a per-key
    # aggregate + merge probe; rows whose key matches no audit row
    # take the aggregate's empty-input value (NULL here, so they
    # keep their note via SQL's three-valued guard on the WHERE)
    fr.sql(
        "UPDATE trades SET note = 'flagged' WHERE k < "
        "(SELECT max(a.id) FROM audit a WHERE a.id = trades.k) + 1"
    )
    n_audited = fr.sql(
        "SELECT COUNT(*) AS n FROM trades WHERE note IN "
        "('audited', 'flagged')"
    ).first()["n"]
    print(f"subquery DML: {n_audited} rows matched the audit keys")

    # merge-on-read opt-in (r15): the Delta dv property flips SQL
    # DML to deletion vectors — no data file rewritten
    fr.sql(
        "ALTER TABLE trades SET TBLPROPERTIES "
        "('delta.enableDeletionVectors' = 'true')"
    )
    fr.sql("DELETE FROM trades WHERE k % 10 = 8")
    last = fr.sql("DESCRIBE HISTORY trades LIMIT 1").first()
    assert last["operation"] == "delete_dv", last["operation"]
    print("dv opt-in: DELETE committed as", last["operation"])
    fr.sql(
        "ALTER TABLE trades UNSET TBLPROPERTIES "
        "('delta.enableDeletionVectors')"
    )

    # maintain + audit
    fr.sql("OPTIMIZE trades ZORDER BY (k)")
    fr.sql("ANALYZE TABLE trades COMPUTE STATISTICS FOR COLUMNS k, x")
    for row in fr.sql("DESCRIBE HISTORY trades LIMIT 5").collect():
        print(f"  v{row['version']:>3}  {row['operation']}")
    det = fr.sql("DESCRIBE DETAIL trades").first()
    print(f"detail: v{det['version']}, {det['num_files']} files")

    # CDF + time travel, still SQL
    changed = fr.sql(
        "SELECT _change_type, COUNT(*) AS n FROM table_changes('trades', 1) "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    print("changes:", [(r["_change_type"], r["n"]) for r in changed])
    was = fr.sql(
        "SELECT COUNT(*) AS n FROM trades VERSION AS OF 0"
    ).first()["n"]
    now = fr.sql("SELECT COUNT(*) AS n FROM trades").first()["n"]
    assert was == n0, (was, n0)
    # @v shorthand resolves the same snapshot
    assert fr.sql("SELECT COUNT(*) AS n FROM trades@v0").first()["n"] == was
    print(f"time travel: v0 had {was}, head has {now}")

    # r12 late verbs: comments, catalog listings, clone, truncate
    fr.sql("COMMENT ON TABLE trades IS 'tick-level trade events'")
    fr.sql("COMMENT ON COLUMN trades.x IS 'scaled value'")
    cols = [r["col_name"] for r in fr.sql("SHOW COLUMNS IN trades").collect()]
    print("columns:", cols)
    clone_loc = os.path.join(root, "trades_snap")
    fr.sql(
        f"CREATE TABLE trades_snap SHALLOW CLONE trades VERSION AS OF 0 "
        f"LOCATION '{clone_loc}'"
    )
    snap_n = fr.sql("SELECT COUNT(*) AS n FROM trades_snap").first()["n"]
    assert snap_n == n0, (snap_n, n0)
    rec = fr.sql("TRUNCATE TABLE audit").first()
    assert fr.sql("SELECT COUNT(*) AS n FROM audit").first()["n"] == 0
    print(
        f"clone holds v0 ({snap_n} rows); audit truncated "
        f"({rec['num_removed_files']} files, metadata-only)"
    )
    print("sql tour OK")


if __name__ == "__main__":
    main()
