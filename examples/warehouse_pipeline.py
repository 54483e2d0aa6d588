"""End-to-end warehouse-maintenance pipeline on the lakehouse.

The round-7 table-management features composed into one story: an
events fact lake with bloom-indexed point lookups, GDPR-style
deletes that cost O(deleted rows) via deletion vectors, a zero-copy
clone for an experiment branch, an SCD2 user-attribute dimension
maintained incrementally from the same feed, and compaction that
materializes the vectors away — every step an ACID commit with
time-travel intact.

Run: python examples/warehouse_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_data_lakehouse_spark.queries.catalog import load  # noqa: E402
from market_data_lakehouse_spark.scd import scd2_apply  # noqa: E402
from market_data_lakehouse_spark.schema import epoch_us  # noqa: E402
from market_data_lakehouse_spark.session import get_spark  # noqa: E402
from market_data_lakehouse_spark.txnlog import TransactionalLake  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("warehouse_pipeline")
    root = os.path.join(
        tempfile.gettempdir(), f"warehouse_{uuid.uuid4().hex[:8]}"
    )

    # --- 1. fact lake with a bloom index on the lookup key -------------
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "user_id",
        "event_type",
        epoch_us(F.col("ts")).alias("tsu"),
        "value",
    )
    facts = TransactionalLake(
        spark,
        os.path.join(root, "facts"),
        partition_by=(),
        bloom_columns=("event_id",),
    )
    facts.append(ev.repartition(4))
    kept, total, _ = facts.prune_files({}, equals={"event_id": 42})
    print(f"point lookup: bloom pruned {total} files -> {len(kept)}")
    hit = facts.scan_between({}, equals={"event_id": 42}).count()
    print(f"  event 42 rows: {hit}")

    # --- 2. GDPR delete: positional, no rewrite ------------------------
    before, _, _ = facts.prune_files({})
    target_user = ev.select("user_id").first()["user_id"]
    facts.delete_where(f"user_id = {target_user}", mode="dv")
    after, _, _ = facts.prune_files({})
    assert sorted(before) == sorted(after)
    print(
        f"dv delete of user {target_user}: file set untouched, "
        f"{facts.snapshot().count()} rows visible"
    )

    # --- 3. zero-copy clone for an experiment branch -------------------
    branch = facts.clone(os.path.join(root, "experiment"))
    branch.update_where("event_type = 'view'", {"value": "value * 2"})
    print(
        "clone diverged: prod v%d, experiment v%d"
        % (facts.version, branch.version)
    )

    # --- 4. SCD2 dimension from the same feed --------------------------
    dim = TransactionalLake(spark, os.path.join(root, "dim"), partition_by=())
    changes = ev.select("user_id", "event_type", "tsu", "event_id")
    # two in-order daily batches
    mid = changes.agg(F.expr("percentile(tsu, 0.5)")).first()[0]
    for batch in (
        changes.filter(F.col("tsu") <= mid),
        changes.filter(F.col("tsu") > mid),
    ):
        scd2_apply(
            dim, batch, ["user_id"], "tsu", ["event_type"],
            tiebreak="event_id",
        )
    hist = dim.snapshot()
    print(
        "scd2 dimension: %d versions across %d users, %d current"
        % (
            hist.count(),
            hist.select("user_id").distinct().count(),
            hist.filter("is_current").count(),
        )
    )

    # --- 5. compaction materializes the vectors away -------------------
    facts.optimize()
    assert facts._snapshot_state()[3] == {}
    print(
        "optimize: vectors materialized, table at v%d, "
        "time-travel to v0 still sees %d rows"
        % (facts.version, facts.snapshot(version=0).count())
    )


if __name__ == "__main__":
    main()
