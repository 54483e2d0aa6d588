"""Runnable tour of the table-evolution surface. Usage:

    PYTHONPATH=/root/repo python examples/table_evolution.py

A 100 TB table lives for years; its schema doesn't. This walks the
full lifecycle on one TransactionalLake: IDENTITY ids at ingest,
metadata-only COUNT(*), RENAME/DROP via column mapping (zero rows
rewritten), time-travel across the rename, CHECK constraints that
keep enforcing through it, and reorg_purge to physically reclaim
dropped bytes.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from market_data_lakehouse_spark import TransactionalLake, get_spark


def main() -> None:
    spark = get_spark("table_evolution")
    root = tempfile.mkdtemp()
    lake = TransactionalLake(spark, f"{root}/trades", partition_by=())

    # IDENTITY: contiguous 64-bit ids assigned at append, no global sort
    lake.set_identity("trade_id")
    lake.append(
        spark.createDataFrame(
            [("AAPL", 150.0, "junk"), ("MSFT", 300.0, "junk")],
            "symbol string, price double, scratch string",
        )
    )
    lake.add_check_constraint("pos_price", "price > 0")
    v_ingest = lake.version
    print("ids:", sorted(r.trade_id for r in lake.snapshot().collect()))
    print("metadata-only count:", lake.count_rows(), "(no Spark job)")

    # INTEGRITY: every commit leaves a checksum sidecar ({v}.crc);
    # verify_checksum() recomputes from the log and raises on drift —
    # and the head count above was answered FROM this sidecar (O(1))
    crc = lake.verify_checksum()
    print("checksum:", {
        k: crc[k] for k in ("num_files", "total_rows", "total_bytes")
    })

    # INTEROP: export a symlink-format manifest so engines that don't
    # speak the commit log (Presto/Hive external tables) read a
    # consistent snapshot (refused once column mapping is active)
    lake.generate_manifest()
    print("manifest paths:", len(lake.manifest_paths()))

    # RENAME: one log write; files keep their physical names forever
    lake.rename_column("price", "px_usd")
    print("after rename:", lake.snapshot().columns)
    print("time-travel:", lake.snapshot(version=v_ingest).columns)

    # the constraint added pre-rename still enforces (binds physically)
    try:
        lake.append(
            spark.createDataFrame(
                [("BAD", -1.0, "x")],
                "symbol string, px_usd double, scratch string",
            )
        )
    except ValueError as exc:
        print("constraint held across rename:", str(exc)[:60], "...")

    # ADD COLUMN is one log write: old files null-fill on read
    lake.add_column("venue", "string")
    print("after add_column:", lake.snapshot().columns)

    # MERGE can evolve the schema too (source carries a new column)
    lake.merge(
        spark.createDataFrame(
            [("AAPL", 151.0, 0.9)],
            "symbol string, px_usd double, confidence double",
        ),
        on="symbol",
        schema_evolution=True,
    )
    print("after evolving merge:", lake.snapshot().columns)

    # DROP hides instantly (metadata-only); PURGE reclaims the bytes
    lake.drop_column("scratch")
    print("after drop:", lake.snapshot().columns)
    lake.reorg_purge()
    print("purged; detail:", {
        k: v for k, v in lake.detail().items()
        if k in ("version", "num_files", "column_mapping")
    })


if __name__ == "__main__":
    main()
