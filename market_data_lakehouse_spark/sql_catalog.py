"""SQL-facing catalog: the reference's declared query interface is
SQL text over named tables (/root/reference/README.md:76-82); this
module exposes the rebuild the same way — the driver star tables and
any declared catalog operator become temp views, so a user can stay
entirely in ``spark.sql``.

Views are lazy plans, not materializations: registering a table view
costs a parquet-footer read, and a query view costs plan construction
(a handful of operators collect driver-size state — query sets,
quantizers — at build time, which is why query views register on
demand from an explicit list instead of all 100+ eagerly)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from market_data_lakehouse_spark.queries.catalog import REGISTRY, load
from market_data_lakehouse_spark.schema import STAR_TABLES


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every driver star table as ``<prefix><table>`` temp
    views. Returns the created view names."""
    created = []
    for name in STAR_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
        created.append(prefix + name)
    return created


def register_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str],
    prefix: str = "q_",
) -> list[str]:
    """Register the named catalog queries as ``<prefix><name>`` temp
    views (e.g. ``q_a2_vwap_top10``) so downstream SQL can select
    from / join against operator results without touching the
    DataFrame API. Unknown names raise; the prefix keeps operator
    views from shadowing base tables."""
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise ValueError(f"unknown catalog queries: {unknown}")
    created = []
    for n in names:
        REGISTRY[n].fn(spark, sf_dir).createOrReplaceTempView(prefix + n)
        created.append(prefix + n)
    return created


def unregister(spark: SparkSession, names: list[str]) -> None:
    for n in names:
        spark.catalog.dropTempView(n)
