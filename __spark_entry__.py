"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship VWAP top-10 (reference
README.md:77-81) at sf0.001. ``queries()`` / ``oracle_sql()`` expose
the full declared catalog from
``market_data_lakehouse_spark.queries`` — one entry per implemented
operator from SURVEY.md §2, each oracle-checked against DuckDB where
ANSI-SQL-expressible (the rest get the rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from market_data_lakehouse_spark.queries import oracle_map, spark_queries
from market_data_lakehouse_spark.queries.relational import a2_vwap_top10

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return a2_vwap_top10(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return oracle_map()
