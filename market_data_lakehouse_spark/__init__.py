"""market_data_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``jrajath94/market-data-lakehouse`` engine (a single-process Python
Parquet lakehouse, see ``/root/reference/src/market_data_lakehouse/
lakehouse.py``), re-expressed Spark-first:

- storage: date-partitioned Parquet (columnar, Snappy), written via
  ``df.write.partitionBy``
- query: DataFrame / Spark SQL over the canonical schema, with
  Catalyst doing partition pruning / predicate pushdown / column
  pruning (the reference does pruning by hand and filters in Python)
- validation: OHLC invariants as boolean column predicates with a
  valid/invalid split (reference: per-row ``validate()``,
  lakehouse.py:73-88)
- streaming: Structured Streaming micro-batches (reference README's
  ring buffer + 100ms flush)
- extensions: dedup / similarity search / text analysis / multimodal
  operators for large-scale training-data pipelines.

Everything here derives from public knowledge only: the Apache Spark
API and the reference repo's observable behavior.
"""

from market_data_lakehouse_spark.asof import asof_join
from market_data_lakehouse_spark.lakehouse import (
    AssetClass,
    DataLakehouse,
    IngestionStats,
    OHLCVBar,
    PartitionManager,
    QueryResult,
)
from market_data_lakehouse_spark.schema import BAR_SCHEMA, TICK_SCHEMA
from market_data_lakehouse_spark.session import get_spark
from market_data_lakehouse_spark.txnlog import TransactionalLake

__all__ = [
    "AssetClass",
    "DataLakehouse",
    "IngestionStats",
    "OHLCVBar",
    "PartitionManager",
    "QueryResult",
    "TransactionalLake",
    "asof_join",
    "BAR_SCHEMA",
    "TICK_SCHEMA",
    "get_spark",
]

__version__ = "0.1.0"
