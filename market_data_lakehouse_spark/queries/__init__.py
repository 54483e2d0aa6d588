"""Declared query catalog — the driver-facing operator surface.

Every operator from SURVEY.md §2 that is implemented gets a named
entry here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where ANSI-SQL-expressible, a DuckDB oracle string. The driver runs
both at sf=0.01 and compares row-count + schema + order-insensitive
value-hash (CORRECTNESS_r{N}.json).

Engine-parity rules applied throughout (so hashes match):

- Alias every computed column identically in Spark and SQL.
- Integer-valued computed columns are cast to BIGINT on both sides
  (DuckDB widens SUM(int)→HUGEINT, ROW_NUMBER→BIGINT, while Spark
  uses int for year()/row_number() — normalize to long).
- Float aggregates are ROUND()ed on both sides: double summation
  order differs between engines, so raw sums differ in the last
  ulps; rounding to a tolerance far above the error (but far below
  data resolution) makes the hash deterministic.
- Results that feed a LIMIT carry a unique-key tiebreaker in the
  ORDER BY so the selected set is deterministic in both engines.
- ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as a
  long (``legacy.parquet.nanosAsLong``) and we truncate to micros;
  DuckDB truncates to micros at read time — identical values.
"""

from market_data_lakehouse_spark.queries.catalog import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    load,
    oracle_map,
    register,
    spark_queries,
)

# Import for side effect: each module registers its queries.
from market_data_lakehouse_spark.queries import (  # noqa: F401
    dedup,
    lakehouse_query,
    multimodal,
    quality,
    relational,
    similarity,
    textops,
)
