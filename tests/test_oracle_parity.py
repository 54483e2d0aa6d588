"""Oracle parity: every declared query vs its DuckDB oracle.

Replicates the driver's correctness gate locally: run each
``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet, compare column
names, row count, and order-insensitive values. Queries without an
oracle are smoke-run (must build + execute).

Scale factor: ``SPARK_GRAFT_TEST_SF_DIR`` (default sf0.001 for
speed; the driver runs sf0.01).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from market_data_lakehouse_spark.schema import STAR_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cell_equal(a, b) -> bool:
    a_na = not isinstance(a, (list, tuple)) and pd.isna(a)
    b_na = not isinstance(b, (list, tuple)) and pd.isna(b)
    if a_na or b_na:
        return a_na and b_na
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        return  # rows-only contract: must execute, no oracle exists
    odf = duck.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), "column names differ"
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} oracle={len(odf)}"
    s, o = _normalize(sdf), _normalize(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [i for i in range(len(sv)) if not _cell_equal(sv[i], ov[i])]
        assert not bad, (
            f"{len(bad)}/{len(sv)} values differ in column {c}; first: "
            f"spark={sv[bad[0]]!r} oracle={ov[bad[0]]!r}"
        )
