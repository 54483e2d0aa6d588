"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB (views over the same parquet), then compares row count,
column names, and order-insensitive values. Exit non-zero on any
mismatch. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from market_data_lakehouse_spark.schema import STAR_TABLES  # noqa: E402
from market_data_lakehouse_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(sdf.columns) != sorted(odf.columns):
        issues.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return issues
    if len(sdf) != len(odf):
        issues.append(f"rows: spark={len(sdf)} oracle={len(odf)}")
        return issues
    s, o = normalize(sdf), normalize(odf)
    # dtype report (driver may compare schemas strictly)
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype):
            issues.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
    ncell = 0
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            i
            for i in range(len(sv))
            if not values_equal(
                None
                if not isinstance(sv[i], (list, tuple)) and pd.api.types.is_scalar(sv[i]) and pd.isna(sv[i])
                else sv[i],
                None
                if not isinstance(ov[i], (list, tuple)) and pd.api.types.is_scalar(ov[i]) and pd.isna(ov[i])
                else ov[i],
            )
        ]
        if bad:
            i = bad[0]
            issues.append(
                f"values[{c}]: {len(bad)}/{len(sv)} differ; first at row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
            ncell += len(bad)
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        hard = [i for i in issues if not i.startswith("dtype")]
        soft = [i for i in issues if i.startswith("dtype")]
        if hard:
            print(f"FAIL {name} ({len(sdf)} rows, {dt:.1f}s)")
            for i in hard + soft:
                print(f"   {i}")
            n_fail += 1
        else:
            extra = f" [{'; '.join(soft)}]" if soft else ""
            print(f"pass {name}: {len(sdf)} rows ({dt:.1f}s){extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
