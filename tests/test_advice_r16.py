"""Pins for the r15 ADVICE items fixed in r16.

1. conftest --timeout shim: warns visibly when it swallows a value
   (no watchdog is actually active).
2. bench_compare --sibling: host verdicts only suppress the exit
   gate with code-identity proof (tests live in test_bench_ab.py).
3. parquet_rowcount_exact: the verification memo keys on a stat
   fingerprint, so mid-session layout drift re-verifies instead of
   serving the first footer count forever.
"""

from __future__ import annotations

import os
import subprocess
import sys


class TestTimeoutShimWarns:
    def test_warning_emitted_when_value_swallowed(self):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--timeout", "123",
             "--collect-only", "-q", "tests/test_advice_r16.py",
             "-W", "default"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ},
        )
        assert "NOT enforced" in out.stdout + out.stderr

    def test_no_warning_without_flag(self):
        out = subprocess.run(
            [sys.executable, "-m", "pytest",
             "--collect-only", "-q", "tests/test_advice_r16.py",
             "-W", "default"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ},
        )
        assert "NOT enforced" not in out.stdout + out.stderr


class TestRowcountExactMemoInvalidation:
    def test_mid_session_drift_reverifies(self, spark, tmp_path):
        """r15 ADVICE item 3: after a verified call, rewrite the
        table layout in place — the memoized verification must NOT
        serve the stale footer count; it re-fingerprints, re-sums,
        and answers for the files the NEW scan resolves."""
        from market_data_lakehouse_spark.queries.catalog import (
            parquet_rowcount_exact,
        )

        sf = tmp_path / "sf"
        sf.mkdir()
        tbl = sf / "tbl.parquet"
        spark.range(10).coalesce(1).write.parquet(str(tbl))
        df = spark.read.parquet(str(tbl))
        assert parquet_rowcount_exact(str(sf), "tbl", df) == 10
        # layout drift: the table is rewritten with MORE rows
        spark.range(25).coalesce(1).write.mode("overwrite").parquet(
            str(tbl)
        )
        df2 = spark.read.parquet(str(tbl))
        got = parquet_rowcount_exact(str(sf), "tbl", df2)
        assert got == 25, f"stale memo served {got}"

    def test_drift_to_mismatch_returns_none(self, spark, tmp_path):
        """Verified once, then a stray file lands: the fingerprint
        miss must force re-verification, which sees the footer/scan
        mismatch and returns None (exact-count fallback)."""
        import shutil

        from market_data_lakehouse_spark.queries.catalog import (
            parquet_rowcount_exact,
        )

        sf = tmp_path / "sf2"
        sf.mkdir()
        tbl = sf / "tbl.parquet"
        spark.range(10).coalesce(1).write.parquet(str(tbl))
        df = spark.read.parquet(str(tbl))
        assert parquet_rowcount_exact(str(sf), "tbl", df) == 10
        first = sorted(
            f for f in os.listdir(tbl) if f.endswith(".parquet")
        )[0]
        shutil.copy(tbl / first, tbl / "stray-copy.parquet")
        # same df (its scan resolved the OLD file list): mismatch
        assert parquet_rowcount_exact(str(sf), "tbl", df) is None
