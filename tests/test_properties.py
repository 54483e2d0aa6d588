"""Property-based tests (hypothesis): engine semantics vs tiny
Python oracles on randomized inputs. Few examples, real Spark round
trips — these catch boundary semantics (ties, empty sides, NaN)
that fixed fixtures miss."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_data_lakehouse_spark.asof import asof_join, asof_join_bucketed

BASE = datetime(2024, 6, 15, 10, 0)

# (key, ts-offset-seconds, value); value None = quote with NULL px
event = st.tuples(
    st.sampled_from(["A", "B"]),
    st.integers(min_value=0, max_value=7200),
    st.one_of(st.none(), st.integers(min_value=0, max_value=1000)),
)


def _py_asof(trades, quotes):
    """Per-trade latest quote at-or-before, per key (ties: quote at
    the same instant IS visible). A NULL-valued quote still wins
    resolution — the result is then NULL, not an older price."""
    out = {}
    for k, t_off, tv in trades:
        best = None
        for qk, q_off, qv in quotes:
            if qk == k and q_off <= t_off:
                if best is None or q_off > best[0]:
                    best = (q_off, qv)
        out.setdefault((k, t_off), set()).add(best[1] if best else None)
    return out


@pytest.mark.parametrize("impl", [asof_join, asof_join_bucketed])
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    trades=st.lists(event, min_size=1, max_size=12, unique_by=lambda e: (e[0], e[1])),
    quotes=st.lists(event, min_size=0, max_size=12, unique_by=lambda e: (e[0], e[1])),
)
def test_asof_matches_python_oracle(spark, impl, trades, quotes):
    tdf = spark.createDataFrame(
        [
            (k, BASE + timedelta(seconds=o), None if v is None else float(v))
            for k, o, v in trades
        ],
        "sym string, ts timestamp, trade_px double",
    )
    qdf = spark.createDataFrame(
        [
            (k, BASE + timedelta(seconds=o), None if v is None else float(v))
            for k, o, v in quotes
        ],
        "sym string, ts timestamp, quote_px double",
    ) if quotes else spark.createDataFrame(
        [], "sym string, ts timestamp, quote_px double"
    )
    kwargs = {"bucket_minutes": 7} if impl is asof_join_bucketed else {}
    got = impl(tdf, qdf, on="sym", left_ts="ts", right_ts="ts", **kwargs)
    expected = _py_asof(trades, quotes)
    rows = got.collect()
    assert len(rows) == len(trades)
    for r in rows:
        off = int((r["ts"] - BASE).total_seconds())
        want = expected[(r["sym"], off)]
        assert (None if r["quote_px"] is None else int(r["quote_px"])) in want


@pytest.mark.parametrize("impl", [asof_join, asof_join_bucketed])
def test_asof_null_quote_value_shadows_older(spark, impl):
    """A quote row whose VALUE is NULL still wins as-of resolution
    (DuckDB ASOF attaches the row, giving a NULL value) — it must not
    be conflated with 'no quote' and resurrect an older price. With
    1-minute buckets the trade sits many buckets after both quotes,
    so the bucketed variant's carry-in path is exercised too."""
    tdf = spark.createDataFrame(
        [("A", BASE + timedelta(minutes=30), 1.0)],
        "sym string, ts timestamp, trade_px double",
    )
    qdf = spark.createDataFrame(
        [("A", BASE, 5.0), ("A", BASE + timedelta(minutes=1), None)],
        "sym string, ts timestamp, quote_px double",
    )
    kwargs = {"bucket_minutes": 1} if impl is asof_join_bucketed else {}
    rows = impl(tdf, qdf, on="sym", **kwargs).collect()
    assert len(rows) == 1 and rows[0]["quote_px"] is None


bar_floats = st.one_of(
    st.floats(min_value=1, max_value=1000, allow_nan=False),
    st.just(float("nan")),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bars=st.lists(
        st.tuples(bar_floats, bar_floats, bar_floats, bar_floats,
                  st.integers(min_value=-5, max_value=100)),
        min_size=1,
        max_size=20,
    )
)
def test_ingest_split_conserves_rows(spark, tmp_path_factory, bars):
    """rows_ingested + errors == len(input), for any mix of valid,
    invalid, and NaN bars — and the Spark-side predicate agrees with
    the Python mirror (_valid_py) on every row."""
    from market_data_lakehouse_spark.lakehouse import DataLakehouse

    lake = DataLakehouse(
        spark, str(tmp_path_factory.mktemp("prop") / "lake")
    )
    rows = [
        {
            "symbol": "X",
            "timestamp": BASE + timedelta(seconds=i),
            "open": o,
            "high": h,
            "low": lo,
            "close": c,
            "volume": v,
            "asset_class": "equity",
        }
        for i, (o, h, lo, c, v) in enumerate(bars)
    ]
    stats = lake.ingest_batch(rows)
    assert stats.rows_ingested + stats.errors == len(rows)
    n_valid_py = sum(1 for r in rows if DataLakehouse._valid_py(r))
    assert stats.rows_ingested == n_valid_py
