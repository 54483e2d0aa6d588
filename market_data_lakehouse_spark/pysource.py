"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API)
— a deterministic synthetic tick feed, registered as format
``synthetic_ticks``.

The reference ingests market ticks from external feeds
(/root/reference/README.md:37); this source is the rebuild's
connector surface for anything Spark lacks a built-in reader for: the
same DataSource subclass serves ``spark.read`` (batch, partitioned by
symbol) and ``spark.readStream`` (micro-batched by a monotonically
advancing sequence offset). Everything is a pure function of
(symbol, seq) via md5 — no RNG state — so reads are reproducible
across runs, partitionings, and engines, and a replayed micro-batch
(readBetweenOffsets) regenerates byte-identical rows, which is what
makes the source safe under streaming recovery.

Options: ``symbols`` (csv, default "AAPL,MSFT"), ``ticks`` (rows per
symbol, batch only, default 1000), ``batch_rows`` (rows per symbol
per micro-batch, streaming, default 100), ``start_epoch`` (seconds,
default 1704067200 = 2024-01-01), ``interval_ms`` (tick spacing,
default 1000).

Scale note: the batch reader emits one InputPartition per symbol —
executors generate rows in parallel with zero driver data movement.
The streaming side uses SimpleDataSourceStreamReader (driver-side
row generation), the right tier for a demo feed; a production
high-rate connector implements the partitioned
DataSourceStreamReader instead (same offset contract, executor-side
reads)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TICK_SOURCE_SCHEMA = (
    "symbol string, ts timestamp, price double, volume long, seq long"
)


def _tick(symbol: str, seq: int, start_epoch: int, interval_ms: int):
    h = int.from_bytes(
        hashlib.md5(f"{symbol}:{seq}".encode()).digest()[:8], "big"
    )
    price = round(100.0 + (h % 10_000 - 5_000) / 100.0, 2)
    volume = 10 + (h >> 16) % 990
    ts = datetime.fromtimestamp(
        start_epoch + seq * interval_ms / 1000.0, tz=timezone.utc
    ).replace(tzinfo=None)
    return (symbol, ts, price, volume, seq)


def _opts(options):
    return (
        [s for s in options.get("symbols", "AAPL,MSFT").split(",") if s],
        int(options.get("start_epoch", 1_704_067_200)),
        int(options.get("interval_ms", 1000)),
    )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class TickBatchReader(DataSourceReader):
    def __init__(self, options):
        self.symbols, self.start_epoch, self.interval_ms = _opts(options)
        self.ticks = int(options.get("ticks", 1000))

    def partitions(self):
        return [_SymbolPartition(s) for s in self.symbols]

    def read(self, partition):
        for seq in range(self.ticks):
            yield _tick(
                partition.symbol, seq, self.start_epoch, self.interval_ms
            )


class TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.symbols, self.start_epoch, self.interval_ms = _opts(options)
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self):
        return {"seq": 0}

    def _rows(self, lo: int, hi: int):
        return [
            _tick(s, q, self.start_epoch, self.interval_ms)
            for q in range(lo, hi)
            for s in self.symbols
        ]

    def read(self, start):
        lo = start["seq"]
        hi = lo + self.batch_rows
        return iter(self._rows(lo, hi)), {"seq": hi}

    def readBetweenOffsets(self, start, end):
        # recovery replay: regenerate the EXACT rows of a committed
        # range — determinism is the exactly-once guarantee here
        return iter(self._rows(start["seq"], end["seq"]))


class TickDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return TICK_SOURCE_SCHEMA

    def reader(self, schema):
        return TickBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


def register_tick_source(spark) -> None:
    """Idempotently register the ``synthetic_ticks`` format on a
    session."""
    spark.dataSource.register(TickDataSource)
