"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic tick generator.

The reference pipeline's inputs are files someone else produced; at
development scale you want load you can MANUFACTURE — reproducibly,
in parallel, with no files at all.  This registers a ``tickgen``
format whose reader plans ONE input partition per symbol, so a
100-symbol read fans out across 100 tasks with zero driver-side data:
each task derives its rows from (seed, symbol, index) md5 arithmetic,
the same closed form any engine can replay.

Usage::

    spark.dataSource.register(TickGenDataSource)
    df = (spark.read.format("tickgen")
          .option("symbols", "ALPHA,BETA")
          .option("ticks_per_symbol", 1000)
          .option("start", "2022-04-04 09:15:00")
          .load())

Also exercises the STREAMING half of the API
(``simpleStreamReader``): offsets advance by a fixed tick budget per
micro-batch, so a restart from checkpoint resumes exactly where the
last commit ended — the custom-source exactly-once contract.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ltp", T.DoubleType()),
        T.StructField("ltq", T.LongType()),
    ]
)


def _tick(seed: str, symbol: str, i: int, start: dt.datetime):
    """Closed-form deterministic tick: price/qty from md5(seed:sym:i)."""
    h = hashlib.md5(f"{seed}:{symbol}:{i}".encode()).hexdigest()
    price = 100.0 + (int(h[:8], 16) % 10_000) / 100.0
    qty = 1 + int(h[8:12], 16) % 500
    return (symbol, start + dt.timedelta(seconds=i), price, qty)


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, lo: int, hi: int):
        self.symbol, self.lo, self.hi = symbol, lo, hi


class TickGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s for s in options.get("symbols", "ALPHA,BETA").split(",") if s
        ]
        self.n = int(options.get("ticks_per_symbol", 100))
        self.start = dt.datetime.fromisoformat(
            options.get("start", "2022-04-04 09:15:00")
        )
        self.seed = options.get("seed", "tickgen")

    def partitions(self) -> Sequence[InputPartition]:
        return [_SymbolPartition(s, 0, self.n) for s in self.symbols]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield _tick(self.seed, partition.symbol, i, self.start)


class TickGenStreamReader(SimpleDataSourceStreamReader):
    """Offsets are the per-symbol tick index; each micro-batch emits
    ``ticks_per_batch`` new ticks per symbol.  State lives entirely in
    the offset json, so checkpoint restart is exactly-once by
    construction."""

    def __init__(self, options: dict):
        self.symbols = [
            s for s in options.get("symbols", "ALPHA,BETA").split(",") if s
        ]
        self.batch = int(options.get("ticks_per_batch", 10))
        self.limit = int(options.get("max_ticks", 1_000_000))
        self.start = dt.datetime.fromisoformat(
            options.get("start", "2022-04-04 09:15:00")
        )
        self.seed = options.get("seed", "tickgen")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(lo + self.batch, self.limit)
        rows = [
            _tick(self.seed, s, i, self.start)
            for s in self.symbols
            for i in range(lo, hi)
        ]
        return iter(rows), {"i": hi}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # deterministic replay for recovery: same closed form
        return iter(
            _tick(self.seed, s, i, self.start)
            for s in self.symbols
            for i in range(start["i"], end["i"])
        )


class TickGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tickgen"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> TickGenReader:
        return TickGenReader(self.options)

    def simpleStreamReader(self, schema) -> TickGenStreamReader:
        return TickGenStreamReader(self.options)
