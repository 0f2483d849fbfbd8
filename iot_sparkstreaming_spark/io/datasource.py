"""Custom Python DataSource (Spark 4 API): a broker-less twin of the
reference's Kafka edge.

The reference ingested one multiplexed stream of CSV lines from three
Kafka topics via the receiver-less direct stream — driver-computed
offset ranges, deterministic replay per range
(IOTSparkStreaming.scala:43-44, workingTest.scala:48-49). This module
reproduces those SOURCE semantics with Spark 4's Python DataSource
API instead of a broker:

* **batch**: ``spark.read.format("iot_records")`` — the row range is
  split into ``numPartitions`` offset ranges planned on the driver
  (`partitions()`), each generated independently on an executor, the
  same planning shape as the direct stream's per-partition
  OffsetRange.
* **streaming**: ``spark.readStream.format("iot_records")`` — a
  ``SimpleDataSourceStreamReader`` whose offset is the record index;
  `readBetweenOffsets` regenerates any range bit-identically, which
  is exactly the contract that made the reference's direct stream
  replayable (exactly-once source bookkeeping without receivers).

Lines follow FIXTURES.md §1 (fitbit / new-user-notification / sales,
8:1:1 mix) and include the domain edge cases the reference's logic
branches on: ages 39/40/41 around the max-HR breakpoint, ``.5``
pulse fractions for half-up rounding, all five bp categories, ~5%
unknown users for the inner-join drop path, and incidental whitespace
(the pervasive-trim path P10). Deterministic in the record index —
no RNG, no time.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

BP_CATS = ["NORMAL", "PRE_HYP", "HYP_1", "HYP_2", "HYP_CR"]
CATEGORIES = ["sedentary", "moderate", "active", "athlete"]


def record_line(i: int) -> str:
    """Deterministic multiplexed CSV line for record index ``i``."""
    kind = i % 10
    if kind == 8:  # new-user-notification (FIXTURES.md §1.2)
        uid = i // 10
        age = 15 + uid % 76
        return (
            f"new-user-notification,{age},{'MF'[uid % 2]},"
            f"{CATEGORIES[uid % 4]},{40 + uid % 111}.5,{140 + uid % 71}.0,"
            f"{15 + uid % 31}.2,{5 + uid % 46}.1,{BP_CATS[uid % 5]},"
            f"{90 + uid % 111}.0,{60 + uid % 71}.0,u{uid},d{uid}"
        )
    if kind == 9:  # sales (FIXTURES.md §1.3); repeated dates exercise replace
        day = 1 + (i // 10) % 28
        return f"sales,2016-11-{day:02d},{i % 500}"
    # fitbit (FIXTURES.md §1.1)
    uid = (i * 7) % 1000
    # uid % 20 == 11 ⇔ i ≡ 13 (mod 20), which is always a fitbit slot
    # (i % 10 == 3) — so the unknown users genuinely occur, ~5%
    user = f"u{uid}" if uid % 20 != 11 else f"ghost{uid}"
    age = (38, 39, 40, 41, 42, 25, 55, 70)[i % 8]  # breakpoint coverage
    pulse_whole = 60 + (i * 13) % 160
    frac = (0, 5)[i % 2]  # .0 / .5 — half-up rounding coverage
    minute = (i // 60) % 60
    sec = i % 60
    return (
        f"fitbit,2016-11-07 10:{minute:02d}:{sec:02d}, {user} ,"
        f"12.{9000 + i % 1000},77.{5000 + i % 1000},"
        f"{pulse_whole}.{frac},{95 + i % 11}.4,{age},"
        f"{BP_CATS[(i // 3) % 5]},{1478512345000 + i}"
    )


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        # driver-side offset-range planning, like the direct stream
        step = -(-self.n_rows // self.n_parts)
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (record_line(i),)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsperbatch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["index"]
        hi = lo + self.rows_per_batch
        return iter([(record_line(i),) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a committed range — the exactly-once
        # recovery path (called after restart for uncommitted batches)
        return iter([(record_line(i),) for i in range(start["index"], end["index"])])


class IotRecordsDataSource(DataSource):
    """``format("iot_records")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "iot_records"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema: StructType) -> _BatchReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the data source on a session."""
    spark.dataSource.register(IotRecordsDataSource)
