"""Regression tests for the events.ts load path (tables.load_table).

The harness testdata's ``events.ts`` physical type has changed between
rounds — TIMESTAMP(NANOS) in round 1, ``timestamp[us]`` by round 3 — and
each change broke the hard-coded assumption of the moment (r1:
session-conf portability, r3: dtype). These tests pin the contract:
``load_table(..., "events")`` must yield a ``timestamp`` (session-TZ)
``ts`` column with identical micros-precision instants from EVERY
physical encoding the environment has shipped:

* parquet TIMESTAMP(NANOS)  (surfaced as bigint via nanosAsLong)
* parquet TIMESTAMP(MICROS), isAdjustedToUTC=false  (reads as NTZ)
* parquet TIMESTAMP(MICROS), isAdjustedToUTC=true   (reads as timestamp)
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iot_sparkstreaming_spark.tables import load_table

UTC = datetime.timezone.utc
# Instants with sub-millisecond micros to catch precision loss.
INSTANTS_US = [1_704_067_200_123_456, 1_704_067_260_000_001, 1_735_689_599_999_999]
EXPECTED = [
    datetime.datetime.fromtimestamp(us / 1e6, tz=UTC).replace(tzinfo=None)
    for us in INSTANTS_US
]


def _base_columns(n):
    return {
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.5] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    }


def _write_events(dirpath, ts_array):
    cols = _base_columns(len(INSTANTS_US))
    table = pa.table(
        {
            "event_id": cols["event_id"],
            "ts": ts_array,
            "user_id": cols["user_id"],
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }
    )
    (dirpath / "events.parquet").mkdir()
    pq.write_table(
        table, str(dirpath / "events.parquet" / "part-0.parquet"), version="2.6"
    )
    return str(dirpath)


@pytest.fixture(
    params=["nanos", "micros_ntz", "micros_utc"],
    ids=["timestamp-nanos", "timestamp-us-ntz", "timestamp-us-utc"],
)
def events_dir(request, tmp_path):
    if request.param == "nanos":
        arr = pa.array([us * 1000 for us in INSTANTS_US], pa.timestamp("ns"))
    elif request.param == "micros_ntz":
        arr = pa.array(INSTANTS_US, pa.timestamp("us"))
    else:
        arr = pa.array(INSTANTS_US, pa.timestamp("us", tz="UTC"))
    return _write_events(tmp_path, arr)


def test_events_ts_dtype_adaptive(spark, events_dir):
    df = load_table(spark, events_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == EXPECTED


def test_events_stream_dtype_adaptive(spark, events_dir):
    """The streaming source must normalize every physical encoding the
    batch loader does — same dtype-drift risk, same contract."""
    from iot_sparkstreaming_spark.io.sources import events_stream

    stream = events_stream(spark, events_dir)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
    name = f"ev_dtype_{abs(hash(events_dir)) % 10**8}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [
        r.ts
        for r in spark.sql(f"SELECT ts FROM {name} ORDER BY event_id").collect()
    ]
    assert got == EXPECTED
