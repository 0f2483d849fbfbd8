"""Custom Python DataSource (iot_records): partition planning,
determinism, replay contract, and end-to-end parse through the
reference pipelines — the broker-less Kafka-edge twin."""

from __future__ import annotations

from iot_sparkstreaming_spark.io.datasource import (
    IotRecordsDataSource,
    _StreamReader,
    record_line,
    register,
)
from iot_sparkstreaming_spark.io.sources import parse_csv_records
from iot_sparkstreaming_spark.schemas import FITBIT_SCHEMA
from iot_sparkstreaming_spark.streaming.pipelines import warning_pipeline


def test_batch_read_partitioned_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("iot_records")
        .option("numRows", 200)
        .option("numPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows1 = sorted(r.value for r in df.collect())
    rows2 = sorted(r.value for r in df.collect())
    assert rows1 == rows2 and len(rows1) == 200
    assert rows1 == sorted(record_line(i) for i in range(200))


def test_batch_lines_parse_through_warning_pipeline(spark):
    register(spark)
    lines = spark.read.format("iot_records").option("numRows", 500).load()
    fitbit = parse_csv_records(lines, FITBIT_SCHEMA, "fitbit")
    n_fitbit = fitbit.count()
    assert n_fitbit == 400  # 8 of every 10 records
    # trim fidelity: user ids arrive padded (" u.. ") and parse clean
    assert all(r.user_id == r.user_id.strip() for r in fitbit.limit(20).collect())
    out = warning_pipeline(fitbit)
    rows = out.collect()
    assert 0 < len(rows) < n_fitbit  # classifier fired and filtered
    assert all(r.payload == f"({r.user_id},{r.warning},{r.machine_timestamp})" for r in rows)


def test_stream_reader_replay_is_exact(spark):
    r = _StreamReader({"rowsperbatch": "37"})
    o0 = r.initialOffset()
    it1, o1 = r.read(o0)
    batch1 = list(it1)
    assert o1 == {"index": 37} and len(batch1) == 37
    # the replay path must regenerate the committed range bit-identically
    assert list(r.readBetweenOffsets(o0, o1)) == batch1
    it2, o2 = r.read(o1)
    assert list(it2)[0] == (record_line(37),) and o2 == {"index": 74}


def test_streaming_source_feeds_microbatches(spark, tmp_path):
    register(spark)
    lines = (
        spark.readStream.format("iot_records")
        .option("rowsPerBatch", 50)
        .load()
    )
    fitbit = parse_csv_records(lines, FITBIT_SCHEMA, "fitbit")
    seen: list[int] = []
    q = (
        warning_pipeline(fitbit)
        .writeStream.foreachBatch(lambda b, _id: seen.append(b.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and sum(seen) == 0:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sum(seen) > 0


def test_source_name_and_schema():
    assert IotRecordsDataSource.name() == "iot_records"
    assert IotRecordsDataSource({}).schema() == "value string"


def test_streaming_observe_expectation_metrics(spark, tmp_path):
    """Data-quality rules as STREAMING metrics: df.observe() counts
    rule violations inside each micro-batch (no extra pass, no extra
    query), surfaced through the progress observedMetrics — the
    monitoring half of operators/quality.py on the streaming rail."""
    from pyspark.sql import functions as F

    register(spark)
    lines = (
        spark.readStream.format("iot_records").option("rowsPerBatch", 80).load()
    )
    fitbit = parse_csv_records(lines, FITBIT_SCHEMA, "fitbit")
    observed = fitbit.observe(
        "quality",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("pulse") >= 0, 0).otherwise(1)).alias("viol_pulse_nonneg"),
        F.sum(F.when(F.col("user_id").rlike("^u[0-9]+$"), 0).otherwise(1)).alias(
            "viol_known_user"
        ),
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        metrics = None
        deadline = time.time() + 60
        while time.time() < deadline and metrics is None:
            p = q.lastProgress
            if p and p.get("observedMetrics", {}).get("quality"):
                metrics = p["observedMetrics"]["quality"]
            time.sleep(0.5)
    finally:
        q.stop()
    assert metrics is not None
    assert metrics["n_rows"] > 0
    assert metrics["viol_pulse_nonneg"] == 0
    assert metrics["viol_known_user"] > 0  # the ~5% ghost users


def test_stream_restart_resumes_from_committed_offset(spark, tmp_path):
    """Exactly-once source contract across a REAL restart: run the
    iot_records stream against a checkpoint, stop it, start a fresh
    query on the SAME checkpoint, and prove the offset ledger governs
    recovery — any batch replayed after restart (at-least-once
    foreachBatch) regenerates byte-identical data for its batch id,
    and the union of batches covers a contiguous, gap-free index
    range. This is the direct-stream recovery semantics the reference
    relied on Kafka offsets for, reproduced by readBetweenOffsets."""
    import time

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    batches: dict[int, list[str]] = {}

    def run_once(min_batches: int) -> None:
        lines = (
            spark.readStream.format("iot_records")
            .option("rowsPerBatch", 40)
            .load()
        )
        q = (
            lines.writeStream.foreachBatch(
                lambda b, bid: batches.setdefault(bid, sorted(r.value for r in b.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and len(batches) < min_batches:
                time.sleep(0.3)
        finally:
            q.stop()

    run_once(3)
    n_first = len(batches)
    assert n_first >= 3

    first_run = {bid: rows[:] for bid, rows in batches.items()}
    run_once(n_first + 2)

    # replayed batch ids regenerate identical data (deterministic
    # readBetweenOffsets — the idempotent-replay contract)
    for bid, rows in first_run.items():
        assert batches[bid] == rows

    # the offset ledger is gap-free: batches tile the index range
    all_lines = [v for rows in batches.values() for v in rows]
    assert len(all_lines) == len(set(all_lines))  # no cross-batch overlap
    expected = sorted(record_line(i) for i in range(len(all_lines)))
    assert sorted(all_lines) == expected
