"""The keyed_files Python DataSource writer: Cassandra-style keyed
upsert through the standard df.write API — LWW by version, exactly
-once commit (orphan staging files ignored), deterministic tie-break
independent of partition/arrival order."""

from __future__ import annotations

import os

import pytest

from iot_sparkstreaming_spark.io import keyed_sink


@pytest.fixture(autouse=True)
def _register(spark):
    keyed_sink.register(spark)


def _write(spark, path, rows, mode="append", version="v"):
    df = spark.createDataFrame(rows, ["user_id", "city", "v"])
    w = df.write.format("keyed_files").mode(mode).option("path", str(path)).option(
        "key", "user_id"
    )
    if version:
        w = w.option("version", version)
    w.save()


def test_upsert_lww_across_batches(spark, tmp_path):
    _write(spark, tmp_path, [("u1", "rome", 1), ("u2", "oslo", 1)])
    _write(spark, tmp_path, [("u1", "lima", 2), ("u3", "kiev", 1)])
    got = {r["user_id"]: (r["city"], r["v"]) for r in keyed_sink.read_table(str(tmp_path))}
    assert got == {"u1": ("lima", 2), "u2": ("oslo", 1), "u3": ("kiev", 1)}


def test_stale_version_does_not_overwrite(spark, tmp_path):
    _write(spark, tmp_path, [("u1", "rome", 5)])
    _write(spark, tmp_path, [("u1", "lima", 3)])  # older version arrives late
    got = {r["user_id"]: r["city"] for r in keyed_sink.read_table(str(tmp_path))}
    assert got == {"u1": "rome"}


def test_overwrite_mode_replaces_table(spark, tmp_path):
    _write(spark, tmp_path, [("u1", "rome", 1), ("u2", "oslo", 1)])
    _write(spark, tmp_path, [("u9", "bonn", 1)], mode="overwrite")
    got = {r["user_id"] for r in keyed_sink.read_table(str(tmp_path))}
    assert got == {"u9"}


def test_orphan_staging_file_is_ignored(spark, tmp_path):
    """Exactly-once commit: a staged file from a zombie/retried task
    (present on disk, never reported in a commit message) must NOT be
    merged — and is cleaned up."""
    staging = tmp_path / keyed_sink.STAGING_DIR
    staging.mkdir(parents=True)
    (staging / "part-zombie.jsonl").write_text(
        '{"city": "atlantis", "user_id": "ghost", "v": 99}\n'
    )
    _write(spark, tmp_path, [("u1", "rome", 1)])
    got = {r["user_id"] for r in keyed_sink.read_table(str(tmp_path))}
    assert got == {"u1"}
    assert os.listdir(staging) == []


def test_same_version_tiebreak_is_partition_order_independent(spark, tmp_path):
    """Two rows, same key, same version, different payloads: the
    survivor is the lexicographically-last JSON — identical whichever
    partition commits first."""
    rows = [("u1", "aaaa", 1), ("u1", "zzzz", 1)]
    _write(spark, tmp_path, rows)
    first = keyed_sink.read_table(str(tmp_path))

    alt = tmp_path / "alt"
    df = (
        spark.createDataFrame(list(reversed(rows)), ["user_id", "city", "v"])
        .repartition(2)
    )
    df.write.format("keyed_files").mode("append").option("path", str(alt)).option(
        "key", "user_id"
    ).option("version", "v").save()
    assert keyed_sink.read_table(str(alt)) == first
    assert first[0]["city"] == "zzzz"


def test_streaming_keyed_upsert_per_microbatch(spark, tmp_path):
    """writeStream.format('keyed_files'): each micro-batch commits a
    keyed upsert — the reference's foreachRDD -> Cassandra shape —
    and late batches upsert over earlier ones."""
    import pyspark.sql.functions as F

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    spark.createDataFrame(
        [("u1", "rome", 1), ("u2", "oslo", 1)], ["user_id", "city", "v"]
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("user_id string, city string, v long").parquet(
        str(src / "*.parquet")
    )
    q = (
        stream.writeStream.format("keyed_files")
        .option("path", str(out))
        .option("key", "user_id")
        .option("version", "v")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {r["user_id"]: r["city"] for r in keyed_sink.read_table(str(out))}
        spark.createDataFrame(
            [("u1", "lima", 2), ("u3", "kiev", 1)], ["user_id", "city", "v"]
        ).coalesce(1).write.parquet(str(src / "b1.parquet"))
        q.processAllAvailable()
        end = {r["user_id"]: (r["city"], r["v"]) for r in keyed_sink.read_table(str(out))}
    finally:
        q.stop()
    assert mid == {"u1": "rome", "u2": "oslo"}
    assert end == {"u1": ("lima", 2), "u2": ("oslo", 1), "u3": ("kiev", 1)}


def _stream_writer(path, merge="lww"):
    from iot_sparkstreaming_spark.io.keyed_sink import _KeyedStreamWriter

    return _KeyedStreamWriter(
        {"path": str(path), "key": "user_id", "merge": merge}
    )


def _stage_rows(writer, rows):
    from pyspark.sql import Row

    return writer.write(iter([Row(**r) for r in rows]))


def test_stream_replayed_batch_is_skipped_exactly_once(spark, tmp_path):
    """Transactional epoch dedup: re-committing the SAME batchId (the
    engine's replay-after-restart path) must change nothing — even in
    additive-merge mode, where re-applying would double-add."""
    w = _stream_writer(tmp_path, merge="sum")
    m = _stage_rows(w, [{"user_id": "u1", "n": 5}])
    w.commit([m], 7)
    # replay of batch 7 (same data re-staged, engine re-ran the batch)
    m2 = _stage_rows(w, [{"user_id": "u1", "n": 5}])
    w.commit([m2], 7)
    got = keyed_sink.read_table(str(tmp_path))
    assert got == [{"user_id": "u1", "n": 5}]


def test_stream_additive_merge_maintains_running_aggregate(spark, tmp_path):
    """merge='sum': the sink is an incremental materialized view —
    numeric fields add per key across batches, new keys insert."""
    w = _stream_writer(tmp_path, merge="sum")
    w.commit([_stage_rows(w, [{"user_id": "u1", "n": 5}, {"user_id": "u2", "n": 1}])], 0)
    w.commit([_stage_rows(w, [{"user_id": "u1", "n": 3}, {"user_id": "u3", "n": 2}])], 1)
    got = {r["user_id"]: r["n"] for r in keyed_sink.read_table(str(tmp_path))}
    assert got == {"u1": 8, "u2": 1, "u3": 2}


def test_stream_additive_merge_within_one_batch(spark, tmp_path):
    """Two tasks of the SAME batch carrying the same key: their
    contributions add (partial aggregates per partition)."""
    w = _stream_writer(tmp_path, merge="sum")
    m1 = _stage_rows(w, [{"user_id": "u1", "n": 5}])
    m2 = _stage_rows(w, [{"user_id": "u1", "n": 4}])
    w.commit([m1, m2], 0)
    assert keyed_sink.read_table(str(tmp_path)) == [{"user_id": "u1", "n": 9}]
