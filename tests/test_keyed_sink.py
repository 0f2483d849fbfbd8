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
