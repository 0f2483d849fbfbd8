"""File-format edges: lossless round-trips for every supported
format, and partition-directory pruning visible in the scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sparkstreaming_spark.io.bucketing import explain_str
from iot_sparkstreaming_spark.io.formats import FORMATS, read_table, write_table
from iot_sparkstreaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_DIR, "nation")


@pytest.mark.parametrize("fmt", sorted(FORMATS))
def test_round_trip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / fmt)
    write_table(nation, path, fmt)
    # CSV surfaces everything as strings unless a schema is given —
    # pass the source schema so the round-trip is type-preserving.
    back = read_table(spark, path, fmt, schema=nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_text_formats_demand_schema(spark, tmp_path, nation):
    path = str(tmp_path / "j")
    write_table(nation, path, "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "json")


def test_partitioned_write_prunes_directories(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_table(orders, path, "parquet", partition_by=["o_year"])
    scan = read_table(spark, path, "parquet").filter(F.col("o_year") == 1997)
    plan = explain_str(scan)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # pruned read returns exactly the 1997 slice
    expected = orders.filter(F.col("o_year") == 1997).count()
    assert scan.count() == expected > 0


def test_schema_evolution_merge(spark, tmp_path):
    """Lake reality: files written before a column existed live next
    to files written after. mergeSchema unifies them — old rows read
    null for the new column, and per-file pruning is unaffected."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    v2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    v1.write.parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_zorder_rewrite_roundtrip_and_locality(spark, tmp_path):
    """Z-ordered rewrite is lossless, and each output file covers a
    bounded rectangle of the key space: the per-file min/max spans of
    BOTH dimensions must be far below the global span (the property
    that makes footer-stats pruning work on either filter column)."""
    from iot_sparkstreaming_spark.io.maintenance import zorder_rewrite
    from iot_sparkstreaming_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "events_z")
    zorder_rewrite(ev, "(user_id & 65535)", "(CAST(FLOOR(value) AS BIGINT) & 65535)", path, files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(c for c in back.columns) == sorted(ev.columns)

    import pyarrow.parquet as pq
    from pathlib import Path

    globals_ = ev.agg(
        F.max("user_id").cast("double") - F.min("user_id"),
        F.max(F.floor("value")) - F.min(F.floor("value")),
    ).collect()[0]
    gspan_u, gspan_v = float(globals_[0]), float(globals_[1])
    spans = []
    for f in Path(path).glob("*.parquet"):
        t = pq.read_table(f, columns=["user_id", "value"])
        u = t.column("user_id").to_pylist()
        v = [int(x) for x in t.column("value").to_pylist()]
        if u:
            spans.append(((max(u) - min(u)) / gspan_u, (max(v) - min(v)) / gspan_v))
    assert len(spans) >= 4
    # average rectangle area well under the full key space
    avg_area = sum(su * sv for su, sv in spans) / len(spans)
    assert avg_area < 0.5, spans
