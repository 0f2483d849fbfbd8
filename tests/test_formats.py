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
