"""Python UDTF record exploding + small-file compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from iot_sparkstreaming_spark.io.maintenance import compact
from iot_sparkstreaming_spark.operators.udtf import ExplodeRecord
from iot_sparkstreaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_udtf_explodes_csv_records(spark):
    df = spark.createDataFrame(
        [("fitbit, 2016-11-07 10:00:00 ,u1,12.9",), ("sales,2016-11-07,5",)],
        ["line"],
    )
    rows = sorted(
        (r.tag, r.field_index, r.field_value)
        for r in df.lateralJoin(ExplodeRecord(F.col("line").outer())).collect()
    )
    assert rows == [
        ("fitbit", 1, "2016-11-07 10:00:00"),
        ("fitbit", 2, "u1"),
        ("fitbit", 3, "12.9"),
        ("sales", 1, "2016-11-07"),
        ("sales", 2, "5"),
    ]


def test_compact_reduces_file_count_losslessly(spark, tmp_path):
    src, out = str(tmp_path / "fragmented"), str(tmp_path / "compacted")
    orders = load_table(spark, SF_DIR, "orders")
    orders.repartition(40).write.parquet(src)  # simulate small-file buildup
    assert len(glob.glob(f"{src}/part-*")) == 40

    n = compact(spark, src, out, target_bytes=10 * 1024 * 1024, sort_cols=["o_orderkey"])
    assert n < 40
    assert len(glob.glob(f"{out}/part-*")) == n
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, orders.collect()))
    assert a == b


def test_delete_keys_propagates_takedowns(spark, tmp_path):
    src, out = str(tmp_path / "docs"), str(tmp_path / "docs_clean")
    docs = load_table(spark, SF_DIR, "documents")
    docs.write.parquet(src)
    doomed = spark.createDataFrame([(1,), (2,), (3,), (999999,)], ["doc_id"])
    from iot_sparkstreaming_spark.io.maintenance import delete_keys

    before, after = delete_keys(spark, src, out, doomed, "doc_id")
    assert before - after == 3  # 999999 doesn't exist; 3 real rows removed
    remaining = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert remaining.isdisjoint({1, 2, 3})
