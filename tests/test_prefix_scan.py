"""operators/prefix.two_level_prefix must reproduce the single-window
rank/prefix EXACTLY — shard boundaries cancel out of the offset
reconstruction — including the cases the sharded form could silently
break: negative measures (per-shard totals must be true sums, not
max-of-prefix), duplicate order values straddling a would-be shard
edge, and a constant order column (one shard; still correct)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from iot_sparkstreaming_spark.operators.prefix import two_level_prefix


def _reference(df):
    wo = Window.partitionBy("k").orderBy("v", "tid")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("k")
    return df.select(
        "k",
        "tid",
        F.row_number().over(wo).cast("bigint").alias("rn"),
        F.count("*").over(wp).cast("bigint").alias("n"),
        F.sum("m").over(run).alias("m_pfx"),
        F.sum("m").over(wp).alias("m_tot"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def data(spark):
    # negative measures, duplicate order values, skewed keys
    rows = []
    for i in range(997):
        k = "ab"[i % 2] if i % 7 else "c"
        v = float((i * 37) % 101)  # many duplicates
        m = ((-1) ** i) * ((i * 13) % 29)  # mixed-sign measure
        rows.append((k, i, v, m))
    return spark.createDataFrame(rows, "k string, tid long, v double, m long")


def test_matches_single_window_exactly(spark, data):
    got = two_level_prefix(
        spark, data, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")},
    ).select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    assert _rows(got) == _rows(_reference(data))


def test_constant_order_column_degrades_to_one_shard(spark, data):
    one = data.withColumn("v", F.lit(5.0))
    got = two_level_prefix(
        spark, one, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")},
    ).select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    assert _rows(got) == _rows(_reference(one))


def test_rank_only_no_measures(spark, data):
    got = two_level_prefix(
        spark, data, part="k", order_num=col("v"), tiebreaks=["tid"]
    ).select("k", "tid", "rn", "n")
    want = _reference(data).select("k", "tid", "rn", "n")
    assert _rows(got) == _rows(want)
