"""operators/prefix.two_level_prefix must reproduce the single-window
rank/prefix EXACTLY — shard boundaries cancel out of the offset
reconstruction — including the cases the sharded form could silently
break: negative measures (per-shard totals must be true sums, not
max-of-prefix), duplicate order values straddling a would-be shard
edge, a constant order column (one shard; still correct), NULL order
values (must sort first, as NULLS FIRST window order does), NULL
measures (running sum must be NULL until the first non-null anywhere
in the key — not 0, and not poisoned by a NULL shard offset), plus
the input_bytes gate (single-window plan below SHARD_MIN_BYTES,
identical rows on both sides) and the reserved-name guard."""

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


@pytest.fixture(scope="module")
def null_data(spark):
    # NULL order values on every key (incl. ties among the NULLs),
    # NULL measures arranged so ENTIRE leading shards of key "a" are
    # all-null (the offset-poisoning case from the round-10 advice):
    # key "a" rows with v < 40 all carry m = NULL, so the first
    # non-null mass arrives mid-key and every earlier prefix must be
    # NULL, not 0 and not NULL+offset.
    rows = []
    for i in range(400):
        k = "ab"[i % 2]
        v = None if i % 11 == 0 else float((i * 37) % 101)
        m = None if (k == "a" and (v is None or v < 40.0)) or i % 13 == 0 else (
            ((-1) ** i) * ((i * 13) % 29)
        )
        rows.append((k, i, v, m))
    return spark.createDataFrame(rows, "k string, tid long, v double, m long")


def test_null_order_and_null_measures_match_window(spark, null_data):
    got = two_level_prefix(
        spark, null_data, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")},
    ).select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    assert _rows(got) == _rows(_reference(null_data))


def test_all_null_order_column(spark, null_data):
    allnull = null_data.withColumn("v", F.lit(None).cast("double"))
    got = two_level_prefix(
        spark, allnull, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")},
    ).select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    assert _rows(got) == _rows(_reference(allnull))


def test_input_bytes_gate_single_window_parity(spark, data):
    from iot_sparkstreaming_spark.operators.prefix import SHARD_MIN_BYTES

    small = two_level_prefix(
        spark, data, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")}, input_bytes=SHARD_MIN_BYTES - 1,
    )
    # gated plan must not contain the shard machinery (no crossJoin
    # with the bounds aggregate) and must match the window reference
    assert "_shard" not in small.schema.simpleString()
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got = small.select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    assert _rows(got) == _rows(_reference(data))
    # at/above the gate (and when size is unknown = None) it shards
    big = two_level_prefix(
        spark, data, part="k", order_num=col("v"), tiebreaks=["tid"],
        measures={"m": col("m")}, input_bytes=SHARD_MIN_BYTES,
    )
    assert _rows(got) == _rows(
        big.select("k", "tid", "rn", "n", "m_pfx", "m_tot")
    )


def test_reserved_column_names_rejected(spark, data):
    with pytest.raises(ValueError, match="reserves column names"):
        two_level_prefix(
            spark, data.withColumn("n", F.lit(1)),
            part="k", order_num=col("v"), tiebreaks=["tid"],
        )
    with pytest.raises(ValueError, match="reserves column names"):
        two_level_prefix(
            spark, data.withColumn("m_pfx", F.lit(1)),
            part="k", order_num=col("v"), tiebreaks=["tid"],
            measures={"m": col("m")},
        )
