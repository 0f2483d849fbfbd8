"""Salting correctness: salted two-stage results must equal the
unsalted single-stage results exactly (decimal accumulation makes the
sums order-independent, so equality is bitwise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sparkstreaming_spark.operators.skew import salted_join, salted_sum_count
from iot_sparkstreaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    salted = {
        r.l_returnflag: (r.sum_value, r.n_rows)
        for r in salted_sum_count(
            li, ["l_returnflag"], "l_quantity", salt_from="l_orderkey"
        ).collect()
    }
    plain = {
        r.l_returnflag: (r.sum_value, r.n_rows)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,4)"))
            .cast("double")
            .alias("sum_value"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "l_orderkey", salt_from="l_quantity", n_salts=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count() > 0
    # exact multiset equality on a sample of columns
    a = sorted(map(tuple, salted.select("l_orderkey", "o_orderpriority").collect()))
    b = sorted(map(tuple, plain.select("l_orderkey", "o_orderpriority").collect()))
    assert a == b
