"""Bucketed co-located joins: the join on the bucket key must plan
WITHOUT a shuffle (no Exchange on either side), and still produce
exactly the same rows as the plain parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_sparkstreaming_spark.io.bucketing import bucketed_fact_tables, explain_str
from iot_sparkstreaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # At test SF the planner would auto-broadcast the small side and
    # ignore bucketing; disable it to get the plan both sides have at
    # 100 TB (too big to broadcast) — the case bucketing exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li_t, ord_t = bucketed_fact_tables(spark, SF_DIR, n_buckets=8, prefix="t_bkt")
    yield li_t, ord_t
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_t, ord_t = bucketed
    j = spark.table(li_t).join(
        spark.table(ord_t), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = explain_str(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_agg_on_bucket_key_has_no_exchange(spark, bucketed):
    li_t, _ = bucketed
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    plan = explain_str(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed):
    li_t, ord_t = bucketed
    bucketed_count = (
        spark.table(li_t)
        .join(spark.table(ord_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    plain_count = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed_count == plain_count > 0
