"""Bucketed managed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of lineitem ⋈ orders is the shuffle of
both fact tables. Bucketing pre-partitions each table by the join key
at WRITE time (``bucketBy(n, key)``), so every future join/aggregate
on that key reads co-located buckets and skips the exchange entirely
— the write-once-join-many trade a warehouse makes for its hot keys.

Mechanics (all built-in Spark):
* ``write_bucketed`` saves a managed bucketed+sorted table; equal
  bucket counts on both sides let the planner use bucket info.
* joins between tables bucketed on their join keys with the same
  bucket count plan as SortMergeJoin with NO Exchange on either side
  (verified by ``assert_no_exchange`` in tests) — at cluster scale
  that removes the two largest shuffles a TPC-H-shaped workload has.
* aggregations keyed on the bucket column likewise skip their
  exchange.

Bucket count sizing: buckets ≈ total_table_bytes / target_partition
(128-256 MB) — a config decision per deployment, parameterized here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Save ``df`` as a managed bucketed table (overwrite).

    Sorting within buckets (``sortBy``) additionally lets sort-merge
    joins skip their per-task sort, and gives range-clustered scans.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_fact_tables(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 32,
    prefix: str = "bkt",
) -> tuple[str, str]:
    """Materialize lineitem and orders bucketed by their join key
    (orderkey) with equal bucket counts; returns the table names.
    The one-time bucketing shuffle replaces every future join
    shuffle on the key."""
    from iot_sparkstreaming_spark.tables import load_table

    li_t, ord_t = f"{prefix}_lineitem", f"{prefix}_orders"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), li_t, ["l_orderkey"], n_buckets,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"), ord_t, ["o_orderkey"], n_buckets,
        sort_cols=["o_orderkey"],
    )
    return li_t, ord_t


def explain_str(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
