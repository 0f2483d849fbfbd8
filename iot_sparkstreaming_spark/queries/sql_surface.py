"""SQL front-end surface: queries written as SQL TEXT and executed by
``spark.sql`` over registered views.

The reference created a SparkSession but never engaged Spark SQL
(SURVEY.md §2.8 — "zero SQL strings"). This module proves the
engine's SQL entry point with the strongest possible check: the
IDENTICAL SQL string runs on Spark and on DuckDB (the oracle is the
same text), so parsing, name resolution, and ANSI semantics agree —
not just the final numbers. Queries here are therefore restricted to
the ANSI subset both engines share (EXTRACT, CAST/DECIMAL, joins,
GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table

#: one SQL text, two engines
REGION_REVENUE_SQL = """
SELECT
  r_name,
  EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY r_name, EXTRACT(year FROM o_orderdate)
"""

_SQL_TABLES = ("region", "nation", "customer", "orders", "lineitem")


@register("sql_revenue_by_region", oracle=REGION_REVENUE_SQL)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region × year via ``spark.sql`` on temp views —
    the identical text the DuckDB oracle runs. The SQL path feeds the
    same Catalyst pipeline as the DataFrame API (same pushdown, same
    join planning under the broadcast policy), which ``explain`` on
    the returned frame shows.

    Spark's EXTRACT returns int where DuckDB returns bigint; the
    driver's comparator reprs Python ints identically, and SUM/COUNT
    use the shared decimal/bigint conventions.
    """
    for name in _SQL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(REGION_REVENUE_SQL)
