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


# ---------------------------------------------------------------------------
# Z-order (Morton) locality — one SQL text, two engines
# ---------------------------------------------------------------------------

from iot_sparkstreaming_spark.io.maintenance import zvalue_sql  # noqa: E402

#: Morton code of (user_id, floor(value)) in their low 16 bits; the
#: coarse bucket is the top byte of the 32-bit z-value. The SAME text
#: runs on Spark and DuckDB — both engines share 64-bit `&`, `|`, `<<`
#: semantics, so the interleave is bitwise identical.
ZORDER_LOCALITY_SQL = f"""
WITH z AS (
  SELECT user_id,
    CAST(FLOOR(value) AS BIGINT) AS vb,
    {zvalue_sql("(user_id & 65535)", "(CAST(FLOOR(value) AS BIGINT) & 65535)")}
      AS zval
  FROM events
)
SELECT CAST(zval >> 24 AS BIGINT) AS zbucket,
  COUNT(*) AS n_rows,
  CAST(MIN(user_id) AS BIGINT) AS min_user,
  CAST(MAX(user_id) AS BIGINT) AS max_user,
  CAST(MIN(vb) AS BIGINT) AS min_vb,
  CAST(MAX(vb) AS BIGINT) AS max_vb
FROM z
GROUP BY zbucket
"""


@register("zorder_locality_events", oracle=ZORDER_LOCALITY_SQL)
def zorder_locality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout computation as a checkable query: Morton-
    interleave (user_id, floor(value)) and report, per coarse z-range
    bucket, the row count and the min/max of BOTH dimensions — the
    exact per-file footer statistics a Z-ORDERED rewrite
    (io/maintenance.py ``zorder_rewrite``) would produce, and the
    evidence that each z-range covers a bounded rectangle of the key
    space (which is why min/max pruning then works for filters on
    either dimension, not just the leading sort key).

    The interleave is the public "binary magic numbers" bit spread —
    pure 64-bit integer ops, so the identical SQL text runs on both
    engines and the z-values are bitwise identical. Scale: map-only
    expression + one hash aggregate; the rewrite itself adds one
    range exchange (repartitionByRange on the z-value)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(ZORDER_LOCALITY_SQL)


# ---------------------------------------------------------------------------
# Window functions through the SQL front-end — one text, two engines
# ---------------------------------------------------------------------------

TOP_SPENDERS_SQL = """
SELECT c_mktsegment, c_custkey, total_cents, spend_rank
FROM (
  SELECT c_mktsegment, c_custkey,
    CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
      AS total_cents,
    RANK() OVER (
      PARTITION BY c_mktsegment
      ORDER BY SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) DESC, c_custkey
    ) AS spend_rank
  FROM customer
  JOIN orders ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
) ranked
WHERE spend_rank <= 10
"""


@register("sql_top_spenders_per_segment", oracle=TOP_SPENDERS_SQL)
def sql_top_spenders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lifetime spend per market segment, written
    as ONE SQL text that runs verbatim on Spark and DuckDB — the SQL
    surface's window-function proof point (the other two cover
    join/EXTRACT aggregation and bit-twiddling scalar chains): a
    RANK() window directly over a grouped aggregate, a derived-table
    subquery, and rank predicate pushout, all inside the shared ANSI
    subset. Spend is summed in DECIMAL(38,0) exact cents and cast to
    BIGINT, so the rank order — including the c_custkey tie-break —
    is bit-deterministic on both engines.

    Plan shape: one shuffle for the (segment, customer) aggregate,
    one segment-partitioned rank window over the aggregated (tiny)
    table; RANK keeps ties so the result is order-insensitive.
    """
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(TOP_SPENDERS_SQL)


# ---------------------------------------------------------------------------
# Correlated subqueries: scalar-agg decorrelation + EXISTS semi-join
# ---------------------------------------------------------------------------

ABOVE_SEGMENT_AVG_SQL = """
WITH spend AS (
  SELECT c.c_custkey, c.c_mktsegment,
    CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
      AS BIGINT) AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
)
SELECT s.c_custkey, s.c_mktsegment, s.cents
FROM spend s
WHERE s.cents * (SELECT COUNT(*) FROM spend t
                 WHERE t.c_mktsegment = s.c_mktsegment)
      > (SELECT SUM(t.cents) FROM spend t
         WHERE t.c_mktsegment = s.c_mktsegment)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = s.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


@register("sql_above_segment_average", oracle=ABOVE_SEGMENT_AVG_SQL)
def sql_above_segment_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers spending ABOVE their segment's average who also have
    an urgent order — ONE SQL text, two engines, exercising the two
    correlated-subquery shapes the rest of the SQL surface doesn't:
    a correlated SCALAR AGGREGATE subquery (twice — count and sum
    over the sibling rows of the outer row's segment) and a
    correlated EXISTS semi-join. Catalyst must DECORRELATE both
    (rewrite to a grouped join + left-semi join) for this to run at
    all, so the query is a parser-to-optimizer proof point, not just
    an answer check. The average comparison is CROSS-MULTIPLIED
    (cents·n > Σcents) so it stays in exact bigints — no AVG double.

    Plan shape after decorrelation: the spend CTE aggregates once;
    the two scalar subqueries collapse into ONE segment-level
    aggregate joined back (5 rows, broadcast); EXISTS becomes a
    left-semi join on o_custkey against the priority-filtered orders
    scan (filter pushed to parquet). Nothing here scales worse than
    the spend rollup itself.
    """
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(ABOVE_SEGMENT_AVG_SQL)


# ---------------------------------------------------------------------------
# Recursive CTE: data-driven month spine with zero-filled gap months
# ---------------------------------------------------------------------------

#: WITH RECURSIVE is new in Spark 4.0 (SPARK-24497); DuckDB has had it
#: for years — so the identical text below is runnable on both engines
#: only because the anchor/step/termination stay inside the shared ANSI
#: recursion subset: a plain-CTE anchor, one self-reference in the
#: step, the bound CARRIED AS A COLUMN (a scalar subquery in the step
#: re-evaluates per iteration on Spark — 80 extra orders scans; a
#: carried column is row arithmetic). The recursion steps by YEAR and a
#: 12-row VALUES table expands months: each UnionLoop iteration is a
#: scheduled mini-job on Spark, so depth-7 recursion × 12-way expansion
#: beats depth-80 recursion ~4× in wall clock at identical output.
#: DATE_TRUNC returns TIMESTAMP on Spark but DATE on DuckDB, and
#: DATE + INTERVAL returns TIMESTAMP on DuckDB but DATE on Spark — both
#: are CAST ... AS DATE so the spine is the same type on both sides.
MONTH_SPINE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(DATE_TRUNC('year', MIN(o_orderdate)) AS DATE) AS ylo,
         CAST(DATE_TRUNC('year', MAX(o_orderdate)) AS DATE) AS yhi,
         CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS DATE) AS mlo,
         CAST(DATE_TRUNC('month', MAX(o_orderdate)) AS DATE) AS mhi
  FROM orders
),
years(y, yhi) AS (
  SELECT ylo, yhi FROM bounds
  UNION ALL
  SELECT CAST(y + INTERVAL 1 YEAR AS DATE), yhi FROM years WHERE y < yhi
),
months AS (
  SELECT CAST(y + (k - 1) * INTERVAL 1 MONTH AS DATE) AS m
  FROM years CROSS JOIN (
    VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12)
  ) AS twelve(k)
  CROSS JOIN bounds
  WHERE CAST(y + (k - 1) * INTERVAL 1 MONTH AS DATE) BETWEEN mlo AND mhi
),
rev AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
    COUNT(*) AS n_orders,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 480000
  GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
)
SELECT months.m AS month_start,
  CAST(COALESCE(rev.n_orders, 0) AS BIGINT) AS n_orders,
  CAST(COALESCE(rev.cents, 0) AS BIGINT) AS revenue_cents
FROM months LEFT JOIN rev ON rev.m = months.m
"""


@register("sql_recursive_month_spine", oracle=MONTH_SPINE_SQL)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled monthly revenue of high-value urgent orders over a
    RECURSIVE-CTE month spine — ONE SQL text, two engines, proving the
    SQL surface's newest entry point: Spark 4's ``WITH RECURSIVE``
    (the other four texts cover join/EXTRACT, bit-twiddling scalars,
    windows-over-aggregates, and correlated decorrelation). The spine
    is DATA-DRIVEN (anchor = min order month, termination = a scalar
    subquery on the max), so a reporting month with zero qualifying
    orders still appears with explicit zeros — the absence-is-a-row
    semantics every calendar dashboard needs and a bare GROUP BY
    cannot produce (~19 of 80 months are gaps at the sf0.01 cutoff).
    Revenue rides exact bigint cents.

    Scale shape: recursion depth = #distinct YEARS (single digits;
    months come from a 12-row VALUES expansion — see the module
    comment for why depth is the cost driver), every step one row —
    driver-trivial and INDEPENDENT of table size; the spine is tiny
    so the LEFT join against the revenue rollup broadcasts, and that
    rollup's one exchange is the only real shuffle; the
    priority+price filter pushes to the parquet scan.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(MONTH_SPINE_SQL)


#: one SQL text, two engines — ANSI UNPIVOT (wide metrics -> long)
UNPIVOT_METRICS_SQL = """
WITH wide AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS clicks,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS views,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS purchases,
    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
      AS errors
  FROM events
  GROUP BY user_id
)
SELECT user_id, metric, n
FROM wide
UNPIVOT (n FOR metric IN (clicks, views, purchases, errors))
"""


@register("sql_unpivot_user_metrics", oracle=UNPIVOT_METRICS_SQL)
def sql_unpivot_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the wide→long melt that turns a per-user metrics
    matrix (one column per event type) back into tidy
    ``(user_id, metric, n)`` rows, the shape every feature store and
    metrics warehouse ingests. The relational pivot direction is
    covered by ``pivot_priority_by_status``; this closes the inverse.
    The SAME SQL text (standard ``UNPIVOT (val FOR name IN (...))``)
    parses and runs on both engines, so the check covers grammar and
    name-scoping, not just values.

    Scale shape: the CTE is one hash aggregate (5-way conditional
    count, map-side partial); UNPIVOT itself is a narrow generator —
    4 output rows per input row, zero shuffle, no state — so the
    long table streams out of the aggregate exchange. Fully expanded
    it is 4× the user count, never materialized on the driver.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(UNPIVOT_METRICS_SQL)


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL — the modern-dialect shorthand, one text
# ---------------------------------------------------------------------------

GROUP_BY_ALL_SQL = """
SELECT event_type,
  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY ALL
HAVING COUNT(*) > 5
ORDER BY ALL
"""


@register("sql_group_by_all", oracle=GROUP_BY_ALL_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` + ``HAVING`` — the
    modern-dialect shorthand both engines adopted (Spark 4 and DuckDB
    infer the grouping set as every non-aggregate select item, and
    ORDER BY ALL sorts by the full select list left-to-right) — run
    from ONE text on both, so what's being checked is that the two
    PARSERS infer the same implicit grouping and ordering, the
    sharpest dialect-parity claim in this module after the recursive
    CTE. The distinct-count rides the same exchange as the grouped
    count; HAVING prunes after the final agg.

    Scale shape: an ordinary two-phase hash agg on (type, hour) —
    the dialect sugar desugars to exactly the plan the explicit
    GROUP BY writes, which `docs/PLANS.md` shows.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(GROUP_BY_ALL_SQL)
