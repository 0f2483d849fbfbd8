"""TPC-H-style batch queries over the harness star schema.

The reference has **zero** aggregations, sorts, or SQL (SURVEY.md
§2.8) — these queries are the engine's batch-SQL surface, exercising
every absent category: group-by aggregation, multi-way joins,
semi/anti joins, outer joins, top-k, and scalar expression families.

Numeric determinism contract (see registry docstring): every double
SUM goes through ``decimal(38,4)`` (input columns carry ≤2 decimals)
or ``decimal(38,6)`` (products of doubles), making the aggregate exact
and order-independent, then casts back to double. Both Spark and
DuckDB compute the identical value regardless of parallelism.

Scale notes (100 TB posture):
* fact-fact joins (lineitem ⋈ orders) are shuffle hash/sort-merge on
  the join key — AQE handles skew. ``broadcast()`` hints go ONLY on
  constant-cardinality inputs (region=5, nation=25 rows, 1-row scalar
  aggregates): anything that grows with SF (customer, supplier, part,
  orders) is left unhinted so size-based planning + AQE pick broadcast
  at small SF and shuffle join at cluster scale — a hard hint on an
  SF-scaled table would OOM the build side at 100 TB.
* every query filters and projects before joining, so Catalyst pushes
  predicates/pruning into the parquet scan (verified via
  ``explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.functions import broadcast, col

from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table


def _dsum(c, scale: int = 4):
    """Order-independent double sum via exact decimal accumulation."""
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def _davg(c, scale: int = 4):
    return (F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)).cast(
        "double"
    )


# ---------------------------------------------------------------------------
# Q1 — pricing summary (flagship: full scalar+agg core in one scan)
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one parquet scan → partial (map-side) agg → final agg.

    The filter and 7-column projection push into the scan; the
    group-by has 6 groups so the shuffle is trivially small after
    partial aggregation — the 100 TB cost is the scan alone.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = col("l_extendedprice") * (1 - col("l_discount"))
    charge = disc_price * (1 + col("l_tax"))
    return (
        li.filter(col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(col("l_quantity")).alias("sum_qty"),
            _dsum(col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 6).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            _davg(col("l_quantity")).alias("avg_qty"),
            _davg(col("l_extendedprice")).alias("avg_price"),
            _davg(col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (fact-fact join + top-k)
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate_str,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dimension filter into fact joins, then
    top-10 by revenue (TakeOrderedAndProject — no global sort). No
    hint on customer (SF-scaled): AQE broadcasts it at small SF and
    shuffles at cluster scale.

    Tie-break on ``l_orderkey`` makes the LIMIT deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(cust, col("o_custkey") == col("c_custkey")),
            col("l_orderkey") == col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            "o_orderpriority",
        )
        .orderBy(col("revenue").desc(), col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (SEMI join)
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: left-semi join — the join variety the reference never
    had (SURVEY.md §2.8). Semi join avoids materializing duplicates,
    so the shuffle carries at most one row per order key.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (col("l_orderkey") == col("o_orderkey"))
            & (col("l_shipdate") > col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (5-way join through the dimension chain)
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier", oracle=Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: region→nation broadcast (constant 5/25 rows);
    supplier and customer are SF-scaled so they carry no hint — AQE
    decides. The ``c_nationkey = s_nationkey`` condition rides the
    supplier join.
    """
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    dim = supplier.join(
        broadcast(nation.join(broadcast(region), col("n_regionkey") == col("r_regionkey"))),
        col("s_nationkey") == col("n_nationkey"),
    )
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(customer, col("o_custkey") == col("c_custkey"))
        .join(
            dim,
            (col("l_suppkey") == col("s_suppkey"))
            & (col("c_nationkey") == col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue (pure scan+filter+agg; pushdown showcase)
# ---------------------------------------------------------------------------

Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate pushes to the parquet scan
    (PushedFilters on l_shipdate/l_discount/l_quantity); 3-column
    ReadSchema. The 100 TB plan is scan→partial-agg→single-row result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (col("l_discount") >= 0.05)
            & (col("l_discount") <= 0.07)
            & (col("l_quantity") < 24)
        )
        .agg(
            _dsum(col("l_extendedprice") * col("l_discount"), 6).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (join + agg + top-k per revenue)
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  n_name,
  c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20
    (deterministic tie-break on c_custkey)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(col("l_returnflag") == "R")
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(customer, col("o_custkey") == col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name", "c_mktsegment")
        .orderBy(col("revenue").desc(), col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional aggregation)
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT
  100.00 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_effect", oracle=Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional agg (CASE inside SUM) over the part
    join (unhinted — part is SF-scaled); single-row output."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = col("l_extendedprice") * (1 - col("l_discount"))
    return (
        li.join(part, col("l_partkey") == col("p_partkey"))
        .agg(
            (
                100.0
                * _dsum(F.when(col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)), 6)
                / _dsum(rev, 6)
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (agg-derived semi filter, HAVING)
# ---------------------------------------------------------------------------

Q18_ORACLE = """
SELECT
  c_custkey,
  o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate_str,
  CAST(o_totalprice AS DOUBLE) AS totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 140
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_volume", oracle=Q18_ORACLE)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the HAVING subquery is expressed as a window sum
    over the order key on the SAME scan — per-row order totals filter
    big orders without a second read of lineitem (the
    groupBy+semi-join formulation scans the fact table twice; at
    100 TB the saved scan outweighs the window's per-partition sort,
    and it measured ~40% faster at bench SF too). The quantity
    threshold compares exact decimals on both engines, so boundary
    rows agree.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    oq = F.sum(col("l_quantity").cast("decimal(38,4)")).over(
        Window.partitionBy("l_orderkey")
    )
    return (
        li.withColumn("oq", oq)
        .filter(col("oq") > 140)
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(customer, col("o_custkey") == col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(col("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(col("totalprice").desc(), col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-predicate join)
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


@register("q19_discounted_revenue", oracle=Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides —
    Catalyst extracts the common equi-key (partkey) for the join and
    evaluates the disjunction post-join; the part side carries no
    hint (SF-scaled — AQE decides)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, col("p_partkey") == col("l_partkey"))
    cond = (
        (
            (col("p_brand") == "Brand#11")
            & col("p_size").between(1, 15)
            & col("l_quantity").between(1, 21)
        )
        | (
            (col("p_brand") == "Brand#22")
            & col("p_size").between(1, 25)
            & col("l_quantity").between(10, 30)
        )
        | (
            (col("p_brand") == "Brand#13")
            & col("p_size").between(1, 35)
            & col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Anti join — customers with no orders (absent category: anti)
# ---------------------------------------------------------------------------

ANTI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
GROUP BY c_mktsegment
"""


@register("customers_without_orders", oracle=ANTI_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no *recent* orders (the date
    scope keeps the result non-degenerate — every customer has some
    order), counted per segment. Anti joins shuffle only keys —
    cheap at scale."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        customer.join(orders, col("c_custkey") == col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Outer join — nation supplier/customer census (absent category: outer)
# ---------------------------------------------------------------------------

OUTER_ORACLE = """
SELECT
  n_name,
  COALESCE(s.cnt, 0) AS n_suppliers,
  COALESCE(c.cnt, 0) AS n_customers
FROM nation
LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) s
  ON n_nationkey = s.s_nationkey
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
  ON n_nationkey = c.c_nationkey
"""


@register("nation_census_outer", oracle=OUTER_ORACLE)
def nation_census_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer joins with aggregated sides: pre-aggregating before
    the outer join keeps the shuffled build sides at one row per
    nation — the scalable shape (never outer-join raw facts to a
    dimension then aggregate)."""
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("s_cnt"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("c_cnt"))
    )
    return (
        nation.join(sup, col("n_nationkey") == col("s_nationkey"), "left")
        .join(cust, col("n_nationkey") == col("c_nationkey"), "left")
        .select(
            "n_name",
            F.coalesce(col("s_cnt"), F.lit(0)).alias("n_suppliers"),
            F.coalesce(col("c_cnt"), F.lit(0)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between a nation pair (self-joined dimension roles)
# ---------------------------------------------------------------------------
# The harness schema is a reduced TPC-H (no partsupp, no l_shipmode /
# commitdate / receiptdate, synthetic NATION_* names), so Q7/Q8/Q9/Q13/
# Q15/Q17/Q22 below are adapted to the available columns while keeping
# each query's defining operator shape intact.

Q7_ORACLE = """
SELECT
  supp_nation,
  cust_nation,
  l_year,
  CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    EXTRACT(year FROM l_shipdate) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (adapted pair): the nation dimension joined in TWO
    roles (supplier side, customer side) — the self-join-with-aliases
    shape. Both role tables pre-filter to the two nations of
    interest, so each nation broadcast carries 2 rows and the pair
    disjunction prunes most of the fact scan via the supplier join.
    """
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(col("n_name").isin(pair)).select(
        col("n_nationkey").alias("s_nkey"), col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(col("n_name").isin(pair)).select(
        col("n_nationkey").alias("c_nkey"), col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    sup = supplier.join(broadcast(n1), col("s_nationkey") == col("s_nkey")).select(
        "s_suppkey", "supp_nation"
    )
    cust = customer.join(broadcast(n2), col("c_nationkey") == col("c_nkey")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(sup, col("l_suppkey") == col("s_suppkey"))
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(cust, col("o_custkey") == col("c_custkey"))
        .filter(
            ((col("supp_nation") == pair[0]) & (col("cust_nation") == pair[1]))
            | ((col("supp_nation") == pair[1]) & (col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region (conditional share ratio)
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT
  o_year,
  CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
    / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT
    EXTRACT(year FROM o_orderdate) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted): share-of-total ratio per year — two
    conditional decimal sums in one aggregation (no second pass over
    the data). Only the constant-size nation/region legs are hinted;
    the customer/supplier sides resolve by size at runtime.
    """
    part = load_table(spark, sf_dir, "part").filter(col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "EUROPE")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            broadcast(
                nation.join(
                    broadcast(region), col("n_regionkey") == col("r_regionkey")
                ).select(col("n_nationkey").alias("c_nkey"))
            ),
            col("c_nationkey") == col("c_nkey"),
        )
        .select("c_custkey")
    )
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            broadcast(
                nation.select(
                    col("n_nationkey").alias("s_nkey"), col("n_name").alias("nation")
                )
            ),
            col("s_nationkey") == col("s_nkey"),
        )
        .select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = col("l_extendedprice") * (1 - col("l_discount"))
    return (
        li.join(part, col("p_partkey") == col("l_partkey"))
        .join(supp_dim, col("s_suppkey") == col("l_suppkey"))
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(cust_dim, col("o_custkey") == col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                _dsum(F.when(col("nation") == "NATION_5", vol).otherwise(F.lit(0.0)), 6)
                / _dsum(vol, 6)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year (LIKE filter)
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT
  nation,
  o_year,
  CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS profit
FROM (
  SELECT
    n_name AS nation,
    EXTRACT(year FROM o_orderdate) AS o_year,
    l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp/supplycost in the harness
    schema, so profit = discounted revenue): substring LIKE filter on
    the part dimension, profit rolled up by supplier nation × order
    year. Nation (constant 25 rows) rides the supplier join as the
    only hinted broadcast.
    """
    part = load_table(spark, sf_dir, "part").filter(col("p_name").contains("widget"))
    supp_dim = (
        load_table(spark, sf_dir, "supplier").join(
            broadcast(
                load_table(spark, sf_dir, "nation").select(
                    col("n_nationkey").alias("s_nkey"), col("n_name").alias("nation")
                )
            ),
            col("s_nationkey") == col("s_nkey"),
        ).select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, col("p_partkey") == col("l_partkey"))
        .join(supp_dim, col("s_suppkey") == col("l_suppkey"))
        .join(orders, col("o_orderkey") == col("l_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias("profit")
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join → double group-by)
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left-outer join preserving order-less customers
    (COUNT of a null column skips nulls → their count is 0), then a
    second aggregation over the first's output — the histogram-of-
    groups shape. Stage 1 shuffles by customer key; stage 2's input
    is one row per customer, so the second shuffle is tiny.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, col("c_custkey") == col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (agg → global-max semi filter)
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: scalar-subquery max over an aggregated view. The
    max is computed as a 1-row DataFrame and broadcast-cross-joined
    back — no global sort, no driver collect. Revenue equality is
    exact because both sides aggregate in decimal.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(col("l_suppkey").alias("supplier_no")).agg(
        _dsum(col("l_extendedprice") * (1 - col("l_discount")), 6).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(broadcast(max_rev), col("total_revenue") == col("max_revenue"))
        .join(supplier, col("s_suppkey") == col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-group average)
# ---------------------------------------------------------------------------

Q17_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT
    l_partkey AS agg_partkey,
    COUNT(*) AS cnt,
    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
  FROM lineitem
  GROUP BY l_partkey
) part_agg ON agg_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND p_size < 20
  AND l_quantity < 0.2 * (sum_qty / cnt)
"""


@register("q17_small_quantity", oracle=Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted filter: brand+size, no p_container in
    schema): the correlated scalar subquery (avg quantity per part)
    de-correlated into a pre-aggregation joined back to the fact —
    the scalable rewrite of a per-row subquery. The threshold
    expression ``0.2 * (sum/cnt)`` is written identically on both
    engines (decimal-exact sum, then one double divide and multiply),
    so boundary rows agree bitwise.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (col("p_brand") == "Brand#13") & (col("p_size") < 20)
    )
    part_agg = li.groupBy(col("l_partkey").alias("agg_partkey")).agg(
        F.count("*").alias("cnt"),
        F.sum(col("l_quantity").cast("decimal(38,4)"))
        .cast("double")
        .alias("sum_qty"),
    )
    return (
        li.join(part, col("p_partkey") == col("l_partkey"))
        .join(part_agg, col("agg_partkey") == col("l_partkey"))
        .filter(col("l_quantity") < F.lit(0.2) * (col("sum_qty") / col("cnt")))
        .agg(
            (_dsum(col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 — idle wealthy customers (scalar-average threshold + anti join)
# ---------------------------------------------------------------------------

Q22_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'
  )
GROUP BY c_mktsegment
"""


@register("q22_idle_customers", oracle=Q22_ORACLE)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: no c_phone country codes in schema —
    segmented by market segment): scalar-subquery threshold (average
    positive balance) broadcast as a 1-row cross join, then an anti
    join against recent orders. Threshold arithmetic is decimal-exact
    then a single double divide, mirrored on both engines.
    """
    customer = load_table(spark, sf_dir, "customer")
    threshold = customer.filter(col("c_acctbal") > 0.0).agg(
        (
            F.sum(col("c_acctbal").cast("decimal(38,4)")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(col("o_orderdate") >= F.lit("1999-06-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        customer.join(broadcast(threshold))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") == col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(col("c_acctbal")).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute (NOT IN + count distinct)
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#11'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_diversity", oracle=Q16_ORACLE)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: lineitem is the part–supplier bridge — the
    harness has no partsupp; complaint-comment filter becomes a
    negative-balance filter). Defining shapes kept: NOT IN subquery
    (anti join on the excluded supplier set — none of the excluded
    keys are null, so NOT IN == anti join), IN value list, inequality
    predicate, multi-attribute COUNT(DISTINCT).
    """
    part = load_table(spark, sf_dir, "part").filter(
        (col("p_brand") != "Brand#11")
        & col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, col("p_partkey") == col("l_partkey"))
        .join(excluded, col("l_suppkey") == col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers shipping excess volume (nested semi-join chain)
# ---------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 100
)
"""


@register("q20_excess_suppliers", oracle=Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: shipment volume stands in for partsupp
    stock): the nested-subquery chain — parts by name prefix → their
    year's lineitems → per-supplier volume HAVING → semi join back to
    supplier. The inner aggregate's output is one row per qualifying
    supplier, so the final semi join shuffles keys only.
    """
    part = load_table(spark, sf_dir, "part").filter(col("p_name").startswith("small"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(part, col("p_partkey") == col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(col("l_quantity").cast("decimal(38,4)")).alias("q"))
        .filter(col("q") > 100)
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.join(
        heavy, col("s_suppkey") == col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated-min subquery)
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM supply
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM best
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_size = 15 AND supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: lineitem MIN(extendedprice) per
    (part, supplier) stands in for partsupp supply cost — the harness
    has no partsupp). Defining shape kept: the correlated scalar
    subquery "cost = (SELECT MIN(cost) ... WHERE same part)"
    decorrelated into ONE window-min over the supply aggregate — the
    per-part min rides the same shuffle as the aggregate itself
    instead of a second scan + self-join (the classic Q2 rewrite).

    Scale: region→nation→supplier prune BEFORE the fact aggregate
    (constant dims broadcast); the window partitions by l_partkey,
    the same key the groupBy just shuffled on, so AQE plans no extra
    exchange. MIN needs no decimal trick (order-independent as-is).
    """
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    euro_supp = (
        supplier.join(
            broadcast(nation.join(broadcast(region), col("n_regionkey") == col("r_regionkey"))),
            col("s_nationkey") == col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    # one explicit partitioning on l_partkey serves BOTH the (partkey,
    # suppkey) aggregate (hash partitioning on a subset satisfies the
    # clustering requirement) and the per-part window min — without it
    # the plan pays two full-data exchanges back to back
    supply = (
        li.join(euro_supp, col("l_suppkey") == col("s_suppkey"))
        .repartition(col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min("l_extendedprice").alias("supply_cost"),
            F.first("s_name").alias("s_name"),
            F.first("s_acctbal").alias("s_acctbal"),
            F.first("n_name").alias("n_name"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_partkey")
    best = supply.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        col("supply_cost") == col("min_cost")
    )
    part = load_table(spark, sf_dir, "part").filter(col("p_size") == 15)
    return (
        best.join(part, col("p_partkey") == col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (global-scalar HAVING subquery)
# ---------------------------------------------------------------------------

Q11_FRACTION = 0.001

Q11_ORACLE = f"""
WITH nation_value AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS value_dec
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_9'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM nation_value
WHERE CAST(value_dec AS DOUBLE) >
      {Q11_FRACTION} * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM nation_value)
"""


@register("q11_important_parts", oracle=Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: shipped value per part from one nation's
    suppliers stands in for partsupp stock value). Defining shape
    kept: the HAVING threshold against a GLOBAL scalar subquery —
    computed as a 1-row aggregate of the SAME grouped frame,
    broadcast into the filter (no second fact scan; the grouped frame
    is materialized once and reused for both the rows and the total).

    Determinism: the per-part sums accumulate in decimal; both the
    part value and the global total cast to double only at the
    comparison/output boundary, so the filter is bitwise-stable at
    any parallelism.
    """
    nation = load_table(spark, sf_dir, "nation").filter(col("n_name") == "NATION_9")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    nat_supp = supplier.join(
        broadcast(nation), col("s_nationkey") == col("n_nationkey")
    ).select("s_suppkey")
    value = (
        li.join(nat_supp, col("l_suppkey") == col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(col("l_extendedprice").cast("decimal(38,4)")).alias("value_dec"))
        .localCheckpoint(eager=True)  # reused by rows AND the scalar total
    )
    total = value.agg(
        F.sum("value_dec").cast("double").alias("total_value")
    )
    return (
        value.crossJoin(broadcast(total))
        .filter(
            col("value_dec").cast("double") > Q11_FRACTION * col("total_value")
        )
        .select("l_partkey", col("value_dec").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

Q21_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
),
participants AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s_name, COUNT(*) AS numwait
FROM returned r1
JOIN orders ON o_orderkey = r1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = r1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_9'
  AND EXISTS (
    SELECT 1 FROM participants p
    WHERE p.l_orderkey = r1.l_orderkey AND p.l_suppkey <> r1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM returned r2
    WHERE r2.l_orderkey = r1.l_orderkey AND r2.l_suppkey <> r1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_waiting_suppliers", oracle=Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: a RETURNED lineitem stands in for a late
    delivery — the harness carries no commit/receipt dates). Defining
    shape kept exactly: the double-correlated EXISTS (another supplier
    participated in the order) + NOT EXISTS (no OTHER supplier had a
    return) over the same fact table, i.e. the sole at-fault supplier
    of a finished multi-supplier order.

    Plan: both correlations become key-local joins on l_orderkey — a
    semi-join-shaped inner join against the distinct participant set
    (guarded to a different supplier) and a left-anti against the
    returned set under the same guard. Everything shuffles once on
    l_orderkey; the count aggregates per supplier at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # materialized: `returned` feeds both the driving side (r1) and the
    # NOT-EXISTS probe (other_ret); without it lineitem is scanned and
    # distinct-ed twice for the same set
    returned = (
        li.filter(col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    participants = li.select("l_orderkey", "l_suppkey").distinct()

    r1 = returned.select(
        col("l_orderkey").alias("o_key"), col("l_suppkey").alias("supp")
    )
    # EXISTS: some other supplier participated in the order
    other_part = participants.select(
        col("l_orderkey").alias("o_key"), col("l_suppkey").alias("other_supp")
    )
    with_other = (
        r1.join(other_part, "o_key")
        .filter(col("other_supp") != col("supp"))
        .select("o_key", "supp")
        .distinct()
    )
    # NOT EXISTS: no other supplier had a return in the same order
    other_ret = returned.select(
        col("l_orderkey").alias("o_key"), col("l_suppkey").alias("ret_supp")
    )
    sole_fault = with_other.join(
        other_ret,
        (with_other.o_key == other_ret.o_key) & (col("ret_supp") != col("supp")),
        "left_anti",
    )

    orders = load_table(spark, sf_dir, "orders").filter(col("o_orderstatus") == "F")
    nation = load_table(spark, sf_dir, "nation").filter(col("n_name") == "NATION_9")
    supplier = load_table(spark, sf_dir, "supplier").join(
        broadcast(nation), col("s_nationkey") == col("n_nationkey")
    )
    return (
        sole_fault.join(orders, col("o_key") == col("o_orderkey"))
        .join(supplier, col("supp") == col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(col("numwait").desc(), "s_name")
        .limit(100)
    )

# ---------------------------------------------------------------------------
# Q12 — shipping modes & order priority (completes the 22-query suite)
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT
  l_returnflag || '-' || l_linestatus AS ship_mode,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY ship_mode
ORDER BY ship_mode
"""


@register("q12_shipping_modes", oracle=Q12_ORACLE)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: the harness lineitem has no
    l_shipmode/l_commitdate/l_receiptdate, so ship mode is the
    returnflag+linestatus pair — 6 stable buckets — and "received
    late" becomes "shipped more than 60 days after the order date").
    Defining shape kept exactly: fact-fact join + two conditional
    counts (CASE inside SUM) bucketed by a low-cardinality mode
    column (``workingTest.scala`` has no aggregation at all —
    SURVEY.md §2.8 absent-category).

    Scale: the l_shipdate year-range pushes into the parquet scan;
    the lateness predicate rides the join (it references both
    sides). 6 output groups → the post-join partial aggregation
    collapses everything map-side; the only real cost at 100 TB is
    the orderkey shuffle, which AQE skew-splits.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (col("l_orderkey") == col("o_orderkey"))
            & (col("l_shipdate") > col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(
            F.concat_ws("-", col("l_returnflag"), col("l_linestatus")).alias(
                "ship_mode"
            )
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue growth (DATE-part time series)
# ---------------------------------------------------------------------------

MOM_GROWTH_ORACLE = """
WITH m AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
    EXTRACT(month FROM o_orderdate) AS o_month,
    CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
      AS revenue_cents,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders
  GROUP BY 1, 2
)
SELECT CAST(o_year AS BIGINT) AS o_year,
  CAST(o_month AS BIGINT) AS o_month,
  revenue_cents, n_orders,
  CAST(revenue_cents AS DOUBLE)
    / LAG(CAST(revenue_cents AS DOUBLE)) OVER (
        ORDER BY o_year, o_month) - 1.0 AS mom_growth
FROM m
"""


@register("revenue_mom_growth", oracle=MOM_GROWTH_ORACLE)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the finance/BI drumbeat
    series: exact-cents revenue per calendar month with the LAG-ratio
    growth rate. Calendar parts are extracted from a DATE column,
    which both engines bucket identically (the timestamp-side
    calendar disagreements the house epoch-integer rule avoids do not
    exist for dates — no timezone, no DST); the first month's growth
    is NULL by LAG semantics on both engines.

    Scale shape: the fact table collapses to ≤ |years|·12 cells with
    map-side combine; the LAG window runs over the cell table only —
    a single-partition window over dozens of rows, which is exactly
    where a global window is legitimate.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year(col("o_orderdate")).alias("o_year"),
        F.month(col("o_orderdate")).alias("o_month"),
    ).agg(
        F.sum((col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("revenue_cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("o_year", "o_month")
    return m.select(
        col("o_year").cast("bigint").alias("o_year"),
        col("o_month").cast("bigint").alias("o_month"),
        "revenue_cents",
        "n_orders",
        (
            col("revenue_cents").cast("double")
            / F.lag(col("revenue_cents").cast("double")).over(w)
            - 1.0
        ).alias("mom_growth"),
    )
