"""Scalar-function-family queries: JSON, regex, datetime, string,
grouping sets, distinct aggregation, and array math.

The reference's scalar surface is split/trim/equality only
(SURVEY.md §2.8 — "no array/map/JSON functions, no regex, no
null-handling functions"). These queries put every absent family on
the engine's public surface, each as a JVM-side built-in (no Python
UDFs anywhere) with an exact DuckDB oracle.

Determinism: integer aggregates are exact; double aggregates go
through the decimal trick (queries/tpch.py ``_dsum``); per-row double
math (array norms) folds left-to-right identically on both engines
(validated in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.queries.tpch import _dsum
from iot_sparkstreaming_spark.tables import load_table

# ---------------------------------------------------------------------------
# JSON extraction over events.props
# ---------------------------------------------------------------------------

JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_k_over_50
FROM events
GROUP BY event_type
"""


@register("json_extract_events", oracle=JSON_ORACLE)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events payload column
    (``get_json_object`` — JVM-side, codegen-friendly), aggregated
    per event type. At scale this is scan → partial agg; the JSON
    parse never leaves the executors' generated code.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_k_over_50"),
    )


# ---------------------------------------------------------------------------
# Regex extraction over part names
# ---------------------------------------------------------------------------

REGEX_ORACLE = """
SELECT
  regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2) AS noun,
  COUNT(*) AS n_parts,
  COUNT(DISTINCT regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1)) AS n_adjectives,
  CAST(MAX(p_size) AS BIGINT) AS max_size
FROM part
WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+$')
GROUP BY noun
"""


@register("regex_part_taxonomy", oracle=REGEX_ORACLE)
def regex_part_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex match + group extraction (``rlike`` /
    ``regexp_extract``) splitting part names into an
    adjective–noun taxonomy, with a per-noun distinct-adjective
    count. The pattern is anchored ASCII so Java and RE2 regex
    semantics agree.
    """
    part = load_table(spark, sf_dir, "part")
    pat = "^([a-z]+) ([a-z]+)$"
    return (
        part.filter(col("p_name").rlike("^[a-z]+ [a-z]+$"))
        .groupBy(F.regexp_extract(col("p_name"), pat, 2).alias("noun"))
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct(F.regexp_extract(col("p_name"), pat, 1)).alias(
                "n_adjectives"
            ),
            F.max("p_size").cast("bigint").alias("max_size"),
        )
    )


# ---------------------------------------------------------------------------
# Datetime functions: ship-delay statistics per order month
# ---------------------------------------------------------------------------

DATETIME_ORACLE = """
SELECT
  EXTRACT(year FROM o_orderdate) AS o_year,
  EXTRACT(month FROM o_orderdate) AS o_month,
  COUNT(*) AS n_items,
  CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*)
    AS avg_ship_delay_days,
  CAST(MAX(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_ship_delay_days,
  CAST(SUM(CASE WHEN date_part('dow', o_orderdate) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_weekend_ordered
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year, o_month
"""


@register("datetime_ship_delay", oracle=DATETIME_ORACLE)
def datetime_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: year/month extraction, day-difference
    arithmetic, day-of-week classification. All-delay sums are exact
    integers, so the average is one deterministic double divide.
    (Spark ``dayofweek`` is 1=Sunday; DuckDB ``dow`` is 0=Sunday —
    the weekend predicate accounts for the offset.)
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(col("l_shipdate"), col("o_orderdate"))
    return (
        orders.join(li, col("o_orderkey") == col("l_orderkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(delay).cast("double") / F.count("*")).alias("avg_ship_delay_days"),
            F.max(delay).cast("bigint").alias("max_ship_delay_days"),
            F.sum(F.when(F.dayofweek("o_orderdate").isin(1, 7), 1).otherwise(0))
            .cast("bigint")
            .alias("n_weekend_ordered"),
        )
    )


# ---------------------------------------------------------------------------
# String function family over customer names
# ---------------------------------------------------------------------------

STRING_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(MIN(CAST(substr(c_name, 10, 20) AS BIGINT)) AS BIGINT) AS min_custno,
  CAST(MAX(CAST(substr(c_name, 10, 20) AS BIGINT)) AS BIGINT) AS max_custno,
  MAX(upper(substr(c_mktsegment, 1, 2)) || '-' ||
      lpad(CAST(c_custkey % 100 AS VARCHAR), 3, '0') || '-' ||
      reverse(substr(c_name, 1, 8))) AS max_code
FROM customer
GROUP BY c_mktsegment
"""


@register("string_functions_customer", oracle=STRING_ORACLE)
def string_functions_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substr, numeric cast of digit substrings,
    upper, lpad, reverse, concat — all JVM built-ins. The max_code
    column composes five string functions to force byte-for-byte
    cross-engine agreement.
    """
    cust = load_table(spark, sf_dir, "customer")
    custno = F.substring(col("c_name"), 10, 20).cast("bigint")
    code = F.concat_ws(
        "-",
        F.upper(F.substring(col("c_mktsegment"), 1, 2)),
        F.lpad((col("c_custkey") % 100).cast("string"), 3, "0"),
        F.reverse(F.substring(col("c_name"), 1, 8)),
    )
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.min(custno).alias("min_custno"),
        F.max(custno).alias("max_custno"),
        F.max(code).alias("max_code"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (beyond the existing rollup/cube queries)
# ---------------------------------------------------------------------------

GROUPING_SETS_ORACLE = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_revenue", oracle=GROUPING_SETS_ORACLE)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (an arbitrary set list, not the
    rollup/cube lattice): detail, per-flag subtotal, and grand total
    in one pass. Spark expands the sets after partial aggregation, so
    the scan is still read once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n_rows"),
            _dsum(col("l_extendedprice")).alias("sum_price"),
        )
        .select(
            F.coalesce(col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregation across a 3-way join
# ---------------------------------------------------------------------------

DISTINCT_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(DISTINCT l_suppkey) AS n_suppliers,
  COUNT(DISTINCT c_custkey) AS n_customers,
  COUNT(*) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_mktsegment
"""


@register("distinct_suppliers_per_segment", oracle=DISTINCT_ORACLE)
def distinct_suppliers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — two distinct columns plus a plain count in
    one aggregation (Spark plans an expand + two-phase distinct
    aggregate). No broadcast hint on customer — it scales with SF, so
    size-based planning/AQE picks broadcast at small SF and shuffle
    join at cluster scale.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, col("o_orderkey") == col("l_orderkey"))
        .join(cust, col("c_custkey") == col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Array math: embedding norm statistics per label
# ---------------------------------------------------------------------------

ARRAY_ORACLE = """
WITH e AS (
  SELECT
    label,
    len(embedding) AS dim,
    ROUND(sqrt(list_dot_product(
      list_transform(embedding, x -> CAST(x AS DOUBLE)),
      list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS norm
  FROM embeddings
)
SELECT
  label,
  COUNT(*) AS n_vecs,
  CAST(MIN(dim) AS BIGINT) AS min_dim,
  MIN(norm) AS min_norm,
  MAX(norm) AS max_norm,
  CAST(SUM(CAST(norm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_norm
FROM e
GROUP BY label
"""


@register("embedding_norm_stats", oracle=ARRAY_ORACLE)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, element-wise transform, left-fold
    aggregate (L2 norm). Per-row norms round to 6 dp (the fold is
    bitwise-identical cross-engine; rounding removes any doubt), and
    the cross-row average goes through decimal.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(col("embedding"), lambda x: x.cast("double"))
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    return (
        emb.select(
            "label", F.size("embedding").alias("dim"), norm.alias("norm")
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").cast("bigint").alias("min_dim"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            (F.sum(col("norm").cast("decimal(38,6)")).cast("double") / F.count("*")).alias(
                "avg_norm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pivot: order-priority counts per status (wide reshaping)
# ---------------------------------------------------------------------------

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

PIVOT_ORACLE = """
SELECT
  o_orderstatus,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS not_specified,
  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
FROM orders
GROUP BY o_orderstatus
"""


@register("pivot_priority_by_status", oracle=PIVOT_ORACLE)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide reshaping): order counts per status ×
    priority. The pivot value list is EXPLICIT — with it, Spark skips
    the extra distinct-values job and plans a single pass (each pivot
    cell is a conditional aggregate, exactly what the oracle spells
    out). Unlisted values at scale would be dropped, which is the
    deterministic contract a fixed report schema wants.
    """
    orders = load_table(spark, sf_dir, "orders")
    aliases = dict(
        zip(PRIORITIES, ["urgent", "high", "medium", "not_specified", "low"])
    )
    wide = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
    )
    out = wide.select(
        "o_orderstatus",
        *[F.coalesce(col(f"`{p}`"), F.lit(0)).alias(aliases[p]) for p in PRIORITIES],
    )
    return out


# ---------------------------------------------------------------------------
# Approximate distinct (HLL sketch) — the 100 TB path for COUNT(DISTINCT)
# ---------------------------------------------------------------------------


SKETCH_ORACLE = """
SELECT
  c_mktsegment,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
  TRUE AS approx_within_rsd
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


@register("approx_distinct_sketch", oracle=SKETCH_ORACLE)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_count_distinct`` (HyperLogLog++) per market segment.

    At 100 TB an exact COUNT(DISTINCT) shuffles every distinct value;
    the sketch shuffles fixed-size registers per group instead —
    constant memory, one pass, mergeable across partitions. The sketch
    VALUE is implementation-specific (DuckDB cannot reproduce it), so
    the oracle-matched output carries the exact count plus a boolean
    asserting the HLL estimate sits within ~3× the rsd=0.05 standard
    error (HLL++ is hash-based and deterministic for fixed data, so
    the boolean is stable). A hash mismatch on this row therefore
    means the accuracy contract itself broke. The raw estimate value
    is additionally bounds-checked in tests/test_functions.py.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.join(orders, col("o_orderkey") == col("l_orderkey"))
        .join(cust, col("c_custkey") == col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.05).alias("approx_suppliers"),
            F.countDistinct("l_suppkey").alias("exact_suppliers"),
        )
    )
    return agg.select(
        "c_mktsegment",
        "exact_suppliers",
        (
            F.abs(col("approx_suppliers") - col("exact_suppliers"))
            <= 0.15 * col("exact_suppliers")
        ).alias("approx_within_rsd"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles as order statistics (deterministic at any scale)
# ---------------------------------------------------------------------------

PERCENTILE_ORACLE = """
WITH ranked AS (
  SELECT event_type, value, 
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT
  event_type,
  CAST(MAX(n) AS BIGINT) AS n_events,
  MAX(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT) THEN value END) AS median_lower,
  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90_lower
FROM ranked
GROUP BY event_type
"""


@register("percentile_event_values", oracle=PERCENTILE_ORACLE)
def percentile_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90 as ORDER STATISTICS (the value at row
    ceil(q·n)) rather than interpolated quantiles: an order statistic
    is an actual data value picked by rank, so it is deterministic
    under any partitioning and identical across engines — interpolated
    ``percentile``/``quantile_cont`` arithmetic is not guaranteed to
    match bitwise cross-engine. Tie-break on event_id makes the rank
    itself unambiguous.

    Scale: one shuffle on the group key for the ranking window, then
    a trivial conditional aggregate. For quantiles over 100 TB where
    a full sort per group is too hot, the sketch path is
    ``percentile_approx`` (same trade as approx_distinct_sketch).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max(
            F.when(col("rn") == F.ceil(col("n") / 2.0), col("value"))
        ).alias("median_lower"),
        F.max(
            F.when(col("rn") == F.ceil(col("n") * 0.9), col("value"))
        ).alias("p90_lower"),
    )


# ---------------------------------------------------------------------------
# UDAF: Pandas grouped-agg IQR (order statistics, oracle-exact)
# ---------------------------------------------------------------------------

IQR_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT
  event_type,
  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q1_lower,
  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q3_lower,
  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN value END)
    - MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS iqr
FROM ranked
GROUP BY event_type
"""


@register("udaf_iqr_pandas", oracle=IQR_ORACLE)
def udaf_iqr_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via ``applyInPandas``: per-group interquartile range
    as ORDER STATISTICS (value at rank ceil(q·n), ties broken by
    event_id — the same definition as percentile_event_values, so the
    Python aggregate is oracle-exact; numpy quantile interpolation
    would not be).

    This is the UDAF category the reference had none of (SURVEY.md
    §2.8): group-map Pandas with Arrow transfer — the sanctioned shape
    for aggregation logic built-ins can't express. Scale: one shuffle
    on the group key; each group materializes in one Arrow batch, so
    this pattern fits bounded groups (use the window/order-stat SQL
    form for giant groups).
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def iqr(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = pdf.sort_values(["value", "event_id"], kind="mergesort")["value"].values
        n = len(s)
        import math

        q1 = s[math.ceil(n * 0.25) - 1]
        q3 = s[math.ceil(n * 0.75) - 1]
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "q1_lower": q1,
                    "q3_lower": q3,
                    "iqr": q3 - q1,
                }
            ]
        )

    return ev.groupBy("event_type").applyInPandas(
        iqr,
        schema="event_type string, q1_lower double, q3_lower double, iqr double",
    )


# ---------------------------------------------------------------------------
# Feature binning: equi-width histogram via width_bucket
# ---------------------------------------------------------------------------

BINNING_ORACLE = """
SELECT
  event_type,
  CAST(CASE WHEN value < 0.0 THEN 0
            WHEN value >= 500.0 THEN 21
            ELSE floor(value / 25.0) + 1 END AS BIGINT) AS bin,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, bin
"""


@register("feature_binning_histogram", oracle=BINNING_ORACLE)
def feature_binning_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width feature binning: 20 bins over [0, 500), underflow to
    bin 0 and overflow to bin 21 (width_bucket semantics, written as
    explicit arithmetic — DuckDB has no width_bucket, and the one
    float divide + floor is bitwise-identical on both engines). The
    discretization pass of feature engineering; bin edges are
    closed-form so no quantile pass is needed — scan → partial agg.
    """
    ev = load_table(spark, sf_dir, "events")
    bin_ = (
        F.when(col("value") < 0.0, 0)
        .when(col("value") >= 500.0, 21)
        .otherwise(F.floor(col("value") / 25.0) + 1)
        .cast("bigint")
    )
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum(col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# HLL sketch ALGEBRA: build once at a fine grain, merge upward
# ---------------------------------------------------------------------------

HLL_UNION_ORACLE = """
SELECT r_name,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
  TRUE AS merged_within_rsd,
  TRUE AS merge_lossless
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
"""


@register("hll_union_region_suppliers", oracle=HLL_UNION_ORACLE)
def hll_union_region_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA, not just sketch estimation: per-nation
    Datasketches HLL sketches of the suppliers serving each nation's
    customers (suppliers overlap heavily across nations — a genuine
    multiset union), merged upward to region level with
    ``hll_union_agg`` — the pre-aggregated-rollup pattern that makes
    COUNT(DISTINCT) feasible at 100 TB: leaf sketches are built once
    in the hot path (fixed-size registers per group, mergeable), and
    every coarser grain is a cheap register-max union of stored
    sketches, never a re-scan of the fact table.

    Output carries the exact distinct count plus two stable booleans:
    the merged estimate lands within 3× the rsd standard error of
    exact, and — the algebra's defining property — merging the nation
    sketches gives BIT-IDENTICAL register state to sketching the
    region directly (register-wise max is associative), asserted as
    equal estimates. DuckDB cannot reproduce the sketch itself, so
    the oracle checks the exact counts and the two invariant booleans
    (same contract as ``approx_distinct_sketch``)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        li.join(orders, col("o_orderkey") == col("l_orderkey"))
        .join(cust, col("c_custkey") == col("o_custkey"))
        .join(F.broadcast(nation), col("n_nationkey") == col("c_nationkey"))
        .join(F.broadcast(region), col("r_regionkey") == col("n_regionkey"))
    )
    leaf = joined.groupBy("r_name", "n_nationkey").agg(
        F.hll_sketch_agg("l_suppkey").alias("sketch")
    )
    merged = leaf.groupBy("r_name").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_est")
    )
    direct = joined.groupBy("r_name").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_suppkey")).alias("direct_est"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
    )
    return merged.join(direct, "r_name").select(
        "r_name",
        col("exact_suppliers").cast("bigint").alias("exact_suppliers"),
        (
            F.abs(col("merged_est") - col("exact_suppliers"))
            <= 0.15 * col("exact_suppliers")
        ).alias("merged_within_rsd"),
        (col("merged_est") == col("direct_est")).alias("merge_lossless"),
    )


# ---------------------------------------------------------------------------
# Approximate quantiles with provable rank bounds (GK sketch)
# ---------------------------------------------------------------------------

APPROX_Q_ACC = 1000  # GK accuracy parameter: rank error ≤ n / ACC

APPROX_QUANTILE_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
  CAST(MAX(n) AS BIGINT) AS n_events,
  MAX(CASE WHEN rn = GREATEST(CAST(FLOOR(0.5 * n) - CEIL(CAST(n AS DOUBLE) / {APPROX_Q_ACC}) AS BIGINT), 1)
       THEN value END) AS lower_bound,
  MAX(CASE WHEN rn = LEAST(CAST(CEIL(0.5 * n) + CEIL(CAST(n AS DOUBLE) / {APPROX_Q_ACC}) AS BIGINT), n)
       THEN value END) AS upper_bound,
  TRUE AS approx_in_bounds
FROM ranked
GROUP BY event_type
"""


@register("approx_quantile_bounds", oracle=APPROX_QUANTILE_ORACLE)
def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` (Greenwald–Khanna sketch) with its
    guarantee made CHECKABLE: the sketch promises a median whose rank
    sits within n/accuracy of the true rank, so the output carries
    the exact order statistics at ranks 0.5·n ∓ ⌈n/acc⌉ and a boolean
    asserting the approximate median lies between them. The boolean
    is stable under ANY partition/merge order — the bound is what the
    algorithm guarantees, unlike the raw estimate, which mergers may
    legitimately move — so the row is hash-comparable while still
    failing loudly if the sketch ever broke its contract.

    100-TB story mirrors approx_distinct_sketch: the exact windowed
    rank path shuffles every row per group; the sketch keeps
    O(acc·log n) state per group, merges associatively map-side, and
    is the only way a 10¹² -row percentile fits an executor."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    eps = F.ceil(col("n").cast("double") / APPROX_Q_ACC)
    ranked = ev.select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max(
            F.when(
                col("rn")
                == F.greatest(
                    (F.floor(0.5 * col("n")) - eps).cast("bigint"), F.lit(1)
                ),
                col("value"),
            )
        ).alias("lower_bound"),
        F.max(
            F.when(
                col("rn")
                == F.least((F.ceil(0.5 * col("n")) + eps).cast("bigint"), col("n")),
                col("value"),
            )
        ).alias("upper_bound"),
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, APPROX_Q_ACC).alias("approx_median")
    )
    return bounds.join(approx, "event_type").select(
        "event_type",
        "n_events",
        "lower_bound",
        "upper_bound",
        (
            (col("approx_median") >= col("lower_bound"))
            & (col("approx_median") <= col("upper_bound"))
        ).alias("approx_in_bounds"),
    )


# ---------------------------------------------------------------------------
# VARIANT ingestion over events.props (Spark 4 semi-structured type)
# ---------------------------------------------------------------------------

VARIANT_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  COUNT(*) AS n_valid_variant,
  CAST(COUNT(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                  IS NOT NULL THEN 1 END) AS BIGINT) AS n_k_typed,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
  CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10)
       AS BIGINT) AS n_k_decades
FROM events
GROUP BY event_type
"""


@register("variant_events_typed", oracle=VARIANT_ORACLE)
def variant_events_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured payloads:
    ``try_parse_json`` decodes the JSON string into the binary
    VARIANT encoding once, then ``try_variant_get`` does TYPED
    extraction (bigint) straight from the encoded form. Versus
    per-path ``get_json_object`` (``json_extract_events``), the
    parse happens once per row regardless of how many paths are read,
    the binary form is what a 100-TB bronze table would persist (and
    shred into columns at the storage layer), and the try_ variants
    degrade malformed rows to NULL instead of failing the task —
    the bad-record path the reference lacks entirely (SURVEY.md §1.2
    "a malformed CSV line throws and would kill the task").

    Plan shape: scan -> project (variant decode) -> partial agg ->
    final agg; no shuffle beyond the 5-group rollup. The oracle
    mirrors the typed extraction with DuckDB JSON + TRY_CAST (every
    fixture row is valid JSON, so n_valid_variant == n_events on
    both sides — asserted by value, not assumed).
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json(col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(v).alias("n_valid_variant"),
        F.count(k).alias("n_k_typed"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(F.floor(k / 10)).alias("n_k_decades"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter counts (HLL's frequency twin)
# ---------------------------------------------------------------------------

#: sketch geometry (functions/sketch.py): 4 rows x 1024 buckets =
#: 4 KiB of counters per (grain, row) — small enough to broadcast,
#: mergeable by cell-wise add. The (j, bucket) projection is the
#: SHARED cms_j_bucket expression so the streaming register twin
#: (streaming/stateful.py streaming_cms) folds the identical cells.
from iot_sparkstreaming_spark.functions.sketch import (  # noqa: E402
    CMS_DEPTH,
    CMS_WIDTH,
    cms_j_bucket,
)

CMS_ORACLE = """
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS true_clicks,
  TRUE AS cms_ge_true
FROM events
WHERE event_type = 'click'
GROUP BY user_id
ORDER BY true_clicks DESC, user_id
LIMIT 20
"""


@register("cms_heavy_hitters", oracle=CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over click counts per user — the frequency
    counterpart of the HLL family (``hll_union_region_suppliers``):
    a fixed 4x1024 grid of counters where cell (j, h_j(key)) sums
    every occurrence hashing there, and the estimate for a key is the
    MIN over its 4 cells. Like HLL registers the grid is mergeable
    (cell-wise ADD across partitions/days), so at 100 TB the sketch
    is built once per ingest grain as a partial agg (the groupBy
    below is map-side combined into at most d*w = 4096 rows per
    partition) and heavy-hitter queries never re-scan the fact table.

    Hashing is ``xxhash64(key, row_index) mod width`` — Spark's
    built-in 64-bit hash, JVM-side, no UDF. DuckDB cannot reproduce
    xxhash64, so (house sketch contract) the oracle checks the exact
    top-20 counts and the sketch's DETERMINISTIC invariant — the CMS
    estimate never undercounts (each of the key's cells contains the
    key's own occurrences plus non-negative collision mass) — as a
    boolean the Spark side computes from the real sketch.

    The top-20 selection orders by (true count desc, user_id) so the
    cut is total and both engines agree on ties.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(col("event_type") == "click").select("user_id")

    rows_ = cms_j_bucket(clicks, "user_id")
    sketch = rows_.groupBy("j", "bucket").agg(F.count("*").alias("c"))

    true_counts = clicks.groupBy("user_id").agg(F.count("*").alias("true_clicks"))
    probes = cms_j_bucket(true_counts, "user_id", "true_clicks")
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "true_clicks")
        .agg(F.min("c").alias("est_clicks"))
    )
    return (
        est.select(
            "user_id",
            col("true_clicks").cast("bigint").alias("true_clicks"),
            (col("est_clicks") >= col("true_clicks")).alias("cms_ge_true"),
        )
        .orderBy(col("true_clicks").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (DLT-style audit)
# ---------------------------------------------------------------------------

EXPECTATIONS_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
    AS viol_ts_not_null,
  CAST(SUM(CASE WHEN user_id >= 0 THEN 0 ELSE 1 END) AS BIGINT)
    AS viol_user_id_nonneg,
  CAST(SUM(CASE WHEN event_type IN
        ('click', 'view', 'purchase', 'signup', 'error')
        THEN 0 ELSE 1 END) AS BIGINT) AS viol_known_event_type,
  CAST(SUM(CASE WHEN value >= 0.0 AND value < 500.0 THEN 0 ELSE 1 END)
    AS BIGINT) AS viol_value_in_range,
  CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
        IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS viol_props_k_typed
FROM events
"""


@register("expectations_audit_events", oracle=EXPECTATIONS_ORACLE)
def expectations_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators/quality.py):
    five named pass-predicates audited in ONE scan with map-side
    partial aggregation — each rule is a SUM of a 0/1 cast, so the
    audit costs a single pass regardless of rule count, and the SAME
    predicates drive the clean/quarantine split (`enforce`, unit-
    tested). The engine-wide bad-record path the reference lacked:
    its parser threw on any malformed line (SURVEY.md §1.2); here
    malformed rows are counted, named, and quarantined instead of
    killing the task. The value-range rule is intentionally violable
    on this data (events.value has an over-500 tail), so the audit is
    proven to COUNT, not just pass."""
    from iot_sparkstreaming_spark.operators.quality import audit

    ev = load_table(spark, sf_dir, "events")
    rules = {
        "ts_not_null": col("ts").isNotNull(),
        "user_id_nonneg": col("user_id") >= 0,
        "known_event_type": col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        ),
        "value_in_range": (col("value") >= 0.0) & (col("value") < 500.0),
        "props_k_typed": F.get_json_object(col("props"), "$.k")
        .cast("bigint")
        .isNotNull(),
    }
    return audit(ev, rules)


# ---------------------------------------------------------------------------
# Portable HyperLogLog: the sketch estimate itself reproduced bit-exactly
# ---------------------------------------------------------------------------

from iot_sparkstreaming_spark.functions.sketch import (
    HLL_BITLEN_CASE as _HLL_BITLEN_CASE,
)
from iot_sparkstreaming_spark.functions.sketch import (
    HLL_KEY_SQL_DEFAULT as HLL_KEY_SQL,
)
from iot_sparkstreaming_spark.functions.sketch import HLL_NUM, hll_bucket_rho

HLL_PORTABLE_ORACLE = f"""
WITH keys AS (
  SELECT event_type,
    user_id * 131072 + (CAST(ts AS DATE) - DATE '1970-01-01') % 131072 AS k
  FROM events
), m0 AS (
  SELECT event_type, k % 4294967296 AS h0 FROM keys
), m1 AS (
  SELECT event_type, (xor(h0, h0 // 65536) * 73244475) % 4294967296 AS h1 FROM m0
), m2 AS (
  SELECT event_type, (xor(h1, h1 // 65536) * 73244475) % 4294967296 AS h2 FROM m1
), h AS (
  SELECT event_type, xor(h2, h2 // 65536) AS h32 FROM m2
), b AS (
  SELECT event_type, h32 // 16777216 AS bucket,
    25 - ({_HLL_BITLEN_CASE.replace("w >=", "(h32 % 16777216) >=")}) AS rho
  FROM h
), r AS (
  SELECT event_type, bucket, MAX(rho) AS m FROM b GROUP BY event_type, bucket
), z AS (
  SELECT event_type, COUNT(*) AS nb,
    SUM(CAST(1 AS BIGINT) << (25 - m)) AS z_part
  FROM r GROUP BY event_type
), e AS (
  SELECT event_type, nb, z_part + (256 - nb) * 33554432 AS z_num FROM z
), x AS (
  SELECT event_type,
    COUNT(DISTINCT user_id * 131072
          + (CAST(ts AS DATE) - DATE '1970-01-01') % 131072) AS ex
  FROM events GROUP BY event_type
)
SELECT e.event_type,
  CAST(nb AS BIGINT) AS n_buckets,
  CAST(z_num AS BIGINT) AS z_num,
  CAST({HLL_NUM} // (1000000 * z_num) AS BIGINT) AS hll_estimate,
  CAST(ex AS BIGINT) AS exact_distinct,
  CAST(ABS({HLL_NUM} // (1000000 * z_num) - ex) AS BIGINT) AS abs_err
FROM e JOIN x ON e.event_type = x.event_type
"""


@register("hll_portable_events", oracle=HLL_PORTABLE_ORACLE)
def hll_portable_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog — the register state AND the estimate are
    reproduced bit-exactly by the oracle, upgrading the sketch family
    from invariant-checked (``hll_union_region_suppliers``,
    ``cms_heavy_hitters``: engine-private hashes, so the oracle can
    only assert exact counts + sketch invariants) to hash-exact: every
    piece — the avalanche hash, the register maxima, the harmonic-mean
    estimator — is pure int64 arithmetic both engines evaluate
    identically. Cardinality target is daily-active user-days per
    event type (n >> 2.5m, the regime where the raw Flajolet
    estimator applies; the small-range linear-counting correction
    needs ln(), which libms round differently — out of scope by
    design, noted not hidden).

    The hash is the public Thomas-Mueller/degski 32-bit integer mix
    (h ^= h>>16; h *= 0x45d9f3b; twice; final xor-shift): constants
    below 2^27 keep every product under 2^59, so the whole avalanche
    runs in int64 with no 128-bit ops. (A plain Knuth multiplicative
    hash maps SEQUENTIAL ids to a near-perfect Weyl spread — 149
    occupied buckets from 150 keys — which silently voids the
    estimator's randomness assumption; the mixer restores it.)

    Estimator in exact rationals: with register maxima M_j, the
    harmonic denominator Z = sum(2^-M_j) is carried as the integer
    Z_num = sum(2^(25-M_j)) over all 256 registers (empty register =
    2^25), and E = alpha*m^2/Z becomes ONE bigint floor-division
    (alpha_e6*m^2*2^25) div (1e6*Z_num) — no doubles anywhere.

    Scale shape: registers are a (event_type, bucket) MAX — map-side
    combined, mergeable across partitions/days exactly like the
    Datasketches variant, at most 5*256 rows after the partial agg.
    The exact COUNT(DISTINCT) yardstick is the only expensive column
    and exists to price the sketch's error honestly. The hash/register
    projection is shared with the streaming twin ``streaming_hll``
    (functions/sketch.py), whose micro-batch register merges converge
    to this query's exact output in any arrival order.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    b = hll_bucket_rho(ev, HLL_KEY_SQL, "event_type")
    regs = b.groupBy("event_type", "bucket").agg(F.max("rho").alias("m"))
    z = regs.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(25 - m AS INT))")).alias(
            "z_part"
        ),
    )
    e = z.select(
        "event_type",
        col("nb").cast("bigint").alias("n_buckets"),
        F.expr("z_part + (256 - nb) * CAST(33554432 AS BIGINT)").alias("z_num"),
    ).withColumn(
        "hll_estimate",
        F.expr(f"CAST({HLL_NUM} div (1000000 * z_num) AS BIGINT)"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct(F.expr(HLL_KEY_SQL)).cast("bigint").alias("exact_distinct")
    )
    return e.join(exact, "event_type").select(
        "event_type",
        "n_buckets",
        col("z_num").cast("bigint").alias("z_num"),
        "hll_estimate",
        "exact_distinct",
        F.abs(col("hll_estimate") - col("exact_distinct"))
        .cast("bigint")
        .alias("abs_err"),
    )
