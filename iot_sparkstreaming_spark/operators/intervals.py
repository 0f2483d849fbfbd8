"""Interval and dominance operators, input-parametric so they can be
property-tested on arbitrary frames (the fixture-bound queries in
queries/analytics.py delegate here).

Both are window compositions — no joins, no Python — chosen over
their naive quadratic formulations (all-pairs overlap test, NOT
EXISTS dominance) because the window forms cost one sort each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def interval_union_coverage(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "s",
    end: str = "e",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Sweep-line union of per-key intervals ``[start, end)`` (integer
    endpoints): returns one row per key with ``n_intervals``,
    ``n_segments`` (merged runs), and ``covered_ms`` (union length).

    ONE exchange on ``key`` carries the sort, the strict-past
    ``MAX(end)`` window, and the map-side-combined final aggregate —
    O(1) state per row, no self-join (the naive pairwise-overlap
    formulation is O(n²) per key).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(start, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sweep = intervals.withColumn("__prev_e", F.max(end).over(w))
    new_seg = col("__prev_e").isNull() | (col(start) >= col("__prev_e"))
    stripe = F.greatest(
        F.lit(0),
        col(end) - F.greatest(col(start), F.coalesce(col("__prev_e"), col(start))),
    )
    return sweep.groupBy(key).agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(F.when(new_seg, 1).otherwise(0)).cast("bigint").alias("n_segments"),
        F.sum(stripe).cast("bigint").alias("covered_ms"),
    )


def _prune_dominated(df: DataFrame, cost: str, gain: str, group: list[str]) -> DataFrame:
    """Drop rows dominated within ``group`` scope: a row survives iff
    no row with strictly smaller ``cost`` has ``gain`` >= its own, and
    no equal-cost row has ``gain`` strictly above it. (Two window
    columns materialized via select — Spark disallows windows inside
    WHERE.)"""
    w_cheaper = (
        Window.partitionBy(*group)
        .orderBy(cost)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    annotated = df.select(
        "*",
        F.max(gain).over(w_cheaper).alias("__best_cheaper"),
        F.max(gain).over(Window.partitionBy(*group, cost)).alias("__best_same"),
    )
    return annotated.filter(
        (col("__best_cheaper").isNull() | (col(gain) > col("__best_cheaper")))
        & (col(gain) == col("__best_same"))
    ).drop("__best_cheaper", "__best_same")


def pareto_frontier(
    points: DataFrame,
    cost: str,
    gain: str,
    n_salt: int = 32,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skyline over (minimize ``cost``, maximize ``gain``)
    with INTEGER cost values: rows not dominated by any other row
    (``other.cost <= cost AND other.gain >= gain`` with one strict).

    Phase 1 prunes inside ``n_salt`` hash groups — a point dominated
    by a group-mate is dominated globally, so the prune is always
    safe — and phase 2 runs the exact test on the union of local
    frontiers, so the single-direction global window sees
    ~``n_salt × |frontier|`` rows instead of the table. The classic
    distributed-skyline partition-then-merge (Borzsony et al.,
    ICDE'01 lineage).
    """
    salt_col = F.pmod(F.hash(salt_on if salt_on else cost), F.lit(n_salt))
    local = _prune_dominated(
        points.withColumn("__salt", salt_col), cost, gain, ["__salt"]
    ).drop("__salt")
    return _prune_dominated(local, cost, gain, [])
