"""Two-level (sharded) prefix scan: global row ranks and running sums
without a per-key window sort.

A window partitioned on a LOW-CARDINALITY key (event_type: 5 values)
caps parallelism at the key cardinality no matter how many executors
exist — the 100x scale measurement (docs/SCALING.md) clocked the
single-window forms of cusum / equi-depth / weighted-median at
10-17 s while everything around them finished in ~1 s. The classic
fix (vectorized prefix-scan literature; Blelloch '90) is two levels:

1. shard every row by a MONOTONE bucketing of the ordering column
   (derived from the global min/max via a broadcast 1-row aggregate —
   never a driver collect), so shard order is consistent with row
   order and equal keys land in one shard;
2. run the rank/prefix windows per (key, shard) — shard-parallel;
3. aggregate per-(key, shard) counts/sums (a tiny keys x shards
   table), roll them into per-shard offsets with a window over that
   tiny table, and broadcast-join the offsets back: local + offset
   reconstructs the EXACT global rank and prefix.

The output is bitwise identical to the single-window form — shard
boundaries cancel out of the reconstruction — so oracle hashes are
unchanged; only the physical parallelism changes (executors instead
of key cardinality). Per-shard totals are true SUMs of the raw
measure, not max-of-prefix, so negative measures are safe.

Reference basis: IOT_SparkStreaming has no analog (its DStream jobs
never rank); this exists for the engine's added analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def two_level_prefix(
    spark: SparkSession,
    df: DataFrame,
    part: str,
    order_num: Column,
    tiebreaks: list[str],
    measures: dict[str, Column] | None = None,
) -> DataFrame:
    """Return ``df``'s columns plus exact global per-``part`` order
    statistics, computed shard-parallel:

    * ``rn``  — row_number over (order_num, *tiebreaks) within part;
    * ``n``   — part row count;
    * per measure ``m``: ``m_pfx`` (running sum up to and including
      the current row, in the same order) and ``m_tot`` (part total).

    ``order_num`` must be numeric and the FIRST ordering key (ties
    broken by ``tiebreaks``); measure columns may be any summable
    type (bigint/decimal) and may be negative.
    """
    measures = measures or {}
    n_shards = max(spark.sparkContext.defaultParallelism, 1)
    base_cols = df.columns
    src = df.withColumn("_ord", order_num)
    bounds = src.agg(F.min("_ord").alias("_lo"), F.max("_ord").alias("_hi"))
    # monotone shard id: equal _ord values share a shard; the top edge
    # clamps into the last shard; a constant column degrades to one
    # shard (still correct, just unsharded)
    width = (col("_hi") - col("_lo")) / n_shards
    shard = (
        F.when(col("_hi") <= col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((col("_ord") - col("_lo")) / width).cast("bigint"),
                F.lit(n_shards - 1),
            )
        )
        .cast("bigint")
    )
    sh = src.crossJoin(F.broadcast(bounds)).withColumn("_shard", shard)

    wo = Window.partitionBy(part, "_shard").orderBy("_ord", *tiebreaks)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    loc = sh.select(
        *base_cols,
        "_ord",
        "_shard",
        *[m.alias(f"_{name}_raw") for name, m in measures.items()],
        F.row_number().over(wo).cast("bigint").alias("_rn_loc"),
    )
    loc = loc.select(
        *loc.columns,
        *[
            F.sum(col(f"_{name}_raw")).over(run).alias(f"_{name}_loc")
            for name in measures
        ],
    )

    totals = loc.groupBy(part, "_shard").agg(
        F.count("*").cast("bigint").alias("_cnt"),
        *[F.sum(col(f"_{name}_raw")).alias(f"_{name}_sh") for name in measures],
    )
    wsh = Window.partitionBy(part).orderBy("_shard")
    wpt = Window.partitionBy(part)
    offs = totals.select(
        part,
        "_shard",
        (F.sum("_cnt").over(wsh) - col("_cnt")).alias("_rn_off"),
        F.sum("_cnt").over(wpt).alias("n"),
        *[
            c
            for name in measures
            for c in (
                (F.sum(col(f"_{name}_sh")).over(wsh) - col(f"_{name}_sh")).alias(
                    f"_{name}_off"
                ),
                F.sum(col(f"_{name}_sh")).over(wpt).alias(f"{name}_tot"),
            )
        ],
    )

    out = loc.join(F.broadcast(offs), [part, "_shard"])
    return out.select(
        *base_cols,
        (col("_rn_loc") + col("_rn_off")).alias("rn"),
        col("n"),
        *[
            c
            for name in measures
            for c in (
                (col(f"_{name}_loc") + col(f"_{name}_off")).alias(f"{name}_pfx"),
                col(f"{name}_tot"),
            )
        ],
    )
