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
   order and equal keys land in one shard; NULL order values get a
   dedicated lowest shard (-1), matching the NULLS FIRST order of an
   ascending window sort;
2. run the rank/prefix windows per (key, shard) — shard-parallel;
3. aggregate per-(key, shard) counts/sums (a tiny keys x shards
   table), roll them into per-shard offsets with a window over that
   tiny table, and broadcast-join the offsets back: local + offset
   reconstructs the EXACT global rank and prefix.

The output is bitwise identical to the single-window form — shard
boundaries cancel out of the reconstruction — so oracle hashes are
unchanged; only the physical parallelism changes (executors instead
of key cardinality). Per-shard totals are true SUMs of the raw
measure, not max-of-prefix, so negative measures are safe; NULL
measures reproduce SQL running-sum semantics exactly (the prefix is
NULL until the first non-null value anywhere in the key, then nulls
are skipped) because the offset uses a preceding-rows frame and the
reconstruction only substitutes 0 when at least one side is non-null.

The sharded form pays a fixed overhead (a second scan for the bounds
aggregate plus two extra tiny exchanges) that only amortizes once the
per-key sort actually serializes — ``input_bytes`` lets callers that
know their source size keep the cheap single-window plan for small
inputs (identical output either way; see ``SHARD_MIN_BYTES``).

Reference basis: IOT_SparkStreaming has no analog (its DStream jobs
never rank); this exists for the engine's added analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

#: below this input size the per-key window sort finishes in ~0.1 s
#: even fully serialized — under the sharded form's fixed ~0.3 s
#: overhead — so callers passing ``input_bytes`` keep the one-window
#: plan for small inputs and shard past it (sf0.1 events is ~2 MiB,
#: the 10x scale fixture ~20 MiB: the gate flips between the decades
#: where the serialization was actually measured to bite).
SHARD_MIN_BYTES = 8 << 20


def _reserved_names(measures: dict) -> set[str]:
    out = {"_ord", "_shard", "_rn_loc", "_rn_off", "_cnt", "_lo", "_hi", "rn", "n"}
    for name in measures:
        out |= {
            f"_{name}_raw",
            f"_{name}_loc",
            f"_{name}_sh",
            f"_{name}_off",
            f"{name}_pfx",
            f"{name}_tot",
        }
    return out


def _single_window_prefix(
    df: DataFrame,
    part: str,
    order_num: Column,
    tiebreaks: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """The classic one-window form — same output contract, one sort
    per key. Correct at any size; serializes at key-cardinality
    parallelism, so only chosen for small inputs."""
    base_cols = df.columns
    src = df.withColumn("_ord", order_num)
    wo = Window.partitionBy(part).orderBy("_ord", *tiebreaks)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy(part)
    return src.select(
        *base_cols,
        F.row_number().over(wo).cast("bigint").alias("rn"),
        F.count("*").over(wp).cast("bigint").alias("n"),
        *[
            c
            for name, m in measures.items()
            for c in (
                F.sum(m).over(run).alias(f"{name}_pfx"),
                F.sum(m).over(wp).alias(f"{name}_tot"),
            )
        ],
    )


def two_level_prefix(
    spark: SparkSession,
    df: DataFrame,
    part: str,
    order_num: Column,
    tiebreaks: list[str],
    measures: dict[str, Column] | None = None,
    *,
    input_bytes: int | None = None,
) -> DataFrame:
    """Return ``df``'s columns plus exact global per-``part`` order
    statistics, computed shard-parallel:

    * ``rn``  — row_number over (order_num, *tiebreaks) within part;
    * ``n``   — part row count;
    * per measure ``m``: ``m_pfx`` (running sum up to and including
      the current row, in the same order) and ``m_tot`` (part total).

    ``order_num`` must be numeric and the FIRST ordering key (ties
    broken by ``tiebreaks``); measure columns may be any summable
    type (bigint/decimal), may be negative, and may be NULL (running
    sums reproduce window-SQL null semantics exactly). NULL order
    values sort first, as in an ascending window sort.

    ``input_bytes`` (optional): the source's on-disk size when the
    caller knows it; below ``SHARD_MIN_BYTES`` the identical-output
    single-window plan is used instead (cheaper at small scale).
    """
    measures = measures or {}
    clash = _reserved_names(measures) & set(df.columns)
    if clash:
        raise ValueError(
            f"two_level_prefix reserves column names {sorted(clash)}; "
            "rename or drop them in the input frame"
        )
    if input_bytes is not None and input_bytes < SHARD_MIN_BYTES:
        return _single_window_prefix(df, part, order_num, tiebreaks, measures)
    n_shards = max(spark.sparkContext.defaultParallelism, 1)
    base_cols = df.columns
    src = df.withColumn("_ord", order_num)
    bounds = src.agg(F.min("_ord").alias("_lo"), F.max("_ord").alias("_hi"))
    # monotone shard id: equal _ord values share a shard; the top edge
    # clamps into the last shard; a constant column degrades to one
    # shard (still correct, just unsharded); NULL _ord goes to the
    # dedicated -1 shard so it sorts before every value (NULLS FIRST,
    # exactly as Window.orderBy ascending would place it)
    width = (col("_hi") - col("_lo")) / n_shards
    shard = (
        F.when(col("_ord").isNull(), F.lit(-1))
        .when(col("_hi") <= col("_lo"), F.lit(0))
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
    # offsets come from a PRECEDING-rows frame (not running-sum minus
    # current): with NULL-summing shards, `running - current` would
    # poison the offset with NULL where SQL semantics need "sum of
    # prior shards' non-null mass, NULL only if there is none".
    wsh = Window.partitionBy(part).orderBy("_shard")
    prior = wsh.rowsBetween(Window.unboundedPreceding, -1)
    wpt = Window.partitionBy(part)
    offs = totals.select(
        part,
        "_shard",
        F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).alias("_rn_off"),
        F.sum("_cnt").over(wpt).alias("n"),
        *[
            c
            for name in measures
            for c in (
                F.sum(col(f"_{name}_sh")).over(prior).alias(f"_{name}_off"),
                F.sum(col(f"_{name}_sh")).over(wpt).alias(f"{name}_tot"),
            )
        ],
    )

    def _pfx(name: str) -> Column:
        loc_c, off_c = col(f"_{name}_loc"), col(f"_{name}_off")
        # NULL iff no non-null measure anywhere up to this row — the
        # exact global running-sum contract; otherwise missing sides
        # contribute 0.
        return (
            F.when(loc_c.isNull() & off_c.isNull(), F.lit(None))
            .otherwise(F.coalesce(loc_c, F.lit(0)) + F.coalesce(off_c, F.lit(0)))
            .alias(f"{name}_pfx")
        )

    out = loc.join(F.broadcast(offs), [part, "_shard"])
    return out.select(
        *base_cols,
        (col("_rn_loc") + col("_rn_off")).alias("rn"),
        col("n"),
        *[c for name in measures for c in (_pfx(name), col(f"{name}_tot"))],
    )
