"""Skew-mitigation operators: salted two-phase ranking.

AQE's skew handling splits oversized SHUFFLE partitions for joins and
aggregates, but a window function cannot be split that way — rank()
over a hot key needs every row of the key in one task, so one
pathological user (a bot account with 10^9 events in a 100 TB log)
serializes an entire stage. For MERGEABLE window consumers (top-k:
the global top-k is contained in the union of per-shard top-ks) the
fix is algebraic, not physical: rank within (key, salt) shards first,
discard everything below k per shard, then rank the ≤ k·n_salts
survivors per key. Phase 1 spreads the hot key over n_salts tasks;
phase 2 touches only a constant number of rows per key.

The result is bitwise-identical to the single-window form — the
registered query shares its oracle with the unsalted one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_topk(
    df: DataFrame,
    part_keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    salt_from: Column,
    n_salts: int = 16,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per ``part_keys`` group under ``order_by``, computed
    as two cascaded windows so no single task ever holds a whole hot
    key. ``salt_from`` must be a deterministic column expression
    (e.g. a unique id) — NOT rand(), which would break replay/retry
    determinism.

    Exactness: for any k and any shard split, the k smallest elements
    of a multiset union are contained in the union of each shard's k
    smallest — so phase 2 sees every global top-k candidate. The
    per-shard rank is discarded; the emitted ``rank_col`` comes from
    the phase-2 window over survivors only.
    """
    salt = (F.abs(F.hash(salt_from)) % n_salts).alias("__salt")
    w1 = Window.partitionBy(*part_keys, "__salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__shard_rk", F.row_number().over(w1))
        .filter(F.col("__shard_rk") <= k)
        .drop("__salt", "__shard_rk")
    )
    w2 = Window.partitionBy(*part_keys).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
