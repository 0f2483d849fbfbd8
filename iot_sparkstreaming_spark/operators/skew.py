"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback for the cases AQE cannot fix:

* a single hot KEY in an aggregation (one reducer gets the world —
  splitting a partition doesn't help when one key IS the partition);
* skewed keys in a shuffle join where the other side is small enough
  to replicate per salt but too big to broadcast outright.

``salted_agg`` runs any algebraic aggregation in two stages:
group by (key, salt) — spreading a hot key over ``n_salts`` reducers —
then re-aggregate by key. Correct for aggregations with a merge step
(sum/count/min/max — pass the partial column names and merge exprs).

``salted_join`` salts the skewed (big) side with a random-free
deterministic salt derived from a high-cardinality column, and
explodes the small side ``n_salts``-fold so every (key, salt) pair
still matches. Row multiplicity is preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def _salt_col(det_col: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) — hash of a high-cardinality
    column, not rand(): reruns and retried tasks produce identical
    results (rand() in a shuffle input breaks exactly-once retries)."""
    return F.pmod(F.hash(det_col), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage sum+count of ``value_col`` per key, skew-spread over
    ``n_salts`` partial groups. Returns (key..., sum_value, n_rows).

    Stage 1 shuffles on (key, salt) — a hot key occupies n_salts
    reducers instead of one; stage 2's input is n_salts rows per key,
    so its shuffle is negligible."""
    partial = (
        df.withColumn("_salt", _salt_col(col(salt_from), n_salts))
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(col(value_col).cast("decimal(38,4)")).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join where ``big`` has skewed keys: big side gets a
    deterministic salt, small side is exploded n_salts-fold, and the
    join key becomes (key, salt) — the hot key's rows spread across
    n_salts tasks. Use when the small side fits replicated-n_salts
    but not broadcast; otherwise prefer plain broadcast."""
    big_s = big.withColumn("_salt", _salt_col(col(salt_from), n_salts))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
