"""Join operators Spark lacks as built-ins: as-of join and a
range-join helper.

The reference had only inner equi-joins (SURVEY.md §2.3); these are
north-star additions. Both are implemented as compositions of
DataFrame ops (no UDFs), chosen for their 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_time <= left_time`` for the same key.

    Implementation is the union-and-carry pattern, NOT a range join:
    union both sides on (key, time), sort within key, and carry the
    last-seen right values forward with ``last(..., ignorenulls=True)``
    over an unbounded-preceding window. Cost: ONE shuffle of
    |left|+|right| rows on the key — versus a naive
    join-filter-rank which materializes every (left, right) pair per
    key first (quadratic in events-per-key; lethal at 100 TB). This is
    how kdb/Flink-style as-of joins map onto a shuffle engine.

    Right-side rows must be unique per (key, right_time) — pre-dedup
    with ``tie_break`` (max wins) if not. Ties left_time == right_time
    match (<= semantics, like DuckDB ASOF JOIN with >=).
    """
    if tie_break is not None:
        w_dedup = Window.partitionBy(on, right_time).orderBy(F.col(tie_break).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # __r_matched: explicit non-null match marker carried alongside the
    # data columns. Inner-mode filtering on a DATA column would drop a
    # legitimately-matched left row whose matched right value is NULL.
    carried = [f"__r_{c}" for c in right_cols]
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
        F.lit(True).alias("__r_matched"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r.schema[a].dataType).alias(a) for a in carried],
        F.lit(None).cast("boolean").alias("__r_matched"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))

    # right rows sort before left rows at equal time → <= match
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r.select(*l.columns))
    filled = unioned.select(
        "__left",
        "__side",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
        F.last("__r_matched", ignorenulls=True).over(w).alias("__r_matched"),
    ).filter(F.col("__side") == 1)

    out = filled.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(a).alias(c) for a, c in zip(carried, right_cols)],
        "__r_matched",
    )
    if how == "inner":
        out = out.filter(F.col("__r_matched"))
    return out.drop("__r_matched")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    condition: Column,
) -> DataFrame:
    """Equi-key + range-predicate join. Expressed declaratively so
    Catalyst plans the equi-part as a hash/sort-merge join and applies
    the range predicate as a post-join filter — the right plan when
    the equi-key is selective (per-user ranges). For band joins with
    no equi-key, see :func:`band_join`.
    """
    return left.join(right, (left[on] == right[on]) & condition)


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: int,
) -> DataFrame:
    """|left_on − right_on| ≤ band join with NO equi-key — the case a
    naive formulation turns into a broadcast-nested-loop (cross
    product × filter: dead beyond toy sizes, Spark has no native
    batch interval join).

    Construction: MANUFACTURE the equi-key by bucketing the band
    column to the band width. A qualifying pair's buckets differ by
    at most 1, so the left side explodes to its bucket ±1 (3 rows)
    and joins the right's single bucket on equality; the exact band
    predicate then prunes the bucket-collision false positives.
    Cost: 3×|left|+|right| rows shuffled on bucket keys and only
    intra-bucket pairs materialized — the standard interval-bucketing
    rewrite (same trick Flink's interval join and KDB's window join
    use), linear in input + true-output size for bounded density.

    ``left_on`` / ``right_on`` must be integral (epoch ms/us);
    ``band`` is inclusive, in the same unit. Column names must be
    disjoint across the two inputs.
    """
    lb = F.floor(F.col(left_on) / F.lit(band))
    rb = F.floor(F.col(right_on) / F.lit(band))
    l3 = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r1 = right.withColumn("__bucket", rb)
    return (
        l3.join(r1, "__bucket")
        .filter(
            F.abs(F.col(left_on) - F.col(right_on)) <= band
        )
        .drop("__bucket")
    )
