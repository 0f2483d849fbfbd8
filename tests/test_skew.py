"""Salting correctness: salted two-stage results must equal the
unsalted single-stage results exactly (decimal accumulation makes the
sums order-independent, so equality is bitwise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sparkstreaming_spark.operators.skew import salted_join, salted_sum_count
from iot_sparkstreaming_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    salted = {
        r.l_returnflag: (r.sum_value, r.n_rows)
        for r in salted_sum_count(
            li, ["l_returnflag"], "l_quantity", salt_from="l_orderkey"
        ).collect()
    }
    plain = {
        r.l_returnflag: (r.sum_value, r.n_rows)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,4)"))
            .cast("double")
            .alias("sum_value"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "l_orderkey", salt_from="l_quantity", n_salts=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count() > 0
    # exact multiset equality on a sample of columns
    a = sorted(map(tuple, salted.select("l_orderkey", "o_orderpriority").collect()))
    b = sorted(map(tuple, plain.select("l_orderkey", "o_orderpriority").collect()))
    assert a == b


def _bands_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, band int, bucket bigint")


def _naive_pairs(rows):
    from collections import defaultdict
    from itertools import combinations

    buckets = defaultdict(list)
    for vid, band, bucket in rows:
        buckets[(band, bucket)].append(vid)
    out = set()
    for ids in buckets.values():
        for a, b in combinations(sorted(ids), 2):
            out.add((a, b))
    return out


def test_capped_bucket_join_exact_below_cap(spark):
    """With every bucket at or under the cap the output must be the
    IDENTICAL candidate-pair set as the naive band self-join — the
    property that makes the cap wireable without moving any hash."""
    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    rows = [
        (1, 0, 7), (2, 0, 7), (3, 0, 7),          # occ 3
        (4, 0, 9), (5, 0, 9),                      # occ 2
        (1, 1, 2), (4, 1, 2),                      # cross-band pair
        (6, 1, 5),                                 # singleton
    ]
    got = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(_bands_df(spark, rows), cap=3).collect()
    }
    assert got == _naive_pairs(rows)


def test_capped_bucket_join_bounds_hot_bucket(spark):
    """A bucket above the cap is sharded: emitted pairs are a strict
    subset of the naive set, every shard stays bounded (pair mass per
    bucket drops from C(occ,2) toward ~occ*cap/2), and COLD buckets
    are untouched."""
    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    hot = [(i, 0, 42) for i in range(40)]          # occ 40, cap 10
    cold = [(100, 0, 7), (101, 0, 7), (102, 1, 3), (103, 1, 3)]
    rows = hot + cold
    got = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(_bands_df(spark, rows), cap=10).collect()
    }
    naive = _naive_pairs(rows)
    assert got < naive
    # cold buckets keep their exact pairs
    assert (100, 101) in got and (102, 103) in got
    # hot-bucket pair mass: 4 hash-assigned shards of ~10 give
    # ~4*C(10,2) ≈ 180 pairs in expectation (shard sizes are
    # multinomial, so allow slack) vs the naive C(40,2) = 780 — assert
    # the mass at least halves
    hot_pairs = {p for p in got if p[0] < 100 and p[1] < 100}
    assert 0 < len(hot_pairs) < 780 / 2
    # determinism: a second run emits the identical set
    again = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(_bands_df(spark, rows), cap=10).collect()
    }
    assert again == got


def test_capped_bucket_join_band_decorrelated(spark):
    """The shard salt hashes (id, band), so ids co-bucketed in TWO hot
    bands get independent shard draws — across enough ids, some pair
    split apart in band 0 must survive via band 1 (the OR-construction
    recovery property the docstring claims)."""
    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    n, cap = 60, 10
    rows = [(i, 0, 1) for i in range(n)] + [(i, 1, 8) for i in range(n)]
    df = _bands_df(spark, rows)
    got = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(df, cap=cap).collect()
    }
    per_band = {}
    for band in (0, 1):
        only = [r for r in rows if r[1] == band]
        per_band[band] = {
            (r.id1, r.id2)
            for r in capped_bucket_self_join(_bands_df(spark, only), cap=cap).collect()
        }
    # the union across bands is what the two-band table yields...
    assert got == per_band[0] | per_band[1]
    # ...and each band contributes pairs the other lost (independent draws)
    assert per_band[0] - per_band[1] and per_band[1] - per_band[0]
