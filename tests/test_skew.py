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


def test_cap_and_probes_validated():
    """cap <= 0 used to make occ/cap NULL (non-ANSI division by zero),
    greatest(1, NULL) = 1 shard, and the join ran silently UNCAPPED —
    invalid knobs must raise, not weaken the guarantee (ADVICE r13)."""
    import pytest

    from iot_sparkstreaming_spark.operators.skew import (
        bucket_shard,
        capped_bucket_self_join,
    )

    with pytest.raises(ValueError):
        bucket_shard(F.col("a"), F.col("b"), F.col("c"), cap=0)
    with pytest.raises(ValueError):
        capped_bucket_self_join(None, cap=-3)
    with pytest.raises(ValueError):
        capped_bucket_self_join(None, cap=5, n_probes=0)


def test_capped_occupancy_counts_distinct_ids(spark):
    """Occupancy is countDistinct(id), not count(*): duplicate
    (id, band, bucket) rows in a non-deduplicated band table must not
    inflate a bucket past the cap and silently shard it (ADVICE r13 —
    the 'exact below the cap' guarantee is over distinct ids). 12
    distinct ids duplicated 4x: raw count 48 >> cap 12, distinct 12 ==
    cap, so the bucket stays single-shard and ALL C(12,2)=66 pairs
    must emerge (a raw-count shard into 4 would lose ~3/4 of them)."""
    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    rows = [(i, 0, 5) for i in range(12)] * 4
    got = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(_bands_df(spark, rows), cap=12).collect()
    }
    assert got == _naive_pairs(set(rows))


def test_gate_corpus_estimate_immune_to_expanded_bands(spark):
    """The gate's corpus-size estimate is countDistinct(vec_id), not
    rows-derived (r14 verdict task 5): a band table where each id
    occupies MORE than one bucket per band (probe-expanded index, or
    plain duplicated rows) must not inflate n — the old
    `rows // N_BANDS` would double n here, quadruple model_mass, read
    skew 0.97 < 2.0 and silently leave the hot buckets UNCAPPED.

    Geometry (4 bands = similarity.N_BANDS, 64 distinct ids, each id
    on TWO rows per band): per band, ids 0..31 share one hot bucket
    (occ 32) and every id also sits in its own singleton bucket
    (mass 0). True n = 64 -> bits = 4, model_mass = 512, mass =
    4*C(32,2) = 1984, skew = 3.875 >= 2.0 -> the gate must cap at
    CAP_MULT*64/16 = 16 and shard the occ-32 buckets: output is a
    strict subset of the naive pairs, and IDENTICAL to forcing that
    cap through the same path."""
    from iot_sparkstreaming_spark.queries.dedup import _band_candidate_pairs

    rows = []
    for band in range(4):
        rows += [(i, band, 0) for i in range(32)]          # hot bucket
        rows += [(i, band, 1 + (i - 32)) for i in range(32, 64)]
        rows += [(i, band, 1000 + i) for i in range(64)]   # 2nd row/id
    df = _bands_df(spark, rows)
    gated = {(r.vec_a, r.vec_b) for r in _band_candidate_pairs(df).collect()}
    naive = _naive_pairs(rows)
    assert gated < naive  # the gate fired despite the row expansion
    forced = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(df, force_cap=16).collect()
    }
    assert gated == forced  # gate-derived cap == CAP_MULT * n / 2^bits
    # whole-table duplication changes nothing: n and mass are both
    # distinct-based, and the capped join drops duplicate input rows
    # before the occ join (ADVICE r14) instead of exploding them
    gated_dup = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(_bands_df(spark, rows * 2)).collect()
    }
    assert gated_dup == gated


def test_capped_join_invariants_randomized(spark):
    """Property test over randomized band tables (hypothesis): for ANY
    table — including duplicate rows and multi-bucket ids — and any
    cap, (1) p=1 pairs ⊆ p=2 pairs ⊆ naive pairs (monotone in probes,
    never exceeds the uncapped set), (2) cap ≥ the max distinct
    occupancy gives EXACTLY the naive set (the wireability guarantee
    on arbitrary geometry, not just the fixtures above), and (3)
    duplicating every input row changes nothing (distinct-based
    occupancy + input dedup). One Spark job chain per example, low
    example count for JVM round-trip cost (test_properties.py
    policy)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),  # vec_id
                st.integers(min_value=0, max_value=1),   # band
                st.integers(min_value=0, max_value=2),   # bucket
            ),
            min_size=2,
            max_size=48,
        ),
        cap=st.integers(min_value=1, max_value=6),
    )
    def prop(rows, cap):
        df = _bands_df(spark, rows)
        p1 = {
            (r.id1, r.id2)
            for r in capped_bucket_self_join(df, cap=cap).collect()
        }
        p2 = {
            (r.id1, r.id2)
            for r in capped_bucket_self_join(df, cap=cap, n_probes=2).collect()
        }
        naive = _naive_pairs(set(rows))
        assert p1 <= p2 <= naive
        occ = Counter()
        for vid, band, bucket in set(rows):
            occ[(band, bucket)] += 1
        if cap >= max(occ.values()):
            assert p1 == naive
        dup = {
            (r.id1, r.id2)
            for r in capped_bucket_self_join(
                _bands_df(spark, rows * 2), cap=cap
            ).collect()
        }
        assert dup == p1

    prop()


def test_multiprobe_monotone_and_bounded(spark):
    """n_probes=2 must strictly EXTEND the p=1 candidate set (probe 0
    is the base (id, band) draw, so every p=1 collision persists),
    recover a meaningful fraction of the pairs p=1 lost (model: per
    hot cell survival 1/k -> ~1-((k-a)/k)^2), and still stay below the
    naive join (the cap still bounds per-shard mass)."""
    from iot_sparkstreaming_spark.operators.skew import capped_bucket_self_join

    rows = [(i, 0, 42) for i in range(40)]  # occ 40, cap 10 -> k=4 shards
    df = _bands_df(spark, rows)
    p1 = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(df, cap=10).collect()
    }
    p2 = {
        (r.id1, r.id2)
        for r in capped_bucket_self_join(df, cap=10, n_probes=2).collect()
    }
    naive = _naive_pairs(rows)
    assert p1 < p2 < naive
    # k=4: p=1 survival ~1/4, p=2 ~ up to 1-(2/4)^2 = 3/4 -- assert the
    # direction with generous slack (hash draws, not i.i.d. samples)
    assert len(p2) > 1.5 * len(p1)


def test_cap_wiring_production_path_exact_when_cold(spark):
    """THE integration test the r13 verdict asked for, part (a): drive
    the CAPPED branch through the production candidate path
    (queries/dedup._band_candidate_pairs, the function the
    lsh_scored_pairs artifact builds on) with a cap at/above the
    hottest real bucket -- no bucket is hot, so the capped branch must
    emit the IDENTICAL candidate set as the gate's naive branch (the
    below-cap exactness that makes the wiring a no-hash-movement
    change by construction)."""
    from iot_sparkstreaming_spark.queries.dedup import _band_candidate_pairs
    from iot_sparkstreaming_spark.queries.similarity import _lsh_bands

    bands = _lsh_bands(spark, SF_DIR)
    naive = {
        (r.vec_a, r.vec_b) for r in _band_candidate_pairs(bands).collect()
    }
    max_occ = (
        bands.groupBy("band", "bucket")
        .agg(F.countDistinct("vec_id").alias("occ"))
        .agg(F.max("occ").alias("m"))
        .first()["m"]
    )
    capped = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(bands, force_cap=int(max_occ)).collect()
    }
    assert capped == naive and len(naive) > 0


def test_cap_wiring_production_path_bounds_hot_buckets(spark):
    """Part (b): a forced TINY cap through the same production path
    must (1) emit a strict subset of the naive candidates, (2) keep
    every pair that has cold-bucket support (exactness below the cap),
    and (3) cut the per-bucket pair mass -- recomputed via the SHARED
    skew.bucket_shard expression, so the bound asserted is the bound
    the operator actually enforces."""
    from iot_sparkstreaming_spark.operators.skew import bucket_shard
    from iot_sparkstreaming_spark.queries.dedup import _band_candidate_pairs
    from iot_sparkstreaming_spark.queries.similarity import _lsh_bands

    cap = 4
    bands = _lsh_bands(spark, SF_DIR)
    naive = {
        (r.vec_a, r.vec_b) for r in _band_candidate_pairs(bands).collect()
    }
    capped = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(bands, force_cap=cap).collect()
    }
    assert capped < naive
    # (2) cold-support pairs survive exactly: every naive pair sharing
    # at least one bucket whose distinct occupancy is <= cap
    occ = bands.groupBy("band", "bucket").agg(
        F.countDistinct("vec_id").alias("_occ")
    )
    cold_rows = bands.join(occ.filter(F.col("_occ") <= cap), ["band", "bucket"])
    cold_pairs = {
        (r.vec_a, r.vec_b)
        for r in cold_rows.alias("a")
        .join(cold_rows.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
        .collect()
    }
    assert cold_pairs <= capped
    # (3) per-(band, bucket, shard) pair mass, via the shared shard
    # expression: the capped mass must be a small fraction of the
    # uncapped sum(C(occ, 2)) -- cap 4 vs ~31 expected occupancy cuts
    # each bucket's mass ~cap/occ
    sharded_sizes = (
        bands.join(occ, ["band", "bucket"])
        .select(
            "band",
            "bucket",
            bucket_shard(
                F.col("vec_id"), F.col("band"), F.col("_occ"), cap
            ).alias("_sh"),
        )
        .groupBy("band", "bucket", "_sh")
        .agg(F.count("*").alias("c"))
    )
    masses = sharded_sizes.join(occ, ["band", "bucket"]).agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("capped_mass"),
        F.sum(
            F.when(
                F.col("_sh") == 0, F.col("_occ") * (F.col("_occ") - 1) / 2
            ).otherwise(0.0)
        ).alias("uncapped_mass"),
    ).first()
    assert masses["capped_mass"] < 0.5 * masses["uncapped_mass"]


def test_cap_wiring_multiprobe_through_production_path(spark):
    """The recall knob reaches through the gate: n_probes=2 with the
    same forced tiny cap must strictly extend the p=1 candidate set
    (probe 0 keeps the base draw) while staying below the naive set —
    i.e. the parameter the wiring day's recall budget turns is live
    end-to-end in the production candidate path, not just on the
    operator."""
    from iot_sparkstreaming_spark.queries.dedup import _band_candidate_pairs
    from iot_sparkstreaming_spark.queries.similarity import _lsh_bands

    cap = 4
    bands = _lsh_bands(spark, SF_DIR)
    naive = {
        (r.vec_a, r.vec_b) for r in _band_candidate_pairs(bands).collect()
    }
    p1 = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(bands, force_cap=cap).collect()
    }
    p2 = {
        (r.vec_a, r.vec_b)
        for r in _band_candidate_pairs(
            bands, force_cap=cap, n_probes=2
        ).collect()
    }
    assert p1 < p2 < naive
