"""Unit tests for the function library and custom operators on tiny
in-memory frames: threshold boundaries, hash/fold cross-engine
invariants, minhash estimation property, as-of join edge cases."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from iot_sparkstreaming_spark.functions.health import (
    classify_warning,
    max_heart_rate,
    round_pulse,
)
from iot_sparkstreaming_spark.functions.text import (
    fingerprint,
    hash64,
    minhash_signature,
    simhash32,
    tokens,
    word_shingles,
)
from iot_sparkstreaming_spark.operators.joins import asof_join


def test_max_heart_rate_breakpoint(spark):
    df = spark.createDataFrame([(39,), (40,), (41,)], ["age"])
    got = {r.age: r.mhr for r in df.select("age", max_heart_rate(F.col("age")).alias("mhr")).collect()}
    assert got[39] == 181  # 220 - 39
    assert got[40] == 178.0  # 208 - 0.75*40
    assert got[41] == 177.25


def test_round_pulse_half_up(spark):
    df = spark.createDataFrame([(72.5,), (72.49,), (71.5,)], ["p"])
    got = [r.r for r in df.select(round_pulse(F.col("p")).alias("r")).collect()]
    assert got == [73, 72, 72]  # (x+0.5).toInt semantics, positives


def test_classify_warning_matrix(spark):
    # age 30 → maxHR 190; θ=0.95 → 180.5
    rows = [
        (180.5, 30, "HYP_1", "critical"),
        (180.5, 30, "HYP_CR", "critical"),
        (180.5, 30, "PRE_HYP", "simple"),
        (180.49, 30, "HYP_2", "no-use"),
    ]
    df = spark.createDataFrame([(p, a, b) for p, a, b, _ in rows], ["p", "a", "b"])
    got = [
        r.w
        for r in df.select(
            classify_warning(F.col("p"), F.col("a"), F.col("b")).alias("w")
        ).collect()
    ]
    assert got == [e for _, _, _, e in rows]


def test_hash64_matches_python_md5(spark):
    df = spark.createDataFrame([("hello",), ("",), ("spark graft",)], ["s"])
    got = {r.s: r.h for r in df.select("s", hash64(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        assert h == int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_word_shingles_guard(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], ["t"])
    got = df.select(word_shingles(tokens(F.col("t"))).alias("sh")).collect()
    assert got[0].sh == []  # < 3 tokens → empty, NOT sequence(1,-1)
    assert got[1].sh == ["a b c", "b c d"]


def test_minhash_estimates_jaccard(spark):
    """Identical sets → all slots agree; disjoint sets → ~none."""
    a = " ".join(f"tok{i}" for i in range(40))
    b = " ".join(f"tok{i}" for i in range(40))  # same
    c = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["id", "t"])
    sigs = {
        r.id: r.sig
        for r in df.select(
            "id", minhash_signature(word_shingles(tokens(F.col("t")))).alias("sig")
        ).collect()
    }
    agree_ab = sum(x == y for x, y in zip(sigs[1], sigs[2]))
    agree_ac = sum(x == y for x, y in zip(sigs[1], sigs[3]))
    assert agree_ab == 16
    assert agree_ac <= 2


def test_simhash_similar_texts_close(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base + " extra"
    far = " ".join(f"z{i}" for i in range(60))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["id", "t"])
    got = {
        r.id: r.s
        for r in df.select("id", simhash32(tokens(F.col("t"))).alias("s")).collect()
    }
    ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert ham(got[1], got[2]) <= 4
    assert ham(got[1], got[3]) >= 8


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",)], ["t"])
    got = [r.f for r in df.select(fingerprint(tokens(F.col("t"))).alias("f")).collect()]
    assert got[0] != got[1]


def test_asof_join_edges(spark):
    """<= tie matching, no-match drop (inner), pick-latest."""
    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 50, "e2"), (2, 10, "e3")], ["k", "t", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 100, "r_at_100"), (1, 60, "r_at_60"), (3, 5, "r_other")],
        ["k", "rt", "val"],
    )
    out = {
        r.tag: r.val
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", right_cols=["val", "rt"]
        ).collect()
    }
    assert out["e1"] == "r_at_100"  # tie at t=100 matches (<=)
    assert "e3" not in out  # key 2 has no right rows → dropped (inner)
    assert "e2" not in out  # t=50 precedes earliest right (60) → dropped


def test_dot_product_parity_with_duckdb(spark):
    """The invariant similarity.py relies on: Spark's sequential
    aggregate fold == DuckDB list_dot_product, bitwise."""
    vecs = [[0.1 * i + 0.01 * j for i in range(8)] for j in range(3)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], ["id", "v"])
    a = df.filter("id = 0").select(F.col("v").alias("va"))
    pairs = a.crossJoin(df.filter("id > 0").select("id", F.col("v").alias("vb")))
    got = {
        r.id: r.dot
        for r in pairs.select(
            "id",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dot"),
        ).collect()
    }
    con = duckdb.connect()
    for i in (1, 2):
        dv = con.execute(
            "SELECT list_dot_product(?::DOUBLE[], ?::DOUBLE[])", [vecs[0], vecs[i]]
        ).fetchone()[0]
        assert dv == got[i]


def test_approx_distinct_within_rsd(spark):
    """HLL++ sketch accuracy: the registered query's boolean verdict
    holds for every group, and the raw estimate (re-derived here, since
    the oracle-matched output deliberately omits the engine-specific
    value) is within 5% of exact."""
    from pyspark.sql import functions as F

    from iot_sparkstreaming_spark.queries.registry import load_all
    from iot_sparkstreaming_spark.tables import load_table

    q = load_all()["approx_distinct_sketch"]
    for r in q.spark(spark, "/root/testdata/sf0.01").collect():
        assert r.approx_within_rsd, r

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_suppkey", rsd=0.05).alias("a"),
        F.countDistinct("l_suppkey").alias("e"),
    ).first()
    assert abs(row.a - row.e) <= max(0.05 * row.e, 2), row


def test_cms_never_undercounts_and_error_bounded(spark):
    """Count-min invariants on the real fixture: the estimate is a
    certain upper bound (every cell holds the key's own mass plus
    non-negative collision mass), and the measured overestimate stays
    within a generous multiple of the expected collision mass N/W
    (Markov bound; deterministic here since data and xxhash seeds are
    fixed)."""
    from iot_sparkstreaming_spark.queries.functions import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_heavy_hitters,
    )
    from iot_sparkstreaming_spark.tables import load_table

    from tests.conftest import SF_DIR

    out = cms_heavy_hitters(spark, SF_DIR).collect()
    assert out and all(r.cms_ge_true for r in out)

    # re-derive the full (unlimited) estimate table to measure error
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    n_total = clicks.count()
    probe = clicks.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    ).withColumn("bucket", F.pmod(F.xxhash64(F.col("user_id"), F.col("j")), F.lit(CMS_WIDTH)))
    sketch = probe.groupBy("j", "bucket").agg(F.count("*").alias("c"))
    est = (
        probe.join(sketch, ["j", "bucket"])
        .groupBy("user_id")
        .agg((F.min("c") - F.count("*") / CMS_DEPTH).alias("overestimate"))
    )
    max_over = est.agg(F.max("overestimate")).first()[0]
    assert max_over >= 0
    assert max_over <= max(5.0, 4.0 * n_total / CMS_WIDTH)


def test_expectations_enforce_quarantines_and_names_rules(spark):
    """enforce() splits exactly by the audited predicates and the
    quarantine rows name every violated rule; NULL predicate results
    fail (an unevaluable expectation did not pass)."""
    from pyspark.sql import functions as F

    from iot_sparkstreaming_spark.operators.quality import audit, enforce

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -3.0, "a"), (3, None, "b"), (4, 700.0, None)],
        ["id", "value", "tag"],
    )
    rules = {
        "value_in_range": (F.col("value") >= 0.0) & (F.col("value") < 500.0),
        "tag_known": F.col("tag").isin("a", "b"),
    }
    a = audit(df, rules).first()
    assert a.n_rows == 4 and a.viol_value_in_range == 3 and a.viol_tag_known == 1

    clean, quarantine = enforce(df, rules)
    assert [r.id for r in clean.collect()] == [1]
    q = {r.id: sorted(r.failed_rules) for r in quarantine.collect()}
    assert q == {
        2: ["value_in_range"],
        3: ["value_in_range"],
        4: ["tag_known", "value_in_range"],
    }


def test_levenshtein_cross_engine_on_typos(spark, duck):
    """The edit-distance rescore path on ACTUAL near-misses (the
    corpus has none): Spark and DuckDB levenshtein must agree with
    each other and with hand-computed distances for substitutions,
    insertions, deletions, transpositions, and the just-over-threshold
    case."""
    pairs = [
        ("the quick brown fox", "the quick brown fox", 0),
        ("the quick brown fox", "the quick brwon fox", 2),  # transposition = 2 ops
        ("the quick brown fox", "the quikc brown fx", 3),
        ("data pipeline v2", "data pipeline v3", 1),
        ("data pipeline v2", "data  pipeline v2", 1),  # insertion
        ("warehouse", "warehous", 1),  # deletion
        ("abcdefgh", "hgfedcba", 8),
    ]
    df = spark.createDataFrame(pairs, ["a", "b", "expected"])
    from pyspark.sql import functions as F

    for r in df.select(
        "a", "b", "expected", F.levenshtein("a", "b").alias("d")
    ).collect():
        assert r.d == r.expected, (r.a, r.b, r.d, r.expected)
    con = duck()
    for a, b, expected in pairs:
        got = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got == expected, (a, b, got, expected)
