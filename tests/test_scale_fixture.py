"""The 10x scale-up fixture generator (tools/scale10_report.py) must
produce a scale-up that measures PLAN scaling, not artifacts of the
synthesis: exact 10x row counts, intact referential integrity under
the dense key strides, preserved within-copy structure (text token
stats, embedding norms and angles), and cross-copy duplicate/neighbor
structure that scales linearly (disjoint shingles, scattered cosines)
instead of exploding quadratically. Built here at sf0.001 into
tmp_path — the real fixture at sf0.1 lives in gitignored .scale10/.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "tools") not in sys.path:
    sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def scale_dir(spark, tmp_path_factory):
    import scale10_report as s

    root = tmp_path_factory.mktemp("scale10")
    orig_base, orig_root = s.BASE, s.SCALE_ROOT
    s.BASE, s.SCALE_ROOT = "/root/testdata/sf0.001", str(root)
    try:
        s.build_fixture(spark, copies=10)
    finally:
        s.BASE, s.SCALE_ROOT = orig_base, orig_root
    return str(root / "x10")


def _t(spark, d, name):
    return spark.read.parquet(f"{d}/{name}.parquet")


def test_row_counts_scale_10x_and_dims_fixed(spark, scale_dir):
    base = "/root/testdata/sf0.001"
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        assert _t(spark, scale_dir, t).count() == 10 * _t(spark, base, t).count(), t
    for t in ("region", "nation"):
        assert _t(spark, scale_dir, t).count() == _t(spark, base, t).count(), t


def test_keys_unique_and_fks_resolve(spark, scale_dir):
    cust = _t(spark, scale_dir, "customer")
    orders = _t(spark, scale_dir, "orders")
    li = _t(spark, scale_dir, "lineitem")
    n = cust.count()
    assert cust.select("c_custkey").distinct().count() == n
    # every FK joins: anti-joins are empty on all shifted edges
    assert orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").count() == 0
    assert li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count() == 0
    supp = _t(spark, scale_dir, "supplier")
    assert li.join(supp, li.l_suppkey == supp.s_suppkey, "left_anti").count() == 0
    nation = _t(spark, scale_dir, "nation")
    assert cust.join(nation, cust.c_nationkey == nation.n_nationkey, "left_anti").count() == 0


def test_per_copy_order_history_preserved(spark, scale_dir):
    """Copy i's orders are copy 0's orders with shifted keys — the join
    cardinality per entity (degree distribution) is exactly preserved."""
    from pyspark.sql import functions as F

    orders = _t(spark, scale_dir, "orders")
    per_copy = (
        orders.groupBy((F.col("o_orderkey") / 150_000).cast("int").alias("copy"))
        .agg(F.count("*").alias("n"), F.sum(F.hash("o_orderstatus", "o_orderpriority")).alias("sig"))
        .collect()
    )
    assert len(per_copy) == 10
    assert len({r["n"] for r in per_copy}) == 1
    assert len({r["sig"] for r in per_copy}) == 1  # non-key cols identical per copy


def test_text_rotation_preserves_stats_and_disjoins_shingles(spark, scale_dir):
    from pyspark.sql import functions as F

    docs = _t(spark, scale_dir, "documents").withColumn(
        "copy", (F.col("doc_id") / 5_000).cast("int")
    )
    stats = (
        docs.groupBy("copy")
        .agg(
            F.sum(F.length("text")).alias("chars"),
            F.sum(F.size(F.split("text", r"\s+"))).alias("tokens"),
        )
        .collect()
    )
    assert len({r["chars"] for r in stats}) == 1
    assert len({r["tokens"] for r in stats}) == 1
    # cross-copy exact-duplicate texts: none (the per-copy letter
    # permutation makes copies disjoint), while within-copy duplicates
    # are preserved 10x
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_rows = base.count()
    base_distinct = base.select("text").distinct().count()
    assert docs.select("text").distinct().count() == 10 * base_distinct
    assert docs.count() == 10 * base_rows


def test_embedding_flip_preserves_norms_and_within_copy_angles(spark, scale_dir):
    import numpy as np

    base = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").collect()
    }
    scaled = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in _t(spark, scale_dir, "embeddings").collect()
    }
    stride = 2_000
    ids = sorted(base)[:20]
    for copy in (0, 3, 7):
        for vid in ids:
            b, s = base[vid], scaled[vid + copy * stride]
            assert math.isclose(np.linalg.norm(b), np.linalg.norm(s), rel_tol=1e-6)
        # same-copy pairwise dot products are exactly preserved (diag +-1
        # is orthogonal), so cluster geometry is intact
        a, b = ids[0], ids[1]
        want = float(base[a] @ base[b])
        got = float(scaled[a + copy * stride] @ scaled[b + copy * stride])
        assert math.isclose(want, got, rel_tol=1e-6)
    # cross-copy cosine of the SAME source vector scatters well below 1
    for vid in ids[:5]:
        b = base[vid]
        for copy in (1, 5, 9):
            s = scaled[vid + copy * stride]
            cos = float(b @ s) / (np.linalg.norm(b) * np.linalg.norm(s))
            assert abs(cos) < 0.9, (vid, copy, cos)


def test_copy_sign_patterns_are_distinct():
    """No two copies share a sign pattern (a collision would silently
    reintroduce cross-copy exact duplicates — the failure mode a naive
    parity-based pattern hits at even copy indices). Checked across the
    full 100x copy range, not just the 10x fixture."""
    import scale10_report as s

    pats = {tuple(s._sign(i, d) for d in range(64)) for i in range(100)}
    assert len(pats) == 100


def test_copy_letter_perms_are_distinct_bijections():
    """Every copy's text transform is a true permutation of [a-z]
    (lengths and token stats preserved) and no two copies share one —
    the failure mode a Caesar rotation hits at copy i == j mod 26,
    silently reintroducing cross-copy exact duplicates once the 100x
    fixture exceeds 26 copies."""
    import scale10_report as s

    perms = [s._letter_perm(i) for i in range(100)]
    assert perms[0] == s.LOWER
    for p in perms:
        assert sorted(p) == sorted(s.LOWER)
    assert len(set(perms)) == 100
