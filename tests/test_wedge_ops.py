"""Unit tests for the shared wedge-enumeration trio
(operators/graph.py wedge_adjacency / wedge_pair_counts /
wedge_link_prediction) — extracted from link_prediction_suppliers in
round 12 so the profile tool times the exact production stages.

The registered query keeps its end-to-end oracle hash check
(tests/test_oracle_parity.py); these tests pin the operator-level
contracts on hand-built graphs: brute-force pair parity, the degree
cap actually dropping hubs, Jaccard consistency on the CAPPED graph,
and the packed-key overflow guard failing loudly instead of wrapping.
"""

from __future__ import annotations

from itertools import combinations

import pytest


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "a bigint, b bigint")


def _brute_common(edges, cap):
    """Common-neighbor counts by brute force over the capped graph."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
    nbrs = {a: ns for a, ns in nbrs.items() if len(ns) <= cap}
    out = defaultdict(int)
    for ns in nbrs.values():
        for s1, s2 in combinations(sorted(ns), 2):
            out[(s1, s2)] += 1
    return dict(out)


def test_wedge_pair_counts_match_bruteforce(spark):
    from iot_sparkstreaming_spark.operators.graph import (
        wedge_adjacency,
        wedge_pair_counts,
    )

    # 3 pivots sharing overlapping neighbor sets + one hub pivot that
    # must be dropped by cap=3; duplicate edges exercise the
    # collect_set dedup (multiplicities must not inflate the cap test
    # or double-count wedges)
    edges = [
        (1, 10), (1, 20), (1, 30),
        (2, 20), (2, 30), (2, 20), (2, 20),  # dupes: still degree 2
        (3, 10), (3, 30),
        (9, 10), (9, 20), (9, 30), (9, 40),  # degree 4 > cap
    ]
    adj = wedge_adjacency(_pairs_df(spark, edges), cap=3)
    got = {
        (r["s1"], r["s2"]): r["common"]
        for r in wedge_pair_counts(adj).collect()
    }
    adj.unpersist()
    assert got == _brute_common(edges, cap=3)
    # the hub's exclusive neighbor never appears
    assert all(40 not in pair for pair in got)


def test_link_prediction_jaccard_on_capped_graph(spark):
    from iot_sparkstreaming_spark.operators.graph import (
        wedge_adjacency,
        wedge_link_prediction,
    )

    edges = [
        (1, 10), (1, 20),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
    ]
    adj = wedge_adjacency(_pairs_df(spark, edges), cap=10)
    rows = {(r["s1"], r["s2"]): r for r in wedge_link_prediction(adj).collect()}
    adj.unpersist()
    # deg(10)=3, deg(20)=2, deg(30)=1 on the capped graph
    r = rows[(10, 20)]
    assert (r["common"], r["deg1"], r["deg2"]) == (2, 3, 2)
    assert r["jaccard"] == pytest.approx(2 / (3 + 2 - 2))
    r = rows[(10, 30)]
    assert (r["common"], r["deg1"], r["deg2"]) == (1, 3, 1)
    assert r["jaccard"] == pytest.approx(1 / (3 + 1 - 1))
    assert (20, 30) not in rows  # no pivot buys from both


def test_degrees_computed_on_capped_graph_not_raw(spark):
    """The Jaccard union must use degrees AFTER the cap drops hub
    pivots — mixing capped wedges with raw degrees would deflate every
    score touching a hub's neighbor."""
    from iot_sparkstreaming_spark.operators.graph import (
        wedge_adjacency,
        wedge_link_prediction,
    )

    edges = [
        (1, 10), (1, 20),
        # hub pivot 9 (degree 3 > cap=2) also buys 10 — dropped, so
        # deg(10) must be 1, not 2
        (9, 10), (9, 30), (9, 40),
    ]
    adj = wedge_adjacency(_pairs_df(spark, edges), cap=2)
    rows = wedge_link_prediction(adj).collect()
    adj.unpersist()
    assert len(rows) == 1
    r = rows[0]
    assert (r["s1"], r["s2"], r["deg1"], r["deg2"]) == (10, 20, 1, 1)
    assert r["jaccard"] == 1.0


def test_overflow_guard_fails_loudly(spark):
    """A node id >= 2^31 would silently wrap the packed bigint wedge
    key; the adjacency guard must raise instead."""
    from iot_sparkstreaming_spark.operators.graph import wedge_adjacency

    # the eager checkpoint materializes the guard at construction;
    # PySpark surfaces the JVM-side raise as SparkRuntimeException
    # (Py4JJavaError on older wrappers) — match on the message
    edges = [(1, 10), (1, 1 << 31)]
    with pytest.raises(Exception, match="overflow the packed wedge key"):
        wedge_adjacency(_pairs_df(spark, edges), cap=10)

    # negative ids would cancel into colliding packed keys — also loud
    with pytest.raises(Exception, match="overflow the packed wedge key"):
        wedge_adjacency(_pairs_df(spark, [(1, -5), (1, 10)]), cap=10)

    # the full valid range is fine
    ok = wedge_adjacency(
        _pairs_df(spark, [(1, 0), (1, 10), (1, (1 << 31) - 1)]), cap=10
    )
    assert ok.count() == 1
    ok.unpersist()


def test_all_null_dst_pivot_dropped_not_misdiagnosed(spark):
    """collect_set drops nulls, so a pivot whose every dst is NULL
    yields an EMPTY neighbor array; element_at on it returns NULL and
    assert_true(NULL) would raise with the misleading overflow message
    (ADVICE r12). The empty array generates zero wedges anyway, so the
    guard drops it instead of raising."""
    from iot_sparkstreaming_spark.operators.graph import (
        wedge_adjacency,
        wedge_pair_counts,
    )

    edges = [(1, 10), (1, 20), (2, None), (2, None), (3, None), (3, 30)]
    adj = wedge_adjacency(_pairs_df(spark, edges), cap=10)
    # pivot 2 (all-null) is gone; pivot 3's null was dropped from its
    # set, leaving [30]; pivot 1 keeps both neighbors
    got = sorted(r["nb"] for r in adj.collect())
    adj.unpersist()
    assert got == [[10, 20], [30]]
    pairs = wedge_pair_counts(wedge_adjacency(_pairs_df(spark, edges), cap=10))
    assert {(r["s1"], r["s2"], r["common"]) for r in pairs.collect()} == {
        (10, 20, 1)
    }
