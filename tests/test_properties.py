"""Property-based tests (hypothesis): each Spark operator is compared
against an independent pure-Python reference on randomized inputs —
the oracle suite checks fixed datasets; these check the input space.

One Spark job evaluates a whole hypothesis example (a generated
dataset), keeping example counts low enough for JVM round-trip cost.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iot_sparkstreaming_spark.functions.health import (
    DEFAULT_THRESHOLD,
    HYPERTENSIVE_CATS,
    classify_warning,
    max_heart_rate,
    tuple_string,
)
from iot_sparkstreaming_spark.operators.joins import asof_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BP_CATS = ["NORMAL", "PRE_HYP", "HYP_1", "HYP_2", "HYP_CR"]


def _py_classify(pulse: float, age: int, bp: str, theta: float) -> str:
    max_hr = (220 - age) if age < 40 else (208 - 0.75 * age)
    if pulse >= theta * max_hr:
        return "critical" if bp in HYPERTENSIVE_CATS else "simple"
    return "no-use"


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=30, max_value=300, allow_nan=False),
            st.integers(min_value=15, max_value=90),
            st.sampled_from(BP_CATS),
        ),
        min_size=1,
        max_size=50,
    ),
    theta=st.sampled_from([0.85, 0.95]),
)
def test_classifier_matches_python_reference(spark, rows, theta):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], ["i", "pulse", "age", "bp_cat"]
    )
    got = {
        r.i: r.w
        for r in df.select(
            "i",
            classify_warning(
                F.col("pulse"), F.col("age"), F.col("bp_cat"), theta
            ).alias("w"),
        ).collect()
    }
    for i, (pulse, age, bp) in enumerate(rows):
        assert got[i] == _py_classify(pulse, age, bp, theta), (i, rows[i], theta)


@settings(**SETTINGS)
@given(age=st.integers(min_value=15, max_value=90))
def test_max_hr_continuity_and_bounds(spark, age):
    (got,) = (
        spark.range(1)
        .select(max_heart_rate(F.lit(age)).alias("m"))
        .collect()[0]
    )
    expected = (220 - age) if age < 40 else (208 - 0.75 * age)
    assert got == expected
    assert 140 <= got <= 205


@settings(**SETTINGS)
@given(
    parts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters=",()"),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_tuple_string_format(spark, parts):
    (got,) = (
        spark.range(1)
        .select(tuple_string(*[F.lit(p) for p in parts]).alias("s"))
        .collect()[0]
    )
    assert got == "(" + ",".join(parts) + ")"


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, time)
        min_size=1,
        max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),  # unique per (key, right_time)
    ),
)
def test_asof_join_matches_naive(spark, left, right):
    """The single-shuffle union-carry as-of join must agree with the
    obvious quadratic reference on every randomized input, including
    ties (right_time == left_time matches) and keys with no match."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "lt"]
    )
    rdf = spark.createDataFrame(right, ["k", "rt", "val"])
    got = {
        r.lid: (r.rt, r.val)
        for r in asof_join(
            ldf, rdf, on="k", left_time="lt", right_time="rt",
            right_cols=["rt", "val"], how="inner",
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cand = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        expected = max(cand) if cand else None
        assert got.get(i) == expected, (i, k, t, cand)


@settings(**SETTINGS)
@given(
    left=st.lists(st.integers(-100, 100), min_size=1, max_size=25),
    right=st.lists(st.integers(-100, 100), min_size=1, max_size=25),
    band=st.integers(1, 40),
)
def test_band_join_matches_naive(spark, left, right, band):
    """The bucketized keyless band join must return exactly the pairs
    |l − r| ≤ band, including negative values (floor-div bucketing)
    and band-boundary ties, with no duplicates."""
    from iot_sparkstreaming_spark.operators.joins import band_join

    ldf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(left)], ["lid", "lv"]
    )
    rdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(right)], ["rid", "rv"]
    )
    got = sorted(
        (r.lid, r.rid)
        for r in band_join(ldf, rdf, "lv", "rv", band).collect()
    )
    expected = sorted(
        (li, ri)
        for li, lv in enumerate(left)
        for ri, rv in enumerate(right)
        if abs(lv - rv) <= band
    )
    assert got == expected


def test_asof_join_inner_keeps_null_right_values(spark):
    """ADVICE r1: a matched right row whose carried value is NULL must
    still count as a match in inner mode (the match marker, not a data
    column, decides)."""
    ldf = spark.createDataFrame([(1, 1, 10), (2, 2, 10)], ["lid", "k", "lt"])
    rdf = spark.createDataFrame(
        [(1, 5, None), (2, 5, "x")],
        schema="k int, rt int, val string",
    )
    got = {
        r.lid: (r.rt, r.val)
        for r in asof_join(
            ldf, rdf, on="k", left_time="lt", right_time="rt",
            right_cols=["val", "rt"], how="inner",
        ).collect()
    }
    # first right_col is the NULL-valued one — the old isNotNull test dropped lid=1
    assert got == {1: (5, None), 2: (5, "x")}


def test_tuple_string_renders_null_fields(spark):
    """Scala Tuple.toString renders null fields as the literal 'null';
    concat_ws alone would drop them and shift later fields."""
    (got,) = (
        spark.range(1)
        .select(
            tuple_string(
                F.lit("a"), F.lit(None).cast("string"), F.lit("c")
            ).alias("s")
        )
        .collect()[0]
    )
    assert got == "(a,null,c)"


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with pure-Python union-find on
    random graphs (self-loops included — they're harmless edges)."""
    from iot_sparkstreaming_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected: dict[int, int] = {}
    roots: dict[int, int] = {}
    for node in sorted(parent):
        r = find(node)
        roots.setdefault(r, node)  # min node of the component (sorted order)
        expected[node] = roots[r]

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == expected


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_star_matches_min_label(spark, edges):
    """Large-star/small-star must produce the IDENTICAL (node,
    component) mapping as min-label propagation — same contract, the
    O(log² n)-round swap for deep graphs."""
    from iot_sparkstreaming_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    base = {r.node: r.component for r in connected_components(df).collect()}
    star = {r.node: r.component for r in connected_components_star(df).collect()}
    assert star == base


def test_connected_components_star_deep_chain(spark):
    """A 40-node path graph (diameter 39) — the worst case for
    min-label propagation — must converge for the star variant well
    under the iteration cap and map every node to component 0."""
    from iot_sparkstreaming_spark.operators.graph import connected_components_star

    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.component for r in connected_components_star(df, max_iterations=12).collect()}
    assert got == {i: 0 for i in range(40)}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_matches_python_reference(spark, edges):
    """Fixed-point integer PageRank must agree exactly with a pure-
    Python replay of the same update rule on random directed graphs
    (integer arithmetic means EXACT equality, not approximate)."""
    from iot_sparkstreaming_spark.operators.graph import PR_SCALE, pagerank

    iters, damp = 3, 85
    base = PR_SCALE * (100 - damp) // 100
    outdeg: dict[int, int] = {}
    nodes: set[int] = set()
    for a, b in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
        nodes.update((a, b))
    pr = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        incoming = {n: 0 for n in nodes}
        for a, b in edges:
            incoming[b] += pr[a] // outdeg[a]
        pr = {n: base + (damp * incoming[n]) // 100 for n in nodes}

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.pr for r in pagerank(df, iterations=iters, damping_pct=damp).collect()}
    assert got == pr


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),  # heavy key collisions
        min_size=1,
        max_size=60,
    ),
    k=st.integers(1, 4),
    n_salts=st.integers(1, 8),
)
def test_salted_topk_equals_single_window(spark, rows, k, n_salts):
    """Salted two-phase top-k must be EXACTLY the single-window top-k
    for any key skew, k, and salt count (top-k is a mergeable
    aggregate — phase 1 can never discard a global top-k row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from iot_sparkstreaming_spark.operators.skew import salted_topk

    df = spark.createDataFrame(
        [(key, val, i) for i, (key, val) in enumerate(rows)],
        ["key", "val", "row_id"],
    )
    order = [F.col("val").desc(), F.col("row_id")]
    w = Window.partitionBy("key").orderBy(*order)
    expected = {
        (r.key, r.row_id, r.rk)
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    }
    got = {
        (r.key, r.row_id, r.rk)
        for r in salted_topk(
            df, ["key"], order, k, salt_from=F.col("row_id"), n_salts=n_salts
        ).collect()
    }
    assert got == expected


def _py_bpe(docs: list[list[str]], n_merges: int):
    """Pure-Python greedy BPE reference: count adjacent pairs, merge
    the (count desc, pair asc)-top pair left-to-right, repeat."""
    state = [list(d) for d in docs]
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for d in state:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (p1, p2), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, p1, p2, n))
        new_state = []
        for d in state:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == p1 and d[i + 1] == p2:
                    out.append(p1 + " " + p2)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_state.append(out)
        state = new_state
    return merges


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ).filter(lambda ds: sum(len(d) for d in ds) >= 4)
)
def test_bpe_merge_loop_matches_python(spark, docs):
    """The distributed BPE round (window run-parity merge) must equal
    the sequential greedy reference on random corpora — including
    repeated-token runs ('a a a a'), the case the parity trick exists
    for."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_merges = 3
    expected = _py_bpe(docs, n_merges)

    from iot_sparkstreaming_spark.operators.bpe import bpe_train

    rows = [
        (di, pi + 1, t) for di, d in enumerate(docs) for pi, t in enumerate(d)
    ]
    state = spark.createDataFrame(rows, "doc_id LONG, pos LONG, tok STRING")
    got = bpe_train(state, n_merges)
    assert got == expected


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered triangle counting must agree with a pure-Python
    all-triples check on random graphs (inputs canonicalized to the
    operator's simple-graph contract: u < v, dedup, no self-loops)."""
    from itertools import combinations

    from iot_sparkstreaming_spark.operators.graph import triangle_counts

    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    eset = set(canon)
    nodes = sorted({n for e in canon for n in e})
    expected: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1

    df = spark.createDataFrame(canon, ["u", "v"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "zz"])),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_quality_audit_enforce_partition(spark, rows):
    """For ANY data and the rule set, audit/enforce are consistent:
    clean + quarantine partition the input, the per-rule audit counts
    equal the per-rule quarantine tallies, and rows pass iff they
    violate zero rules (NULLs fail)."""
    from pyspark.sql import functions as F

    from iot_sparkstreaming_spark.operators.quality import audit, enforce

    df = spark.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(rows)], "id long, value double, tag string"
    )
    rules = {
        "value_nonneg": F.col("value") >= 0.0,
        "tag_known": F.col("tag").isin("a", "b"),
    }
    a = audit(df, rules).first()
    clean, quarantine = enforce(df, rules)
    qrows = quarantine.collect()
    assert a.n_rows == len(rows)
    assert clean.count() + len(qrows) == len(rows)
    assert a.viol_value_nonneg == sum(
        1 for r in qrows if "value_nonneg" in r.failed_rules
    )
    assert a.viol_tag_known == sum(1 for r in qrows if "tag_known" in r.failed_rules)
    assert all(len(r.failed_rules) > 0 for r in qrows)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(1, 5),
)
def test_kcore_matches_python_peel(spark, edges, k):
    """Fixed-iteration k-core with enough rounds must equal pure-Python
    peel-to-fixpoint on random multigraphs (self-loops add 2 to their
    node's degree, multi-edges count per occurrence — both engines see
    one row per edge). 16 rounds always suffices on a 16-node universe
    (each non-final peel removes at least one node)."""
    from iot_sparkstreaming_spark.operators.graph import kcore

    cur = list(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = [(a, b) for a, b in cur if a in keep and b in keep]
        if len(nxt) == len(cur):
            break
        cur = nxt
    expected: dict[int, int] = {}
    for a, b in cur:
        expected[a] = expected.get(a, 0) + 1
        expected[b] = expected.get(b, 0) + 1

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r.node: r.deg for r in kcore(df, k, 16).collect()}
    assert got == expected


def test_kcore_fixture_converges_inside_default_rounds(spark):
    """The 40-core of the sf0.01 trade graph must reach its fixpoint
    within the registered query's KCORE_ITERS rounds — one more peel
    changes nothing. Guards the docstring's exactness claim if the
    fixture drifts denser."""
    from iot_sparkstreaming_spark.operators.graph import kcore
    from iot_sparkstreaming_spark.queries.analytics import KCORE_ITERS, KCORE_K
    from iot_sparkstreaming_spark.tables import load_table
    from pyspark.sql.functions import col

    sf = "/root/testdata/sf0.01"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select((col("o_custkey") * 2).alias("a"), (col("l_suppkey") * 2 + 1).alias("b"))
        .distinct()
    )
    at_default = sorted(map(tuple, kcore(edges, KCORE_K, KCORE_ITERS).collect()))
    one_more = sorted(map(tuple, kcore(edges, KCORE_K, KCORE_ITERS + 1).collect()))
    assert at_default == one_more
    assert len(at_default) > 0  # the fixture actually has a 40-core


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=500),  # start
            st.integers(min_value=1, max_value=60),  # length
        ),
        min_size=1,
        max_size=60,
    )
)
def test_interval_union_coverage_property(spark, rows):
    """Sweep-line union on random interval sets equals the sort-and-
    merge reference for every key."""
    from iot_sparkstreaming_spark.operators.intervals import interval_union_coverage

    data = [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(rows)]
    df = spark.createDataFrame(data, ["user_id", "event_id", "s", "e"])
    got = {
        r.user_id: (r.n_intervals, r.n_segments, r.covered_ms)
        for r in interval_union_coverage(df).collect()
    }
    per_key: dict[int, list[tuple[int, int]]] = {}
    for k, _, s, e in data:
        per_key.setdefault(k, []).append((s, e))
    want = {}
    for k, ivs in per_key.items():
        ivs.sort()
        covered = segs = 0
        cs = ce = None
        for s, e in ivs:
            if ce is None or s >= ce:
                if ce is not None:
                    covered += ce - cs
                cs, ce, segs = s, e, segs + 1
            else:
                ce = max(ce, e)
        covered += ce - cs
        want[k] = (len(ivs), segs, covered)
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # cost
            st.integers(min_value=0, max_value=30),  # gain
        ),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_frontier_property(spark, rows):
    """Two-phase salted skyline on random point sets equals the
    brute-force undominated set (duplicates: all copies of a frontier
    (cost, gain) pair survive)."""
    from iot_sparkstreaming_spark.operators.intervals import pareto_frontier

    data = [(i, c, g) for i, (c, g) in enumerate(rows)]
    df = spark.createDataFrame(data, ["pid", "cost", "gain"])
    got = {r.pid for r in pareto_frontier(df, "cost", "gain", salt_on="pid").collect()}
    want = {
        pid
        for pid, c, g in data
        if not any(
            (c2 <= c and g2 >= g and (c2 < c or g2 > g))
            for p2, c2, g2 in data
            if p2 != pid
        )
    }
    assert got == want


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    ),
    iters=st.integers(min_value=1, max_value=3),
)
def test_label_propagation_property(spark, edges, iters):
    """Synchronous LPA with the (count DESC, label ASC) tie-break on
    random undirected graphs equals a pure-Python round-by-round
    simulation."""
    from collections import Counter

    from iot_sparkstreaming_spark.operators.graph import label_propagation

    undirected = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    df = spark.createDataFrame(undirected, ["a", "b"])
    got = {r.node: r.label for r in label_propagation(df, iterations=iters).collect()}

    nbrs: dict[int, list[int]] = {}
    for a, b in undirected:
        nbrs.setdefault(b, []).append(a)  # in-neighbours of b
    nodes = set(nbrs)
    labels = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            counts = Counter(labels[m] for m in nbrs[n])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    assert got == labels


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    ),
    iters=st.integers(min_value=1, max_value=3),
)
def test_label_propagation_directed_property(spark, edges, iters):
    """DIRECTED LPA: a node with no in-neighbours keeps its previous
    label (coalesce semantics) instead of vanishing — checked against
    a pure-Python simulation on random directed graphs."""
    from collections import Counter

    from iot_sparkstreaming_spark.operators.graph import label_propagation

    directed = list({(a, b) for a, b in edges})
    df = spark.createDataFrame(directed, ["a", "b"])
    got = {r.node: r.label for r in label_propagation(df, iterations=iters).collect()}

    in_nbrs: dict[int, list[int]] = {}
    nodes = {a for a, _ in directed} | {b for _, b in directed}
    for a, b in directed:
        in_nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            counts = Counter(labels[m] for m in in_nbrs.get(n, []))
            if counts:
                nxt[n] = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                nxt[n] = labels[n]
        labels = nxt
    assert got == labels


def test_label_propagation_directed_chain(spark):
    """Regression: a→b→c for 2 rounds labels every node 'a'; the old
    per-round rebuild dropped the zero-in-degree source entirely."""
    from iot_sparkstreaming_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(0, 1), (1, 2)], ["a", "b"])
    got = {r.node: r.label for r in label_propagation(df, iterations=2).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es)),
    n_sources=st.integers(1, 3),
)
def test_bfs_layers_matches_python_bfs(spark, edges, n_sources):
    """Frontier BFS must agree with a pure-Python BFS on random
    directed graphs (distance = fewest hops, unreachable absent,
    capped at the round budget)."""
    from collections import deque

    from iot_sparkstreaming_spark.operators.graph import bfs_layers

    rounds = 4
    nodes = sorted({n for e in edges for n in e})
    sources = nodes[:n_sources]

    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if want[u] >= rounds:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)

    df = spark.createDataFrame(edges, ["a", "b"])
    src = spark.createDataFrame([(s,) for s in sources], ["node"])
    got = {r.node: r.dist for r in bfs_layers(df, src, rounds=rounds).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# ZIP shard codec: random-unicode round-trip (pure Python, no Spark)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**11),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",)  # no lone surrogates
                ),
                max_size=400,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda m: m[0],
    )
)
def test_zip_codec_roundtrip_random_unicode(members):
    """pack_zip → walk_zip is the identity on (doc_id, text) for
    arbitrary unicode payloads, every member takes the DEFLATE path,
    n_bytes is the UTF-8 length, and packing is bit-deterministic."""
    from iot_sparkstreaming_spark.operators.multimodal import pack_zip, walk_zip

    members = sorted(members)
    payload = pack_zip(members)
    assert pack_zip(members) == payload
    back = walk_zip(payload)
    assert [(d, t) for d, _m, _n, t in back] == members
    assert all(m == 8 for _, m, _, _ in back)
    assert [n for _, _, n, _ in back] == [
        len(t.encode("utf-8")) for _, t in members
    ]


# ---------------------------------------------------------------------------
# Portable-HLL register algebra: merge = union, estimate within rsd bound
# ---------------------------------------------------------------------------


def _py_hll(keys):
    """Pure-Python twin of the engines' shared projection
    (functions/sketch.py): mix → (bucket, rho) → register max."""
    from iot_sparkstreaming_spark.functions.sketch import HLL_M, HLL_W

    regs = [0] * HLL_M
    for k in keys:
        h = k % 4294967296
        h = ((h ^ (h >> 16)) * 73244475) % 4294967296
        h = ((h ^ (h >> 16)) * 73244475) % 4294967296
        h = h ^ (h >> 16)
        bucket, w = h >> HLL_W, h % (1 << HLL_W)
        rho = HLL_W + 1 - w.bit_length()
        if rho > regs[bucket]:
            regs[bucket] = rho
    return regs


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**15), max_size=300),
    st.lists(st.integers(min_value=0, max_value=10**15), max_size=300),
)
def test_hll_register_merge_is_set_union(a, b):
    """Register-wise max of two sketches equals the sketch of the
    concatenated stream — the mergeability the streaming twin relies
    on — and the estimate depends only on the SET of keys (duplicate
    insertion is a no-op)."""
    from iot_sparkstreaming_spark.functions.sketch import (
        hll_estimate_from_znum,
        hll_znum,
    )

    ra, rb, rab = _py_hll(a), _py_hll(b), _py_hll(a + b)
    merged = [max(x, y) for x, y in zip(ra, rb)]
    assert merged == rab
    assert _py_hll(a + a) == ra
    est = hll_estimate_from_znum(hll_znum(rab))
    assert est >= 0


def test_hll_estimate_tracks_cardinality_within_rsd():
    """At n >> 2.5m the raw estimator must land within ~5 standard
    errors (rsd = 1.04/sqrt(256) ≈ 6.5%) of the true cardinality for
    a few deterministic key families — sequential, strided, and
    offset — the spread the avalanche mixer exists to guarantee."""
    from iot_sparkstreaming_spark.functions.sketch import (
        hll_estimate_from_znum,
        hll_znum,
    )

    for n, gen in [
        (5000, range(5000)),
        (20000, range(0, 20000 * 7, 7)),
        (8000, range(10**9, 10**9 + 8000)),
    ]:
        est = hll_estimate_from_znum(hll_znum(_py_hll(gen)))
        assert abs(est - n) < 5 * 0.065 * n, (n, est)
