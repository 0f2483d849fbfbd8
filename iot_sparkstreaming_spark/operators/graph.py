"""Iterative graph operators: connected components and PageRank.

The engine's iterative-algorithm shape (driver-controlled loop of
distributed joins/aggregations). Used by the dedup family to turn
pairwise near-dup matches into clusters; exposed as library
operators because any entity-resolution pipeline needs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of an undirected pair graph by min-label
    propagation; returns ``(node, component)`` with component = min
    node id in the component.

    Each round: pull every neighbor's current label across the edges,
    keep the per-node minimum, stop when no label changed.
    Convergence takes O(component diameter) rounds. localCheckpoint
    truncates per-round lineage — without it, round i re-plans and
    re-executes rounds 1..i-1 (the classic iterative-DataFrame trap).

    Scale: each round shuffles |edges| on the join key and |nodes|
    for the min-aggregate; for planet-scale graphs switch to the
    large-star/small-star variant — same loop skeleton.
    """
    edges = (
        pairs.select(col(src).alias("a"), col(dst).alias("b"))
        .union(pairs.select(col(dst).alias("a"), col(src).alias("b")))
        # Loop-invariant: pre-partition on the per-round join key and
        # cache the PLAN (not localCheckpoint — ExistingRDD loses
        # outputPartitioning and would re-exchange the edges every
        # round; see pagerank below).
        .repartition("b")
        .persist()
    )
    labels = (
        edges.select(col("a").alias("node")).distinct().withColumn("comp", col("node"))
    )
    # The returned frame scans the final localCheckpoint'ed labels RDD,
    # not the edges plan, so the edge cache can be dropped on exit —
    # repeated clustering calls in one session must not accumulate
    # cached blocks for the session lifetime.
    try:
        for _ in range(max_iterations):
            candidate = edges.join(labels, edges.b == labels.node).select(
                col("a").alias("node"), col("comp")
            )
            new_labels = (
                labels.unionByName(candidate)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
                .filter(col("comp") != col("old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", col("comp").alias("component"))
        raise RuntimeError(f"did not converge in {max_iterations} iterations")
    finally:
        edges.unpersist()


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm). Same contract as
    :func:`connected_components`: returns ``(node, component)`` with
    component = min node id; property-tested equal to min-label
    propagation on random graphs.

    Why it exists: min-label propagation converges in O(diameter)
    rounds and each round re-shuffles the FULL edge set — fine for
    shallow near-dup clusters, quadratic pain on planet-scale graphs
    with long chains. Star operations instead rewire edges toward
    each neighborhood's minimum, provably converging in O(log² n)
    rounds while the edge set monotonically flattens into stars —
    the variant you switch to when components may be deep.

    Round shape (all distributed, loop on the driver):
    * large-star: group by node over BOTH edge directions, m =
      min(neighborhood ∪ self); rewire strictly-larger neighbors to m.
    * small-star: orient edges large→small, group by the larger
      endpoint, m = min(neighborhood); rewire the smaller neighbors
      (and self) to m.
    Each op is one groupBy-min + one join — the same shuffle
    primitives as a round of label propagation, but on a shrinking
    edge set. localCheckpoint truncates per-round lineage.
    """
    all_nodes = (
        pairs.select(col(src).alias("node"))
        .union(pairs.select(col(dst).alias("node")))
        .distinct()
    )
    # star ops assume no self-loops; isolated/self-loop-only nodes are
    # re-attached as their own singleton component at the end
    edges = (
        pairs.select(col(src).alias("u"), col(dst).alias("v"))
        .filter(col("u") != col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _large_star(e: DataFrame) -> DataFrame:
        nbrs = e.union(e.select(col("v").alias("u"), col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            nbrs.join(mins, "u")
            .filter(col("v") > col("u"))
            .select(col("v").alias("u"), col("m").alias("v"))
            .filter(col("u") != col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        rewired = (
            d.join(mins, "u")
            .select(col("v").alias("u"), col("m").alias("v"))
            .union(mins.select(col("u"), col("m").alias("v")))
            .filter(col("u") != col("v"))
            .distinct()
        )
        return rewired

    for _ in range(max_iterations):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        changed = (
            new_edges.subtract(edges).union(edges.subtract(new_edges)).limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(f"did not converge in {max_iterations} iterations")

    # converged edge set is a star forest: every edge is (node, root)
    mapping = edges.select(
        col("u").alias("node"), col("v").alias("component")
    ).union(edges.select(col("v").alias("node"), col("v").alias("component")))
    mapping = mapping.groupBy("node").agg(F.min("component").alias("component"))
    return all_nodes.join(mapping, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def triangle_counts(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-node triangle counts of an undirected simple graph given as
    canonical edges (``src < dst``, no duplicates, no self-loops);
    returns ``(node, n_triangles)`` for every node in ≥ 1 triangle.

    Degree-ordered orientation (the standard distributed formulation:
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11 — public algorithm): orient every edge
    toward the higher ``(degree, id)`` endpoint, enumerate wedges at
    each source among its out-neighbors, close them against the
    oriented edge list. Every triangle is found exactly once — at its
    lowest-ordered vertex.

    Why orientation matters at 100 TB: out-degree under this total
    order is bounded by O(sqrt(m)) for ANY degree distribution, so
    wedge count is Σ outdeg² ≤ m·sqrt(m) instead of the Σ deg²
    blow-up a naive a<b<c id-ordering suffers at power-law hub nodes
    (a celebrity node with deg 10⁷ would otherwise emit 10¹⁴ wedges
    from one reducer). Three shuffles total: degree agg, wedge
    self-join on the source, closing-edge join.
    """
    e = edges.select(col(src).alias("u"), col(dst).alias("v"))
    deg = (
        e.select(col("u").alias("node"))
        .union(e.select(col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(col("node").alias("u"), col("deg").alias("du"))
    dv = deg.select(col("node").alias("v"), col("deg").alias("dv"))
    ann = e.join(du, "u").join(dv, "v")
    lower_first = (col("du") < col("dv")) | (
        (col("du") == col("dv")) & (col("u") < col("v"))
    )
    oriented = ann.select(
        F.when(lower_first, col("u")).otherwise(col("v")).alias("src"),
        F.when(lower_first, col("v")).otherwise(col("u")).alias("dst"),
        F.when(lower_first, col("dv")).otherwise(col("du")).alias("ddst"),
    )
    x = oriented.select(
        col("src"), col("dst").alias("p"), col("ddst").alias("dp")
    )
    y = oriented.select(
        col("src"), col("dst").alias("q"), col("ddst").alias("dq")
    )
    wedges = x.join(y, "src").filter(
        (col("dp") < col("dq")) | ((col("dp") == col("dq")) & (col("p") < col("q")))
    )
    closing = oriented.select(
        col("src").alias("p"), col("dst").alias("q")
    )
    tri = wedges.join(closing, ["p", "q"]).select("src", "p", "q")
    nodes = (
        tri.select(col("src").alias("node"))
        .union(tri.select(col("p").alias("node")))
        .union(tri.select(col("q").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def wedge_adjacency(pairs: DataFrame, cap: int, src: str = "a", dst: str = "b") -> DataFrame:
    """Degree-capped adjacency lists of a bipartite edge list, pivoted
    on the ``src`` side: one row per surviving pivot holding its SORTED
    distinct-neighbor array ``nb`` (≤ cap elements). Pivots above the
    cap are dropped — the standard hub-capping trick that bounds the
    wedge mass downstream at Σ min(deg, cap)² and keeps the quadratic
    side of the enumeration off the heavy tail.

    One groupBy(src) collects the arrays (the edge list crosses the
    wire exactly once; collect_set dedupes, so a caller may pass a
    raw non-distinct edge list — multiplicities neither inflate the
    cap test nor double-count wedges), the cap filter is a size()
    test on the DISTINCT-neighbor array (no degree-table join), and
    the result is eagerly checkpointed: both consumers (neighbor
    degrees and wedge pairs) read the bounded arrays instead of
    re-shuffling edges. Rows are edge-bounded, so the checkpoint is
    ~|edges| x 8 bytes.

    The guard makes the packed-key trick in :func:`wedge_pair_counts`
    loud: bigint arithmetic WRAPS silently, so a node id >= 2^31 — or
    a NEGATIVE id, whose packed term cancels into a colliding key —
    would corrupt pair counts with no signal. nb is sorted, so
    element_at(1)/element_at(-1) are the per-pivot min/max; the
    assert rides the edge-bounded adjacency rows (never the
    ~wedge-mass-sized pair stream) and the filter wrapper keeps
    Catalyst from pruning it."""
    return (
        pairs.groupBy(col(src).alias("a"))
        .agg(F.sort_array(F.collect_set(col(dst))).alias("nb"))
        # collect_set drops nulls, so an all-null-dst pivot yields an
        # EMPTY array; drop it here (it generates zero wedges anyway) so
        # element_at on the empty array can't feed NULL into the
        # overflow assert below and raise with the wrong diagnosis
        .filter((F.size("nb") > 0) & (F.size("nb") <= cap))
        .select("nb")
        .filter(
            F.assert_true(
                (F.element_at(col("nb"), -1) < F.lit(1 << 31))
                & (F.element_at(col("nb"), 1) >= 0),
                F.lit(
                    "wedge enumeration: node id outside [0, 2^31) would "
                    "overflow the packed wedge key"
                ),
            ).isNull()
        )
        .localCheckpoint(eager=True)
    )


def wedge_pair_counts(adj: DataFrame) -> DataFrame:
    """Common-neighbor counts ``(s1 < s2, common)`` from a capped
    adjacency table (:func:`wedge_adjacency`): every ordered pair of
    each pivot's neighbor array, hash-aggregated to distinct pairs.

    Ordered pairs (nb[i], nb[j]) for i < j stream from TWO Generate
    steps (posexplode, then explode of the tail slice): nb is sorted
    and duplicate-free, so s1 < s2 holds by construction, and pairs
    flow straight into the partial agg — no struct-array
    materialization per pivot (a flatten-of-nested-transform variant
    measured ~70% slower: it allocates the full pair array per row
    before exploding). The pair aggregates on ONE packed bigint key
    (s1 << 32 | s2 — lossless below 2^31, asserted upstream) and
    unpacks after: halving the hash/shuffle key width measured 20%
    off this exchange at the 100x scale fixture with identical
    output. This rollup owns the operator's cost at scale — the
    wedge stream is Σ min(deg, cap)² rows collapsing to the distinct
    co-neighbor pairs."""
    packed = (col("s1") * F.lit(1 << 32) + col("s2")).alias("k")
    return (
        adj.select(F.posexplode("nb").alias("i", "s1"), "nb")
        .select(
            "s1",
            F.explode(
                F.slice(col("nb"), col("i") + F.lit(2), F.size("nb"))
            ).alias("s2"),
        )
        .select(packed)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("common"))
        .select(
            F.shiftright(col("k"), 32).alias("s1"),
            (col("k") % F.lit(1 << 32)).alias("s2"),
            "common",
        )
    )


def wedge_link_prediction(adj: DataFrame) -> DataFrame:
    """Common-neighbor link prediction over a capped adjacency table:
    ``(s1, s2, common, deg1, deg2, jaccard)`` for every co-neighbor
    pair — common counts from :func:`wedge_pair_counts`, neighborhood
    degrees from one explode of the SAME capped arrays (so the
    Jaccard union is internally consistent with the capped graph),
    and the Jaccard is one division of exact bigints."""
    sdeg = (
        adj.select(F.explode("nb").alias("s"))
        .groupBy("s")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    wedges = wedge_pair_counts(adj)
    d1 = sdeg.select(col("s").alias("s1"), col("d").alias("deg1"))
    d2 = sdeg.select(col("s").alias("s2"), col("d").alias("deg2"))
    return (
        wedges.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "common",
            "deg1",
            "deg2",
            (
                col("common").cast("double")
                / (col("deg1") + col("deg2") - col("common")).cast("double")
            ).alias("jaccard"),
        )
    )


#: fixed-point scale for integer PageRank: ranks are stored as
#: rank * PR_SCALE in a bigint, so every operation is exact integer
#: arithmetic (floor division) — bitwise reproducible across engines,
#: which float/decimal division is not.
PR_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "a",
    dst: str = "b",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list, in
    fixed-point integer arithmetic; returns ``(node, pr)`` where
    ``pr`` ≈ rank * PR_SCALE.

    Update rule per iteration (d = damping_pct/100)::

        pr'(v) = (1-d)*PR_SCALE + d * Σ_{u→v} (pr(u) // outdeg(u))

    with every division a FLOOR division on bigints, so two engines
    computing this independently agree bit-for-bit (no float sum
    order, no decimal quotient rounding). Dangling mass is dropped
    (standard simplification); ranks stay bounded by
    |nodes| * PR_SCALE, far inside int64.

    Plan per iteration: one join of ranks onto the loop-invariant
    degree-annotated edge list, one groupBy-sum on the destination,
    one left join back to the node set — the same skeleton as
    :func:`connected_components`, minus the per-round edge shuffle:

    The loop invariants (``ed``, ``nodes``) are ``repartition(key)``
    + ``persist()``, NOT ``localCheckpoint``: a checkpointed frame
    scans back as ExistingRDD with UNKNOWN outputPartitioning, so
    Catalyst re-exchanges the full edge list EVERY round; a cached
    plan keeps its ``hashpartitioning`` metadata, the per-round rank
    frame is already partitioned on the join key by the previous
    round's join, and all five rounds run exchange-free on the edge
    side (measured ~3.5x wall-clock on the sf0.1 trade graph; at
    cluster scale it removes 5x|edges| of shuffle I/O). Same trick as
    GraphX's partitioned-edge RDD. The caches are LRU-managed by the
    block manager (MEMORY_AND_DISK) and safe to leave resident; call
    ``.unpersist()`` on long-lived sessions that are done with the
    graph.

    Unlike the components loop there is NO per-round driver action
    (no convergence check), so rounds chain lazily into one job and
    Catalyst/AQE optimize across round boundaries; a periodic
    ``localCheckpoint`` every ``checkpoint_every`` rounds bounds plan
    depth for high iteration counts (eager per-round checkpointing
    measured ~35% slower at 5 rounds — five forced materializations
    for zero reuse).
    """
    base = PR_SCALE * (100 - damping_pct) // 100
    e = edges.select(col(src).alias("a"), col(dst).alias("b"))
    outdeg = e.groupBy("a").agg(F.count("*").alias("deg"))
    ed = e.join(outdeg, "a").repartition("a").persist()
    nodes = (
        e.select(col("a").alias("node"))
        .union(e.select(col("b").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for i in range(iterations):
        contrib = (
            ed.join(ranks, ed.a == ranks.node)
            .select(col("b").alias("node"), F.expr("pr div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).cast("bigint").alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def kcore(
    edges: DataFrame,
    k: int,
    iterations: int,
    src: str = "a",
    dst: str = "b",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-iteration k-core peeling over an UNDIRECTED edge list
    (stored one row per edge): repeatedly delete every node whose
    degree in the surviving subgraph is < k, ``iterations`` times;
    returns ``(node, deg)`` — the degree of each surviving node
    inside the final subgraph.

    A FIXED round count, not a convergence loop, is the cross-engine
    contract (same trick as :func:`pagerank`): both engines unroll
    the identical number of peels, so results agree bit-for-bit even
    on inputs where the fixpoint is further than ``iterations`` away.
    Degree peeling is monotone (the survivor set only shrinks), so
    any round count >= the true peel depth yields the exact k-core;
    tests assert the fixture converges well inside the default.

    Plan per round: one degree aggregate over both endpoint
    projections (map-side combined) and one double semi-join of the
    edge list against the survivor set — the same
    shuffle-on-the-node-key skeleton as :func:`connected_components`.
    Unlike :func:`pagerank` (one self-reference per round, checkpoint
    optional), each peel references the previous edge frame THREE
    times (two degree projections + the semi-join left side), so an
    unmaterialized chain re-computes the base ~3^rounds times —
    measured 45 s vs 3 s at sf0.1 over 4 rounds. The periodic eager
    ``localCheckpoint`` is therefore structural, not a tuning knob;
    every 2 rounds measured fastest (every round adds one more
    materialization than it saves).
    """
    e = edges.select(col(src).alias("a"), col(dst).alias("b"))
    for i in range(iterations):
        und = e.select(col("a").alias("node")).unionAll(
            e.select(col("b").alias("node"))
        )
        keep = (
            und.groupBy("node")
            .agg(F.count("*").alias("deg"))
            .filter(col("deg") >= k)
            .select("node")
        )
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "leftsemi")
            .join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
            .select("a", "b")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            e = e.localCheckpoint(eager=True)
    return (
        e.select(col("a").alias("node"))
        .unionAll(e.select(col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (community
    detection) over a DIRECTED edge list (feed both directions for an
    undirected graph); returns ``(node, label)`` after ``iterations``
    rounds.

    Deterministic update rule, exactly mirrorable in unrolled SQL:
    every node starts labelled with its own id; each round it adopts
    the most frequent label among its in-neighbours, ties broken by
    the SMALLEST label (Raghavan et al.'s LPA with the random
    tie-break replaced by a total order — the same
    determinism-by-total-order trick as the components min-label
    loop). A FIXED round count is the cross-engine contract; no
    convergence check means no per-round driver action, so rounds
    chain lazily into one job.

    A node with NO in-neighbours this round (zero in-degree, or all
    its in-neighbours were themselves absent upstream) KEEPS its
    previous label: each round's argmax is left-joined back onto the
    full label frame with ``coalesce(new, prev)``. Without that, a
    source-only node silently vanished from the output and its
    out-edges stopped propagating — wrong for any directed input.

    Plan per round: one join of the label frame onto the
    loop-invariant edge list, one (dst, label) count aggregate, one
    per-dst argmax window, one coalescing left join back onto the
    label frame. The edge list is ``repartition(src)`` +
    ``persist()`` — cached WITH partitioning metadata so every round's
    join reuses the exchange (see :func:`pagerank` for why
    localCheckpoint would defeat this). The label frame is referenced
    TWICE per round (vote join + coalesce join), so each round's
    result is persisted, eagerly materialized with one cheap count
    job, and THEN the retired round is unpersisted — cached storage
    stays O(1) in the iteration count instead of pinning every
    intermediate frame for the session's lifetime. (The count must
    precede the unpersist: releasing a round that was never
    materialized would re-derive it once per downstream reference —
    the 2^rounds blow-up the persist exists to prevent.) The FINAL
    round's frame is returned still persisted; the caller owns its
    lifetime (the registered query memoizes it via session_memo, so
    nothing leaks there). All arithmetic is integer counts; no floats
    anywhere.
    """
    e = edges.select(col(src).alias("a"), col(dst).alias("b"))
    ed = e.repartition("a").persist()
    nodes = (
        e.select(col("a").alias("node"))
        .union(e.select(col("b").alias("node")))
        .distinct()
        .repartition("node")
    )
    labels = nodes.select("node", col("node").alias("label")).persist()
    w = Window.partitionBy("node").orderBy(col("c").desc(), col("label").asc())
    for _ in range(iterations):
        cnt = (
            ed.join(labels, ed.a == labels.node)
            .groupBy(col("b").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        argmax = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(col("rk") == 1)
            .select("node", col("label").alias("new_label"))
        )
        prev = labels
        labels = (
            prev.join(argmax, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .persist()
        )
        labels.count()
        prev.unpersist()
    ed.unpersist()
    return labels


def bfs_layers(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Fixed-round multi-source breadth-first search over a DIRECTED
    edge list (feed both directions for undirected); returns
    ``(node, dist)`` for every node reached within ``rounds`` hops —
    the unweighted shortest-path layer decomposition (iterative graph
    algorithm beside components/PageRank/k-core/LPA).

    FRONTIER form, not dense relaxation: round r joins only the nodes
    FIRST reached at round r−1 against the edge list, dedups the
    neighbor set, and anti-joins the visited set — per-round cost is
    O(frontier-adjacent edges), and a converged component stops
    costing anything once its frontier empties (a dense min-distance
    relaxation re-touches every edge every round). This is the BFS
    every distributed graph system settles on (Pregel's vertex
    frontier), and it is exactly mirrorable in unrolled SQL: each
    round is one JOIN + DISTINCT + EXCEPT.

    The edge list is ``repartition(src)`` + ``persist()`` so every
    round's frontier join reuses one exchange (:func:`pagerank`
    explains why localCheckpoint would defeat this). Frontiers are
    ``localCheckpoint(eager=True)`` — each is tiny relative to the
    graph, is referenced by BOTH the next round's join and the final
    union, and eager materialization keeps the visited anti-join's
    plan from re-deriving every earlier round (the same O(1)-storage
    discipline as the LPA loop; retired frontiers hold no cache).
    Distances are plain bigints; no floats anywhere.
    """
    e = edges.select(col(src).alias("a"), col(dst).alias("b"))
    ed = e.repartition("a").persist()
    layers = [
        sources.select(
            col(sources.columns[0]).alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        ).localCheckpoint(eager=True)
    ]
    frontier = layers[0].select("node")
    visited = layers[0].select("node")
    for r in range(1, rounds + 1):
        nxt = (
            ed.join(frontier.withColumnRenamed("node", "a"), "a")
            .select(col("b").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(r).cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        layers.append(nxt)
        frontier = nxt.select("node")
        visited = visited.union(frontier)
    ed.unpersist()
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    return out
