"""ANN quality: the approximate variants must recover a reasonable
fraction of the exact top-k (recall vs knn_bruteforce_cosine) — the
property the oracle hash cannot see (it only proves each plan computes
what it claims)."""

from __future__ import annotations

import pytest

from iot_sparkstreaming_spark.queries.registry import load_all

from tests.conftest import SF_DIR_ORACLE

REGISTRY = load_all()


@pytest.fixture(scope="module")
def exact_neighbors(spark):
    rows = REGISTRY["knn_bruteforce_cosine"].spark(spark, SF_DIR_ORACLE).collect()
    by_query: dict[int, set[int]] = {}
    for r in rows:
        by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
    return by_query


def _recall(spark, name, exact):
    rows = REGISTRY[name].spark(spark, SF_DIR_ORACLE).collect()
    approx: dict[int, set[int]] = {}
    for r in rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.items() and exact.values())
    return hits / total


def test_lsh_recall(spark, exact_neighbors):
    # 8-plane sign-LSH on 64-dim data: buckets are coarse; require
    # meaningfully-better-than-random overlap with the exact top-5.
    assert _recall(spark, "ann_lsh_cosine", exact_neighbors) >= 0.2


def test_ivf_recall(spark, exact_neighbors):
    # probing 4 of ~17 inverted lists should still find most of the
    # true top-5 (nearby vectors cluster to nearby centroids).
    assert _recall(spark, "ann_ivf_cosine", exact_neighbors) >= 0.4


def test_embedding_neardup_banded_vs_exact(spark):
    """The registered banded near-dup operator must be a strict
    precision-1 subset of the brute-force ground truth (rescoring is
    exact, so every emitted pair is a true pair), with recall above
    the measured floor. Fixture qualifying cosines hug the 0.4
    threshold (random-ish vectors — the LSH worst case), so the floor
    is deliberately modest; the point is the subset relationship and
    that banding finds a non-trivial share."""
    from iot_sparkstreaming_spark.queries.dedup import dedup_embedding_cosine_exact

    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup_embedding_cosine_exact(spark, SF_DIR_ORACLE).collect()
    }
    banded = {
        (r.vec_a, r.vec_b): r.cosine
        for r in REGISTRY["dedup_embedding_cosine"].spark(spark, SF_DIR_ORACLE).collect()
    }
    assert set(banded) <= set(exact)  # precision 1.0
    for pair, c in banded.items():
        assert c == exact[pair]  # bitwise-identical cosines
    assert len(banded) / len(exact) >= 0.5  # measured: 36/59 ≈ 0.61


def test_ivf_prunes_candidates(spark):
    """The IVF result must be a genuine subset of the work: every
    query returns at most TOP_K rows and never scores itself."""
    rows = REGISTRY["ann_ivf_cosine"].spark(spark, SF_DIR_ORACLE).collect()
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
        assert r.neighbor_id != r.query_id
    assert per_query and all(n <= 5 for n in per_query.values())


def test_int8_quantization_reconstruction_bound(spark):
    """Dequantized values (q*scale) must sit within half a quantization
    step of the original in every dimension, and codes must fill the
    int8 range (max_abs_q == 127 for every non-zero vector)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from iot_sparkstreaming_spark.tables import load_table

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").select(
        "vec_id",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    quant = REGISTRY["quantize_embeddings_int8"].spark(spark, SF_DIR_ORACLE)
    joined = emb.join(quant, "vec_id")
    # reconstruct each dim as floor(x*127/amax+0.5)*scale and take the
    # worst |x - dequant|; the half-up rule bounds it by scale/2
    amax = col("scale") * 127.0
    dequant_err = F.array_max(
        F.transform(
            col("v"),
            lambda x: F.abs(x - F.floor(x / amax * 127.0 + 0.5) * col("scale")),
        )
    )
    rows = joined.select(
        "vec_id", "scale", "max_abs_q", dequant_err.alias("err")
    ).collect()
    assert rows
    for r in rows:
        assert r.max_abs_q == 127
        assert r.err <= r.scale / 2 + 1e-12, (r.vec_id, r.err, r.scale)


def test_pq_recall_vs_exact_l2(spark):
    """PQ-ADC ranks by L2 on reconstructions, so its ground truth is
    the exact-L2 top-5 (not the cosine fixture — unnormalized vectors
    order differently under the two metrics). Measured 0.40 on the
    clusterless random fixture (chance is ~0.001); floor leaves drift
    margin."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    from iot_sparkstreaming_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
        _d2,
        _vectors,
    )

    e = _vectors(spark, SF_DIR_ORACLE)
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(col("d2").asc(), "neighbor_id")
    exact_rows = (
        e.crossJoin(F.broadcast(q))
        .filter(col("query_id") != col("vec_id"))
        .select(
            "query_id",
            col("vec_id").alias("neighbor_id"),
            _d2(col("qv"), col("v")).alias("d2"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .collect()
    )
    exact: dict[int, set[int]] = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    pq: dict[int, set[int]] = {}
    for r in REGISTRY["ann_pq_adc"].spark(spark, SF_DIR_ORACLE).collect():
        pq.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(pq.get(qid, set()) & nbrs) for qid, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    assert hits / total >= 0.25


def test_pq_seed_vectors_reconstruct_exactly(spark):
    """PQ identity invariant: a codebook seed vector's nearest
    centroid in every subspace is its own subvector (distance 0), so
    its reconstruction must be bitwise the original vector."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from iot_sparkstreaming_spark.queries.similarity import (
        PQ_K,
        PQ_SEED_BASE,
        _pq_recon,
        _vectors,
    )

    e = _vectors(spark, SF_DIR_ORACLE)
    recon = _pq_recon(spark, SF_DIR_ORACLE)
    seeds = (
        e.filter(
            (col("vec_id") >= PQ_SEED_BASE) & (col("vec_id") < PQ_SEED_BASE + PQ_K)
        )
        .join(recon, "vec_id")
        .select("vec_id", (col("v") == col("r")).alias("identical"))
        .collect()
    )
    assert len(seeds) == PQ_K
    assert all(r.identical for r in seeds)


def test_gram_matrix_matches_numpy(spark):
    """Distributed partial-Gram accumulation equals a single-machine
    numpy S^T.S on the same fixed-point matrix, and the derived
    covariance tracks numpy.cov to float tolerance."""
    import numpy as np

    from iot_sparkstreaming_spark.queries.similarity import (
        DIM,
        GRAM_SCALE,
        embedding_gram_matrix,
    )
    from iot_sparkstreaming_spark.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    s = np.array(
        [[round(float(x) * GRAM_SCALE) for x in r.embedding] for r in emb],
        dtype=np.int64,
    )
    expected = s.T @ s
    cov = np.cov(s.astype(np.float64), rowvar=False) / (GRAM_SCALE * GRAM_SCALE)
    rows = embedding_gram_matrix(spark, SF_DIR).collect()
    assert len(rows) == DIM * (DIM + 1) // 2
    for r in rows:
        assert r.gram_scaled == expected[r.i, r.j]
        assert r.n_vecs == s.shape[0]
        assert abs(r.cov - cov[r.i, r.j]) < 1e-9


def test_kmeans_matches_numpy_lloyd(spark):
    """The distributed Lloyd rounds must match a numpy re-run of the
    identical update rule (fixed-point centroid sums, min-cid ties)."""
    import numpy as np

    from iot_sparkstreaming_spark.queries.similarity import (
        KM_ITERS,
        KM_K,
        KM_SCALE,
        kmeans_lloyd_embeddings,
    )
    from iot_sparkstreaming_spark.tables import load_table
    from tests.conftest import SF_DIR

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    v = np.array([[float(x) for x in r.embedding] for r in emb])
    sv = np.round(v * KM_SCALE).astype(np.int64)
    order = np.argsort(ids)
    ids, v, sv = ids[order], v[order], sv[order]
    cent = v[ids < KM_K]
    cids = ids[ids < KM_K]
    for _ in range(KM_ITERS):
        d2 = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = cids[np.argmin(d2, axis=1)]  # argmin takes first=min cid
        new_c, new_ids = [], []
        for c in sorted(set(assign)):
            mask = assign == c
            new_c.append(sv[mask].sum(axis=0) / (KM_SCALE * mask.sum()))
            new_ids.append(c)
        cent, cids = np.array(new_c), np.array(new_ids)
    d2 = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    want = dict(zip(ids.tolist(), cids[np.argmin(d2, axis=1)].tolist()))
    got = {r.vec_id: r.cid for r in kmeans_lloyd_embeddings(spark, SF_DIR).collect()}
    assert got == want


def test_ivf_kmeans_probe_subset_and_exactness(spark):
    """Every IVF-kmeans hit must be an exact-L2 true distance, rank
    within TOP_K per query, never the query itself — and recall vs
    exhaustive L2 must be positive (probing 2 of 8 Lloyd cells)."""
    import numpy as np

    from iot_sparkstreaming_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
        ann_ivf_kmeans,
    )
    from iot_sparkstreaming_spark.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = (
        load_table(spark, SF_DIR_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vid = np.array([r.vec_id for r in emb])
    v = np.array([[float(x) for x in r.embedding] for r in emb])
    rows = ann_ivf_kmeans(spark, SF_DIR_ORACLE).collect()
    per_q: dict[int, list] = {}
    idx = {int(i): k for k, i in enumerate(vid)}
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert 1 <= r.rk <= TOP_K
        true_d2 = float(((v[idx[r.query_id]] - v[idx[r.neighbor_id]]) ** 2).sum())
        assert abs(r.sq_dist - true_d2) < 1e-4
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert len(per_q) == N_QUERIES
    hits = total = 0
    for q, got in per_q.items():
        d2 = ((v - v[idx[q]]) ** 2).sum(axis=1)
        d2[idx[q]] = np.inf
        exact = set(vid[np.argsort(d2)[:TOP_K]].tolist())
        hits += len(exact & set(got))
        total += TOP_K
    assert hits / total > 0.2  # non-trivial recall at 2/8 probes


def test_kmeans_quality_consistent_with_assignments(spark):
    """Quality report must reconcile with the per-vector assignment
    output: identical populations, inertia = sum of (fixed-pointed)
    member distances, max radius = max member distance."""
    from collections import Counter

    from iot_sparkstreaming_spark.queries.similarity import (
        KMQ_SCALE,
        kmeans_cluster_quality,
        kmeans_lloyd_embeddings,
    )
    from tests.conftest import SF_DIR

    members = kmeans_lloyd_embeddings(spark, SF_DIR).collect()
    per_cid = Counter(r.cid for r in members)
    rows = {r.cid: r for r in kmeans_cluster_quality(spark, SF_DIR).collect()}
    assert {c: r.n_members for c, r in rows.items()} == dict(per_cid)
    for cid, r in rows.items():
        ds = [m.sq_dist for m in members if m.cid == cid]
        # members' sq_dist is rounded to 6 dp, quality fixed-points at
        # 1e-6 before summing — both within 1e-6/member of raw
        assert abs(r.inertia - sum(ds)) < len(ds) * 2e-6
        assert abs(r.max_radius_sq - max(ds)) < 2e-6
