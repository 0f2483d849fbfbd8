"""Similarity search over the ``embeddings`` table: brute-force
cosine top-k (the exact baseline) and a sign-LSH bucketed ANN variant
(the scale path).

North-star operator family (BASELINE.json). Vectors are
``array<float>`` cast to double; every dot product folds
left-to-right, which is bitwise-identical across Spark's
``aggregate`` and DuckDB's ``list_dot_product`` (validated in
tests/test_functions.py), so cosines oracle-check exactly.

The LSH hyperplanes are pseudo-random but DERIVED IN PYTHON from md5
and embedded as literal constants into both the Spark plan and the
oracle SQL — determinism by construction, no cross-engine RNG.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
DIM = 64
N_BANDS = 4
PLANES_PER_BAND = 4  # the bit-count FLOOR: fixture-size geometry
N_PLANES = N_BANDS * PLANES_PER_BAND

# -- scale-adaptive banding width (round-11; the sign-LSH analog of
# the IVF k ~ sqrt(n) retrain policy). With a FIXED b bits per band,
# buckets number 2^b and candidate pairs grow ~n^2/2^b — the 100x
# scale audit measured the 4-bit geometry OOM-ing at 200k vectors
# (docs/SCALING.md). Growing bits with the corpus keeps the expected
# bucket occupancy ~n/2^bits bounded (~2^BITS_OFFSET rows under a
# uniform sign model), so candidates stay O(n * occupancy) — linear.
# bits(n) = clamp(floor(log2 n) - BITS_OFFSET, PLANES_PER_BAND,
# MAX_BITS): the floor pins the oracle-validated fixture geometry for
# n <= 2047 (every sf <= 0.1), and the cap bounds the literal plane
# table embedded in both engines' plans (4 bands x 16 bits = 64
# planes); corpora past 2^(MAX_BITS+BITS_OFFSET) = ~4M vectors extend
# MAX_BITS at index-retrain time the same way IVF re-derives k. The
# DuckDB oracles re-derive the identical bits from COUNT(*) (see
# _geo_sql), so the parameterization is checked, not just stated.
MAX_BITS = 16
BITS_OFFSET = 6


def lsh_bits(n: int) -> int:
    """Adaptive per-band hyperplane count for an n-vector corpus.
    ``bit_length() - 1`` is exact floor(log2 n) — no float rounding."""
    if n < 1:
        return PLANES_PER_BAND
    return max(PLANES_PER_BAND, min(MAX_BITS, n.bit_length() - 1 - BITS_OFFSET))


def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1] from md5."""
    h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def _plane_index(band: int, bit: int) -> int:
    """Plane id for (band, bit). Bits below PLANES_PER_BAND keep the
    ORIGINAL round-3 plane ids (band*4 + bit) so fixture-size buckets
    — and every oracle hash at sf <= 0.1 — are bit-for-bit unchanged;
    the adaptive bits extend past the original table."""
    if bit < PLANES_PER_BAND:
        return band * PLANES_PER_BAND + bit
    return N_PLANES + band * (MAX_BITS - PLANES_PER_BAND) + (bit - PLANES_PER_BAND)


PLANES: list[list[float]] = [
    [_plane_weight(p, d) for d in range(DIM)]
    for p in range(N_PLANES + N_BANDS * (MAX_BITS - PLANES_PER_BAND))
]


def _dot(u: Column, w: Column) -> Column:
    # NOTE (r15 optimization round, measured and REJECTED): unrolling
    # this HOF fold into 64 codegen'd multiply-adds is 2.2x faster
    # per evaluation on an isolated 4M-pair cross-score, but it makes
    # every expression tree that embeds a dot ~64x larger — and the
    # multi-branch ANN/kmeans plans walk those trees repeatedly during
    # Catalyst optimization and whole-stage codegen, which DOMINATES
    # at bench scale (ann_ivf_pq 0.53 s -> 2.41 s, ann_incremental
    # 1.76 -> 4.62, rrf 1.00 -> 2.37, knn 0.44 -> 0.96; the banded-LSH
    # index build additionally overflowed janino and fell back to
    # interpreted execution). See OPTIMIZATION_r15.md.
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(u: Column, w: Column) -> Column:
    return F.round(_dot(u, w) / F.sqrt(_dot(u, u)) / F.sqrt(_dot(w, w)), 6)


def _norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def _cosine_pre(u: Column, w: Column, nu: Column, nw: Column) -> Column:
    """Cosine with per-side norms precomputed BEFORE the pair join:
    self-norms are per-vector quantities, so folding them per pair
    would triple the hot-loop array work. Division operands are the
    identical values, so results are bitwise equal to :func:`_cosine`
    (parity-proven against the same oracles)."""
    return F.round(_dot(u, w) / nu / nw, 6)


_COS_SQL = (
    "ROUND(list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a}))"
    " / sqrt(list_dot_product({b}, {b})), 6)"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v double[], nv norm), MATERIALIZED: every query
    here references the corpus from 2-4 plan branches, and Spark does
    not reuse exchanges across self-join branches — without the
    checkpoint each branch re-scans parquet and re-folds the norms.
    Production shape: the vectors+norms table you write once —
    session-memoized so every similarity query shares ONE
    materialization per sf_dir."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return (
            emb.select(
                "vec_id",
                "label",
                F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
            )
            .withColumn("nv", _norm(col("v")))
        )

    return artifact_memo(spark, ("sim_vectors", sf_dir), build)

# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------

KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {_COS_SQL.format(a="q.v", b="c.v")} AS cosine
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


@register("knn_bruteforce_cosine", oracle=KNN_ORACLE)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each of the 10 query vectors.

    Plan shape: broadcast the (tiny) query set against the corpus →
    per-partition scoring, then a ranking window partitioned by query.
    At 100 TB corpus scale this is one broadcast + one scan + a
    shuffle of only |queries|·|corpus-partition winners| via the rank
    — the canonical exact-kNN baseline the ANN variant is judged
    against. Ties broken by neighbor_id on the 6-dp-rounded cosine."""
    e = _vectors(spark, sf_dir)
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv"), col("nv").alias("qn")
    )
    c = e.select(
        col("vec_id").alias("neighbor_id"),
        col("label").alias("neighbor_label"),
        col("v").alias("cv"),
        col("nv").alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("query_id") != col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            _cosine_pre(col("qv"), col("cv"), col("qn"), col("cn")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(col("cosine").desc(), col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Sign-LSH bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def _geo_sql(corpus_sql: str = "embeddings") -> str:
    """The banding-geometry CTE body: re-derives the EXACT Python
    ``lsh_bits`` clamp from COUNT(*) in SQL. floor(log2 n) is exact in
    IEEE for every n (log2 of a power of two is representable; between
    powers the value is > 1 ulp from the integer), so the two engines
    cannot disagree on the floor."""
    return (
        f"SELECT GREATEST({PLANES_PER_BAND}, LEAST({MAX_BITS}, "
        f"CAST(FLOOR(LOG2(GREATEST(COUNT(*), 1))) AS INT) - {BITS_OFFSET})) AS bits "
        f"FROM {corpus_sql}"
    )


def _band_bucket_sql(v: str, band: int) -> str:
    """Adaptive sign bucket of one band: the full MAX_BITS-wide bucket
    masked to the low ``bits`` bits (bit i's weight is 2^i, so the
    mask IS "use the first bits planes"). Requires a ``geo`` relation
    (see :func:`_geo_sql`) cross-joined into scope for ``bits``; at
    fixture sizes bits = 4 and the masked value equals the original
    4-plane bucket exactly."""
    terms = []
    for i in range(MAX_BITS):
        plane = PLANES[_plane_index(band, i)]
        lits = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({lits}::DOUBLE[], {v}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    wide = "(" + " + ".join(terms) + ")"
    return f"({wide} & ((CAST(1 AS BIGINT) << bits) - 1))"


ANN_ORACLE = f"""
WITH geo AS (
  {_geo_sql()}
),
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bands AS (
  SELECT vec_id, label, v, 0 AS band, {_band_bucket_sql('v', 0)} AS bucket FROM e, geo
  UNION ALL
  SELECT vec_id, label, v, 1 AS band, {_band_bucket_sql('v', 1)} AS bucket FROM e, geo
  UNION ALL
  SELECT vec_id, label, v, 2 AS band, {_band_bucket_sql('v', 2)} AS bucket FROM e, geo
  UNION ALL
  SELECT vec_id, label, v, 3 AS band, {_band_bucket_sql('v', 3)} AS bucket FROM e, geo
),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.label AS neighbor_label,
         {_COS_SQL.format(a="q.v", b="c.v")} AS cosine
  FROM bands q JOIN bands c
    ON q.band = c.band AND q.bucket = c.bucket
   AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def _band_bucket_col(v: Column, band: int, bits: int = PLANES_PER_BAND) -> Column:
    """Sign bucket of one band from the first ``bits`` planes. Bit i
    weighs 2^i, so this equals the oracle's MAX_BITS-wide bucket
    masked to the low ``bits`` bits — the Spark plan just skips the
    masked-off dot products instead of computing-then-discarding."""
    out = F.lit(0)
    for i in range(bits):
        w = F.array(*[F.lit(x) for x in PLANES[_plane_index(band, i)]])
        out = out + F.when(_dot(w, v) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def _lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded sign-LSH index table ``(vec_id, band, bucket)`` —
    an ANN index is the canonical build-once/query-many artifact, so
    it is materialized and session-memoized: both self-join branches
    of every LSH consumer (ann_lsh_cosine, dedup_embedding_cosine)
    read the 16-byte index rows instead of re-running the per-band
    hyperplane dot products per branch per call.

    The band width is the ADAPTIVE ``lsh_bits(corpus count)`` —
    derived here at index build time (the count is a parquet
    metadata-priced action, paid once per artifact build, exactly
    like IVF's k ~ sqrt(n) at retrain) and re-derived independently
    by every consumer's DuckDB oracle from the same COUNT(*), so a
    drift between the two derivations fails the hash gate instead of
    hiding."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        bits = lsh_bits(emb.count())
        e = _vectors(spark, sf_dir)
        return (
            e.withColumn(
                "band_buckets",
                F.array(
                    *[_band_bucket_col(col("v"), b, bits) for b in range(N_BANDS)]
                ),
            )
            .select("vec_id", F.posexplode("band_buckets").alias("band", "bucket"))
        )

    return artifact_memo(spark, ("lsh_bands", sf_dir), build)


@register("ann_lsh_cosine", oracle=ANN_ORACLE)
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via BANDED sign-LSH: 4 bands of
    ``lsh_bits(n)`` hyperplane bits each (4 at fixture sizes, growing
    ~log2 of the corpus — see the module-level banding policy); two
    vectors are candidates if they share ANY band's bucket (the
    OR-construction that trades a few extra candidates for much
    higher recall than one wide hash — single-bucket 8-bit LSH
    measured 6% recall on this data, banding lifts it severalfold;
    tests/test_similarity_ops.py enforces the floor).

    Scale shape: band buckets are a map-only pass (4*bits fixed dot
    products in codegen), candidates come from 4 equi-joins on
    (band, bucket) expressed as one join on the exploded band column,
    and the DISTINCT collapses pairs found by multiple bands before
    ranking. Per-band bucket occupancy is held ~O(2^BITS_OFFSET) by
    the adaptive width, and the oracle replays the identical
    construction with the same literal hyperplanes AND the same
    bits-from-COUNT(*) derivation, so the hash check proves the
    pruned plan computes exactly what it claims."""
    e = _vectors(spark, sf_dir)
    # band join + candidate DISTINCT move only (id, band, bucket);
    # vectors join back per UNIQUE candidate so each pair pays one dot
    # product and the dedup shuffle carries ids, not 512-byte arrays
    bands = _lsh_bands(spark, sf_dir)
    cand = (
        bands.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").alias("query_id"), "band", "bucket")
        .join(
            bands.select(col("vec_id").alias("neighbor_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(col("query_id") != col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qe = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv"), col("nv").alias("qn")
    )
    ce = e.select(
        col("vec_id").alias("neighbor_id"),
        col("label").alias("neighbor_label"),
        col("v").alias("cv"),
        col("nv").alias("cn"),
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            _cosine_pre(col("qv"), col("cv"), col("qn"), col("cn")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(col("cosine").desc(), col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Int8 symmetric quantization (vector-index compression)
# ---------------------------------------------------------------------------

QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e
),
q AS (
  SELECT vec_id, amax,
    CASE WHEN amax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
         ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / amax + 0.5) AS BIGINT))
    END AS qv
  FROM s
)
SELECT vec_id,
  CAST(len(qv) AS BIGINT) AS n_dims,
  amax / 127.0 AS scale,
  CAST(list_sum(qv) AS BIGINT) AS sum_q,
  CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS max_abs_q
FROM q
"""


@register("quantize_embeddings_int8", oracle=QUANT_ORACLE)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the index-compression
    pass of a vector-search pipeline (4x smaller than float32, 8x
    smaller than the double working form; dequantize is q*scale).
    Codes are ``floor(x*127/amax + 0.5)`` (round-half-up toward +inf,
    identical in both engines via FLOOR — never engine ``round()``,
    whose half-tie rule differs); all-zero vectors quantize to zeros
    with scale 0.

    Emits the per-vector audit row (dims, scale, integer checksums) —
    integer outputs make the quantizer bitwise-checkable; the
    reconstruction-error bound is asserted in
    tests/test_similarity_ops.py. Plan: pure map-only pass, one scan,
    zero shuffles; each HOF stage lives in its own select so the amax
    reduction isn't re-inlined per element (expression-inlining trap).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    s = e.select(
        "vec_id",
        "v",
        F.array_max(F.transform(col("v"), F.abs)).alias("amax"),
    )
    qv = F.when(
        col("amax") == 0,
        F.transform(col("v"), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(col("v"), lambda x: F.floor(x * 127.0 / col("amax") + 0.5))
    )
    q = s.select("vec_id", "amax", qv.alias("qv"))
    return q.select(
        "vec_id",
        F.size("qv").cast("bigint").alias("n_dims"),
        (col("amax") / 127.0).alias("scale"),
        F.aggregate(
            col("qv"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("sum_q"),
        F.array_max(F.transform(col("qv"), F.abs)).cast("bigint").alias("max_abs_q"),
    )


# ---------------------------------------------------------------------------
# IVF-style partitioned ANN (the clustered scale path)
# ---------------------------------------------------------------------------

CENT_STRIDE = 30  # fixture-floor stride: vec_id % 30 == 10 (disjoint from queries)
CENT_OFFSET = 10
N_PROBE = 4

# -- scale-adaptive centroid stride (round 11; the deterministic-IVF
# twin of the lsh_bits policy). A FIXED stride means k = n/stride
# cells: cell size stays constant (good) but the assignment crossJoin
# does n*k = n^2/stride dot products and the centroid broadcast grows
# linearly — the same documented-but-not-implemented k ~ sqrt(n) gap
# the round-10 audit burned the fixed LSH banding for. The stride now
# derives from the corpus count at build time: fixture corpora
# (n < IVF_FLOOR_N — every harness SF) keep the original oracle-pinned
# stride-30 geometry, larger ones take stride = ceil(n / floor(sqrt
# (n))) ~ sqrt(n), so k ~ sqrt(n) cells of ~sqrt(n) rows: assignment
# is n^1.5, broadcast O(sqrt(n)) — and every consumer's DuckDB oracle
# re-derives the identical stride from the same COUNT(*)
# (_ivf_stride_sql), so the parameterization is hash-checked.
IVF_FLOOR_N = 2048


def ivf_stride(n: int) -> int:
    """Adaptive centroid stride for an n-vector corpus. isqrt and
    ceil-division are exact integer ops — no float rounding."""
    if n < IVF_FLOOR_N:
        return CENT_STRIDE
    import math

    return -(-n // math.isqrt(n))


def _ivf_stride_sql(corpus_sql: str = "embeddings") -> str:
    """The stride CTE body: the EXACT Python ``ivf_stride`` clamp in
    SQL. FLOOR(SQRT(n)) cannot disagree with isqrt (sqrt of a perfect
    square is exactly representable; between squares the value is
    >> 1 ulp from the integer), and CEIL of the double quotient
    cannot cross an integer (the fractional part is >= 1/sqrt(n),
    astronomically larger than the quotient's ulp)."""
    return (
        f"SELECT CASE WHEN COUNT(*) < {IVF_FLOOR_N} THEN {CENT_STRIDE} "
        f"ELSE CAST(CEIL(COUNT(*) / FLOOR(SQRT(COUNT(*)))) AS BIGINT) END "
        f"AS stride FROM {corpus_sql}"
    )


def ivf_stride_for(spark: SparkSession, sf_dir: str) -> int:
    """The adaptive stride for one sf_dir. The count behind it is a
    parquet metadata-priced action, session-memoized per sf_dir
    (build-time parameter derivation, exactly like _lsh_bands' bit
    count)."""
    from iot_sparkstreaming_spark.tables import session_memo

    def derive() -> int:
        return ivf_stride(load_table(spark, sf_dir, "embeddings").count())

    return session_memo(spark, ("ivf_stride", sf_dir), derive)


def _ivf_cent(spark: SparkSession, sf_dir: str, e: DataFrame) -> DataFrame:
    """The deterministic centroid subset ``(cid, cvec, cn)`` of the
    similarity-module vector table under the adaptive stride."""
    return e.filter(
        col("vec_id") % ivf_stride_for(spark, sf_dir) == CENT_OFFSET
    ).select(
        col("vec_id").alias("cid"), col("v").alias("cvec"), col("nv").alias("cn")
    )

IVF_ORACLE = f"""
WITH st AS (
  {_ivf_stride_sql()}
),
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cvec FROM e, st
  WHERE vec_id % st.stride = {CENT_OFFSET}
),
assigned AS (
  SELECT vec_id, label, v, cid FROM (
    SELECT e.vec_id, e.label, e.v, cent.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_COS_SQL.format(a="e.v", b="cent.cvec")} DESC, cent.cid) AS crk
    FROM e CROSS JOIN cent
  ) WHERE crk = 1
),
probes AS (
  SELECT query_id, cid, qv FROM (
    SELECT e.vec_id AS query_id, cent.cid, e.v AS qv,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_COS_SQL.format(a="e.v", b="cent.cvec")} DESC, cent.cid) AS prk
    FROM e CROSS JOIN cent WHERE e.vec_id < {N_QUERIES}
  ) WHERE prk <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.label AS neighbor_label,
         {_COS_SQL.format(a="p.qv", b="a.v")} AS cosine
  FROM probes p JOIN assigned a ON a.cid = p.cid
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def _ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list assignment: one broadcast + hash-aggregated
    argmax (max of (ccos, -cid) structs == highest cosine, lowest cid
    on ties — identical pick to the oracle's ROW_NUMBER, but a
    partial-aggregating hash agg instead of a sort window: no
    per-partition sort of the corpus×C pair stream at scale). The
    assignment IS the IVF index — the build-once artifact (written
    partitionBy(cid) in production) — so it is materialized +
    session-memoized and SHARED by every consumer (`ann_ivf_cosine`,
    `ann_ivf_pq`).

    EVERY input is constructed INSIDE the builder (no DataFrame
    parameters): the artifact store fingerprints the builder's CODE,
    and a closure-captured DataFrame is invisible to that hash —
    deriving the vectors and centroids here makes the token recurse
    through _vectors / _ivf_cent → ivf_stride, so a geometry or
    vector-prep change can never be answered by a stale index."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build_assigned() -> DataFrame:
        e = _vectors(spark, sf_dir)
        cent = _ivf_cent(spark, sf_dir, e)
        return (
            e.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                "label",
                "v",
                "nv",
                _cosine_pre(col("v"), col("cvec"), col("nv"), col("cn")).alias("ccos"),
                "cid",
            )
            .groupBy("vec_id")
            .agg(
                F.any_value(col("label")).alias("label"),
                F.any_value(col("v")).alias("v"),
                F.any_value(col("nv")).alias("nv"),
                F.max(
                    F.struct(col("ccos").alias("c"), (-col("cid")).alias("nc"))
                ).alias("m"),
            )
            .select("vec_id", "label", "v", "nv", (-col("m.nc")).alias("cid"))
        )

    return artifact_memo(spark, ("ivf_assigned", sf_dir), build_assigned)


@register("ann_ivf_cosine", oracle=IVF_ORACLE)
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    centroid (inverted lists); a query probes only its ``N_PROBE``
    nearest centroids' lists, scoring ~nprobe/C of the corpus.

    Centroids here are a deterministic arithmetic subset of the
    corpus (``vec_id % stride == 10``) rather than k-means output —
    the operator mechanics (assignment pass, probe pruning, exact
    re-ranking) are identical and oracle-checkable; swapping in
    trained centroids changes recall, not the plan. The stride is the
    ADAPTIVE ``ivf_stride(n)`` (~sqrt(n), floored at 30 for fixture
    corpora, re-derived by the oracle from the same COUNT(*)), so
    k ~ sqrt(n) cells of ~sqrt(n) rows: the assignment crossJoin does
    n^1.5 dot products instead of the n^2/30 a fixed stride implies.

    Scale shape: centroid set is O(sqrt(n)) → broadcast cross join +
    argmax makes assignment one map-side pass over the corpus. At
    100 TB the assigned corpus would be written
    ``partitionBy("cid")`` so a search reads only the probed
    partitions (partition pruning on cid); the candidate join is an
    equi-join on cid with bounded fan-in. Recall vs the exact
    baseline is checked in tests/test_similarity_ops.py; THIS oracle
    proves the pruned plan computes exactly what it claims."""
    e = _vectors(spark, sf_dir)
    cent = _ivf_cent(spark, sf_dir, e)

    assigned = _ivf_assigned(spark, sf_dir)

    probes = (
        e.filter(col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            col("vec_id").alias("query_id"),
            col("v").alias("qv"),
            col("nv").alias("qn"),
            "cid",
            _cosine_pre(col("v"), col("cvec"), col("nv"), col("cn")).alias("ccos"),
        )
        .withColumn("prk", F.row_number().over(
            Window.partitionBy("query_id").orderBy(col("ccos").desc(), col("cid"))
        ))
        .filter(col("prk") <= N_PROBE)
        .select("query_id", "qv", "qn", "cid")
    )

    scored = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(col("vec_id") != col("query_id"))
        .select(
            "query_id",
            col("vec_id").alias("neighbor_id"),
            col("label").alias("neighbor_label"),
            _cosine_pre(col("qv"), col("v"), col("qn"), col("nv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(col("cosine").desc(), col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction (JL sketching)
# ---------------------------------------------------------------------------

RP_DIM = 8


def _rp_oracle() -> str:
    cols = []
    for j in range(RP_DIM):
        w = "[" + ", ".join(repr(x) for x in PLANES[j]) + "]"
        cols.append(f"ROUND(list_dot_product(v, {w}), 6) AS p{j}")
    sel = ",\n  ".join(cols)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
  {sel}
FROM e
"""


@register("rp_project_embeddings", oracle=_rp_oracle())
def rp_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 → 8 dims: project
    every embedding onto 8 fixed pseudo-random hyperplanes (the SAME
    md5-seeded literals the sign-LSH family uses, so the projection
    is a pure function of the construction, not an RNG draw). The
    standard index-compression / visualization precursor; sign-LSH is
    exactly this projection quantized to 1 bit.

    Determinism: each coordinate is a left-to-right fold rounded to
    6 dp — the module's cosine convention — so both engines agree
    bitwise. Scale: map-only, 8 codegen folds per row; the 64-float
    payload never shuffles (this query has no exchange at all).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    projections = [
        F.round(
            _dot(col("v"), F.array(*[F.lit(x) for x in PLANES[j]])), 6
        ).alias(f"p{j}")
        for j in range(RP_DIM)
    ]
    return e.select("vec_id", *projections)


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance (the compressed scale path)
# ---------------------------------------------------------------------------

PQ_M = 32  # subspaces (64 dims -> 32 slices of 2)
PQ_DSUB = DIM // PQ_M
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_SEED_BASE = 10  # codebook seeds: vec_id in [10, 26) (disjoint from queries)

#: squared L2 via dot products — ONE expression text on both engines,
#: so the doubles are bit-identical (same IEEE ops on same inputs).
_D2_SQL = (
    "(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b}))"
    " + list_dot_product({b}, {b})"
)


def _d2(u: Column, w: Column) -> Column:
    return (_dot(u, u) - F.lit(2.0) * _dot(u, w)) + _dot(w, w)


PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
js AS (SELECT unnest(range(0, {PQ_M})) AS j),
cb AS (
  SELECT e.vec_id - {PQ_SEED_BASE} AS c_id, js.j,
         list_slice(e.v, js.j * {PQ_DSUB} + 1, js.j * {PQ_DSUB} + {PQ_DSUB}) AS cent
  FROM e CROSS JOIN js
  WHERE e.vec_id >= {PQ_SEED_BASE} AND e.vec_id < {PQ_SEED_BASE + PQ_K}
),
sub AS (
  SELECT e.vec_id, js.j,
         list_slice(e.v, js.j * {PQ_DSUB} + 1, js.j * {PQ_DSUB} + {PQ_DSUB}) AS u
  FROM e CROSS JOIN js
),
codes AS (
  SELECT vec_id, j, c_id FROM (
    SELECT sub.vec_id, sub.j, cb.c_id,
      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.j
        ORDER BY {_D2_SQL.format(a="sub.u", b="cb.cent")}, cb.c_id) AS rk
    FROM sub JOIN cb ON sub.j = cb.j
  ) WHERE rk = 1
),
recon AS (
  SELECT codes.vec_id, flatten(list(cb.cent ORDER BY codes.j)) AS r
  FROM codes JOIN cb ON codes.j = cb.j AND codes.c_id = cb.c_id
  GROUP BY codes.vec_id
),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         ne.label AS neighbor_label,
         ROUND({_D2_SQL.format(a="q.v", b="n.r")}, 6) AS adc_d2
  FROM e q
  JOIN recon n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
  JOIN e ne ON ne.vec_id = n.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, adc_d2, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def _pq_codebook(e: DataFrame) -> DataFrame:
    """(j, c_id, cent) — PQ_M × PQ_K subvector centroids from the
    deterministic seed vectors; 128 tiny rows, always broadcast."""
    jseq = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j")
    return (
        e.filter(
            (col("vec_id") >= PQ_SEED_BASE) & (col("vec_id") < PQ_SEED_BASE + PQ_K)
        )
        .select((col("vec_id") - PQ_SEED_BASE).alias("c_id"), "v", jseq)
        .select(
            "c_id", "j", F.slice(col("v"), col("j") * PQ_DSUB + 1, PQ_DSUB).alias("cent")
        )
    )


def _pq_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, r) — PQ reconstructions (concatenated nearest
    centroids per subspace). The codes table is the build-once
    compression artifact; materialized + session-memoized and SHARED
    by every consumer (`ann_pq_adc`, `ann_ivf_pq`).

    EVERY input is constructed INSIDE the builder (same fingerprint
    discipline as :func:`_ivf_assigned`): the store hashes builder
    CODE, and a closure-captured DataFrame is invisible to that hash —
    deriving the vectors and codebook here makes the token recurse
    through _vectors / _pq_codebook, so a vector-prep or codebook
    change can never be answered by stale reconstructions."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build_recon() -> DataFrame:
        e = _vectors(spark, sf_dir)
        cb = _pq_codebook(e)
        jseq = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j")
        sub = e.select("vec_id", "v", jseq).select(
            "vec_id",
            "j",
            F.slice(col("v"), col("j") * PQ_DSUB + 1, PQ_DSUB).alias("u"),
        )
        codes = (
            sub.join(F.broadcast(cb), "j")
            .select(
                "vec_id",
                "j",
                "c_id",
                _d2(col("u"), col("cent")).alias("d2"),
            )
            .groupBy("vec_id", "j")
            .agg(
                F.min(F.struct(col("d2").alias("d"), col("c_id").alias("c"))).alias("m")
            )
            .select("vec_id", "j", col("m.c").alias("c_id"))
        )
        return (
            codes.join(F.broadcast(cb), ["j", "c_id"])
            .groupBy("vec_id")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(col("j"), col("cent")))),
                        lambda s: s["cent"],
                    )
                ).alias("r")
            )
        )

    return artifact_memo(spark, ("pq_recon", sf_dir), build_recon)


@register("ann_pq_adc", oracle=PQ_ORACLE)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance: each corpus
    vector is compressed to ``PQ_M`` 4-bit codes (nearest of 16
    centroids per 2-dim subspace), and queries are scored against the
    RECONSTRUCTION (concatenated centroids) — exactly the ADC
    estimate, since the asymmetric distance IS d(q, recon(code)).
    This is the memory-side scale lever the IVF/LSH variants don't
    cover: 64 floats (256 B) become 16 bytes per vector, the form a
    100-TB corpus actually keeps hot (IVF prunes WHICH vectors are
    scored; PQ shrinks WHAT is stored/scanned — production systems
    compose them as IVF-PQ). Geometry (32×2-dim, measured recall 0.40
    vs exact-L2 top-5 on the clusterless random fixture) was chosen
    over 8×8-dim (0.14) — finer subspaces quantize unstructured data
    far better; on clustered real embeddings both improve.

    Codebooks are deterministic data subvectors (seeds ``vec_id`` in
    [10, 26), the same trained-centroids-change-recall-not-the-plan
    stance as ``ann_ivf_cosine``). Encoding is one broadcast join
    (codebook = 128 tiny rows) + a hash-aggregated argmin — a single
    map-side pass over the corpus, shuffled only by (vec_id, j) for
    the argmin; the code table is the build-once artifact and is
    session-memoized like the IVF assignment. Distances everywhere
    use the dot-product identity in ONE shared expression string
    (`_D2_SQL`), so Spark and DuckDB fold bit-identical doubles;
    reconstruction order is pinned by sorting the (j, centroid)
    structs. Recall vs the exact baseline is measured in
    tests/test_similarity_ops.py; this oracle proves the compressed
    plan computes exactly what it claims."""
    e = _vectors(spark, sf_dir)
    recon = _pq_recon(spark, sf_dir)

    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv")
    )
    scored = (
        recon.join(e.select("vec_id", "label"), "vec_id")
        .crossJoin(F.broadcast(q))
        .filter(col("query_id") != col("vec_id"))
        .select(
            "query_id",
            col("vec_id").alias("neighbor_id"),
            col("label").alias("neighbor_label"),
            F.round(_d2(col("qv"), col("r")), 6).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(col("adc_d2").asc(), col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "adc_d2", col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ: probe pruning composed with compressed scoring
# ---------------------------------------------------------------------------

IVF_PQ_ORACLE = f"""
WITH st AS (
  {_ivf_stride_sql()}
),
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cvec FROM e, st
  WHERE vec_id % st.stride = {CENT_OFFSET}
),
assigned AS (
  SELECT vec_id, label, cid FROM (
    SELECT e.vec_id, e.label, cent.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_COS_SQL.format(a="e.v", b="cent.cvec")} DESC, cent.cid) AS crk
    FROM e CROSS JOIN cent
  ) WHERE crk = 1
),
probes AS (
  SELECT query_id, cid, qv FROM (
    SELECT e.vec_id AS query_id, cent.cid, e.v AS qv,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY {_COS_SQL.format(a="e.v", b="cent.cvec")} DESC, cent.cid) AS prk
    FROM e CROSS JOIN cent WHERE e.vec_id < {N_QUERIES}
  ) WHERE prk <= {N_PROBE}
),
js AS (SELECT unnest(range(0, {PQ_M})) AS j),
cb AS (
  SELECT e.vec_id - {PQ_SEED_BASE} AS c_id, js.j,
         list_slice(e.v, js.j * {PQ_DSUB} + 1, js.j * {PQ_DSUB} + {PQ_DSUB}) AS cent
  FROM e CROSS JOIN js
  WHERE e.vec_id >= {PQ_SEED_BASE} AND e.vec_id < {PQ_SEED_BASE + PQ_K}
),
sub AS (
  SELECT e.vec_id, js.j,
         list_slice(e.v, js.j * {PQ_DSUB} + 1, js.j * {PQ_DSUB} + {PQ_DSUB}) AS u
  FROM e CROSS JOIN js
),
codes AS (
  SELECT vec_id, j, c_id FROM (
    SELECT sub.vec_id, sub.j, cb.c_id,
      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.j
        ORDER BY {_D2_SQL.format(a="sub.u", b="cb.cent")}, cb.c_id) AS rk
    FROM sub JOIN cb ON sub.j = cb.j
  ) WHERE rk = 1
),
recon AS (
  SELECT codes.vec_id, flatten(list(cb.cent ORDER BY codes.j)) AS r
  FROM codes JOIN cb ON codes.j = cb.j AND codes.c_id = cb.c_id
  GROUP BY codes.vec_id
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.label AS neighbor_label,
         ROUND({_D2_SQL.format(a="p.qv", b="n.r")}, 6) AS adc_d2
  FROM probes p
  JOIN assigned a ON a.cid = p.cid
  JOIN recon n ON n.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, neighbor_label, adc_d2, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


@register("ann_ivf_pq", oracle=IVF_PQ_ORACLE)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production composition the two scale paths exist
    for: IVF probe pruning decides WHICH vectors are scored
    (~nprobe/C of the corpus), PQ codes decide WHAT is read per
    candidate (16 B reconstructions instead of 256 B raw vectors).
    At 100 TB this is the standard big-ANN architecture (inverted
    lists partition-pruned on cid; each list stores only codes).

    Both build-once artifacts are REUSED, not rebuilt: the query
    joins the session-memoized IVF assignment (`ivf_assigned`) with
    the session-memoized PQ reconstructions (`pq_recon`) — the
    artifact-sharing that makes index cost amortize across every
    query type that consumes it. Candidate scoring is ADC (exact L2
    to the reconstruction), bit-identical to the oracle via the
    shared `_D2_SQL` expression."""
    # rebuilding via the registered queries hits the same session
    # memos (keys ("ivf_assigned", sf_dir) / ("pq_recon", sf_dir)),
    # so these two calls are cheap after either parent query ran.
    from iot_sparkstreaming_spark.artifacts import artifact_memo  # noqa: F401

    e = _vectors(spark, sf_dir)
    cent = _ivf_cent(spark, sf_dir, e)
    assigned = _ivf_assigned(spark, sf_dir).select("vec_id", "label", "cid")
    recon = _pq_recon(spark, sf_dir)

    probes = (
        e.filter(col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            col("vec_id").alias("query_id"),
            col("v").alias("qv"),
            "cid",
            _cosine_pre(col("v"), col("cvec"), col("nv"), col("cn")).alias("ccos"),
        )
        .withColumn(
            "prk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(col("ccos").desc(), col("cid"))
            ),
        )
        .filter(col("prk") <= N_PROBE)
        .select("query_id", "qv", "cid")
    )

    scored = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(col("vec_id") != col("query_id"))
        .join(recon, "vec_id")
        .select(
            "query_id",
            col("vec_id").alias("neighbor_id"),
            col("label").alias("neighbor_label"),
            F.round(_d2(col("qv"), col("r")), 6).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(col("adc_d2").asc(), col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "adc_d2",
            col("rk").cast("bigint").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Gram / covariance matrix of the embedding corpus (the PCA front half)
# ---------------------------------------------------------------------------

GRAM_SCALE = 10000  # fixed-point: round(v * 1e4) per dimension

GRAM_ORACLE = f"""
WITH s AS (
  SELECT list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * {GRAM_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
),
dims AS (
  SELECT a.r AS i, b.r AS j
  FROM range(0, {DIM}) a(r), range(0, {DIM}) b(r)
  WHERE a.r <= b.r
),
gram AS (
  SELECT d.i, d.j,
    CAST(SUM(sv[d.i + 1] * sv[d.j + 1]) AS DOUBLE) AS gram_scaled
  FROM s, dims d GROUP BY d.i, d.j
),
dsums AS (
  SELECT t.r AS d,
    CAST(SUM(sv[t.r + 1]) AS DOUBLE) AS dsum,
    CAST(COUNT(*) AS DOUBLE) AS n
  FROM s, range(0, {DIM}) t(r) GROUP BY t.r
)
SELECT g.i, g.j,
  CAST(g.gram_scaled AS DOUBLE) AS gram_scaled,
  CAST(si.dsum AS DOUBLE) AS sum_i_scaled,
  CAST(sj.dsum AS DOUBLE) AS sum_j_scaled,
  CAST(si.n AS BIGINT) AS n_vecs,
  (g.gram_scaled - si.dsum * sj.dsum / si.n) / (si.n - 1)
    / {GRAM_SCALE * GRAM_SCALE}.0 AS cov
FROM gram g
JOIN dsums si ON si.d = g.i
JOIN dsums sj ON sj.d = g.j
"""


@register("embedding_gram_matrix", oracle=GRAM_ORACLE)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular Gram + sample-covariance matrix of the
    embedding corpus — the one-pass sufficient statistic feeding PCA
    whitening, JL-vs-PCA comparisons, and drift monitors over an
    embedding column.

    Exactness: dimensions ride fixed-point bigints (round(v·1e4));
    each partition's Gram contribution is an int64 ``Sᵀ·S`` matmul, so
    every `gram_scaled` cell is an exact integer (well under 2^53 at
    any harness scale; per-partition partials stay exact to ~1e6 rows
    x |s|≤6000 per task). The covariance combines those exact moments
    in ONE identical double expression on both engines.

    Scale shape: this is the mapInPandas-partial-aggregate pattern —
    each task folds its rows into a d x d int64 matrix (32 KB) via one
    vectorized numpy matmul and emits d(d+1)/2 partial rows, so the
    shuffle moves O(partitions · d²) rows, NEVER O(rows · d²): the
    explode-and-self-join formulation the oracle uses would shuffle
    4e12 rows at 1e9 vectors, this moves ~2080 per task. Per-dim sums
    ride a separate posexplode aggregate (O(rows · d) map-side
    combined), and the d-row join is broadcast.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    e = load_table(spark, sf_dir, "embeddings")
    scaled = e.select(
        F.transform(
            col("embedding"),
            lambda x: F.round(x.cast("double") * GRAM_SCALE).cast("bigint"),
        ).alias("s")
    )

    def gram_partial(batches):
        import numpy as np

        acc = np.zeros((DIM, DIM), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf):
                m = np.array(pdf["s"].tolist(), dtype=np.int64)
                acc += m.T @ m
                seen = True
        if seen:
            iu = np.triu_indices(DIM)
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"), "partial": acc[iu]}
            )

    gram = (
        scaled.mapInPandas(gram_partial, "i int, j int, partial long")
        .groupBy("i", "j")
        .agg(F.sum("partial").cast("double").alias("gram_scaled"))
    )
    dsums = (
        scaled.select(F.posexplode("s").alias("d", "sv"))
        .groupBy("d")
        .agg(
            F.sum("sv").cast("double").alias("dsum"),
            F.count("*").cast("double").alias("n"),
        )
    )
    si = dsums.select(col("d").alias("i"), col("dsum").alias("sum_i_scaled"), "n")
    sj = dsums.select(col("d").alias("j"), col("dsum").alias("sum_j_scaled"))
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            "gram_scaled",
            "sum_i_scaled",
            "sum_j_scaled",
            col("n").cast("bigint").alias("n_vecs"),
            (
                (
                    col("gram_scaled")
                    - col("sum_i_scaled") * col("sum_j_scaled") / col("n")
                )
                / (col("n") - 1)
                / float(GRAM_SCALE * GRAM_SCALE)
            ).alias("cov"),
        )
    )


# ---------------------------------------------------------------------------
# Lloyd k-means over the embedding corpus (iterative algorithm #6)
# ---------------------------------------------------------------------------

KM_K = 8
KM_ITERS = 3
KM_SCALE = 10000  # fixed-point for the exact centroid-sum accumulators


def _kmeans_ctes() -> str:
    """Shared unrolled-Lloyd CTE chain (``e``, ``c0`` … ``c{ITERS}``)
    — the common prefix of the k-means oracle and the
    ``ann_ivf_kmeans`` oracle, so both engines provably run the SAME
    clustering."""
    sql = f"""
WITH e AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    list_transform(embedding,
      x -> CAST(ROUND(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < {KM_K})"""
    for i in range(1, KM_ITERS + 1):
        d2 = _D2_SQL.format(a="e.v", b="c.cvec")
        sql += f""",
a{i} AS (
  SELECT vec_id, v, sv, cid FROM (
    SELECT e.vec_id, e.v, e.sv, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rk
    FROM e CROSS JOIN c{i - 1} c
  ) WHERE rk = 1
),
cnt{i} AS (SELECT cid, COUNT(*) AS n FROM a{i} GROUP BY cid),
sums{i} AS (
  SELECT a.cid, t.r AS d, SUM(sv[t.r + 1]) AS s
  FROM a{i} a, range(0, {DIM}) t(r) GROUP BY 1, 2
),
c{i} AS (
  SELECT s.cid, list(s.s / ({KM_SCALE}.0 * c.n) ORDER BY s.d) AS cvec
  FROM sums{i} s JOIN cnt{i} c USING (cid) GROUP BY s.cid
)"""
    return sql


def _kmeans_oracle() -> str:
    """Unrolled fixed-iteration Lloyd: each round is one assignment
    CTE (argmin squared-L2 via the bitwise-validated dot-product
    identity, ties to the smallest centroid id) and one update CTE
    (per-dim EXACT integer sums divided once into double centroids) —
    the same unroll trick as the PageRank/LPA oracles."""
    d2f = _D2_SQL.format(a="e.v", b="c.cvec")
    return _kmeans_ctes() + f"""
SELECT vec_id, cid,
  CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size,
  ROUND(sq_dist, 6) AS sq_dist
FROM (
  SELECT vec_id, cid, sq_dist FROM (
    SELECT e.vec_id, c.cid, {d2f} AS sq_dist,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2f}, c.cid) AS rk
    FROM e CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
)
"""


@register("kmeans_lloyd_embeddings", oracle=_kmeans_oracle())
def kmeans_lloyd_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means (k = {KM_K}, {KM_ITERS} fixed rounds, seeds =
    the first k vectors) over the embedding corpus — the clustering
    that real IVF/SemDeDup builds refine their seed centroids with,
    and the engine's sixth iterative-algorithm shape (components,
    PageRank, k-core, BPE, LPA, and now Lloyd).

    Cross-engine exactness for a FLOAT algorithm: every distance is
    the dot-product identity ``v·v − 2·v·c + c·c`` whose fold is
    bitwise-validated against DuckDB's list_dot_product; every
    centroid dimension is an EXACT integer sum (1e4 fixed-point)
    divided ONCE into a double — so assignments, ties (smallest cid)
    and the 3-round fixpoint are bit-for-bit reproducible, and the
    oracle unrolls the identical rounds. A cluster that empties
    simply drops out of the next round on both engines.

    Scale shape per round: centroids (k x d doubles) BROADCAST to a
    map-side argmin expressed as a hash aggregate (max of
    (-dist, -cid) structs — no per-vector sort window); the update is
    a (cid, dim)-keyed exact-sum aggregate with map-side combine.
    Corpus rows are never shuffled for assignment — only the k x d
    sums move. The classic MLlib plan, minus the RDD API.
    """
    parts = _kmeans_parts(spark, sf_dir)
    e, cent = parts["e"], parts["cent"]
    d2 = _d2(col("v"), col("cvec"))
    final = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            F.struct((-d2).alias("nd"), (-col("cid")).alias("nc")).alias("key"),
        )
        .groupBy("vec_id")
        .agg(F.max("key").alias("m"))
        .select(
            "vec_id",
            (-col("m.nc")).cast("bigint").alias("cid"),
            (-col("m.nd")).alias("sq_dist"),
        )
    )
    return final.select(
        "vec_id",
        "cid",
        F.count("*").over(Window.partitionBy("cid")).cast("bigint").alias(
            "cluster_size"
        ),
        F.round(col("sq_dist"), 6).alias("sq_dist"),
    )


kmeans_lloyd_embeddings.__doc__ = kmeans_lloyd_embeddings.__doc__.replace(
    "{KM_K}", str(KM_K)
).replace("{KM_ITERS}", str(KM_ITERS))


def _kmeans_parts(spark: SparkSession, sf_dir: str) -> dict:
    """Memoized Lloyd artifacts per (session, sf_dir): the prepared
    vector frame ``e`` (double + fixed-point views) and the FINAL
    round-{KM_ITERS} centroid table — the build-once clustering both
    ``kmeans_lloyd_embeddings`` and ``ann_ivf_kmeans`` consume."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> dict:
        e = (
            load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
            F.transform(
                col("embedding"),
                lambda x: F.round(x.cast("double") * KM_SCALE).cast("bigint"),
            ).alias("sv"),
        )
            .localCheckpoint(eager=True)
        )
        cent = e.filter(col("vec_id") < KM_K).select(
            col("vec_id").alias("cid"), col("v").alias("cvec")
        )

        def assign(centroids: DataFrame) -> DataFrame:
            d2 = _d2(col("v"), col("cvec"))
            return (
                e.crossJoin(F.broadcast(centroids))
                .select(
                    "vec_id",
                    "v",
                    "sv",
                    "cid",
                    F.struct(
                        (-d2).alias("nd"), (-col("cid")).alias("nc")
                    ).alias("key"),
                )
                .groupBy("vec_id")
                .agg(
                    F.any_value(col("v")).alias("v"),
                    F.any_value(col("sv")).alias("sv"),
                    F.max("key").alias("m"),
                )
                .select(
                    "vec_id", "v", "sv", (-col("m.nc")).cast("bigint").alias("cid")
                )
            )

        cent_i = cent
        for _ in range(KM_ITERS):
            assigned = assign(cent_i)
            cnt = assigned.groupBy("cid").agg(F.count("*").alias("n"))
            sums = (
                assigned.select("cid", F.posexplode("sv").alias("d", "x"))
                .groupBy("cid", "d")
                .agg(F.sum("x").alias("s"))
            )
            cent_i = (
                sums.join(cnt, "cid")
                .select(
                    "cid",
                    "d",
                    (
                        col("s").cast("double")
                        / (F.lit(float(KM_SCALE)) * col("n"))
                    ).alias("c"),
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("d", "c"))),
                        lambda x: x["c"],
                    ).alias("cvec")
                )
            )
        return {"e": e, "cent": cent_i.localCheckpoint(eager=True)}

    return artifact_memo(spark, ("kmeans_parts", sf_dir), build)


# ---------------------------------------------------------------------------
# IVF over Lloyd-refined centroids (clustering -> index composition)
# ---------------------------------------------------------------------------


def _kmeans_ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized corpus→cell assignment table (vec_id, v, cid) against
    the FINAL Lloyd centroids — the inverted-file index that
    ``ann_ivf_kmeans`` serves probes from and
    ``ann_incremental_assign`` treats as the persisted historical
    index. One broadcast hash-agg argmin over the corpus; in
    production this is the table written partitionBy(cid).

    Inputs are derived INSIDE the builder (same discipline as
    _ivf_assigned): the store fingerprints builder CODE, and a
    closure-captured DataFrame is invisible to that hash — deriving
    e/cent here recurses the token through _kmeans_parts, so a Lloyd
    change can never be answered by a stale assignment."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build_assigned() -> DataFrame:
        parts = _kmeans_parts(spark, sf_dir)
        e, cent = parts["e"], parts["cent"]
        d2 = _d2(col("v"), col("cvec"))
        return (
            e.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                "v",
                "cid",
                F.struct((-d2).alias("nd"), (-col("cid")).alias("nc")).alias("key"),
            )
            .groupBy("vec_id")
            .agg(F.any_value(col("v")).alias("v"), F.max("key").alias("m"))
            .select("vec_id", "v", (-col("m.nc")).cast("bigint").alias("cid"))
        )

    return artifact_memo(spark, ("kmeans_ivf_assigned", sf_dir), build_assigned)


def _ivf_kmeans_oracle() -> str:
    d2a = _D2_SQL.format(a="e.v", b="c.cvec")
    d2s = _D2_SQL.format(a="p.qv", b="f.v")
    return _kmeans_ctes() + f""",
fin AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2a}, c.cid) AS rk
    FROM e CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
),
probes AS (
  SELECT query_id, cid, qv FROM (
    SELECT e.vec_id AS query_id, c.cid, e.v AS qv,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2a}, c.cid) AS prk
    FROM e CROSS JOIN c{KM_ITERS} c WHERE e.vec_id < {N_QUERIES}
  ) WHERE prk <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, f.vec_id AS neighbor_id, {d2s} AS d2
  FROM probes p JOIN fin f ON f.cid = p.cid
  WHERE f.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, ROUND(d2, 6) AS sq_dist, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY d2, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


@register("ann_ivf_kmeans", oracle=_ivf_kmeans_oracle())
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over LLOYD-REFINED centroids — the production IVF
    build: ``ann_ivf_cosine`` partitions by raw seed vectors, this
    one by the k-means fixpoint, which tightens the cells and so the
    probe recall at the same probe budget. Composition is the point:
    the memoized clustering artifact (`_kmeans_parts`) becomes the
    index, exactly how an offline "train centroids -> assign corpus
    -> serve probes" pipeline stages it.

    Metric is squared L2 (consistent with the clustering), every
    distance the bitwise-validated dot-product identity; probes and
    top-k tie-break on ids, so the result is a pure function of the
    data on both engines — the oracle replays the SAME unrolled
    Lloyd rounds before searching.

    Scale shape: the corpus-to-cell assignment is one broadcast
    hash-agg argmin, memoized (in production: written
    partitionBy(cid)); each query probes {N_PROBE} of {KM_K} cells,
    so the scoring join touches ~{N_PROBE}/{KM_K} of the corpus,
    shuffled on the cell id only.
    """
    parts = _kmeans_parts(spark, sf_dir)
    e, cent = parts["e"], parts["cent"]
    assigned = _kmeans_ivf_assigned(spark, sf_dir)

    d2p = _d2(col("qv"), col("cvec"))
    w_probe = Window.partitionBy("query_id").orderBy(d2p.asc(), col("cid").asc())
    probes = (
        e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").alias("query_id"), col("v").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .withColumn("prk", F.row_number().over(w_probe))
        .filter(col("prk") <= N_PROBE)
        .select("query_id", "qv", "cid")
    )
    d2s = _d2(col("qv"), col("v"))
    scored = (
        probes.join(assigned, "cid")
        .filter(col("vec_id") != col("query_id"))
        .select("query_id", col("vec_id").alias("neighbor_id"), d2s.alias("d2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        col("d2").asc(), col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(col("d2"), 6).alias("sq_dist"),
            col("rk").cast("bigint").alias("rk"),
        )
    )


ann_ivf_kmeans.__doc__ = ann_ivf_kmeans.__doc__.replace("{KM_K}", str(KM_K)).replace(
    "{N_PROBE}", str(N_PROBE)
)


# ---------------------------------------------------------------------------
# Per-cluster quality report off the memoized Lloyd artifacts
# ---------------------------------------------------------------------------

KMQ_SCALE = 1000000  # fixed-point for order-free inertia sums


def _kmeans_quality_oracle() -> str:
    d2f = _D2_SQL.format(a="e.v", b="c.cvec")
    return _kmeans_ctes() + f""",
fin AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT e.vec_id, c.cid, {d2f} AS d2,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2f}, c.cid) AS rk
    FROM e CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
)
SELECT cid,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  CAST(SUM(CAST(ROUND(d2 * {KMQ_SCALE}) AS BIGINT)) AS DOUBLE) / {KMQ_SCALE}
    AS inertia,
  ROUND(MAX(d2), 6) AS max_radius_sq
FROM fin GROUP BY cid
"""


@register("kmeans_cluster_quality", oracle=_kmeans_quality_oracle())
def kmeans_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster quality report for the Lloyd fixpoint: member
    count, within-cluster inertia (sum of squared distances), and the
    squared max radius — the numbers that decide k, flag degenerate
    cells before they become hot IVF lists, and feed elbow plots.

    Determinism trick for a float SUM: each member's squared distance
    is a double, and doubles summed in shuffle order never hash-match
    — so every distance is fixed-pointed (round(d2·1e6), exact
    bigint) BEFORE the aggregate; the integer sum is order-free and
    divides back once. MAX is order-free as-is. Same discipline as
    the EWMA/anomaly integer folds, applied to clustering metrics.

    Scale shape: reuses the memoized clustering; one broadcast
    hash-agg argmin over the corpus, then a k-row aggregate with
    map-side combine. Nothing but k rows moves after the scan.
    """
    parts = _kmeans_parts(spark, sf_dir)
    e, cent = parts["e"], parts["cent"]
    d2 = _d2(col("v"), col("cvec"))
    fin = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.struct((-d2).alias("nd"), (-col("cid")).alias("nc")).alias("key"),
        )
        .groupBy("vec_id")
        .agg(F.max("key").alias("m"))
        .select((-col("m.nc")).cast("bigint").alias("cid"), (-col("m.nd")).alias("d2"))
    )
    return fin.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_members"),
        (
            F.sum(F.round(col("d2") * KMQ_SCALE).cast("bigint")).cast("double")
            / KMQ_SCALE
        ).alias("inertia"),
        F.round(F.max("d2"), 6).alias("max_radius_sq"),
    )


# ---------------------------------------------------------------------------
# Incremental ANN: assign a new vector batch to the trained index
# ---------------------------------------------------------------------------

#: "today's batch" = the AIA_WINDOW newest arrivals (vec_id is
#: assigned by arrival order, so the batch is the trailing id window
#: ending at max(vec_id)). A BOUNDED batch — not a fixed FRACTION of
#: the corpus — is what makes the daily cost genuinely O(batch): the
#: 1x/10x scale measurement (docs/SCALING.md) showed the previous
#: ``vec_id % 10 == 0`` convention growing the batch 10x with the
#: corpus, compounding with 10x IVF cell size into ~100x candidate
#: pairs (20.5x measured wall-clock). Real ingest is bounded by
#: arrival rate, not corpus size.
AIA_WINDOW = 100


def _aia_oracle() -> str:
    d2a = _D2_SQL.format(a="e.v", b="c.cvec")
    d2s = _D2_SQL.format(a="p.qv", b="m.v")
    return _kmeans_ctes() + f""",
cut AS (SELECT MAX(vec_id) - {AIA_WINDOW} AS lo FROM e),
fin AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2a}, c.cid) AS rk
    FROM e CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
),
probes AS (
  SELECT query_id, cid, qv FROM (
    SELECT e.vec_id AS query_id, c.cid, e.v AS qv,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2a}, c.cid) AS prk
    FROM e CROSS JOIN c{KM_ITERS} c WHERE e.vec_id > (SELECT lo FROM cut)
  ) WHERE prk <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, m.vec_id AS neighbor_id,
    m.vec_id > (SELECT lo FROM cut) AS is_new, {d2s} AS d2
  FROM probes p JOIN fin m ON m.cid = p.cid
  WHERE m.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, is_new,
  ROUND(d2, 6) AS sq_dist, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY d2, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


@register("ann_incremental_assign", oracle=_aia_oracle())
def ann_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest retrieval: a NEW batch of vectors (the
    {AIA_WINDOW} newest arrivals — ids above max(vec_id) −
    {AIA_WINDOW}, since ids are assigned in arrival order) is
    assigned to the MEMOIZED Lloyd centroids without retraining,
    merged with the persisted historical cell index, and each new
    vector is probe-queried against the merged index — the
    vector-side twin of ``dedup_incremental_minhash``, completing the
    incremental story (dedup had it; retrieval now does too).
    ``is_new`` marks neighbors that are themselves from today's
    batch, so downstream can split intra-batch near-dups from hits
    against the corpus.

    Correctness contract: incremental assignment against FROZEN
    centroids must land every batch vector in exactly the cell a full
    index rebuild would — so the oracle replays the full unrolled
    Lloyd assignment and searches it, and the hash only matches if
    the incremental path is indistinguishable from the rebuild.

    Scale shape: daily cost is O(batch), and the batch is BOUNDED
    ({AIA_WINDOW} rows at any corpus size — the 1x/10x measurement in
    docs/SCALING.md caught the previous fraction-of-corpus batch
    compounding with cell growth into ~100x candidate pairs). One
    broadcast-centroid argmin over the NEW vectors only (the
    historical index is the memoized/persisted artifact, loaded not
    rebuilt), then the probe join touches ~{N_PROBE}/{KM_K} of the
    merged corpus, shuffled on cell id only. Retraining cost: zero;
    the corpus is never rescanned. Residual linear term: probed cell
    size is corpus/{KM_K}; at real scale the retrain policy grows k
    with ~sqrt(corpus) to hold cells bounded (k is a parameter of the
    shared Lloyd build; {KM_K} is this fixture's size).
    """
    parts = _kmeans_parts(spark, sf_dir)
    e, cent = parts["e"], parts["cent"]
    # arrival cutoff: one tiny aggregate, broadcast into both branch
    # predicates (never a driver collect)
    cut = e.agg((F.max("vec_id") - AIA_WINDOW).alias("lo"))
    is_new = col("vec_id") > col("lo")

    # persisted historical index: everything that existed at train
    # time (the memoized artifact minus today's ids)
    hist = (
        _kmeans_ivf_assigned(spark, sf_dir)
        .crossJoin(F.broadcast(cut))
        .filter(~is_new)
    )

    # ONE batch×centroid cross product serves both daily jobs: rank
    # every frozen centroid per batch vector by (d2, cid) — rank 1 IS
    # the argmin cell assignment (identical tie-break to the
    # broadcast hash-agg argmin the rebuild uses: min d2, then min
    # cid), ranks ≤ N_PROBE are the probe list. One scan of the
    # batch, one broadcast, one window exchange on vec_id — the
    # forked consumers below share that identical exchange subtree
    # (ReusedExchange), where the previous shape scanned e and
    # re-broadcast cent twice.
    d2p = _d2(col("qv"), col("cvec"))
    w_probe = Window.partitionBy("query_id").orderBy(d2p.asc(), col("cid").asc())
    ranked = (
        e.crossJoin(F.broadcast(cut))
        .filter(is_new)
        .select(
            col("vec_id").alias("query_id"),
            col("v").alias("qv"),
            _dot(col("v"), col("v")).alias("qq"),
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("prk", F.row_number().over(w_probe))
        .filter(col("prk") <= N_PROBE)
        .select("query_id", "qv", "qq", "cid", "prk")
        # O(batch·N_PROBE) rows; cached so the two consumers below
        # compute the cross product + rank once (the forked plan is
        # not exchange-reused across the window)
        .persist()
    )
    newly = ranked.filter(col("prk") == 1).select(
        col("query_id").alias("vec_id"), col("qv").alias("v"), "cid"
    )
    probes = ranked.select("query_id", "qv", "qq", "cid")
    # Rescore-cost note: array higher-order functions (zip_with +
    # aggregate) are JVM-side but NOT whole-stage-codegen'd — each
    # evaluation walks the array interpreted. The exact rescore below
    # touches |probes|·|cell| candidate PAIRS, so the self-norms are
    # computed ONCE PER ROW here (corpus side and query side, below
    # the cid exchange) and only the cross dot product is evaluated
    # per pair: 3 HOF evals/pair → 1, bitwise-identical because the
    # final expression keeps _d2's exact (uu − 2·uw) + ww association.
    merged = (
        hist.select("vec_id", "v", "cid")
        .unionByName(newly)
        .crossJoin(F.broadcast(cut))
        .select(
            "vec_id", "v", "cid", "lo", _dot(col("v"), col("v")).alias("ww")
        )
    )
    d2s = (col("qq") - F.lit(2.0) * _dot(col("qv"), col("v"))) + col("ww")
    scored = (
        probes.join(merged, "cid")
        .filter(col("vec_id") != col("query_id"))
        .select(
            "query_id",
            col("vec_id").alias("neighbor_id"),
            is_new.alias("is_new"),
            d2s.alias("d2"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        col("d2").asc(), col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "is_new",
            F.round(col("d2"), 6).alias("sq_dist"),
            col("rk").cast("bigint").alias("rk"),
        )
    )


ann_incremental_assign.__doc__ = ann_incremental_assign.__doc__.replace(
    "{AIA_WINDOW}", str(AIA_WINDOW)
).replace("{N_PROBE}", str(N_PROBE)).replace("{KM_K}", str(KM_K))


# ---------------------------------------------------------------------------
# Top principal direction via distributed power iteration (PCA back half)
# ---------------------------------------------------------------------------

PCA_POWER_ROUNDS = 3
PCA_VNORM = 1_000_000  # fixed-point magnitude of the normalized iterate


def _pca_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized FULL (mirrored) centered-scatter matrix
    ``(i, j, sc)`` with ``sc = n·G_ij − S_i·S_j`` as EXACT
    decimal(29,0) — n·(n−1)·cov in 1e4-fixed-point² units, the matrix
    power iteration multiplies by. Built like
    ``embedding_gram_matrix``: per-task int64 Sᵀ·S partials via ONE
    vectorized numpy matmul (the shuffle moves O(partitions·d²) rows,
    never O(rows·d²)), partials summed in decimal, and the
    rank-one-correction products ride decimal(19,0) casts — exact to
    ~1e9 vectors at |s| ≤ 1e4·|v| (sc ≤ ~1e28 < 10²⁹; int64 would
    wrap at ~1e5 vectors)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        scaled = e.select(
            F.transform(
                col("embedding"),
                lambda x: F.round(x.cast("double") * GRAM_SCALE).cast("bigint"),
            ).alias("s")
        )

        def gram_partial(batches):
            import numpy as np

            acc = np.zeros((DIM, DIM), dtype=np.int64)
            seen = False
            for pdf in batches:
                if len(pdf):
                    m = np.array(pdf["s"].tolist(), dtype=np.int64)
                    acc += m.T @ m
                    seen = True
            if seen:
                iu = np.triu_indices(DIM)
                yield pd.DataFrame(
                    {
                        "i": iu[0].astype("int32"),
                        "j": iu[1].astype("int32"),
                        "partial": acc[iu],
                    }
                )

        d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — house cast
        gram = (
            scaled.mapInPandas(gram_partial, "i int, j int, partial long")
            .groupBy("i", "j")
            .agg(F.sum(d19(col("partial"))).cast("decimal(19,0)").alias("g"))
        )
        dsums = (
            scaled.select(F.posexplode("s").alias("d", "sv"))
            .groupBy("d")
            .agg(
                F.sum(d19(col("sv"))).cast("decimal(19,0)").alias("dsum"),
                F.count("*").cast("bigint").alias("n"),
            )
        )
        si = dsums.select(col("d").alias("i"), col("dsum").alias("si"), "n")
        sj = dsums.select(col("d").alias("j"), col("dsum").alias("sj"))
        upper = (
            gram.join(F.broadcast(si), "i")
            .join(F.broadcast(sj), "j")
            .select(
                "i",
                "j",
                (d19(col("n")) * col("g") - col("si") * col("sj"))
                .cast("decimal(29,0)")
                .alias("sc"),
            )
        )
        full = upper.unionByName(
            upper.filter(col("i") != col("j")).select(
                col("j").alias("i"), col("i").alias("j"), "sc"
            )
        )
        return full

    return artifact_memo(spark, ("pca_scatter", sf_dir), build)


def _pca_oracle() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, PCA_POWER_ROUNDS + 1):
        rounds.append(
            f"""
u{r} AS (
  SELECT c.i, SUM(c.sc * v.v) AS u
  FROM scatter c JOIN {prev} v ON v.j = c.j GROUP BY c.i),
m{r} AS (
  SELECT GREATEST(MAX(ABS(u)) // {PCA_VNORM}, CAST(1 AS HUGEINT)) AS md
  FROM u{r}),
v{r} AS (
  SELECT i AS j,
    CASE WHEN u < 0 THEN -(ABS(u) // md) ELSE ABS(u) // md END AS v
  FROM u{r}, m{r})"""
        )
        prev = f"v{r}"
    return f"""
WITH s AS (
  SELECT list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * {GRAM_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
),
dims AS (
  SELECT a.r AS i, b.r AS j FROM range(0, {DIM}) a(r), range(0, {DIM}) b(r)
),
gram AS (
  SELECT d.i, d.j, CAST(SUM(sv[d.i + 1] * sv[d.j + 1]) AS HUGEINT) AS g
  FROM s, dims d GROUP BY d.i, d.j
),
dsums AS (
  SELECT t.r AS d, CAST(SUM(sv[t.r + 1]) AS HUGEINT) AS dsum,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM s, range(0, {DIM}) t(r) GROUP BY t.r
),
scatter AS (
  SELECT g.i, g.j, si.n * g.g - si.dsum * sj.dsum AS sc
  FROM gram g
  JOIN dsums si ON si.d = g.i
  JOIN dsums sj ON sj.d = g.j
),
v0 AS (SELECT t.r AS j, CAST({PCA_VNORM} AS HUGEINT) AS v
       FROM range(0, {DIM}) t(r)),
{",".join(rounds)}
SELECT CAST(j AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_fixed,
       CAST(v AS DOUBLE) / {PCA_VNORM}.0 AS weight
FROM v{PCA_POWER_ROUNDS}
"""


@register("embedding_pca_power", oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by
    {PCA_POWER_ROUNDS} rounds of DISTRIBUTED power iteration on the
    exact centered-scatter matrix — the back half of
    ``embedding_gram_matrix``'s PCA story (iterative algorithm #7,
    beside components/PageRank/k-core/BPE/LPA/Lloyd). Each round is
    one mat-vec: the scatter cells join the broadcast 64-row iterate
    and hash-aggregate per output dimension — exactly the PageRank
    edge-join shape, so the same plan scales to a huge SPARSE matrix
    where the "matrix" no longer fits anywhere.

    Bit-reproducible float-free iteration: the iterate is normalized
    WITHOUT a square root — each round divides by
    ``md = floor(max|u| / {PCA_VNORM})``, computed in PURE decimal
    (the subtract-mod form ``(mx − mx%V)/V`` has zero remainder, so
    the decimal division is exact; the naive ``div`` returns Long and
    would overflow past ~1e6 vectors), then truncates
    sign-separated magnitudes with ``abs(u) div md`` (quotient always
    ≤ ~{PCA_VNORM}, Long-safe at any corpus size; Spark ``div`` and
    DuckDB ``//`` both truncate toward zero, but only non-negative
    operands reach the division), keeping every component an exact
    integer in [−{PCA_VNORM}, {PCA_VNORM}]·(1+ε). The oracle replays
    the identical unrolled iteration in HUGEINT, so the hash proves
    every one of the 3·d² multiply-adds. One final double division
    scales the report weight.

    Scale shape: the scatter build is the memoized mapInPandas
    partial-Gram artifact (shuffle O(partitions·d²)); each iteration
    shuffles d rows and broadcasts a d-row vector — driver never
    touches data. Products ride decimal(29,0)×decimal(9,0) casts,
    exact to ~1e9 vectors; sums bound ~1e28·d < 10³⁸.
    """
    cells = _pca_scatter(spark, sf_dir)
    v = spark.range(DIM).select(
        col("id").cast("int").alias("j"),
        F.lit(PCA_VNORM).cast("long").alias("v"),
    )
    for _ in range(PCA_POWER_ROUNDS):
        u = (
            cells.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(col("sc") * col("v").cast("decimal(9,0)")).alias("u"))
        )
        # md = floor(max|u| / VNORM) computed ENTIRELY in decimal:
        # (mx - mx % V) is exactly divisible by V, so the decimal
        # division has zero remainder and rounds to the exact integer
        # quotient — no Long materialization. The naive
        # ``max(abs(u)) div V`` returns LongType and overflows once
        # max|u| > 2^63·V (~1e5-1e6 vectors); this form keeps the
        # engine exact to the scatter's own decimal(29,0) bound
        # (~1e10 vectors at |s| ≤ 1e4).
        #
        # max|u| rides an UNPARTITIONED WINDOW over the d-row iterate
        # (bounded: u is always exactly DIM rows), not a separate
        # agg + crossJoin: the agg form referenced ``u`` from TWO plan
        # branches per round, and with the iterate feeding forward the
        # unrolled plan duplicated the scatter join 2^rounds times
        # (28 parquet scans / 84 hash aggregates for 3 rounds —
        # plans/r15/embedding_pca_power_before.txt). One reference per
        # round keeps the plan linear: 3 scatter passes, one window
        # exchange over 64 rows each. The md expression is unchanged,
        # so every component is bitwise identical.
        vn = F.lit(PCA_VNORM).cast("decimal(38,0)")
        mx = F.max(F.abs(col("u"))).over(Window.partitionBy())
        v = u.withColumn(
            "md",
            F.greatest(
                ((mx - mx % vn) / vn).cast("decimal(29,0)"),
                F.lit(1).cast("decimal(29,0)"),
            ),
        ).select(
            col("i").alias("j"),
            (
                F.when(col("u") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("abs(u) div md")
            ).cast("long")
            .alias("v"),
        )
    return v.select(
        col("j").cast("bigint").alias("dim"),
        col("v").cast("bigint").alias("v_fixed"),
        (col("v").cast("double") / float(PCA_VNORM)).alias("weight"),
    )


embedding_pca_power.__doc__ = embedding_pca_power.__doc__.replace(
    "{PCA_POWER_ROUNDS}", str(PCA_POWER_ROUNDS)
).replace("{PCA_VNORM}", str(PCA_VNORM))


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the two ANN rankers
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard smoothing constant (Cormack et al. 2009)
RRF_SCALE = 10**12  # fixed point: 1/(K+rank) as RRF_SCALE div (K+rank)

RRF_ORACLE = f"""
WITH lsh AS ({ANN_ORACLE}),
ivf AS ({IVF_ORACLE}),
pooled AS (
  SELECT query_id, neighbor_id, rk FROM lsh
  UNION ALL
  SELECT query_id, neighbor_id, rk FROM ivf
),
fused AS (
  SELECT query_id, neighbor_id,
    CAST(SUM({RRF_SCALE} // ({RRF_K} + rk)) AS BIGINT) AS rrf_fixed,
    CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM pooled GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, rrf_fixed, n_lists,
  CAST(rrf_fixed AS DOUBLE) / {RRF_SCALE} AS rrf_score,
  CAST(fused_rk AS BIGINT) AS fused_rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf_fixed DESC, neighbor_id) AS fused_rk
  FROM fused
)
WHERE fused_rk <= {TOP_K}
"""


@register("rrf_fuse_rankers", oracle=RRF_ORACLE)
def rrf_fuse_rankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, Cormack et al. 2009) of the two
    registered ANN rankers: each (query, neighbor) scores
    Σ 1/({RRF_K}+rank) over the lists it appears in — sign-LSH and
    IVF retrieve DIFFERENT neighbor pools (different blind spots), and
    RRF is the standard score-free way to combine them without
    calibrating cosine scales. The production ensemble-retrieval
    stage between candidate generation and reranking.

    Numeric determinism: ranks fuse in FIXED POINT —
    ``{RRF_SCALE} div ({RRF_K}+rk)`` per list, summed as exact
    integers — so the fused ordering is identical on both engines
    regardless of aggregation order (a float 1/(k+r) sum would be
    associativity-dependent). One final double division reports the
    conventional score. Ties break on neighbor_id.

    Scale shape: both input rankers are the already-bounded top-{TOP_K}
    tables (each ≤ {TOP_K} rows/query, built from memoized artifacts)
    — fusion itself is one hash aggregate + one per-query top-k window
    on a few-rows-per-query frame; the corpus is never touched. The
    oracle nests BOTH rankers' full constructions as CTEs, so the
    hash-match re-proves the inputs and the fusion together.
    """
    lsh = ann_lsh_cosine(spark, sf_dir).select("query_id", "neighbor_id", "rk")
    ivf = ann_ivf_cosine(spark, sf_dir).select("query_id", "neighbor_id", "rk")
    pooled = lsh.unionByName(ivf)
    fused = pooled.groupBy("query_id", "neighbor_id").agg(
        F.sum(F.expr(f"{RRF_SCALE} div ({RRF_K} + rk)"))
        .cast("bigint")
        .alias("rrf_fixed"),
        F.count("*").cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        col("rrf_fixed").desc(), col("neighbor_id").asc()
    )
    return (
        fused.withColumn("fused_rk", F.row_number().over(w))
        .filter(col("fused_rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rrf_fixed",
            "n_lists",
            (col("rrf_fixed").cast("double") / RRF_SCALE).alias("rrf_score"),
            col("fused_rk").cast("bigint").alias("fused_rk"),
        )
    )


rrf_fuse_rankers.__doc__ = (
    rrf_fuse_rankers.__doc__.replace("{RRF_K}", str(RRF_K))
    .replace("{RRF_SCALE}", str(RRF_SCALE))
    .replace("{TOP_K}", str(TOP_K))
)


# ---------------------------------------------------------------------------
# Dimension-truncation retrieval evaluation (Matryoshka-style)
# ---------------------------------------------------------------------------

TRUNC_DIM = 16  # evaluate retrieval on the first 16 of 64 dims


def _trunc_overlap_oracle() -> str:
    cos_full = _COS_SQL.format(a="q.v", b="c.v")
    cos_tr = _COS_SQL.format(a="list_slice(q.v, 1, 16)", b="list_slice(c.v, 1, 16)")
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {N_QUERIES}),
full_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos_full} AS cosine
  FROM q JOIN e c ON c.vec_id <> q.query_id
),
full_top AS (
  SELECT query_id, neighbor_id FROM full_scored
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) <= {TOP_K}
),
tr_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos_tr} AS cosine
  FROM q JOIN e c ON c.vec_id <> q.query_id
),
tr_top AS (
  SELECT query_id, neighbor_id FROM tr_scored
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  ) <= {TOP_K}
),
ov AS (
  SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM full_top f JOIN tr_top t
    ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
  GROUP BY f.query_id
)
SELECT q.query_id,
  CAST(COALESCE(ov.n, 0) AS BIGINT) AS n_overlap,
  CAST(COALESCE(ov.n, 0) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM (SELECT DISTINCT query_id FROM q) q
LEFT JOIN ov ON ov.query_id = q.query_id
"""


@register("ann_dim_truncation_overlap", oracle=_trunc_overlap_oracle())
def ann_dim_truncation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation evaluation: for each
    query vector, exact top-{TOP_K} retrieval under the FULL {DIM}-dim
    cosine vs under only the first {TRUNC_DIM} dims, reporting the
    per-query overlap and recall@{TOP_K} — the measurement behind the
    "can we serve the index at 1/4 the dimensions?" decision
    (truncatable/Matryoshka embeddings trade dimensions for recall;
    this query IS that tradeoff curve's data point, the same
    calibration role `minhash_error_report` plays for MinHash k).

    Exactness: both rankings use the house 6-dp-rounded cosine with
    the (cosine DESC, neighbor_id) tie-break; the truncated side's
    norms are computed over the SLICED arrays on both engines, so the
    two top-k sets — and therefore the overlap counts — are
    bit-deterministic.

    Scale shape: the {N_QUERIES}-row query set broadcasts twice
    (full + sliced); each corpus row pays one full dot and one
    {TRUNC_DIM}-dim dot per query (norms precomputed per side, not
    per pair); the rank windows shuffle only per-partition winners;
    queries with zero overlap survive via the left join onto the
    query list.
    """
    e = _vectors(spark, sf_dir)
    tr = lambda c: F.slice(c, 1, TRUNC_DIM)  # noqa: E731
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"),
        col("v").alias("qv"),
        col("nv").alias("qn"),
        tr(col("v")).alias("qt"),
        F.sqrt(_dot(tr(col("v")), tr(col("v")))).alias("qtn"),
    )
    c = e.select(
        col("vec_id").alias("neighbor_id"),
        col("v").alias("cv"),
        col("nv").alias("cn"),
        tr(col("v")).alias("ct"),
        F.sqrt(_dot(tr(col("v")), tr(col("v")))).alias("ctn"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("query_id") != col("neighbor_id"))
    )
    w = Window.partitionBy("query_id")
    full_top = (
        pairs.select(
            "query_id",
            "neighbor_id",
            _cosine_pre(col("qv"), col("cv"), col("qn"), col("cn")).alias("cosine"),
        )
        .withColumn(
            "rk",
            F.row_number().over(w.orderBy(col("cosine").desc(), col("neighbor_id"))),
        )
        .filter(col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    tr_top = (
        pairs.select(
            "query_id",
            "neighbor_id",
            _cosine_pre(col("qt"), col("ct"), col("qtn"), col("ctn")).alias("cosine"),
        )
        .withColumn(
            "rk",
            F.row_number().over(w.orderBy(col("cosine").desc(), col("neighbor_id"))),
        )
        .filter(col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    ov = (
        full_top.join(tr_top, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        q.select("query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(col("n"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (
                F.coalesce(col("n"), F.lit(0)).cast("double") / float(TOP_K)
            ).alias("recall_at_k"),
        )
    )


ann_dim_truncation_overlap.__doc__ = (
    ann_dim_truncation_overlap.__doc__.replace("{TOP_K}", str(TOP_K))
    .replace("{DIM}", str(DIM))
    .replace("{TRUNC_DIM}", str(TRUNC_DIM))
    .replace("{N_QUERIES}", str(N_QUERIES))
)


# ---------------------------------------------------------------------------
# Centroid drift monitor (the retrain trigger for the frozen index)
# ---------------------------------------------------------------------------


def _centroid_drift_oracle() -> str:
    d2a = _D2_SQL.format(a="e.v", b="c.cvec")
    return _kmeans_ctes() + f""",
fin AS (
  SELECT vec_id, sv, cid FROM (
    SELECT e.vec_id, e.sv, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2a}, c.cid) AS rk
    FROM e CROSS JOIN c{KM_ITERS} c
  ) WHERE rk = 1
),
cc AS (
  SELECT cid, t.r AS d,
    CAST(ROUND(cvec[t.r + 1] * {KM_SCALE}) AS HUGEINT) AS c4
  FROM c{KM_ITERS}, range(0, {DIM}) t(r)
),
csum AS (
  SELECT f.cid, t.r AS d, CAST(SUM(sv[t.r + 1]) AS HUGEINT) AS s,
    CAST(COUNT(*) AS HUGEINT) AS n
  FROM fin f, range(0, {DIM}) t(r) GROUP BY 1, 2
),
numer AS (
  SELECT cs.cid, cs.n,
    (cs.s - cs.n * cc.c4) * (cs.s - cs.n * cc.c4) AS q
  FROM csum cs JOIN cc ON cc.cid = cs.cid AND cc.d = cs.d
)
SELECT cid, CAST(MAX(n) AS BIGINT) AS n_members,
  CAST(SUM(q) AS DOUBLE)
    / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
       * {KM_SCALE * KM_SCALE}.0) AS drift_sq
FROM numer GROUP BY cid
"""


@register("kmeans_centroid_drift", oracle=_centroid_drift_oracle())
def kmeans_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RETRAIN TRIGGER for the frozen-index serving posture: per
    cluster, the squared L2 distance between the FROZEN Lloyd
    centroid (1e4-quantized) and the TRUE mean of the vectors
    currently assigned to it — when drift_sq grows, the index
    partitions no longer sit on the data and `ann_incremental_assign`
    / `ann_ivf_kmeans` recall decays; this query is the monitoring
    job that decides when the train-once artifact must be rebuilt,
    closing the loop on the incremental family (ingest daily, monitor
    drift, retrain on threshold).

    Exactness: the comparison runs entirely in integers — per-dim
    member sums S_d in 1e4 fixed point (exact, order-free), the
    frozen centroid quantized identically on both engines, and the
    per-dim term (S_d − n·c4)² summed exactly — with ONE double
    division at the end, so the drift numbers are bit-identical. The
    oracle replays the full unrolled Lloyd + assignment + drift
    derivation.

    Scale shape: the assignment table is the memoized artifact
    (loaded, not rebuilt); per-(cid, dim) sums combine map-side to
    k·d rows; the frozen-centroid table is k·d rows joined on the
    tiny (cid, d) key. Monitoring cost ≈ one scan of the assignment
    table at any corpus size.
    """
    parts = _kmeans_parts(spark, sf_dir)
    e, cent = parts["e"], parts["cent"]
    assigned = _kmeans_ivf_assigned(spark, sf_dir)
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — house cast
    sv = F.transform(
        col("v"), lambda x: F.round(x * KM_SCALE).cast("bigint")
    )
    csum = (
        assigned.select("cid", F.posexplode(sv).alias("d", "x"))
        .groupBy("cid", "d")
        .agg(
            F.sum(d19(col("x"))).cast("decimal(19,0)").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    cc = cent.select(
        "cid",
        F.posexplode(
            F.transform(
                col("cvec"), lambda x: F.round(x * KM_SCALE).cast("bigint")
            )
        ).alias("d", "c4"),
    )
    numer = csum.join(cc, ["cid", "d"]).select(
        "cid",
        "n",
        (
            (col("s") - d19(col("n")) * d19(col("c4"))).cast("decimal(19,0)")
            * (col("s") - d19(col("n")) * d19(col("c4"))).cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    )
    return numer.groupBy("cid").agg(
        F.max("n").cast("bigint").alias("n_members"),
        (
            F.sum(col("q")).cast("double")
            / (
                F.max("n").cast("double")
                * F.max("n").cast("double")
                * F.lit(float(KM_SCALE * KM_SCALE))
            )
        ).alias("drift_sq"),
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k re-rank (greedy maximal marginal relevance)
# ---------------------------------------------------------------------------

MMR_C = 16  # exact-cosine candidates fed to the re-ranker, per query
MMR_K = 5  # diversified picks returned per query (λ = 1/2, dyadic)


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in plain CTEs: candidate top-{MMR_C} by
    exact cosine, the pairwise candidate-cosine table, then {MMR_K}
    argmax steps — step t picks ROW_NUMBER()=1 by
    (0.5·rel − 0.5·maxsim) DESC with cid tie-break and folds the
    pick's similarity into every survivor's running maxsim."""
    steps, picks = [], []
    prev = "st0"
    for t in range(1, MMR_K + 1):
        picks.append(
            f"""pick{t} AS (
  SELECT query_id, cid AS sel, rel, score, {t} AS rk FROM (
    SELECT *, 0.5 * rel - 0.5 * maxsim AS score,
      ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY 0.5 * rel - 0.5 * maxsim DESC, cid
      ) AS rn
    FROM {prev}
  ) WHERE rn = 1
)"""
        )
        if t < MMR_K:
            steps.append(
                f"""st{t} AS (
  SELECT s.query_id, s.cid, s.rel,
    GREATEST(s.maxsim, pc.cos_ab) AS maxsim
  FROM {prev} s
  JOIN pick{t} p ON p.query_id = s.query_id AND s.cid <> p.sel
  JOIN pc ON pc.query_id = s.query_id AND pc.ca = s.cid AND pc.cb = p.sel
)"""
            )
        prev = f"st{t}"
    chain = ",\n".join(
        x for pair in zip(picks, steps + [""]) for x in pair if x
    )
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, rk, sel AS neighbor_id, rel, score FROM pick{t}"
        for t in range(1, MMR_K + 1)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cid,
         {_COS_SQL.format(a="q.v", b="c.v")} AS rel
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, cid) AS crk
    FROM scored
  ) WHERE crk <= {MMR_C}
),
pc AS (
  SELECT a.query_id, a.cid AS ca, b.cid AS cb,
         {_COS_SQL.format(a="va.v", b="vb.v")} AS cos_ab
  FROM cand a
  JOIN cand b ON b.query_id = a.query_id AND b.cid <> a.cid
  JOIN e va ON va.vec_id = a.cid
  JOIN e vb ON vb.vec_id = b.cid
),
st0 AS (
  SELECT query_id, cid, rel, CAST(0.0 AS DOUBLE) AS maxsim FROM cand
),
{chain}
SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, rel, score
FROM ({union})
"""


@register("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-rank — the standard
    retrieval-diversification pass (Carbonell & Goldstein 1998) an
    LLM RAG stack runs between ANN recall and the context window:
    from each query's exact top-{MMR_C} cosine candidates, greedily
    pick {MMR_K} maximizing 0.5·rel − 0.5·max-sim-to-already-picked
    (λ = 1/2, dyadic ⇒ exact doubles), cid tie-break.

    Engine split: everything O(corpus) is DECLARATIVE — candidate
    recall is the broadcast-query scan + rank (knn shape), and the
    {MMR_C}×{MMR_C} candidate-pair cosines come from a self-join on
    the candidate table, all 6-dp-rounded JVM-side so Python never
    recomputes a cosine. Only the inherently sequential {MMR_K}-step
    greedy runs as a grouped Pandas kernel over each query's ≤
    {MMR_C}² pair rows — bounded Arrow batches regardless of corpus
    size. The oracle unrolls the identical greedy into {MMR_K}
    argmax CTEs over the same rounded doubles, so selection order,
    scores, and ties all check bit-for-bit.

    Scale shape: one broadcast scan for recall (corpus never
    shuffles), candidate tables are O(queries·{MMR_C}) rows, and the
    Python stage is O(queries·{MMR_C}²) — independent of corpus row
    count. Reference had no retrieval surface at all (SURVEY §2.8);
    this completes recall → rescore → fuse (rrf) → DIVERSIFY.
    """
    import pandas as pd

    e = _vectors(spark, sf_dir)
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv"), col("nv").alias("qn")
    )
    c = e.select(col("vec_id").alias("cid"), col("v").alias("cv"), col("nv").alias("cn"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("query_id") != col("cid"))
        .select(
            "query_id",
            "cid",
            _cosine_pre(col("qv"), col("cv"), col("qn"), col("cn")).alias("rel"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(col("rel").desc(), col("cid"))
    cand = (
        scored.withColumn("crk", F.row_number().over(wq))
        .filter(col("crk") <= MMR_C)
        .select("query_id", "cid", "rel")
    )
    cv = cand.join(c, "cid").select("query_id", "cid", "rel", "cv", "cn")
    a = cv.select(
        "query_id", col("cid").alias("ca"), col("rel").alias("rel_a"),
        col("cv").alias("va"), col("cn").alias("na"),
    )
    b = cv.select(
        col("query_id").alias("qb"), col("cid").alias("cb"),
        col("cv").alias("vb"), col("cn").alias("nb"),
    )
    pairs = (
        a.join(b, (col("query_id") == col("qb")) & (col("ca") != col("cb")))
        .select(
            "query_id",
            "ca",
            "rel_a",
            "cb",
            _cosine_pre(col("va"), col("vb"), col("na"), col("nb")).alias("cos_ab"),
        )
    )

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        qid = pdf["query_id"].iloc[0]
        rel = dict(zip(pdf["ca"], pdf["rel_a"]))
        cos = dict(zip(zip(pdf["ca"], pdf["cb"]), pdf["cos_ab"]))
        maxsim = {cid: 0.0 for cid in rel}
        out, picked = [], set()
        for t in range(1, MMR_K + 1):
            best = None
            for cid in sorted(rel):
                if cid in picked:
                    continue
                score = 0.5 * rel[cid] - 0.5 * maxsim[cid]
                if best is None or score > best[1]:
                    best = (cid, score)
            cid, score = best
            picked.add(cid)
            out.append(
                {"query_id": qid, "rk": t, "neighbor_id": cid,
                 "rel": rel[cid], "score": score}
            )
            for other in rel:
                if other not in picked:
                    maxsim[other] = max(maxsim[other], cos[(other, cid)])
        return pd.DataFrame(out)

    return pairs.groupBy("query_id").applyInPandas(
        greedy,
        schema=(
            "query_id bigint, rk bigint, neighbor_id bigint, "
            "rel double, score double"
        ),
    )


mmr_diversified_topk.__doc__ = (
    mmr_diversified_topk.__doc__.replace("{MMR_C}", str(MMR_C))
    .replace("{MMR_K}", str(MMR_K))
)


# ---------------------------------------------------------------------------
# Hard-negative mining (triplet margins for contrastive training)
# ---------------------------------------------------------------------------

HN_K = 5  # hard negatives per query


HARD_NEG_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel,
    c.vec_id AS cid, c.label AS clabel,
    {_COS_SQL.format(a="q.v", b="c.v")} AS cosine
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
pos AS (
  SELECT query_id, cid AS pos_id, cosine AS pos_cosine FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, cid) AS rk
    FROM scored WHERE clabel = qlabel
  ) WHERE rk = 1
),
neg AS (
  SELECT query_id, cid AS neighbor_id, clabel AS neighbor_label,
    cosine, CAST(rk AS BIGINT) AS rk
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, cid) AS rk
    FROM scored WHERE clabel <> qlabel
  ) WHERE rk <= {HN_K}
)
SELECT n.query_id, n.neighbor_id, n.neighbor_label, n.cosine, n.rk,
  p.pos_id, p.pos_cosine, n.cosine - p.pos_cosine AS margin
FROM neg n JOIN pos p ON p.query_id = n.query_id
"""


@register("ann_hard_negatives", oracle=HARD_NEG_ORACLE)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive/embedding training: for
    each query vector, the top-{HN_K} highest-cosine OTHER-label
    vectors (the negatives that actually teach the model something)
    beside the best SAME-label vector (the positive), with the
    triplet margin cos(neg) − cos(pos). Positive-margin rows are the
    violations a triplet loss would push on — this query IS the
    batch-mining job a two-tower training pipeline runs per epoch.

    Plan shape: the tiny query set broadcasts against the corpus
    (one scan, corpus never shuffles — the knn recall shape); the
    same scored table feeds BOTH rank windows (same-label argmax,
    different-label top-{HN_K}), each shuffling only
    query-partitioned winners; the final join is query-keyed on
    {N_QUERIES} rows. Cosines are 6-dp-rounded JVM-side, ties broken
    by cid — bit-deterministic on both engines.
    """
    e = _vectors(spark, sf_dir)
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"),
        col("label").alias("qlabel"),
        col("v").alias("qv"),
        col("nv").alias("qn"),
    )
    c = e.select(
        col("vec_id").alias("cid"),
        col("label").alias("clabel"),
        col("v").alias("cv"),
        col("nv").alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("query_id") != col("cid"))
        .select(
            "query_id",
            "qlabel",
            "cid",
            "clabel",
            _cosine_pre(col("qv"), col("cv"), col("qn"), col("cn")).alias("cosine"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(col("cosine").desc(), col("cid"))
    pos = (
        scored.filter(col("clabel") == col("qlabel"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(col("rk") == 1)
        .select("query_id", col("cid").alias("pos_id"), col("cosine").alias("pos_cosine"))
    )
    neg = (
        scored.filter(col("clabel") != col("qlabel"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(col("rk") <= HN_K)
        .select(
            "query_id",
            col("cid").alias("neighbor_id"),
            col("clabel").alias("neighbor_label"),
            "cosine",
            col("rk").cast("bigint").alias("rk"),
        )
    )
    return neg.join(pos, "query_id").select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        "cosine",
        "rk",
        "pos_id",
        "pos_cosine",
        (col("cosine") - col("pos_cosine")).alias("margin"),
    )


ann_hard_negatives.__doc__ = ann_hard_negatives.__doc__.replace(
    "{HN_K}", str(HN_K)
).replace("{N_QUERIES}", str(N_QUERIES))


# ---------------------------------------------------------------------------
# Grid-density core cells (DBSCAN's density test, bucketed exactly)
# ---------------------------------------------------------------------------

GRID_SCALE = 20  # cell width = 1/20 in embedding units
GRID_MINPTS = 40  # 3x3-neighborhood mass for a cell to be "core"

GRID_DENSITY_ORACLE = f"""
WITH pts AS (
  SELECT
    CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {GRID_SCALE}) AS BIGINT) AS gx,
    CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {GRID_SCALE}) AS BIGINT) AS gy
  FROM embeddings
),
cells AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY gx, gy),
off(dx, dy) AS (VALUES
  (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
SELECT c.gx AS gx, c.gy AS gy,
  CAST(MIN(c.n) AS BIGINT) AS n_cell,
  CAST(SUM(nb.n) AS BIGINT) AS n_neigh,
  SUM(nb.n) >= {GRID_MINPTS} AS is_core
FROM cells c
JOIN off o ON TRUE
JOIN cells nb ON nb.gx = c.gx + o.dx AND nb.gy = c.gy + o.dy
GROUP BY c.gx, c.gy
"""


@register("grid_density_core", oracle=GRID_DENSITY_ORACLE)
def grid_density_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSITY-BASED clustering's core test (DBSCAN's ``|N_eps(p)| >=
    minPts``) made exact and distributed by GRID BUCKETING: quantize
    the first two embedding dimensions to integer cells of width
    1/{GRID_SCALE}, count per cell, and call a cell core when its
    3x3 neighborhood holds >= {GRID_MINPTS} points. This is the
    standard scale-out surrogate for DBSCAN (cell-graph density
    instead of per-point radius queries) and the one clustering
    family (density) the k-means/LSH surface did not yet cover; the
    grid quantization is FLOOR on an IEEE double product, identical
    on both engines, and all masses are exact bigints.

    Scale shape: points collapse to cells in ONE map-side-combined
    aggregate (the only scan of the data); the 9-offset neighborhood
    is a broadcast expansion of the CELL table joined to itself —
    cell count is bounded by the grid (data-independent), so the
    self-join is over a tiny relation no matter the corpus size. At
    100 TB the same plan holds: the big table is touched once, and
    density logic runs on the bounded summary.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.floor(F.element_at(col("embedding"), 1).cast("double") * GRID_SCALE)
        .cast("bigint")
        .alias("gx"),
        F.floor(F.element_at(col("embedding"), 2).cast("double") * GRID_SCALE)
        .cast("bigint")
        .alias("gy"),
    )
    cells = pts.groupBy("gx", "gy").agg(F.count("*").cast("bigint").alias("n"))
    off = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    nb = cells.select(
        col("gx").alias("nx"), col("gy").alias("ny"), col("n").alias("nn")
    )
    return (
        cells.crossJoin(F.broadcast(off))
        .join(
            F.broadcast(nb),
            (col("nx") == col("gx") + col("dx"))
            & (col("ny") == col("gy") + col("dy")),
        )
        .groupBy("gx", "gy")
        .agg(
            F.min("n").cast("bigint").alias("n_cell"),
            F.sum("nn").cast("bigint").alias("n_neigh"),
            (F.sum("nn") >= GRID_MINPTS).alias("is_core"),
        )
    )


grid_density_core.__doc__ = grid_density_core.__doc__.replace(
    "{GRID_SCALE}", str(GRID_SCALE)
).replace("{GRID_MINPTS}", str(GRID_MINPTS))
