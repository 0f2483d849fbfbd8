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
N_PLANES = 8


def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1] from md5."""
    h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


PLANES: list[list[float]] = [
    [_plane_weight(p, d) for d in range(DIM)] for p in range(N_PLANES)
]


def _dot(u: Column, w: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(u: Column, w: Column) -> Column:
    return F.round(_dot(u, w) / F.sqrt(_dot(u, u)) / F.sqrt(_dot(w, w)), 6)


_COS_SQL = (
    "ROUND(list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a}))"
    " / sqrt(list_dot_product({b}, {b})), 6)"
)

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
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv")
    )
    c = e.select(
        col("vec_id").alias("neighbor_id"),
        col("label").alias("neighbor_label"),
        col("v").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("query_id") != col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            _cosine(col("qv"), col("cv")).alias("cosine"),
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


def _bucket_sql(v: str) -> str:
    terms = []
    for p, plane in enumerate(PLANES):
        lits = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({lits}::DOUBLE[], {v}) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


ANN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bucketed AS (
  SELECT vec_id, label, v, {_bucket_sql("v")} AS bucket FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {_COS_SQL.format(a="q.v", b="c.v")} AS cosine
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def _bucket_col(v: Column) -> Column:
    out = F.lit(0)
    for p, plane in enumerate(PLANES):
        w = F.array(*[F.lit(x) for x in plane])
        out = out + F.when(_dot(w, v) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


@register("ann_lsh_cosine", oracle=ANN_ORACLE)
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via 8-plane sign-LSH: vectors
    sharing a 8-bit hyperplane-sign bucket are the only candidates.

    Scale shape: bucket assignment is a map-only pass (8 fixed dot
    products in codegen); the candidate join is an equi-join on the
    bucket id — ~1/256 of the all-pairs work, and the per-bucket
    fan-in is bounded. The oracle replays the identical construction
    (same literal hyperplanes), so recall loss vs exact kNN is a
    *property checked elsewhere* (tests/test_similarity.py compares
    against knn_bruteforce_cosine), while THIS check proves the
    bucketed plan computes exactly what it claims."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).withColumn("bucket", _bucket_col(col("v")))
    q = e.filter(col("vec_id") < N_QUERIES).select(
        col("vec_id").alias("query_id"), col("v").alias("qv"), col("bucket").alias("qb")
    )
    c = e.select(
        col("vec_id").alias("neighbor_id"),
        col("label").alias("neighbor_label"),
        col("v").alias("cv"),
        col("bucket").alias("cb"),
    )
    scored = (
        q.join(c, (col("qb") == col("cb")) & (col("query_id") != col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            _cosine(col("qv"), col("cv")).alias("cosine"),
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
