"""Corpus-mining / curation operators a large-scale training-data
pipeline needs beyond the dedup/text/similarity families: corpus-level
n-gram statistics, deterministic per-domain sampling quotas, vocabulary
coverage (OOV) measurement, composite quality gating, dimension-wise
embedding centroids, and the classic event-funnel / retention-cohort
analyses over the events stream.

All operators are built-in column expressions (no Python UDFs) with
exact DuckDB oracles. Scale notes per operator docstring; the common
theme is one shuffle on the natural key plus broadcast of anything
bounded by a constant (vocabularies, quota tables, stage sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col
from pyspark.sql.window import Window

from iot_sparkstreaming_spark.functions.text import (
    fingerprint,
    hash64,
    tokens,
    word_shingles,
)
from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table

# ---------------------------------------------------------------------------
# Corpus-wide top-k n-grams
# ---------------------------------------------------------------------------

NGRAM_TOPK_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
bigrams AS (
  SELECT unnest(CASE WHEN len(tk) >= 2
    THEN list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1])
    ELSE [] END) AS ngram
  FROM toks
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM bigrams
GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 50
"""


@register("ngram_topk_corpus", oracle=NGRAM_TOPK_ORACLE)
def ngram_topk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word bigrams — the frequency table behind
    boilerplate detection and n-gram LM features.

    Scale shape: shingle per row (map-only), explode, hash-aggregate
    with map-side partial combine (the shuffle moves one row per
    distinct bigram per partition, not per occurrence), then
    ``TakeOrderedAndProject`` — per-partition top-k merged on the
    driver, never a global sort of the full frequency table.
    Deterministic tie-break (count desc, ngram asc) so the result
    hash-matches regardless of partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = docs.select(
        F.explode(word_shingles(tokens(col("text")), 2)).alias("ngram")
    )
    return (
        bigrams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(col("n_occurrences").desc(), col("ngram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Deterministic per-domain sampling quota (hash-priority sampling)
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id
    ) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS sample_rank
FROM ranked WHERE rk <= 10
"""


@register("priority_sample_per_source", oracle=PRIORITY_SAMPLE_ORACLE)
def priority_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain sampling quota: keep the 10 docs per source with the
    smallest deterministic hash — statistically a uniform sample (the
    hash is effectively random in doc_id) but fully reproducible under
    retries and re-partitioning, unlike reservoir sampling whose result
    depends on encounter order.

    Scale shape: one shuffle on ``source``; skewed domains are the
    norm in web crawls, and AQE splits the hot partitions. For a
    quota >> memory, swap row_number for a two-pass approximate
    threshold (quantile of the hash) — noted, not needed at rank 10."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash64(col("doc_id").cast("string")), col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(col("sample_rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage: per-document OOV rate against the corpus top-100
# ---------------------------------------------------------------------------

OOV_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
ex AS (SELECT doc_id, unnest(tk) AS t FROM toks),
vocab AS (
  SELECT t FROM ex GROUP BY t
  ORDER BY COUNT(*) DESC, t LIMIT 100
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
  CAST(SUM(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE)
    / COUNT(*) AS oov_rate
FROM ex
GROUP BY doc_id
"""


@register("oov_rate_per_doc", oracle=OOV_ORACLE)
def oov_rate_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage measurement: build the corpus top-100
    vocabulary, then score every document's out-of-vocabulary token
    rate (each occurrence counts).

    Scale shape: the vocabulary is constant-size (top-k via
    TakeOrdered), so the per-doc scoring joins exploded tokens against
    a BROADCAST vocab — the corpus-size side never shuffles. Docs with
    zero tokens drop on both engines (explode and unnest agree)."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens(col("text"))).alias("t"))
    vocab = (
        ex.groupBy("t")
        .agg(F.count("*").alias("n"))
        .orderBy(col("n").desc(), col("t"))
        .limit(100)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        ex.join(broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (col("n_oov").cast("double") / col("n_tokens")).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Composite quality gate (C4-style rule filter with reasons)
# ---------------------------------------------------------------------------

QUALITY_GATE_ORACLE = """
WITH m AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
    len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS n_distinct,
    len(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
    len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
    n_chars
  FROM documents
)
SELECT doc_id,
  concat_ws(',',
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN n_tokens > 2000 THEN 'too_long' END,
    CASE WHEN CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) < 0.5 THEN 'low_alpha' END,
    CASE WHEN CAST(n_digit AS DOUBLE) / NULLIF(n_chars, 0) > 0.2 THEN 'digit_heavy' END,
    CASE WHEN n_tokens >= 10
              AND CAST(n_distinct AS DOUBLE) / n_tokens < 0.3 THEN 'low_diversity' END
  ) AS reasons,
  (n_tokens >= 10 AND n_tokens <= 2000
   AND CAST(n_alpha AS DOUBLE) / NULLIF(n_chars, 0) >= 0.5
   AND CAST(n_digit AS DOUBLE) / NULLIF(n_chars, 0) <= 0.2
   AND NOT (n_tokens >= 10 AND CAST(n_distinct AS DOUBLE) / n_tokens < 0.3)
  ) AS keep
FROM m
"""


@register("quality_gate_composite", oracle=QUALITY_GATE_ORACLE)
def quality_gate_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style composite cleaning gate: five rules (length bounds,
    alphabetic ratio, digit density, token diversity) evaluated per
    document, emitting keep/drop plus the comma-joined failed-rule
    list — the audit trail a curation pipeline needs to tune
    thresholds. ``concat_ws`` skips NULLs on both engines, so the
    reasons string is rule-ordered and deterministic.

    Scale shape: map-only scan; at 100 TB this is the cheapest kind of
    operator there is — whole-stage-codegen'd column math."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens(col("text"))
    m = docs.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_distinct"),
        F.length(F.regexp_replace(col("text"), "[^a-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(col("text"), "[^0-9]", "")).alias("n_digit"),
        "n_chars",
    )
    too_short = col("n_tokens") < 10
    too_long = col("n_tokens") > 2000
    # nullif guard: an empty-text document (n_chars = 0) must yield NULL
    # ratios identically on both engines — Spark's non-ANSI x/0 is NULL
    # but DuckDB double division yields inf, so the guard is explicit.
    safe_chars = F.nullif(col("n_chars"), F.lit(0))
    low_alpha = col("n_alpha").cast("double") / safe_chars < 0.5
    digit_heavy = col("n_digit").cast("double") / safe_chars > 0.2
    low_diversity = (col("n_tokens") >= 10) & (
        col("n_distinct").cast("double") / col("n_tokens") < 0.3
    )
    return m.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.when(too_short, "too_short"),
            F.when(too_long, "too_long"),
            F.when(low_alpha, "low_alpha"),
            F.when(digit_heavy, "digit_heavy"),
            F.when(low_diversity, "low_diversity"),
        ).alias("reasons"),
        (
            ~too_short & ~too_long & ~low_alpha & ~digit_heavy & ~low_diversity
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Dimension-wise embedding centroids per label
# ---------------------------------------------------------------------------

CENTROID_ORACLE = """
WITH e AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT label,
    unnest(generate_series(1, len(v))) - 1 AS dim,
    unnest(list_transform(v, x -> ROUND(x, 6))) AS val
  FROM e
)
SELECT label, CAST(dim AS BIGINT) AS dim,
  CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS centroid,
  CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM ex
GROUP BY label, dim
"""


@register("embedding_centroid_per_label", oracle=CENTROID_ORACLE)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, emitted as (label, dim, centroid)
    rows — the cluster-center update of k-means / the class prototype
    of a nearest-centroid classifier, as a pure aggregate.

    Determinism: per-element values round to 6 dp (bitwise-identical
    cross-engine) and the cross-row mean accumulates in exact decimal,
    so the result is independent of aggregation order (a parallel
    double-sum is not — same discipline as the TPC-H sums).

    Scale shape: posexplode then one hash-aggregate on (label, dim) —
    dims are bounded (the array length), so cardinality is
    |labels| x dim: tiny. Map-side partial aggregation does the heavy
    lifting; no window, no sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(
            F.transform(col("embedding"), lambda x: F.round(x.cast("double"), 6))
        ).alias("dim", "val"),
    )
    return (
        ex.groupBy("label", col("dim").cast("bigint").alias("dim"))
        .agg(
            (
                F.sum(col("val").cast("decimal(38,6)")).cast("double") / F.count("*")
            ).alias("centroid"),
            F.count("*").cast("bigint").alias("n_vecs"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
# local fingerprinting algorithm)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # k-gram width (tokens)
WINNOW_W = 4  # winnowing window (hashes)
#: (hash, pos) packed into one bigint so MIN() argmins the pair:
#: hash < 2^32 (md5-prefix hash64), pos < POS_MOD.
WINNOW_POS_MOD = 1_000_000

WINNOWING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(generate_series(1, len(tk) - {WINNOW_K - 1})) - 1 AS pos,
    unnest(CASE WHEN len(tk) >= {WINNOW_K}
      THEN list_transform(generate_series(1, len(tk) - {WINNOW_K - 1}),
             i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 8))::BIGINT)
      ELSE [] END) AS h
  FROM toks
),
packed AS (
  SELECT doc_id, pos, h, h * {WINNOW_POS_MOD} + pos AS hp,
    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM grams
),
wins AS (
  SELECT doc_id, pos, n_grams,
    MIN(hp) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS min_hp
  FROM packed
)
SELECT DISTINCT doc_id,
  CAST(min_hp % {WINNOW_POS_MOD} AS BIGINT) AS fp_pos,
  CAST(min_hp // {WINNOW_POS_MOD} AS BIGINT) AS fp_hash
FROM wins
WHERE pos <= n_grams - {WINNOW_W}
"""


@register("winnowing_fingerprints", oracle=WINNOWING_ORACLE)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    {k}-gram, slide a window of {w} consecutive hashes, keep the
    minimum of each window (lowest position on hash ties — packed
    (hash, pos) bigint makes MIN an argmin, deterministic on both
    engines). Guarantees: any shared run of >= k+w-1 tokens between
    two documents shares at least one fingerprint — the local-match
    detection property plain shingle sampling lacks.

    Scale shape: one shuffle on doc_id serves the gram window, the
    count, and the winnowing min (same partitioning, single exchange);
    the distinct collapses per doc. Density is ~2/(w+1) of grams, so
    the fingerprint table is a fraction of the posting list a full
    shingle index needs. The table is the fingerprint INDEX — a
    build-once artifact — so it is materialized + session-memoized
    for its consumers (winnowing_overlap_pairs)."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tk = docs.select(
            "doc_id", F.posexplode(tokens(col("text"))).alias("pos", "tok")
        )
        w_seq = Window.partitionBy("doc_id").orderBy("pos")
        grams = (
            tk.select(
                "doc_id",
                "pos",
                F.concat_ws(
                    " ",
                    col("tok"),
                    F.lead("tok", 1).over(w_seq),
                    F.lead("tok", 2).over(w_seq),
                ).alias("g"),
                F.lead("tok", 2).over(w_seq).isNotNull().alias("full_width"),
            )
            .filter(col("full_width"))
            .select("doc_id", "pos", hash64(col("g")).alias("h"))
        )
        packed = grams.select(
            "doc_id",
            "pos",
            (col("h") * WINNOW_POS_MOD + col("pos")).alias("hp"),
            F.count("*").over(Window.partitionBy("doc_id")).alias("n_grams"),
        )
        w_win = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.currentRow, WINNOW_W - 1)
        )
        wins = packed.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min("hp").over(w_win).alias("min_hp"),
        )
        return (
            wins.filter(col("pos") <= col("n_grams") - WINNOW_W)
            .select(
                "doc_id",
                (col("min_hp") % WINNOW_POS_MOD).cast("bigint").alias("fp_pos"),
                # integer div, NOT `/` (double division would round the
                # packed bigint through a float)
                F.expr(f"min_hp div {WINNOW_POS_MOD}").cast("bigint").alias(
                    "fp_hash"
                ),
            )
            .distinct()
        )

    return artifact_memo(spark, ("winnowing_fps", sf_dir), build)


WINNOW_MAX_DF = 50  # stop-fingerprint cutoff (boilerplate hashes)
WINNOW_MIN_SHARED = 3

WINNOW_PAIRS_ORACLE = f"""
WITH fps AS ({WINNOWING_ORACLE}),
kept AS (
  SELECT doc_id, fp_hash FROM (
    SELECT doc_id, fp_hash,
      COUNT(*) OVER (PARTITION BY fp_hash) AS df
    FROM (SELECT DISTINCT doc_id, fp_hash FROM fps)
  ) WHERE df <= {WINNOW_MAX_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
"""


@register("winnowing_overlap_pairs", oracle=WINNOW_PAIRS_ORACLE)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-overlap pair detection over the winnowing index: document
    pairs sharing >= 3 distinct fingerprint hashes — the
    plagiarism/boilerplate-overlap query MOSS runs, as an
    inverted-index self-join (same skeleton as dedup_ngram_jaccard but
    over a ~2/(w+1)-density index instead of the full posting list).

    The DF cutoff drops boilerplate fingerprints (a hash shared by
    > 50 docs identifies a template, not a copy) and bounds the
    hottest posting list — without it one viral fingerprint creates a
    df² pair blow-up at scale."""
    fps = winnowing_fingerprints(spark, sf_dir).select("doc_id", "fp_hash").distinct()
    kept = (
        fps.withColumn(
            "df", F.count("*").over(Window.partitionBy("fp_hash"))
        )
        .filter(col("df") <= WINNOW_MAX_DF)
        .drop("df")
    )
    a = kept.select(col("doc_id").alias("doc_a"), "fp_hash")
    b = kept.select(col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(col("n_shared") >= WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Event funnel: signup -> view -> purchase
# ---------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(e.ts) AS v_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND e.ts >= s.s_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_order,
         CAST(COUNT(*) AS BIGINT) AS n_users FROM s
  UNION ALL
  SELECT 'view', CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM v
  UNION ALL
  SELECT 'purchase', CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM p
)
"""


@register("funnel_analysis", oracle=FUNNEL_ORACLE)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel over the events stream: users who
    signed up, then viewed at or after their first signup, then
    purchased at or after that first view. Stage timestamps are MINs,
    so the result is replay-deterministic.

    Scale shape: three aggregations each shuffling on ``user_id`` —
    the SAME key, so Catalyst reuses the partitioning across the
    joins (no extra exchange); the per-stage user sets shrink
    monotonically. No window over the raw stream, no driver state."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(col("event_type") == "view")
        .join(s, "user_id")
        .filter(col("ts") >= col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(col("ts") >= col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(df: DataFrame, name: str, order: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(order).cast("bigint").alias("stage_order"),
            F.count("*").cast("bigint").alias("n_users"),
        )

    return stage(s, "signup", 1).unionAll(stage(v, "view", 2)).unionAll(
        stage(p, "purchase", 3)
    )


# ---------------------------------------------------------------------------
# Retention cohorts: first-seen date x week offset
# ---------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events GROUP BY user_id
)
SELECT f.cohort_date,
  CAST(FLOOR(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
    AS week_offset,
  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


@register("retention_cohorts", oracle=RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: cohort users by first-seen date,
    count distinct active users per (cohort, week-offset) cell.

    Scale shape: first-seen is one shuffle on user_id; the join back
    rides the same partitioning (no extra exchange); the final
    count-distinct re-shuffles on the (cohort, week) cell whose
    cardinality is weeks² — tiny. The distinct is exact; at 100 TB
    swap for approx_count_distinct per the sketch query in
    functions.py if 2-3% error is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_date",
            F.floor(
                F.datediff(F.to_date("ts"), col("cohort_date")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_date", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Bigram association strength (lift) — collocation mining
# ---------------------------------------------------------------------------

# lift(a,b) = P(ab) / (P(a)·P(b)) = c_ab·N / (c_a·c_b): the PMI
# argument without the log, so the score is ONE double division of
# exact bigint products (all < 2^53 — token totals are ~3e6 at sf0.1)
# — bitwise identical across engines, where a log()-based PMI would be
# at the mercy of libm. Ranking by lift is ranking by PMI (log is
# monotone).
BIGRAM_LIFT_ORACLE = """
WITH toks AS (
  SELECT regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
uni AS (SELECT unnest(tk) AS t FROM toks),
ucnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY t),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT
    unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i])) AS w1,
    unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i + 1])) AS w2
  FROM toks WHERE len(tk) >= 2
),
bcnt AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= 5
)
SELECT b.w1 || ' ' || b.w2 AS ngram, b.n_ab,
  CAST(b.n_ab * t.n AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS lift
FROM bcnt b
CROSS JOIN tot t
JOIN ucnt ua ON ua.t = b.w1
JOIN ucnt ub ON ub.t = b.w2
ORDER BY lift DESC, ngram
LIMIT 50
"""


def _collocation_counts(spark: SparkSession, sf_dir: str) -> dict:
    """Memoized collocation-model artifacts per (session, sf_dir):
    the unigram count table ``(t, c)`` and the min-support-5 bigram
    count table ``(w1, w2, n_ab)`` — the corpus passes behind
    bigram lift, built once like the LM model (_lm_bigram_model)."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> dict:
        docs = load_table(spark, sf_dir, "documents")
        tk = docs.select(tokens(col("text")).alias("tk"))
        ucnt = (
            tk.select(F.explode(col("tk")).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("c"))
        )
        m = F.size(col("tk")) - 1
        pairs = tk.filter(F.size(col("tk")) >= 2).select(
            F.explode(
                F.zip_with(
                    F.slice(col("tk"), 1, m),
                    F.slice(col("tk"), 2, m),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        bcnt = (
            pairs.select(col("p.w1").alias("w1"), col("p.w2").alias("w2"))
            .groupBy("w1", "w2")
            .agg(F.count("*").alias("n_ab"))
            .filter(col("n_ab") >= 5)
        )
        return {"ucnt": ucnt, "bcnt": bcnt}

    return artifact_memo(spark, ("collocation_counts", sf_dir), build)


@register("bigram_lift_topk", oracle=BIGRAM_LIFT_ORACLE)
def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams by lift (observed/expected co-occurrence,
    min support 5) — collocation mining: "new york" scores high on
    lift even when raw frequency is unremarkable, which is what
    phrase induction and tokenizer-merge candidates actually need
    (``ngram_topk_corpus`` ranks by raw count; this ranks by
    association strength).

    Scale shape: the unigram and min-support bigram count tables are
    a build-once collocation-model artifact, session-memoized and
    materialized (``_collocation_counts``) because THREE plan
    branches read the unigram table per call (the w1 join, the w2
    join, and the corpus total derived as Σc instead of a fourth
    tokenize) AND repeated calls reuse the one build — Spark reuses
    no exchanges across plan branches, so an unmaterialized chain
    re-tokenizes per branch (measured: 4 scans → 2, then 0 on warm
    calls). The unigram lookups are shuffle equi-joins on the token
    key (the full vocab is NOT broadcastable at web scale); the
    corpus total is a 1-row broadcast. Final top-k is TakeOrdered,
    no global sort."""
    parts = _collocation_counts(spark, sf_dir)
    ucnt, bcnt = parts["ucnt"], parts["bcnt"]
    tot = ucnt.agg(F.sum("c").cast("bigint").alias("n"))
    ua = ucnt.select(col("t").alias("w1"), col("c").alias("c_a"))
    ub = ucnt.select(col("t").alias("w2"), col("c").alias("c_b"))
    lift = (col("n_ab") * col("n")).cast("double") / (
        col("c_a") * col("c_b")
    ).cast("double")
    return (
        bcnt.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(broadcast(tot))
        .select(
            F.concat_ws(" ", col("w1"), col("w2")).alias("ngram"),
            col("n_ab").cast("bigint").alias("n_ab"),
            lift.alias("lift"),
        )
        .orderBy(col("lift").desc(), col("ngram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# BM25 top-k retrieval (ratio-form IDF for cross-engine exactness)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")

BM25_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
  FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs FROM documents),
tt AS (SELECT COUNT(*) AS total_tokens FROM tok),
avg AS (
  SELECT CAST((SELECT total_tokens FROM tt) AS DOUBLE)
         / (SELECT n_docs FROM stats) AS avgdl
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok
  WHERE token IN ('spark', 'join', 'window')
  GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE token IN ('spark', 'join', 'window')
  GROUP BY token
),
scored AS (
  SELECT tf.doc_id,
    ROUND(
      ((CAST((SELECT n_docs FROM stats) - df.df AS DOUBLE) + 0.5)
        / (CAST(df.df AS DOUBLE) + 0.5))
      * ((CAST(tf.tf AS DOUBLE) * 2.2)
         / (CAST(tf.tf AS DOUBLE)
            + (1.2 * (0.25 + ((0.75 * CAST(dl.dl AS DOUBLE))
                              / (SELECT avgdl FROM avg)))))),
      6) AS term_score
  FROM tf
  JOIN df USING (token)
  JOIN dl USING (doc_id)
)
SELECT doc_id, CAST(s AS DOUBLE) AS bm25,
  CAST(c AS BIGINT) AS n_terms, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id,
    SUM(CAST(term_score AS DECIMAL(38,6))) AS s,
    COUNT(*) AS c,
    ROW_NUMBER() OVER (
      ORDER BY SUM(CAST(term_score AS DECIMAL(38,6))) DESC, doc_id) AS rk
  FROM scored GROUP BY doc_id
)
WHERE rk <= 15
"""


@register("bm25_topk_docs", oracle=BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-15 documents for a fixed query term set —
    the lexical-search scorer behind contamination lookup and
    retrieval-augmented corpus curation (k1 = 1.2, b = 0.75).

    Exactness discipline: the classic ``ln((N - df + .5)/(df + .5))``
    IDF is replaced by its ratio form (log is monotone, so ranking is
    unchanged; libm log is not bitwise-portable across engines — same
    trick as ``tfidf_top_terms``), every per-term score is a fixed
    tree of individually-rounded IEEE ops (deterministic on any
    engine), rounded to 6 dp, and the per-doc sum accumulates in
    exact decimal, so the hash matches DuckDB bit-for-bit.

    Scale shape: tf and df both filter to the bounded query-term set
    *before* shuffling (the posting list for 3 terms, not the
    corpus); each aggregate re-derives its token stream map-only
    from the columnar scan rather than caching the exploded corpus
    (re-reading two pruned parquet columns beats materializing a
    row-per-token frame at scale — same trade tfidf_top_terms makes).
    dl is the doc-length table every BM25 index stores; at 100 TB dl
    and df are index artifacts built once and reused per query.
    Scalars (N, avgdl) are driver literals, not joined. The final
    top-k compiles to a TakeOrderedAndProject (Catalyst rewrites the
    rank-then-filter window through LimitPushDownThroughWindow — see
    docs/PLANS.md), never a full global sort.
    """
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> dict:
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select("doc_id", F.explode(tokens(col("text"))).alias("token"))
        qt = tok.filter(col("token").isin(*_BM25_TERMS))
        return {
            # doc lengths, corpus scalars, and the fixed-term tf/df
            # postings are all input-invariant (the term set is a
            # module constant), so the whole retrieval index is one
            # memoized corpus pass; each call pays only the scoring
            # joins over the tiny term-filtered tables.
            "dl": tok.groupBy("doc_id")
            .agg(F.count("*").alias("dl"))
            .localCheckpoint(eager=True),
            "tf": qt.groupBy("doc_id", "token")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint(eager=True),
            "df": qt.groupBy("token")
            .agg(F.countDistinct("doc_id").alias("df"))
            .localCheckpoint(eager=True),
            "n_docs": docs.count(),
            "total_tokens": tok.count(),
        }

    idx = artifact_memo(spark, ("bm25_index", sf_dir), build)
    n_docs, total_tokens = idx["n_docs"], idx["total_tokens"]
    dl, tf, df = idx["dl"], idx["tf"], idx["df"]
    # IEEE double division, same op as the oracle; the empty-corpus
    # guard is value-irrelevant (no docs -> no rows downstream) but
    # keeps the plan constructible.
    avgdl = total_tokens / n_docs if n_docs else 1.0
    idf = ((F.lit(n_docs) - col("df")).cast("double") + F.lit(0.5)) / (
        col("df").cast("double") + F.lit(0.5)
    )
    tf_d = col("tf").cast("double")
    norm = tf_d + (
        F.lit(1.2)
        * (F.lit(0.25) + ((F.lit(0.75) * col("dl").cast("double")) / F.lit(avgdl)))
    )
    scored = (
        tf.join(broadcast(df), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.round(idf * ((tf_d * F.lit(2.2)) / norm), 6).alias("term_score"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum(col("term_score").cast("decimal(38,6)")).alias("s"),
        F.count("*").cast("bigint").alias("n_terms"),
    )
    w = Window.orderBy(col("s").desc(), col("doc_id"))
    return (
        per_doc.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 15)
        .select("doc_id", col("s").cast("double").alias("bm25"), "n_terms", "rk")
    )


# ---------------------------------------------------------------------------
# Bigram-LM likelihood scoring (CCNet-style perplexity filter, log-free)
# ---------------------------------------------------------------------------

LM_LIKELIHOOD_ORACLE = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
vocab AS (
  SELECT COUNT(DISTINCT t) AS v FROM (
    SELECT unnest(tk) AS t FROM tok
  )
),
bi AS (
  SELECT doc_id,
    unnest(CASE WHEN len(tk) >= 2
      THEN list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i + 1])
      ELSE [] END) AS bg
  FROM tok
),
model AS (
  SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY bg
),
ctx AS (
  SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c12) AS BIGINT) AS c1
  FROM model GROUP BY w1
),
p AS (
  SELECT bi.doc_id,
    ROUND(CAST(model.c12 + 1 AS DOUBLE)
          / CAST(ctx.c1 + (SELECT v FROM vocab) AS DOUBLE), 12) AS p
  FROM bi
  JOIN model USING (bg)
  JOIN ctx ON ctx.w1 = split_part(bi.bg, ' ', 1)
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS avg_likelihood,
  (CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)) >= 0.001 AS keep
FROM p
GROUP BY doc_id
"""


def _lm_bigram_model(spark: SparkSession, sf_dir: str):
    """Corpus bigram-LM artifacts: (model, ctx, vocab_size).

    ``model`` is (bg, c12) — add-one numerators; ``ctx`` is (w1, c1)
    — context totals rolled up from the materialized model table
    (|distinct bigrams| rows, never the corpus); ``vocab_size`` is
    |distinct tokens|. Built once per (session, sf_dir) behind the
    same ``artifact_memo`` the similarity indexes use: training is
    the expensive corpus pass, scoring should pay for it once."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build():
        docs = load_table(spark, sf_dir, "documents")
        tk = docs.select(tokens(col("text")).alias("tk"))
        vocab_size = (
            tk.select(F.explode(col("tk")).alias("t")).distinct().count()
        )
        bi = tk.filter(F.size(col("tk")) >= 2).select(
            F.explode(word_shingles(col("tk"), 2)).alias("bg")
        )
        model = (
            bi.groupBy("bg")
            .agg(F.count("*").alias("c12"))
            .localCheckpoint(eager=True)
        )
        ctx = (
            model.select(
                F.split_part(col("bg"), F.lit(" "), F.lit(1)).alias("w1"), "c12"
            )
            .groupBy("w1")
            .agg(F.sum("c12").cast("bigint").alias("c1"))
            .localCheckpoint(eager=True)
        )
        return model, ctx, vocab_size

    return artifact_memo(spark, ("lm_bigram_model", sf_dir), build)


@register("lm_bigram_likelihood", oracle=LM_LIKELIHOOD_ORACLE)
def lm_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: train an add-one-smoothed bigram
    model on the corpus, score every document by its mean conditional
    likelihood, and gate on a threshold. (CCNet scores with KenLM
    perplexity — the geometric mean of the same conditionals; the
    arithmetic mean used here needs no log/exp, so the score is exact
    cross-engine: each conditional is ONE IEEE division of two
    integers, rounded to 12 dp, and the per-doc mean accumulates in
    exact decimal — aggregation-order-independent.)

    Scale shape: the trained model (bigram counts, context counts,
    vocab size) is an INDEX ARTIFACT — built once per (session,
    sf_dir) and materialized via the same session-memo the ANN/LSH
    index tables use, so the context rollup genuinely reads the
    |distinct bigrams|-row model table, not a corpus re-scan, and
    every scoring call (and the train/score split of a real
    pipeline) reuses one materialization. The model build itself is
    one map-side-combined hash aggregate on the shingle key the
    dedup family already shuffles on. Scoring re-derives doc bigrams
    map-only and joins them to the model on the bigram key (broadcast
    here; shuffle-join or top-K-pruned broadcast at 100 TB). Per-doc
    reduce is one decimal-sum aggregate.
    """
    model, ctx, vocab_size = _lm_bigram_model(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens(col("text")).alias("tk"))
    bi = tk.filter(F.size(col("tk")) >= 2).select(
        "doc_id", F.explode(word_shingles(col("tk"), 2)).alias("bg")
    )
    p = (
        bi.join(model, "bg")
        .join(ctx, F.split_part(col("bg"), F.lit(" "), F.lit(1)) == ctx.w1)
        .select(
            "doc_id",
            F.round(
                (col("c12") + F.lit(1)).cast("double")
                / (col("c1") + F.lit(vocab_size)).cast("double"),
                12,
            ).alias("p"),
        )
    )
    mean = F.sum(col("p").cast("decimal(38,12)")).cast("double") / F.count("*")
    return p.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        mean.alias("avg_likelihood"),
        (mean >= F.lit(0.001)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Exact duplicate token-span extraction (substring-level dedup)
# ---------------------------------------------------------------------------

DUP_SPAN_K = 8  # minimum duplicated run, in tokens
DUP_SPAN_MAX_DF = 50  # stop-gram cutoff (viral boilerplate grams)

DUP_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
    ('0x' || substr(md5(array_to_string(tk[i:i+{DUP_SPAN_K}-1], ' ')), 1, 8))::BIGINT AS gh
  FROM toks, unnest(generate_series(1, len(tk) - {DUP_SPAN_K} + 1)) AS t(i)
),
kept AS (
  SELECT doc_id, pos, gh FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY gh) AS df FROM grams
  ) WHERE df <= {DUP_SPAN_MAX_DF}
),
hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
  FROM kept a JOIN kept b USING (gh)
  WHERE a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, pa, pb,
    pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isle
  FROM hits
)
SELECT doc_a, doc_b,
  CAST(MIN(pa) AS BIGINT) AS start_a,
  CAST(MIN(pb) AS BIGINT) AS start_b,
  CAST(COUNT(*) + {DUP_SPAN_K} - 1 AS BIGINT) AS span_tokens
FROM runs
GROUP BY doc_a, doc_b, pa - pb, isle
ORDER BY doc_a, doc_b, start_a, start_b
"""


@register("dup_token_spans", oracle=DUP_SPAN_ORACLE)
def dup_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring extraction: every maximal token span
    of >= {K} tokens shared verbatim between two documents, reported
    as (doc_a, doc_b, 1-based start positions, span length). This is
    the substring-level dedup signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    winnowing answers "do these docs overlap?" approximately; this
    answers "WHICH spans are copied?" exactly, which is what a
    remove-the-duplicate-span cleaner consumes. (Reference scope:
    ``workingTest.scala`` has no corpus ops at all — SURVEY.md S2.8
    training-data-pipeline category.)

    Construction: every {K}-gram position is hashed (hash64 — the
    cross-engine md5-prefix hash; 32-bit collisions are accepted and
    IDENTICAL on both engines, the same trade winnowing makes), a
    df <= {DF} stop-gram cutoff drops viral boilerplate grams (one
    viral gram is a df^2 pair blow-up at scale — same guard as
    ``winnowing_overlap_pairs``), the inverted-index self-join yields
    matching (pos_a, pos_b) anchors, and gaps-and-islands along each
    (doc_a, doc_b, pos_a - pos_b) DIAGONAL merges runs of consecutive
    anchors into maximal spans: j consecutive matching {K}-grams ==
    one duplicated span of j + {K} - 1 tokens.

    Scale shape: shuffle 1 moves (doc_id, pos, gh) triples hashed by
    gh — 16 bytes/row, never gram text — with posting lists bounded
    by the df cutoff; shuffle 2 repartitions the anchor pairs by
    (doc_a, doc_b, diag) for the row_number window, and the final
    groupBy keys (doc_a, doc_b, diag, isle) are a superset of that
    window partitioning, so Catalyst reuses the exchange (one
    shuffle, not two — see docs/PLANS.md). Within a diagonal pos_a is
    unique, so row_number is deterministic without a tie-break
    column.
    """
    return _dup_spans(spark, sf_dir)


def _dup_spans(
    spark: SparkSession, sf_dir: str, ordered: bool = True
) -> DataFrame:
    """The dup_token_spans derivation with the report sort optional:
    ``dedup_span_scrub`` consumes the spans through a distinct +
    collect_set (order-insensitive), so it skips the global sort —
    removing a full range exchange AND its sampling job from the scrub
    plan (and, at scale, a global sort of every duplicated-span row)."""
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return dup_span_gram_index(docs)

    # the DF-filtered hashed-gram posting index is the expensive
    # corpus pass (tokenize + posexplode + per-gram DF window) and is
    # input-invariant, so it is session-memoized like the other
    # retrieval indexes; the diagonal merge runs per call.
    kept = artifact_memo(spark, ("dup_span_grams", sf_dir), build)
    return spans_from_gram_index(kept, k=DUP_SPAN_K, ordered=ordered)


def dup_span_gram_index(
    docs: DataFrame, k: int = DUP_SPAN_K, max_df: int = DUP_SPAN_MAX_DF
) -> DataFrame:
    """Stage 1 of the duplicated-span operator: the hashed k-gram
    posting table ``(doc_id, pos, gh)`` with viral grams dropped by
    the df ≤ max_df cutoff."""
    grams = docs.select(
        "doc_id",
        F.posexplode(word_shingles(tokens(col("text")), k)).alias("pos0", "g"),
    ).select(
        "doc_id",
        (col("pos0") + 1).alias("pos"),  # oracle positions are 1-based
        hash64(col("g")).alias("gh"),
    )
    return (
        grams.withColumn("df", F.count("*").over(Window.partitionBy("gh")))
        .filter(col("df") <= max_df)
        .drop("df")
    )


def duplicate_token_spans(
    docs: DataFrame, k: int = DUP_SPAN_K, max_df: int = DUP_SPAN_MAX_DF
) -> DataFrame:
    """Operator core of ``dup_token_spans`` over any (doc_id, text)
    frame — factored out so property tests can plant known spans in
    synthetic corpora (tests/test_mining_ops.py)."""
    return spans_from_gram_index(dup_span_gram_index(docs, k, max_df), k=k)


def spans_from_gram_index(
    kept: DataFrame, k: int, ordered: bool = True
) -> DataFrame:
    """Stage 2: inverted-index self-join on the gram hash + the
    gaps-and-islands diagonal merge into maximal shared spans.
    ``ordered=False`` skips the report sort for consumers that reduce
    the spans order-insensitively (see ``_dup_spans``)."""
    a = kept.select(col("doc_id").alias("doc_a"), col("pos").alias("pa"), "gh")
    b = kept.select(col("doc_id").alias("doc_b"), col("pos").alias("pb"), "gh")
    hits = (
        a.join(b, "gh")
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("diag", col("pa") - col("pb"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = hits.withColumn("isle", col("pa") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "isle")
        .agg(
            F.min("pa").cast("bigint").alias("start_a"),
            F.min("pb").cast("bigint").alias("start_b"),
            (F.count("*") + F.lit(k - 1)).cast("bigint").alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )
    if not ordered:
        return spans
    return spans.orderBy("doc_a", "doc_b", "start_a", "start_b")


dup_token_spans.__doc__ = dup_token_spans.__doc__.replace("{K}", str(DUP_SPAN_K)).replace(
    "{DF}", str(DUP_SPAN_MAX_DF)
)


# ---------------------------------------------------------------------------
# Duplicate-span scrub (the remove step consuming dup_token_spans)
# ---------------------------------------------------------------------------

_DUP_SPAN_CTES = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
    ('0x' || substr(md5(array_to_string(tk[i:i+{DUP_SPAN_K}-1], ' ')), 1, 8))::BIGINT AS gh
  FROM toks, unnest(generate_series(1, len(tk) - {DUP_SPAN_K} + 1)) AS t(i)
),
kept AS (
  SELECT doc_id, pos, gh FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY gh) AS df FROM grams
  ) WHERE df <= {DUP_SPAN_MAX_DF}
),
hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
  FROM kept a JOIN kept b USING (gh)
  WHERE a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, pa, pb,
    pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isle
  FROM hits
),
spans AS (
  SELECT doc_a, doc_b,
    MIN(pa) AS start_a, MIN(pb) AS start_b,
    COUNT(*) + {DUP_SPAN_K} - 1 AS span_tokens
  FROM runs
  GROUP BY doc_a, doc_b, pa - pb, isle
)
"""

SPAN_SCRUB_ORACLE = (
    _DUP_SPAN_CTES
    + """,
rem AS (
  SELECT doc_b AS doc_id,
    list_distinct(flatten(list(generate_series(start_b, start_b + span_tokens - 1)))) AS rem
  FROM spans GROUP BY doc_b
),
scrubbed AS (
  SELECT toks.doc_id, tk,
    list_transform(
      list_filter(generate_series(1, len(tk)),
                  i -> NOT list_contains(COALESCE(rem.rem, CAST([] AS BIGINT[])), i)),
      i -> tk[i]) AS scrub
  FROM toks LEFT JOIN rem ON toks.doc_id = rem.doc_id
)
SELECT doc_id,
  CAST(len(tk) AS BIGINT) AS n_tokens,
  CAST(len(tk) - len(scrub) AS BIGINT) AS n_removed,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(scrub, t2 -> ('0x' || substr(md5(t2), 1, 8))::BIGINT)),
    (acc, h) -> (acc * 31 + h) % 1000000007) AS scrubbed_fp
FROM scrubbed
ORDER BY doc_id
"""
)


@register("dedup_span_scrub", oracle=SPAN_SCRUB_ORACLE)
def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVE step of substring-level dedup: scrub every
    duplicated span found by ``dup_token_spans`` from the
    higher-doc_id copy (the lower doc_id keeps its text — a
    deterministic canonical-copy rule, same convention as
    ``dedup_canonical_docs``), and emit per-document before/after
    token counts plus the rolling fingerprint of the scrubbed stream
    (order-sensitive, so the oracle proves WHICH tokens survived and
    in what order, not just how many). Together the pair implements
    Lee et al. 2022's dedup loop: detect exact duplicated substrings,
    then cut them out of all-but-one occurrence.

    Scale shape: the spans frame is tiny relative to the corpus (only
    duplicated material), so the removal-set build aggregates a few
    positions per affected doc; the corpus-side work is ONE left join
    on doc_id plus a map-only higher-order-function filter over the
    token array — no explode of the corpus, no per-token shuffle. The
    whole-doc token arrays never leave their partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    # unordered spans: the distinct + collect_set below is
    # order-insensitive, so the report sort (a range exchange + its
    # sampling job, and at scale a global sort of every span row)
    # would be pure waste in this plan
    spans = _dup_spans(spark, sf_dir, ordered=False)
    rem = (
        spans.select(
            col("doc_b").alias("doc_id"),
            F.explode(
                F.sequence(col("start_b"), col("start_b") + col("span_tokens") - 1)
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("rem"))
    )
    tk = docs.select("doc_id", tokens(col("text")).alias("tk"))
    joined = tk.join(rem, "doc_id", "left").select(
        "doc_id",
        "tk",
        F.coalesce(col("rem"), F.array().cast("array<bigint>")).alias("rem"),
    )
    scrub = F.filter(
        col("tk"),
        lambda t, i: ~F.array_contains(col("rem"), (i + F.lit(1)).cast("bigint")),
    )
    return (
        joined.select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tokens"),
            (F.size("tk") - F.size(scrub)).cast("bigint").alias("n_removed"),
            fingerprint(scrub).alias("scrubbed_fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 3

BASKET_RULES_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM baskets),
supp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM baskets GROUP BY p),
pairs AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, n_both,
  sa.n_p AS n_a, sb.n_p AS n_b,
  CAST(n_both AS DOUBLE) / sa.n_p AS conf_a_to_b,
  CAST(n_both AS DOUBLE) / sb.n_p AS conf_b_to_a,
  CAST(n_both * n_orders AS DOUBLE) / CAST(sa.n_p * sb.n_p AS DOUBLE) AS lift
FROM pairs
JOIN supp sa ON part_a = sa.p
JOIN supp sb ON part_b = sb.p
CROSS JOIN n
ORDER BY part_a, part_b
"""


@register("basket_pair_rules", oracle=BASKET_RULES_ORACLE)
def basket_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: every part
    pair co-purchased in >= {S} orders, with support, both directed
    confidences, and lift — the classic a-priori 2-itemset mining
    that drives recommendations ("customers who bought A...").
    Complements ``bigram_lift_topk`` (SEQUENTIAL collocation in text)
    with the SET-BASED flavor over transactions; the reference has no
    aggregation at all (SURVEY.md S2.8).

    Exactness: all counts are bigints; confidence and lift are single
    bigint-ratio double divisions, identical on both engines.

    Scale shape: the pair derivation self-joins baskets on the order
    key, so work per order is C(basket, 2) — bounded by the basket
    size a transaction physically has (same bounded-derivation
    argument as ``triangle_count_parts``'s per-order edges). The pair
    aggregate map-side-combines; the min-support HAVING collapses the
    long tail BEFORE the two support joins, so only surviving rules
    shuffle twice more. n_orders is a 1-row broadcast. The
    support-filtered pair table and the per-part supports are the
    mined MODEL — input-invariant, so they are session-memoized and
    materialized (the a-priori pass runs once; rule scoring reruns
    cheaply), the same build-once discipline as _collocation_counts.
    """
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build() -> dict:
        baskets = (
            load_table(spark, sf_dir, "lineitem")
            .select(col("l_orderkey").alias("o"), col("l_partkey").alias("p"))
            .distinct()
        )
        supp = (
            baskets.groupBy("p")
            .agg(F.count("*").cast("bigint").alias("n_p"))
            .localCheckpoint(eager=True)
        )
        a = baskets.select("o", col("p").alias("part_a"))
        b = baskets.select("o", col("p").alias("part_b"))
        pairs = (
            a.join(b, "o")
            .filter(col("part_a") < col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count("*").cast("bigint").alias("n_both"))
            .filter(col("n_both") >= BASKET_MIN_SUPPORT)
            .localCheckpoint(eager=True)
        )
        n_orders = baskets.agg(
            F.countDistinct("o").cast("bigint").alias("n_orders")
        ).localCheckpoint(eager=True)
        return {"supp": supp, "pairs": pairs, "n_orders": n_orders}

    parts = artifact_memo(spark, ("basket_model", sf_dir), build)
    supp, pairs, n_orders = parts["supp"], parts["pairs"], parts["n_orders"]
    sa = supp.select(col("p").alias("part_a"), col("n_p").alias("n_a"))
    sb = supp.select(col("p").alias("part_b"), col("n_p").alias("n_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            (col("n_both").cast("double") / col("n_a")).alias("conf_a_to_b"),
            (col("n_both").cast("double") / col("n_b")).alias("conf_b_to_a"),
            (
                (col("n_both") * col("n_orders")).cast("double")
                / (col("n_a") * col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


basket_pair_rules.__doc__ = basket_pair_rules.__doc__.replace("{S}", str(BASKET_MIN_SUPPORT))


# ---------------------------------------------------------------------------
# Weighted hash-priority sampling (quality-weighted corpus downsample)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 10

WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
      / CAST(n_chars + 1 AS DOUBLE) AS priority
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_chars,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight_chars,
  CAST(rk AS BIGINT) AS sample_rank
FROM ranked WHERE rk <= {WEIGHTED_SAMPLE_K}
"""


@register("weighted_sample_per_source", oracle=WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED companion to ``priority_sample_per_source``: keep the
    top-{WEIGHTED_SAMPLE_K} docs per source by hash-priority DIVIDED
    by a quality weight (n_chars + 1) — longer documents get smaller
    keys and are proportionally more likely to survive, the
    deterministic, replay-stable stand-in for weighted reservoir
    sampling in a corpus-downsampling stage (weights in practice:
    quality scores, dedup cluster sizes, source trust).

    Numeric determinism: the priority is ONE double division of two
    exactly-representable integers (a 32-bit md5 prefix and the
    weight) — IEEE-correctly-rounded identically on both engines, no
    transcendental functions (an exp/log A-ES key would be at the
    mercy of libm's last ulp). Ties (astronomically unlikely) break
    on doc_id.

    Scale shape: key computation is map-only; per-source top-k rides
    one window on the source exchange — at high quota counts swap
    the rank window for a per-partition TakeOrdered (same trade
    documented in window_topk_salted for skewed sources).
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    priority = u.cast("double") / (col("n_chars") + 1).cast("double")
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        docs.select(
            "doc_id", "source", "n_chars", priority.alias("priority")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(col("rk") <= WEIGHTED_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            col("n_chars").cast("bigint").alias("weight_chars"),
            col("rk").cast("bigint").alias("sample_rank"),
        )
    )


weighted_sample_per_source.__doc__ = weighted_sample_per_source.__doc__.replace(
    "{WEIGHTED_SAMPLE_K}", str(WEIGHTED_SAMPLE_K)
)


# ---------------------------------------------------------------------------
# Ordered funnel: stages must happen in temporal sequence per user
# ---------------------------------------------------------------------------

ORDERED_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT s1.user_id,
  CAST(epoch_ms(s1.t1) AS BIGINT) AS signup_ms,
  CAST(epoch_ms(s2.t2) AS BIGINT) AS first_view_ms,
  CAST(epoch_ms(s3.t3) AS BIGINT) AS first_purchase_ms,
  CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
         + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_depth
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@register("ordered_funnel_users", oracle=ORDERED_FUNNEL_ORACLE)
def ordered_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel (the product-analytics one): signup, then a view
    STRICTLY AFTER the first signup, then a purchase STRICTLY AFTER
    that first qualifying view — per user, with the reach timestamps
    and the depth reached. Set-membership funnels (``funnel_analysis``)
    overcount: a user who purchased before ever signing up is not a
    conversion; the temporal chaining here is what funnel products
    actually sell.

    Semantics: each stage anchors on the EARLIEST qualifying event
    (min-ts greedy, which maximizes downstream matches — the standard
    funnel definition); ordering is strict event-time comparison, so
    the result is a pure function of the data on both engines.

    Scale shape: three conditional aggregations, every one grouped on
    user_id with its stage filter PUSHED TO THE SCAN, chained by
    equi-joins on the same user_id partitioning — one effective
    exchange reused end-to-end, no window over raw events, no
    per-user sort. Stage frames only shrink down the chain.
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(col("event_type") == "view")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.unix_millis(col("t1")).cast("bigint").alias("signup_ms"),
            F.unix_millis(col("t2")).cast("bigint").alias("first_view_ms"),
            F.unix_millis(col("t3")).cast("bigint").alias("first_purchase_ms"),
            (
                F.lit(1)
                + F.when(col("t2").isNull(), 0).otherwise(1)
                + F.when(col("t3").isNull(), 0).otherwise(1)
            )
            .cast("bigint")
            .alias("stage_depth"),
        )
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank over the word co-occurrence graph)
# ---------------------------------------------------------------------------

TR_ITERS = 3
TR_DAMP = 85  # percent, exact integer arithmetic (operators/graph.py)
TR_MIN_COUNT = 30  # vocabulary corpus-count cutoff bounds the graph
TR_TOPK = 25


def _textrank_oracle() -> str:
    """The pagerank unroll (queries/analytics.py _pagerank_oracle)
    replayed over the ADJACENT-WORD co-occurrence graph instead of
    the trade graph — VARCHAR node keys, same exact integer update."""
    from iot_sparkstreaming_spark.operators.graph import PR_SCALE

    base = PR_SCALE * (100 - TR_DAMP) // 100
    sql = f"""
WITH toks AS (
  SELECT regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
uni AS (SELECT unnest(tk) AS t FROM toks),
vocab AS (
  SELECT t FROM uni GROUP BY t HAVING COUNT(*) >= {TR_MIN_COUNT}
),
bg AS (
  SELECT
    unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i])) AS w1,
    unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i + 1])) AS w2
  FROM toks WHERE len(tk) >= 2
),
dpairs AS (
  SELECT DISTINCT w1, w2 FROM (
    SELECT w1, w2 FROM bg WHERE w1 <> w2
    UNION ALL
    SELECT w2 AS w1, w1 AS w2 FROM bg WHERE w1 <> w2
  )
),
edges AS (
  SELECT p.w1 AS a, p.w2 AS b
  FROM dpairs p
  JOIN vocab va ON va.t = p.w1
  JOIN vocab vb ON vb.t = p.w2
),
outdeg AS (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
ed AS (SELECT e.a, e.b, o.deg FROM edges e JOIN outdeg o ON e.a = o.a),
nodes AS (SELECT DISTINCT a AS node FROM edges),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS pr FROM nodes)"""
    for i in range(1, TR_ITERS + 1):
        sql += f""",
r{i} AS (
  SELECT n.node,
    CAST({base} + ({TR_DAMP} * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT ed.b AS node, SUM(r.pr // ed.deg) AS s
    FROM ed JOIN r{i - 1} r ON ed.a = r.node
    GROUP BY ed.b
  ) c ON n.node = c.node
)"""
    sql += f"""
SELECT node AS word, pr FROM r{TR_ITERS}
ORDER BY pr DESC, word ASC LIMIT {TR_TOPK}
"""
    return sql


@register("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keywords by TEXTRANK (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — an undirected edge per
    DISTINCT adjacent word pair, vocabulary bounded by corpus count ≥
    {TR_MIN_COUNT} — then the top-{TR_TOPK} words by rank. The
    graph×text crossover: the trade-graph PageRank operator
    (operators/graph.py, exact fixed-point integer ranks) re-applied
    unchanged to VARCHAR word nodes, which is the point — the
    iterative operator is key-type-generic, and the oracle replays
    the identical unrolled update over the identical word edges, so
    the two graph instantiations share one proven kernel.

    Unlike frequency top-k (`ngram_topk_corpus`) or tf-idf
    (`tfidf_top_terms`), TextRank scores a word by the rank of its
    NEIGHBORS — a hub word adjacent to many other hub words wins even
    at moderate frequency; this is the standard unsupervised
    keyword-extraction baseline.

    Scale shape: adjacency pairs are one map-side explode (zip_with
    of the token array against its own tail — no self-join), the
    DISTINCT collapses them to the edge set, the vocabulary cutoff
    bounds the graph size independent of corpus size, and each
    PageRank round is one join + one aggregate on the cached
    partitioned edge list. Result memoized to the artifact store like
    every iterative-algorithm product.
    """
    from iot_sparkstreaming_spark.artifacts import artifact_memo
    from iot_sparkstreaming_spark.operators.graph import pagerank

    def build():
        docs = load_table(spark, sf_dir, "documents")
        tk = docs.select(tokens(col("text")).alias("tk"))
        vocab = (
            tk.select(F.explode(col("tk")).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .filter(col("c") >= TR_MIN_COUNT)
            .select("t")
        )
        m = F.size(col("tk")) - 1
        bg = (
            tk.filter(F.size(col("tk")) >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(col("tk"), 1, m),
                        F.slice(col("tk"), 2, m),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    )
                ).alias("p")
            )
            .select(col("p.w1").alias("w1"), col("p.w2").alias("w2"))
            .filter(col("w1") != col("w2"))
        )
        dpairs = bg.union(
            bg.select(col("w2").alias("w1"), col("w1").alias("w2"))
        ).distinct()
        edges = dpairs.join(
            vocab.withColumnRenamed("t", "w1"), "w1"
        ).join(vocab.withColumnRenamed("t", "w2"), "w2")
        ranked = pagerank(
            edges, iterations=TR_ITERS, damping_pct=TR_DAMP, src="w1", dst="w2"
        )
        return (
            ranked.orderBy(col("pr").desc(), col("node").asc())
            .limit(TR_TOPK)
            .select(col("node").alias("word"), "pr")
        )

    return artifact_memo(spark, ("textrank_keywords", sf_dir), build)


textrank_keywords.__doc__ = textrank_keywords.__doc__.replace(
    "{TR_MIN_COUNT}", str(TR_MIN_COUNT)
).replace("{TR_TOPK}", str(TR_TOPK))


# ---------------------------------------------------------------------------
# First-occurrence n-gram novelty per document
# ---------------------------------------------------------------------------

NOVELTY_K = 5  # shingle width for the novelty fingerprint


DOC_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, len(tk) - {NOVELTY_K} + 1),
      i -> array_to_string(tk[i:i + {NOVELTY_K} - 1], ' '))) AS gram
  FROM toks WHERE len(tk) >= {NOVELTY_K}
),
owner AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram)
SELECT g.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN o.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  CAST(SUM(CASE WHEN o.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
FROM grams g JOIN owner o ON o.gram = g.gram
GROUP BY g.doc_id
"""


@register("doc_novelty_ratio", oracle=DOC_NOVELTY_ORACLE)
def doc_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CONTENT NOVELTY: the fraction of a document's
    distinct {NOVELTY_K}-gram shingles whose FIRST corpus occurrence
    (min doc_id — ingest order) is the document itself — the
    curation signal between exact dedup and near-dup detection: a doc
    can evade every duplicate detector yet contribute almost nothing
    new (novelty → 0, boilerplate/recombination), and ordered-corpus
    novelty is how training pipelines decide whether late crawl
    batches still add content.

    Scale shape: shingling is map-only; the distinct and the
    first-owner aggregate are hash aggregates on the gram key with
    map-side combine. A gram is novel for exactly the doc that is its
    min-owner, so n_novel(doc) = COUNT of owner rows grouped by
    first_doc — the ownership JOIN back on the gram key (a third
    full-width pass shuffling every string gram) collapses into two
    doc-keyed aggregates and one doc-sized join. The wide string-gram
    key crosses the wire twice (distinct, owner), never three times.
    Documents shorter than {NOVELTY_K} tokens have no grams and no
    row, identically on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.explode(
                word_shingles(tokens(col("text")), NOVELTY_K)
            ).alias("gram"),
        )
        .distinct()
    )
    per_doc = grams.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_grams"))
    owner = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel_counts = owner.groupBy(col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("n_novel")
    )
    return (
        per_doc.join(novel_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(col("n_novel"), F.lit(0).cast("bigint")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (col("n_novel").cast("double") / col("n_grams").cast("double")).alias(
                "novelty_ratio"
            ),
        )
    )


doc_novelty_ratio.__doc__ = doc_novelty_ratio.__doc__.replace(
    "{NOVELTY_K}", str(NOVELTY_K)
)


NOVELTY_BATCH_MOD = 10  # doc_id % 10 == 0 is "today's" batch


DOC_NOVELTY_INCR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, len(tk) - {NOVELTY_K} + 1),
      i -> array_to_string(tk[i:i + {NOVELTY_K} - 1], ' '))) AS gram
  FROM toks WHERE len(tk) >= {NOVELTY_K}
),
hist AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM grams
  WHERE doc_id % {NOVELTY_BATCH_MOD} <> 0 GROUP BY gram
),
batch AS (SELECT doc_id, gram FROM grams WHERE doc_id % {NOVELTY_BATCH_MOD} = 0)
SELECT b.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  CAST(SUM(CASE WHEN h.gram IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
FROM batch b LEFT JOIN hist h ON h.gram = b.gram
GROUP BY b.doc_id
"""


@register("doc_novelty_incremental", oracle=DOC_NOVELTY_INCR_ORACLE)
def doc_novelty_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL novelty: today's batch (doc_id % {MOD} == 0)
    scored against the HISTORICAL corpus's persisted gram-owner index
    — the daily-ingest posture of `doc_novelty_ratio`, completing the
    incremental trilogy (`dedup_incremental_minhash` for near-dup,
    `ann_incremental_assign` for vectors, this for content novelty):
    the decision "does today's crawl still add content?" must not
    cost a full-corpus re-shingle every day.

    Scale shape: the historical gram index ``(gram, first_doc)`` is
    the memoized build-once artifact (in production: the table each
    accepted batch is appended to); daily cost is |batch| shingling
    (map-only) + one equi-join of batch grams against the index on
    the gram key — independent of corpus re-processing. The left
    join keeps all-novel batch docs (no index hit) in the report;
    the oracle replays the full derivation, so the hash proves the
    incremental path ≡ recompute.
    """
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    docs = load_table(spark, sf_dir, "documents")
    is_batch = col("doc_id") % NOVELTY_BATCH_MOD == 0

    def grams_of(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(word_shingles(tokens(col("text")), NOVELTY_K)).alias(
                "gram"
            ),
        ).distinct()

    def build_index() -> DataFrame:
        # the doc scan and batch split derive INSIDE the builder
        # (fingerprint discipline: closure-captured frames/Columns are
        # invisible to the store's code hash; deriving here pins
        # NOVELTY_BATCH_MOD and the load path into the token)
        hist = load_table(spark, sf_dir, "documents").filter(
            ~(col("doc_id") % NOVELTY_BATCH_MOD == 0)
        )
        return (
            grams_of(hist)
            .groupBy("gram")
            .agg(F.min("doc_id").alias("first_doc"))
        )

    hist = artifact_memo(spark, ("novelty_gram_index", sf_dir), build_index)
    batch = grams_of(docs.filter(is_batch))
    novel = col("first_doc").isNull().cast("long")
    return (
        batch.join(hist, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (
                col("n_novel").cast("double") / col("n_grams").cast("double")
            ).alias("novelty_ratio"),
        )
    )


doc_novelty_incremental.__doc__ = doc_novelty_incremental.__doc__.replace(
    "{MOD}", str(NOVELTY_BATCH_MOD)
)


# ---------------------------------------------------------------------------
# Funnel-dropout audience (anti-join: browsed but never bought)
# ---------------------------------------------------------------------------

DROPOUT_ORACLE = """
SELECT v.user_id,
  CAST(COUNT(*) AS BIGINT) AS n_views,
  CAST(epoch_ms(MIN(v.ts)) AS BIGINT) AS first_view_ms,
  CAST(epoch_ms(MAX(v.ts)) AS BIGINT) AS last_view_ms
FROM events v
WHERE v.event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
  )
GROUP BY v.user_id
"""


@register("viewers_without_purchase", oracle=DROPOUT_ORACLE)
def viewers_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROPOUT AUDIENCE: users who viewed but NEVER purchased — the
    retargeting segment every funnel report feeds, and the registry's
    explicit LEFT ANTI join showcase (``funnel_analysis`` counts the
    stage conversions; this materializes the non-converting cohort
    with its engagement stats). Each survivor carries view count and
    first/last view epoch-millis.

    Scale shape: BOTH sides pre-aggregate to one row per user before
    the anti join — views roll up map-side behind the pushed
    event_type filter, the purchaser key set is DISTINCT user_ids of
    one filtered scan — so the anti join shuffles two deduplicated
    key-sized tables, never raw events. At 100 TB the purchaser set is
    the small side (conversion < 100%); AQE can broadcast it into a
    null-free anti join. The oracle's NOT EXISTS is the same left-anti
    semi-plan decorrelated.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_views"),
            F.unix_millis(F.min("ts")).cast("bigint").alias("first_view_ms"),
            F.unix_millis(F.max("ts")).cast("bigint").alias("last_view_ms"),
        )
    )
    buyers = ev.filter(col("event_type") == "purchase").select("user_id").distinct()
    return views.join(buyers, "user_id", "left_anti")


# ---------------------------------------------------------------------------
# Audience overlap: pairwise Jaccard between event-type user bases
# ---------------------------------------------------------------------------

AUDIENCE_OVERLAP_ORACLE = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_inter
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b,
  CAST(sa.n AS BIGINT) AS n_a,
  CAST(sb.n AS BIGINT) AS n_b,
  CAST(n_inter AS BIGINT) AS n_inter,
  CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
  CAST((n_inter * 1000000) // (sa.n + sb.n - n_inter) AS BIGINT) AS jaccard_e6
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""


@register("audience_overlap_jaccard", oracle=AUDIENCE_OVERLAP_ORACLE)
def audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP MATRIX: exact pairwise Jaccard similarity
    between the distinct-user bases of every event-type pair — the
    set-similarity complement of `funnel_analysis` (ordered stages)
    and `retention_cohorts` (time-sliced return): which behaviors
    share an audience AT ALL, the first question before building a
    funnel between them. This is exact Jaccard over SETS OF USERS,
    where the dedup family's MinHash estimates Jaccard over sets of
    shingles — same measure, opposite accuracy/scale trade, and at
    |types| small the exact form is the right one.

    Plan: distinct (type, user) pairs once; the intersection
    self-join keys on user_id, so per-user work is C(k,2) with k
    bounded by |event types| — never all-pairs of users. Sizes table
    is |types| rows, broadcast into the final enrich. Jaccard is one
    exact integer floor-division (1e6-scaled); inter*1e6 is inside
    int64 to ~9e12 shared users.

    Scale shape: two shuffles (the distinct, the user-keyed
    self-join group), both map-side combined; output is C(|types|,2)
    rows. At 100 TB with a type catalog in the thousands the same
    plan holds because the per-user explosion is still k^2, not n^2.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    tu = ev.distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.select(col("event_type").alias("type_a"), "user_id")
    b = tu.select(col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, ["user_id"])
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(col("event_type").alias("type_a"), col("n").alias("n_a"))
    sb = sizes.select(col("event_type").alias("type_b"), col("n").alias("n_b"))
    return (
        inter.join(broadcast(sa), "type_a")
        .join(broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            col("n_a").cast("bigint").alias("n_a"),
            col("n_b").cast("bigint").alias("n_b"),
            col("n_inter").cast("bigint").alias("n_inter"),
            (col("n_a") + col("n_b") - col("n_inter"))
            .cast("bigint")
            .alias("n_union"),
            F.expr(
                "CAST((n_inter * 1000000) div (n_a + n_b - n_inter) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
    )
