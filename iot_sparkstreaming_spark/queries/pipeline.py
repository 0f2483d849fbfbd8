"""Training-data pipeline operators over ``documents``: benchmark
contamination check, stratified deterministic sampling, and
context-window chunking.

These extend the LLM-pipeline families (dedup / similarity / text)
with the remaining ops a corpus-preparation pipeline runs between
"raw documents" and "training batches". All plan shapes are the ones
that survive 100 TB: inverted-index joins on n-gram keys (never
all-pairs), hash-derived pure-function assignments (never RNG), and
explode-based chunking (never per-row Python).

Everything is oracle-checked bitwise against DuckDB; split/sample
membership is a pure function of ids via md5, so both engines agree
exactly (same construction as queries/text.py train_test_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table

# ---------------------------------------------------------------------------
# Benchmark contamination: test-split n-grams appearing in train docs
# ---------------------------------------------------------------------------

CONTAM_N = 5  # word n-gram width

#: doc_id-hash bucket, identical to text.py train_test_split
_BUCKET_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10"

CONTAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_BUCKET_SQL} AS bucket,
    list_distinct(list_transform(generate_series(1, len(tk)-{CONTAM_N - 1}),
                  i -> array_to_string(tk[i:i+{CONTAM_N - 1}], ' '))) AS grams
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
        FROM documents)
  WHERE len(tk) >= {CONTAM_N}
),
test_grams AS (
  SELECT doc_id, unnest(grams) AS g FROM sh WHERE bucket >= 9
),
train_grams AS (
  SELECT DISTINCT unnest(grams) AS g FROM sh WHERE bucket < 8
)
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS contamination_rate
FROM test_grams t LEFT JOIN train_grams tr ON t.g = tr.g
GROUP BY t.doc_id
"""


@register("contamination_ngram_overlap", oracle=CONTAM_ORACLE)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination report: for every TEST-split document,
    the fraction of its distinct 5-gram shingles that occur
    anywhere in the TRAIN split — the canonical pre-release eval-leak
    check (the split is the same doc_id-hash bucketing as
    ``train_test_split``, so membership needs no stored table).

    Plan shape: one tokenize+shingle pass over the corpus, split into
    the two sides BY FILTER on the hash bucket (no second scan); the
    overlap is an inverted-index LEFT join on the gram key — test-side
    grams against the distinct train-gram set — never a doc×doc
    comparison. Shuffles: gram-keyed join + doc-keyed final count.
    At 100 TB the train-gram set is the big side; it arrives
    pre-distinct (one hash agg) so the join carries each gram once.
    """
    from iot_sparkstreaming_spark.artifacts import artifact_memo

    def build_grams():
        docs = load_table(spark, sf_dir, "documents")
        tk = docs.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(F.lower(col("text")), F.lit("([a-z0-9]+)"), 1)
            ).alias("pos", "tok"),
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        lead_cols = [F.lead("tok", i).over(w) for i in range(1, CONTAM_N)]
        g = (
            tk.select(
                "doc_id",
                F.concat_ws(" ", col("tok"), *lead_cols).alias("g"),
                lead_cols[-1].isNotNull().alias("full_width"),
            )
            .filter(col("full_width"))
            .select("doc_id", "g")
            .distinct()
        )
        bucket = (
            F.conv(F.substring(F.md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 10
        )
        return g.withColumn("bucket", bucket)

    grams = artifact_memo(spark, ("contamination_grams", sf_dir), build_grams)
    test_grams = grams.filter(col("bucket") >= 9).select("doc_id", "g")
    train_grams = grams.filter(col("bucket") < 8).select("g").distinct()
    hit = train_grams.withColumn("__hit", F.lit(1))
    return (
        test_grams.join(hit, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
            (
                F.coalesce(F.sum("__hit"), F.lit(0)).cast("double") / F.count("*")
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified deterministic sampling (per-stratum rates, no RNG)
# ---------------------------------------------------------------------------

#: per-source sampling percentage: heavier draw from even-numbered
#: sources — demonstrates per-stratum rates as data, not code
SAMPLE_PCT_EVEN = 50
SAMPLE_PCT_ODD = 10

SAMPLE_ORACLE = f"""
WITH tagged AS (
  SELECT source,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8))::BIGINT
      % 100 AS ticket,
    CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
         THEN {SAMPLE_PCT_EVEN} ELSE {SAMPLE_PCT_ODD} END AS pct,
    doc_id
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN ticket < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
  MIN(CASE WHEN ticket < pct THEN doc_id END) AS min_sampled_doc_id
FROM tagged
GROUP BY source
"""


@register("stratified_sample_by_source", oracle=SAMPLE_ORACLE)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with PER-STRATUM rates (50% from even
    sources, 10% from odd), membership decided by a hash of
    (doc_id, stratum) — reproducible across reruns, engines, and
    partitionings, unlike ``df.sample`` whose draw depends on
    partition layout and seed plumbing. The (id, stratum) salt means
    a document appearing under two sources draws independent tickets.

    Plan: map-only ticket assignment; the only shuffle is the
    per-stratum count aggregate. At 100 TB the sampled SUBSET (filter
    ``ticket < pct``) feeds downstream stages scan-pruned; this query
    reports the per-stratum accounting that validates the draw.
    """
    docs = load_table(spark, sf_dir, "documents")
    ticket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", col("doc_id").cast("string"), col("source"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    pct = (
        F.when(
            F.substring(col("source"), 4, 10).cast("bigint") % 2 == 0,
            F.lit(SAMPLE_PCT_EVEN),
        ).otherwise(F.lit(SAMPLE_PCT_ODD))
    )
    return (
        docs.select("source", ticket.alias("ticket"), pct.alias("pct"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(col("ticket") < col("pct"), 1)).alias("n_sampled"),
            F.min(F.when(col("ticket") < col("pct"), col("doc_id"))).alias(
                "min_sampled_doc_id"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Context-window chunking (fixed token windows with overlap)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40

CHUNK_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id,
    CAST(c AS BIGINT) AS chunk_id,
    toks[c*{CHUNK_STRIDE}+1 : c*{CHUNK_STRIDE}+{CHUNK_TOKENS}] AS win
  FROM tk,
    (SELECT unnest(generate_series(0, 1000)) AS c)
  WHERE c*{CHUNK_STRIDE} < len(toks)
)
SELECT doc_id, chunk_id,
  CAST(len(win) AS BIGINT) AS n_tokens,
  win[1] AS first_token,
  win[len(win)] AS last_token
FROM chunks
"""


@register("chunk_documents", oracle=CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document becomes overlapping
    50-token windows advancing by 40 (10-token
    overlap carries context across boundaries) — the step that turns
    cleaned documents into model-sized training sequences.

    Plan: tokenize once per doc, then ``explode(sequence(...))`` over
    the chunk indices and ``slice`` the token array per chunk — all
    inside codegen, no Python, no shuffle at all until whatever
    aggregation consumes the chunks (this query emits the chunk
    manifest; the text payload would ride along in production).
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = (
        docs.select(
            "doc_id",
            F.regexp_extract_all(F.lower(col("text")), F.lit("([a-z0-9]+)"), 1).alias(
                "toks"
            ),
        )
        .withColumn("n_doc_tokens", F.size("toks"))
        # token-less docs yield no chunks; also guards sequence(), whose
        # (0, n-1) form would infer a NEGATIVE step when n_chunks == 0
        .filter(col("n_doc_tokens") > 0)
    )
    n_chunks = F.ceil(col("n_doc_tokens").cast("double") / CHUNK_STRIDE).cast("bigint")
    chunks = tk.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    ).filter(col("chunk_id") * CHUNK_STRIDE < F.size("toks"))
    win = F.slice(col("toks"), col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    return chunks.select(
        "doc_id",
        col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(win).cast("bigint").alias("n_tokens"),
        F.element_at(win, 1).alias("first_token"),
        F.element_at(win, F.size(win)).alias("last_token"),
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (concat-and-chunk across documents)
# ---------------------------------------------------------------------------

PACK_BUDGET = 256  # tokens per training pack
PACK_WORKERS = 8  # independent packing streams (hash-sharded)

PACK_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {PACK_WORKERS}
      AS shard,
    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM tk WHERE n_tokens > 0
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
  CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS first_pack,
  CAST((cum_before + n_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS last_pack,
  CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS offset_in_pack
FROM cum
"""


@register("pack_token_sequences", oracle=PACK_ORACLE)
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate each shard's token stream and cut
    it into fixed 256-token packs — the step that turns
    variable-length documents into dense training sequences (documents
    straddling a boundary span ``first_pack..last_pack``; the trainer
    splits them at the boundary, GPT-style concat-and-chunk).

    Packing is sequential by nature, so the distributed form shards
    the corpus into 8 independent streams by doc_id hash
    — exactly how a multi-worker packer runs — and packs each stream
    by a running token total. Determinism: shard assignment is an md5
    hash of doc_id (engine-portable) and in-shard order is doc_id, so
    the layout is a pure function of the corpus, reproducible across
    reruns and engines (the oracle replays it bitwise).

    Plan: one tokenize+count pass (map-only), one shuffle on the
    shard key, one running-sum window per shard. At 100 TB, shard
    count scales with the cluster (it is the parallelism knob), and
    the window carries only (doc_id, n_tokens) — the text itself never
    shuffles; production would join the layout back to payloads by
    doc_id at write time.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % PACK_WORKERS
    )
    tk = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(
            F.regexp_extract_all(F.lower(col("text")), F.lit("([a-z0-9]+)"), 1)
        ).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - col("n_tokens")).alias("cum_before")
    # zero-token docs are dropped AFTER the window, not before: they
    # add 0 to the running sum so the layout is identical, and a
    # pre-window filter would be pushed below the projection,
    # re-inlining the tokenize regex to run twice per row (the
    # expression-inlining trap — see dedup.py's explode-first note).
    cum = tk.select("doc_id", "shard", "n_tokens", cum_before).filter(
        col("n_tokens") > 0
    )
    return cum.select(
        "doc_id",
        col("shard").cast("bigint").alias("shard"),
        "n_tokens",
        F.floor(col("cum_before") / PACK_BUDGET).cast("bigint").alias("first_pack"),
        F.floor((col("cum_before") + col("n_tokens") - 1) / PACK_BUDGET)
        .cast("bigint")
        .alias("last_pack"),
        (col("cum_before") % PACK_BUDGET).cast("bigint").alias("offset_in_pack"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus build (the composed flagship pipeline)
# ---------------------------------------------------------------------------

CB_MIN_TOKENS = 25
CB_MAX_TOP_FRAC = 0.15  # Gopher-style repetition cutoff
CB_SAMPLE_PCT = 80

CORPUS_BUILD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, text,
    regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
flags AS (
  SELECT doc_id, source, text, len(tk) AS n_tokens,
    len(tk) >= {CB_MIN_TOKENS} AND
    CAST(list_max(list_transform(list_distinct(tk),
         d -> len(list_filter(tk, t -> t = d)))) AS DOUBLE) / len(tk)
      <= {CB_MAX_TOP_FRAC} AS q_ok
  FROM toks WHERE len(tk) > 0
),
keepers AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keep_id
  FROM flags WHERE q_ok GROUP BY md5(text)
),
staged AS (
  SELECT f.doc_id, f.source, f.n_tokens, f.q_ok,
    f.q_ok AND f.doc_id IN (SELECT keep_id FROM keepers) AS canonical,
    ('0x' || substr(md5(CAST(f.doc_id AS VARCHAR) || ':' || f.source), 1, 8))::BIGINT
      % 100 < {CB_SAMPLE_PCT} AS ticket_ok
  FROM flags f
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(COUNT(*) FILTER (WHERE q_ok) AS BIGINT) AS n_quality,
  CAST(COUNT(*) FILTER (WHERE canonical) AS BIGINT) AS n_canonical,
  CAST(COUNT(*) FILTER (WHERE canonical AND ticket_ok) AS BIGINT) AS n_sampled,
  CAST(SUM(n_tokens) FILTER (WHERE canonical AND ticket_ok) AS BIGINT)
    AS sampled_tokens,
  MIN(CASE WHEN canonical AND ticket_ok THEN doc_id END) AS min_sampled_doc_id
FROM staged
GROUP BY source
"""


@register("corpus_build_pipeline", oracle=CORPUS_BUILD_ORACLE)
def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus build — quality screen (length +
    repetition), exact dedup (canonical copy per content hash), and
    deterministic hash sampling — in ONE query, with per-source
    accounting of every stage's survivor count. This is the
    end-to-end shape the individual operators exist for; running it
    as one plan lets Catalyst fuse the map-side stages (tokenize,
    quality flags, ticket) into a single scan pass.

    Scale: the only shuffles are (a) the content-hash groupBy for
    canonical selection (16-byte keys), (b) the keeper-id semi join
    (AQE broadcasts it when the survivor set is small relative to the
    corpus), (c) the final per-source rollup. Text leaves the scan
    stage only as md5; the quality/ticket flags are map-only.
    Determinism: sampling is a hash ticket on (doc_id, source) — no
    RNG, reproducible across engines and partitionings.

    Fixture note: sf0.01 contains no exact-duplicate texts, so the
    dedup stage's attrition shows from sf0.1 up (8 duplicate groups);
    the quality and sampling stages attrit at every SF.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        "source",
        "text",
        F.regexp_extract_all(F.lower(col("text")), F.lit("([a-z0-9]+)"), 1).alias(
            "tk"
        ),
    ).filter(F.size("tk") > 0)
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(col("tk")),
                lambda d: F.size(F.filter(col("tk"), lambda t: t == d)),
            )
        ).cast("double")
        / F.size("tk")
    )
    flags = tk.select(
        "doc_id",
        "source",
        "text",
        F.size("tk").cast("bigint").alias("n_tokens"),
        (
            (F.size("tk") >= CB_MIN_TOKENS) & (top_frac <= CB_MAX_TOP_FRAC)
        ).alias("q_ok"),
    )
    keepers = (
        flags.filter(col("q_ok"))
        .groupBy(F.md5(col("text")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    ticket_ok = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", col("doc_id").cast("string"), col("source"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        < CB_SAMPLE_PCT
    )
    staged = (
        flags.join(
            keepers.withColumn("is_keeper", F.lit(True)),
            flags.doc_id == keepers.keep_id,
            "left",
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "q_ok",
            (col("q_ok") & F.coalesce(col("is_keeper"), F.lit(False))).alias(
                "canonical"
            ),
            ticket_ok.alias("ticket_ok"),
        )
    )
    return staged.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.count(F.when(col("q_ok"), 1)).cast("bigint").alias("n_quality"),
        F.count(F.when(col("canonical"), 1)).cast("bigint").alias("n_canonical"),
        F.count(F.when(col("canonical") & col("ticket_ok"), 1))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum(F.when(col("canonical") & col("ticket_ok"), col("n_tokens")))
        .cast("bigint")
        .alias("sampled_tokens"),
        F.min(F.when(col("canonical") & col("ticket_ok"), col("doc_id"))).alias(
            "min_sampled_doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# BPE trainer (iterative merge loop — the tokenizer-training operator)
# ---------------------------------------------------------------------------

BPE_MERGES = 5


def _bpe_round_sql(r: int) -> str:
    """One unrolled BPE round: pair counts → deterministic argmax →
    greedy left-to-right merge via run-parity (see bpe_train_merges)."""
    w = "PARTITION BY doc_id ORDER BY pos"
    return f""",
p{r} AS (SELECT doc_id, pos, tok, LEAD(tok) OVER ({w}) AS nxt FROM s{r}),
top{r} AS (
  SELECT tok AS p1, nxt AS p2, COUNT(*) AS n
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY tok, nxt ORDER BY n DESC, p1, p2 LIMIT 1
),
m{r} AS (
  SELECT q.doc_id, q.pos, q.tok, q.nxt,
    q.tok = t.p1 AND q.nxt IS NOT DISTINCT FROM t.p2 AS mt
  FROM p{r} q CROSS JOIN top{r} t
),
h{r} AS (
  SELECT *, CASE WHEN mt AND NOT COALESCE(LAG(mt) OVER ({w}), FALSE)
            THEN 1 ELSE 0 END AS head
  FROM m{r}
),
g{r} AS (
  SELECT *, SUM(head) OVER ({w} ROWS UNBOUNDED PRECEDING) AS grp
  FROM h{r}
),
o{r} AS (
  SELECT *, CASE WHEN mt THEN ROW_NUMBER() OVER
      (PARTITION BY doc_id, grp, mt ORDER BY pos) END AS rk
  FROM g{r}
),
mg{r} AS (
  SELECT *, mt AND rk % 2 = 1 AS mrg FROM o{r}
),
s{r + 1} AS (
  SELECT doc_id,
    ROW_NUMBER() OVER ({w}) AS pos,
    CASE WHEN mrg THEN tok || ' ' || nxt ELSE tok END AS tok
  FROM (SELECT *, COALESCE(LAG(mrg) OVER ({w}), FALSE) AS consumed FROM mg{r})
  WHERE NOT consumed
)"""


def _bpe_oracle() -> str:
    sql = """
WITH s0 AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok
  FROM documents,
    LATERAL (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok,
             generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
               AS pos) u
  WHERE doc_id < 100
)"""
    for r in range(BPE_MERGES):
        sql += _bpe_round_sql(r)
    selects = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS step, p1, p2, CAST(n AS BIGINT) AS n_occurrences FROM top{r}"
        for r in range(BPE_MERGES)
    )
    return sql + "\n" + selects


@register("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, distributed: 5 merge rounds, each (a)
    counting adjacent token pairs corpus-wide, (b) picking the most
    frequent pair (deterministic tie-break: count desc, pair asc),
    (c) merging its occurrences greedily left-to-right. Returns the
    merge table (step, p1, p2, n_occurrences) — the artifact a BPE
    trainer ships.

    The greedy merge is a sequential recurrence (merge[i] = match[i]
    ∧ ¬merge[i-1]) that windows can't express directly; the
    run-parity identity closes it: within each maximal run of
    consecutive match positions, exactly the odd-ranked ones merge
    ("a a a a" → "(a a)(a a)"). Both engines replay that identity —
    the oracle unrolls all 5 rounds into plain CTEs (same trick as
    the PageRank oracle).

    Scale: state is (doc_id, pos, tok), hash-partitioned by doc_id;
    every window in a round is per-document, so ONE exchange
    partitions a round and the pair-count aggregate rides partial
    aggregation. The per-round driver action is the 1-row argmax
    (same class as the components convergence check); state is
    re-materialized per round (localCheckpoint) because the merge
    transform and next round's count both consume it. Restricted to
    doc_id < 100 to keep the fixture's oracle replay fast — the plan
    is corpus-size-agnostic.
    """
    from iot_sparkstreaming_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").filter(col("doc_id") < 100)
    state = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(
                    F.lower(col("text")), F.lit("([a-z0-9]+)"), 1
                )
            ).alias("pos0", "tok"),
        )
        .select("doc_id", (col("pos0") + 1).cast("bigint").alias("pos"), "tok")
        .repartition("doc_id")
        .localCheckpoint(eager=True)
    )
    merges = bpe_train(state, BPE_MERGES)
    return spark.createDataFrame(
        merges, "step INT, p1 STRING, p2 STRING, n_occurrences BIGINT"
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing (data-mixing allocation)
# ---------------------------------------------------------------------------

MIX_BUDGET = 100_000  # documents to draw across sources

MIX_ORACLE = f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, sqrt(n_docs) AS wt FROM c
),
t AS (
  SELECT list_reduce(
    list_prepend(CAST(0 AS DOUBLE),
      list_transform(list_sort(list(struct_pack(s := source, wt := wt))),
                     x -> x.wt)),
    (a, b) -> a + b) AS total
  FROM w
)
SELECT source,
  CAST(n_docs AS BIGINT) AS n_docs,
  wt,
  wt / total AS share,
  CAST(FLOOR(({MIX_BUDGET} * wt) / total) AS BIGINT) AS n_alloc
FROM w, t
"""


@register("temperature_mix_allocation", oracle=MIX_ORACLE)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing allocation with temperature T=2 (weight ∝ n^(1/2)):
    up-weights small sources relative to proportional sampling — the
    standard multi-source mixing step (multilingual/multi-domain
    corpus weighting) between per-source cleaning and batch assembly.

    Exactness without decimals: sqrt is IEEE-754 CORRECTLY ROUNDED
    (unlike pow/log, which vary by libm — temperature 1/2 is chosen
    so the weight is exact), and the global weight total is a
    left-to-right fold over the source-sorted weight array, so both
    engines add the same doubles in the same order. Shares and
    allocations are then single identical expressions.

    Scale: one groupBy over the corpus; the global fold runs on the
    ~|sources|-row aggregate collected to ONE row (constant
    cardinality — the broadcast-scalar pattern from TPC-H Q11), then
    broadcast back. No global sort of the corpus, no driver loop.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = c.select("source", "n_docs", F.sqrt(col("n_docs")).alias("wt"))
    total = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "wt"))),
                lambda x: x["wt"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("total")
    )
    from pyspark.sql.functions import broadcast

    return w.crossJoin(broadcast(total)).select(
        "source",
        col("n_docs").cast("bigint").alias("n_docs"),
        "wt",
        (col("wt") / col("total")).alias("share"),
        F.floor((MIX_BUDGET * col("wt")) / col("total")).cast("bigint").alias(
            "n_alloc"
        ),
    )


# ---------------------------------------------------------------------------
# Global contiguous ID assignment (two-phase, no global sort)
# ---------------------------------------------------------------------------

ID_BUCKET_W = 1024  # doc_ids per range bucket

GLOBAL_ID_ORACLE = """
SELECT doc_id, source,
  CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS global_id
FROM documents
"""


@register("assign_global_ids", oracle=GLOBAL_ID_ORACLE)
def assign_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global ids 0..n-1 ordered by (source, doc_id) —
    the "stable sample index" every sharded training run needs —
    WITHOUT the single-partition global window a naive
    ``ROW_NUMBER() OVER (ORDER BY ...)`` plans.

    Two-phase (the zipWithIndex idea, done declaratively):
    1. range-bucket rows by ``floor(doc_id / 1024)`` — floor division
       preserves doc_id order across buckets, so (source, bucket) is
       a prefix of the global order;
    2. count rows per (source, bucket) — a ~n/1024-row aggregate —
       and prefix-sum those counts into bucket offsets;
    3. join offsets back on (source, bucket) and add the
       within-bucket rank (window bounded to ≤1024 rows).

    Only the TINY offsets table pays an ordered cumsum (single
    partition of n/1024 aggregate rows; recurse the same two-phase
    trick on the offsets table if even that outgrows one task). The
    corpus itself sees one hash shuffle on (source, bucket) and
    bounded windows — no global sort, no driver collect. Oracle is
    the naive global ROW_NUMBER, proving the decomposition exact.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    b = docs.withColumn("bkt", F.floor(col("doc_id") / ID_BUCKET_W))
    counts = b.groupBy("source", "bkt").agg(F.count("*").alias("n"))
    offs = counts.select(
        "source",
        "bkt",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("source", "bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("off"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source", "bkt").orderBy("doc_id")
    )
    return (
        b.join(offs, ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            (col("off") + rk - 1).cast("bigint").alias("global_id"),
        )
    )


# ---------------------------------------------------------------------------
# BPE ENCODE: tokenize the corpus with a fixed (shipped) merge table
# ---------------------------------------------------------------------------

#: the tokenizer artifact — ranked merge list; step 3 consumes step
#: 1's output token, so table ORDER is semantically load-bearing
BPE_MERGE_TABLE: list[tuple[str, str]] = [
    ("table", "hash"),
    ("part", "filter"),
    ("table hash", "agg"),
    ("slow", "key"),
    ("merge", "group"),
]


def _bpe_apply_round_sql(r: int, p1: str, p2: str) -> str:
    """One unrolled ENCODE round: literal merge pair instead of the
    trained argmax; otherwise identical run-parity greedy merge."""
    w = "PARTITION BY doc_id ORDER BY pos"
    return f""",
p{r} AS (SELECT doc_id, pos, tok, LEAD(tok) OVER ({w}) AS nxt FROM s{r}),
m{r} AS (
  SELECT doc_id, pos, tok, nxt,
    tok = '{p1}' AND nxt IS NOT DISTINCT FROM '{p2}' AS mt
  FROM p{r}
),
h{r} AS (
  SELECT *, CASE WHEN mt AND NOT COALESCE(LAG(mt) OVER ({w}), FALSE)
            THEN 1 ELSE 0 END AS head
  FROM m{r}
),
g{r} AS (
  SELECT *, SUM(head) OVER ({w} ROWS UNBOUNDED PRECEDING) AS grp
  FROM h{r}
),
o{r} AS (
  SELECT *, CASE WHEN mt THEN ROW_NUMBER() OVER
      (PARTITION BY doc_id, grp, mt ORDER BY pos) END AS rk
  FROM g{r}
),
mg{r} AS (
  SELECT *, mt AND rk % 2 = 1 AS mrg FROM o{r}
),
s{r + 1} AS (
  SELECT doc_id,
    ROW_NUMBER() OVER ({w}) AS pos,
    CASE WHEN mrg THEN tok || ' ' || nxt ELSE tok END AS tok
  FROM (SELECT *, COALESCE(LAG(mrg) OVER ({w}), FALSE) AS consumed FROM mg{r})
  WHERE NOT consumed
)"""


def _bpe_encode_oracle() -> str:
    sql = """
WITH s0 AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok
  FROM documents,
    LATERAL (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok,
             generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
               AS pos) u
)"""
    for r, (p1, p2) in enumerate(BPE_MERGE_TABLE):
        sql += _bpe_apply_round_sql(r, p1, p2)
    n = len(BPE_MERGE_TABLE)
    return sql + f"""
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN contains(tok, ' ') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_merged,
  STRING_AGG(tok, '|' ORDER BY pos) AS encoded
FROM s{n}
GROUP BY doc_id
"""


@register("bpe_encode_docs", oracle=_bpe_encode_oracle())
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION: encode every document with the
    fixed 5-entry merge table above (the artifact
    ``bpe_train_merges`` produces) — the inference half of the
    tokenizer lifecycle. Merge 3 consumes merge 1's output token, so
    the ranked-order replay is exercised, not just independent
    substitutions.

    Each round is per-document windows over (doc_id, pos) — one hash
    partitioning serves all rounds, rounds lazy-chain (no driver
    action), lineage checkpointed every 3 merges
    (operators/bpe.py:bpe_apply). The oracle unrolls the same rounds
    as plain CTEs with the merge pair as literals. Output: per-doc
    token count, merged-token count, and the full encoded sequence —
    a byte-exact cross-engine check of the entire encode.

    At 100 TB a production encoder would run the merge loop per-doc
    inside an Arrow batch (mapInPandas, merge table broadcast) —
    O(merges × corpus) window passes trade that for pure-JVM
    execution; both shapes shuffle the corpus once.
    """
    docs = load_table(spark, sf_dir, "documents")
    s0 = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("p", "tok"),
    ).select("doc_id", (col("p") + 1).cast("bigint").alias("pos"), "tok")

    from iot_sparkstreaming_spark.operators.bpe import bpe_apply

    final = bpe_apply(s0, BPE_MERGE_TABLE)
    return final.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.contains(col("tok"), F.lit(" ")).cast("int"))
        .cast("bigint")
        .alias("n_merged"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            "|",
        ).alias("encoded"),
    )


# ---------------------------------------------------------------------------
# Deterministic k-fold assignment (train/eval splits that replay)
# ---------------------------------------------------------------------------

CROSSFOLD_K = 5

CROSSFOLD_ORACLE = f"""
WITH assigned AS (
  SELECT source,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         % {CROSSFOLD_K} AS BIGINT) AS fold,
    n_chars
  FROM documents
),
agg AS (
  SELECT fold, source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM assigned GROUP BY fold, source
)
SELECT fold, source, n_docs, sum_chars,
  CAST(n_docs AS DOUBLE)
    / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE) AS fold_share
FROM agg
"""


@register("crossfold_assign_docs", oracle=CROSSFOLD_ORACLE)
def crossfold_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {CROSSFOLD_K}-fold cross-validation assignment
    over the corpus: every document lands in fold
    ``md5(doc_id)[:8] mod {CROSSFOLD_K}`` — a pure function of the
    STABLE id (the house md5-prefix pattern shared with
    priority/weighted sampling), so folds replay identically across
    runs, engines, and data re-partitions, never depending on row
    order or a seed table. The report is the fold × source balance
    sheet (doc count, char mass, within-source share) an eval
    pipeline checks before trusting a split.

    Scale shape: the assignment is map-only on the scan; one
    map-side-combined groupBy collapses 100 TB to
    {CROSSFOLD_K}·|sources| rows; the share window rides those rows.
    Training-side consumers filter ``fold != i`` map-only with no
    extra pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % CROSSFOLD_K
    )
    agg = docs.groupBy(
        fold.alias("fold"), "source"
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    ws = Window.partitionBy("source")
    return agg.select(
        "fold",
        "source",
        "n_docs",
        "sum_chars",
        (col("n_docs").cast("double") / F.sum("n_docs").over(ws).cast("double")).alias(
            "fold_share"
        ),
    )


crossfold_assign_docs.__doc__ = crossfold_assign_docs.__doc__.replace(
    "{CROSSFOLD_K}", str(CROSSFOLD_K)
)


# ---------------------------------------------------------------------------
# Curriculum ordering: shortest-first per source, round-robin interleaved
# ---------------------------------------------------------------------------

CURRICULUM_ORACLE = """
WITH src AS (
  SELECT source,
    ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
    COUNT(*) OVER () AS n_sources
  FROM (SELECT DISTINCT source FROM documents)
), ranked AS (
  SELECT doc_id, d.source, n_chars,
    ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY n_chars, doc_id)
      AS rank_in_source
  FROM documents d
)
SELECT doc_id, r.source,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(rank_in_source AS BIGINT) AS rank_in_source,
  CAST((rank_in_source - 1) * n_sources + src_idx AS BIGINT) AS global_pos
FROM ranked r JOIN src ON r.source = src.source
"""


@register("curriculum_interleave_docs", oracle=CURRICULUM_ORACLE)
def curriculum_interleave_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ORDERING for training: every document gets a total
    global training position that is (a) shortest-first WITHIN each
    source (the classic length-curriculum warmup) and (b) strict
    round-robin ACROSS sources, so no early training window is
    dominated by one domain — the deterministic ordering job that
    sits between `corpus_mix_rebalance` (how much of each source) and
    `pack_token_sequences` (how docs become batches). The closed form
    global_pos = (rank_in_source - 1) * n_sources + src_idx is a
    bijection into 0..N-1 whenever every source still has documents
    at that rank — no sort of the full corpus by a mixed key, no
    driver-side scheduling loop, and downstream shards are just
    global_pos div shard_size.

    All-integer plan; both row_numbers use total orders (length then
    doc_id), so every engine agrees on every position.

    Scale shape: one exchange on source carries the per-source rank;
    the source-index table is |sources| rows (its window sort is on
    that tiny distinct table, never the corpus) and broadcasts into
    the final join. At 100 TB this is exactly how you'd materialize a
    training order: one window pass, then write sorted by global_pos.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    src = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.partitionBy().orderBy("source")) - 1).alias(
                "src_idx"
            ),
            F.count("*").over(Window.partitionBy()).alias("n_sources"),
        )
    )
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rank_in_source"),
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        col("n_chars").cast("bigint").alias("n_chars"),
        col("rank_in_source").cast("bigint").alias("rank_in_source"),
        ((col("rank_in_source") - 1) * col("n_sources") + col("src_idx"))
        .cast("bigint")
        .alias("global_pos"),
    )
