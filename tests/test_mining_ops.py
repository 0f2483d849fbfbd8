"""Structural invariants of the corpus-mining operators — properties
that must hold on ANY input, beyond the value-exact oracle parity
already covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from iot_sparkstreaming_spark.queries.mining import (
    funnel_analysis,
    oov_rate_per_doc,
    priority_sample_per_source,
    quality_gate_composite,
    embedding_centroid_per_label,
    ngram_topk_corpus,
)


def test_funnel_stages_monotone(spark):
    rows = {r.stage: r.n_users for r in funnel_analysis(spark, SF_DIR).collect()}
    assert set(rows) == {"signup", "view", "purchase"}
    assert rows["signup"] >= rows["view"] >= rows["purchase"]
    assert rows["purchase"] >= 0


def test_quality_gate_keep_iff_no_reasons(spark):
    df = quality_gate_composite(spark, SF_DIR)
    bad = df.filter(df.keep != (F.col("reasons") == "")).count()
    assert bad == 0


def test_priority_sample_quota_and_determinism(spark):
    a = priority_sample_per_source(spark, SF_DIR)
    per_source = a.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per_source)
    # deterministic under re-execution (retry-safety: same sample twice)
    ra = sorted((r.doc_id, r.source) for r in a.collect())
    rb = sorted(
        (r.doc_id, r.source)
        for r in priority_sample_per_source(spark, SF_DIR).collect()
    )
    assert ra == rb


def test_oov_bounds(spark):
    df = oov_rate_per_doc(spark, SF_DIR)
    bad = df.filter(
        (F.col("n_oov") < 0)
        | (F.col("n_oov") > F.col("n_tokens"))
        | (F.col("oov_rate") < 0)
        | (F.col("oov_rate") > 1)
    ).count()
    assert bad == 0


def test_centroid_nvecs_consistent_across_dims(spark):
    df = embedding_centroid_per_label(spark, SF_DIR)
    # every dim of a label aggregates the same vector population
    distinct_counts = (
        df.groupBy("label").agg(F.count_distinct("n_vecs").alias("k")).collect()
    )
    assert all(r.k == 1 for r in distinct_counts)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark, tmp_path):
    """Winnowing's defining property (Schleimer et al.): two documents
    sharing a token run of length >= k + w - 1 (= 6 here) must share
    at least one fingerprint hash, regardless of surrounding text."""
    from iot_sparkstreaming_spark.queries.mining import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"nine eight {shared} seven"),
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    fps = winnowing_fingerprints(spark, str(tmp_path)).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"


def test_ngram_topk_sorted_and_bounded(spark):
    rows = ngram_topk_corpus(spark, SF_DIR).collect()
    assert len(rows) <= 50
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r.ngram for r in rows)  # bigrams, not unigrams


def test_bm25_rank_consistent_and_bounded(spark):
    from iot_sparkstreaming_spark.queries.mining import bm25_topk_docs

    rows = bm25_topk_docs(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    # rk is 1..n with score non-increasing and doc_id tiebreak
    rows = sorted(rows, key=lambda r: r.rk)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.bm25 > b.bm25 or (a.bm25 == b.bm25 and a.doc_id < b.doc_id)
    # every hit matched between 1 and |query| terms
    assert all(1 <= r.n_terms <= 3 for r in rows)


def test_lm_likelihood_bounds_and_gate(spark):
    from iot_sparkstreaming_spark.queries.mining import lm_bigram_likelihood

    df = lm_bigram_likelihood(spark, SF_DIR)
    rows = df.collect()
    assert rows, "corpus has multi-token docs"
    for r in rows:
        # smoothed conditional probabilities are in (0, 1]
        assert 0.0 < r.avg_likelihood <= 1.0
        assert r.n_bigrams >= 1
        assert r.keep == (r.avg_likelihood >= 0.001)


def test_dup_token_spans_finds_planted_span_exactly(spark):
    """Plant one 12-token span shared verbatim between two otherwise
    token-disjoint documents: exactly one maximal span must come back,
    with exact 1-based starts and exact length — no fragmentation, no
    extension."""
    from iot_sparkstreaming_spark.queries.mining import duplicate_token_spans

    shared = " ".join(f"shared{i}" for i in range(12))
    doc_a = "alpha0 alpha1 alpha2 " + shared + " alpha3 alpha4"
    doc_b = (
        "beta0 beta1 beta2 beta3 beta4 beta5 beta6 " + shared + " beta7"
    )
    doc_c = " ".join(f"gamma{i}" for i in range(30))  # no overlap
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], ["doc_id", "text"]
    )
    got = [tuple(r) for r in duplicate_token_spans(docs, k=8).collect()]
    # span starts after 3 tokens in doc 1 (position 4) and after 7 in
    # doc 2 (position 8); length is exactly the 12 shared tokens
    assert got == [(1, 2, 4, 8, 12)]


def test_dup_token_spans_stop_gram_cutoff_drops_viral_grams(spark):
    """A gram occurring in more than max_df positions is boilerplate:
    with max_df below the occurrence count the span must vanish."""
    from iot_sparkstreaming_spark.queries.mining import duplicate_token_spans

    shared = " ".join(f"viral{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(i, f"pre{i} " + shared + f" post{i}") for i in range(6)],
        ["doc_id", "text"],
    )
    assert duplicate_token_spans(docs, k=8, max_df=5).count() == 0
    # with the cutoff above the df, all 15 ordered pairs report it
    assert duplicate_token_spans(docs, k=8, max_df=50).count() == 15


def test_ordered_funnel_vs_bruteforce(spark):
    """Greedy min-ts stage chaining recomputed in Python must match,
    and the ordered funnel must never exceed the set-membership one."""
    from iot_sparkstreaming_spark.queries.mining import ordered_funnel_users
    from iot_sparkstreaming_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    want = {}
    for uid, rows in per_user.items():
        t1 = min((t for t, et in rows if et == "signup"), default=None)
        if t1 is None:
            continue
        t2 = min((t for t, et in rows if et == "view" and t > t1), default=None)
        t3 = (
            min((t for t, et in rows if et == "purchase" and t > t2), default=None)
            if t2 is not None
            else None
        )
        want[uid] = 1 + (t2 is not None) + (t3 is not None)
    got = {r.user_id: r.stage_depth for r in ordered_funnel_users(spark, SF_DIR).collect()}
    assert got == want
    for r in ordered_funnel_users(spark, SF_DIR).collect():
        if r.stage_depth >= 2:
            assert r.first_view_ms > r.signup_ms
        if r.stage_depth == 3:
            assert r.first_purchase_ms > r.first_view_ms
