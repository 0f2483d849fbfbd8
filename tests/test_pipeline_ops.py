"""Behavioral invariants for the corpus-pipeline operators
(queries/pipeline.py) — properties the oracle hash can't articulate:
chunk coverage/overlap, per-stratum sample-rate sanity, contamination
bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_sparkstreaming_spark.queries.registry import load_all

from tests.conftest import SF_DIR_ORACLE

REGISTRY = load_all()


def test_chunks_cover_every_token_with_overlap(spark):
    """Chunks must tile each document completely: first chunk starts
    at token 1, consecutive chunks advance by the stride (10-token
    overlap at width 50), and the last chunk reaches the document's
    final token."""
    from iot_sparkstreaming_spark.queries.pipeline import CHUNK_STRIDE, CHUNK_TOKENS

    rows = REGISTRY["chunk_documents"].spark(spark, SF_DIR_ORACLE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("([a-z0-9]+)"), 1
                )
            ).alias("n_tok"),
        )
        .collect()
    )
    n_tok = {r.doc_id: r.n_tok for r in docs}
    assert by_doc, "no chunks produced"
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        total = n_tok[doc_id]
        for c in chunks:
            start = c.chunk_id * CHUNK_STRIDE  # 0-based
            assert c.n_tokens == min(CHUNK_TOKENS, total - start)
        last = chunks[-1]
        assert last.chunk_id * CHUNK_STRIDE + last.n_tokens == total


def test_stratified_sample_rates(spark):
    """Observed per-stratum rates must sit near the configured 50/10%
    (hash tickets are uniform; fixture strata are small, so the bound
    is loose but directional), and every stratum must be reported."""
    from iot_sparkstreaming_spark.queries.pipeline import (
        SAMPLE_PCT_EVEN,
        SAMPLE_PCT_ODD,
    )

    rows = REGISTRY["stratified_sample_by_source"].spark(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20  # src0..src19 all present
    for r in rows:
        num = int(r.source[3:])
        pct = SAMPLE_PCT_EVEN if num % 2 == 0 else SAMPLE_PCT_ODD
        rate = r.n_sampled / r.n_total
        assert abs(rate - pct / 100) < 0.35, (r.source, rate, pct)
        if r.n_sampled:
            assert r.min_sampled_doc_id is not None


def test_contamination_rates_bounded(spark):
    """Every test-split doc reports 0 ≤ n_contaminated ≤ n_grams, and
    on this fixture (shared vocabulary + planted near-dups) at least
    one document shows nonzero contamination."""
    rows = REGISTRY["contamination_ngram_overlap"].spark(spark, SF_DIR_ORACLE).collect()
    assert rows
    assert any(r.n_contaminated > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.contamination_rate - r.n_contaminated / r.n_grams) < 1e-12
