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


def test_sequence_packing_invariants(spark):
    """Packing layout must be a gap-free tiling of each shard's token
    stream: offsets stay inside the budget, pack spans are consistent
    with token counts, and consecutive docs in a shard abut exactly
    (next offset == previous end mod budget, with the pack index
    advancing by the carry) — i.e. no token is lost or duplicated."""
    from iot_sparkstreaming_spark.queries.pipeline import (
        PACK_BUDGET,
        pack_token_sequences,
    )

    rows = (
        pack_token_sequences(spark, SF_DIR_ORACLE)
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert rows, "fixture documents must produce at least one packed doc"
    last_end = {}  # shard -> (pack, offset) one past the previous doc
    for r in rows:
        assert 0 <= r.offset_in_pack < PACK_BUDGET
        assert r.first_pack <= r.last_pack
        # span consistency: the doc's final token lands in last_pack
        end_abs = r.first_pack * PACK_BUDGET + r.offset_in_pack + r.n_tokens - 1
        assert end_abs // PACK_BUDGET == r.last_pack
        if r.shard in last_end:
            prev_abs = last_end[r.shard]
            assert r.first_pack * PACK_BUDGET + r.offset_in_pack == prev_abs
        else:
            assert (r.first_pack, r.offset_in_pack) == (0, 0)
        last_end[r.shard] = end_abs + 1


def test_canonical_selection_per_component(spark):
    """Exactly one canonical doc per component; the survivor is the
    longest member (ties to smallest doc_id); non-canonical rows only
    occur in clusters of >= 2; every fixture document appears once."""
    from iot_sparkstreaming_spark.queries.dedup import dedup_canonical_docs
    from iot_sparkstreaming_spark.tables import load_table

    rows = dedup_canonical_docs(spark, SF_DIR_ORACLE).collect()
    n_docs = load_table(spark, SF_DIR_ORACLE, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs

    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    assert any(len(m) > 1 for m in by_comp.values()), "fixture must have clusters"
    for members in by_comp.values():
        canon = [r for r in members if r.is_canonical]
        assert len(canon) == 1
        expect = min(members, key=lambda r: (-r.n_tokens, r.doc_id))
        assert canon[0].doc_id == expect.doc_id
        if len(members) == 1:
            assert members[0].is_canonical
