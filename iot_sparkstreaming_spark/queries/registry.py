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
from dataclasses import dataclass

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
# * round 5 closes the books: the 16 queries with no external row ever
#   (7 analytics + the 9-query mining family), the 9 whose last
#   external row is red (8 analytics red in r3's events crash and not
#   re-windowed in r4, plus q12 to prove the cast fix), the 8
#   reference-pipeline queries (core contract, continuously checked),
#   and the 17 queries NEW in round 5:
#   16 + 9 + 8 + 17 = exactly the 50-query window. After this
#   round every registered query has ≥1 external row: every r5-new
#   query is in-window, and everything displaced to make room
#   (multimodal_features, dedup_components, ann_lsh_cosine,
#   dedup_ngram_jaccard, dedup_minhash_lsh, semdedup_cluster_prune,
#   dedup_embedding_cosine, ann_ivf_cosine) carries a green r2 row,
#   with its family still in-window via the codec, graph,
#   inverted-index winnowing, edit-distance dedup, and IVF/PQ
#   composition queries that consume the same shared machinery and
#   memoized artifacts.
#
# Everything outside the prefix keeps local oracle coverage via
# tests/test_oracle_parity.py, which parametrizes the full registry.
# (bm25_topk_docs, lm_bigram_likelihood, dup_token_spans,
# acf_user_value, dedup_span_scrub, vocab_coverage_curve and
# value_histogram_events, kcore_trade_graph, event_transition_matrix
# rolling_trend_slope, basket_pair_rules, value_equidepth_bins_events
# image_png_features and video_y4m_frames landed after the r5
# window was sized at 50, as did interval_coverage_user,
# chi2_contingency_cells, pareto_frontier_parts, shuffle_skew_report,
# label_propagation_communities, embedding_gram_matrix,
# dedup_incremental_minhash, snapshot_diff_orders, fk_integrity_audit,
# scd2_point_in_time_join, weighted_sample_per_source,
# ordered_funnel_users, ab_test_conversion, survival_signup_to_purchase,
# graph_assortativity_trade, profile_orders_columns,
# kmeans_lloyd_embeddings, ann_ivf_kmeans, kmeans_cluster_quality,
# value_drift_report —
# they sit outside the prefix this round and are the first candidates
# for round 6's rotation.)
_PRIORITY_PREFIX = [
    # -- never externally checked: analytics (7)
    "band_join_error_near_signup",
    "pagerank_trade_graph",
    "scd2_user_dimension",
    "rollup_minute_to_hour",
    "window_topk_salted",
    "stats_correlation",
    "gapfill_hourly_series",
    # -- never externally checked: mining (9)
    "ngram_topk_corpus",
    "priority_sample_per_source",
    "oov_rate_per_doc",
    "quality_gate_composite",
    "embedding_centroid_per_label",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "funnel_analysis",
    "retention_cohorts",
    # -- last external row red (r3 events crash; q12 oracle cast) (9)
    "setops_user_cohorts",
    "asof_click_to_purchase",
    "range_join_views_before_error",
    "tumbling_window_hourly",
    "sliding_avg_1h",
    "window_rank_family",
    "setops_multiset_intersect",
    "setops_multiset_except",
    "q12_shipping_modes",
    # -- reference pipeline core (8)
    "warning_notification",
    "user_activity_category",
    "user_registration_latest",
    "latest_location",
    "sales_keyed_replace",
    "userhistory_pk_dedup",
    "history_by_user_join",
    "warning_streak_alerts",
    # new in r5 — brand-new code takes the slots of the simplest
    # r2-green fillers (rp_project_embeddings, quantize_embeddings_
    # int8, dedup_exact, dedup_canonical_docs/passages/containment,
    # multimodal_manifest, knn_bruteforce_cosine, dedup_simhash: map-only,
    # single-agg, or broadcast-crossjoin shapes, unchanged since
    # their green rows)
    "audio_wav_features",
    "triangle_count_parts",
    "anomaly_zscore_events",
    "ewma_user_value",
    "bigram_lift_topk",
    "hll_union_region_suppliers",
    "zorder_locality_events",
    "approx_quantile_bounds",
    "image_bmp_features",
    "variant_events_typed",
    "cms_heavy_hitters",
    "ann_pq_adc",
    "image_bmp_thumbnail",
    "ann_ivf_pq",
    "expectations_audit_events",
    "dedup_edit_distance",
    "rolling_median_value",
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

    return dict(sorted(QUERIES.items(), key=key))
