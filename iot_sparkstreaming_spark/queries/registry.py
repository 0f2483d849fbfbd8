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
# * round 6 rotates in the 34 queries that landed after r5's window
#   was sized and therefore have never had an external row (16
#   analytics + 7 mining + 4 similarity + 3 ops + 2 codec + 1 text +
#   1 dedup — the full list below), keeps the 8 reference-pipeline
#   queries pinned (core contract, continuously checked), and gives
#   the remaining 8 slots to the queries NEW in round 6. Everything
#   displaced carries a green r4/r5 row. After this round every
#   registered query has ≥1 green external CORRECTNESS row.
#
# Everything outside the prefix keeps local oracle coverage via
# tests/test_oracle_parity.py, which parametrizes the full registry.
# (simpson_diversity_user, benford_first_digit_orders,
# clustering_coefficient_parts and session_window_events landed after
# round 6's window was sized at 50 — they sit outside the prefix and
# are the first candidates for round 7's rotation.)
_PRIORITY_PREFIX = [
    # -- never externally checked: analytics tail (16)
    "acf_user_value",
    "value_histogram_events",
    "kcore_trade_graph",
    "event_transition_matrix",
    "rolling_trend_slope",
    "value_equidepth_bins_events",
    "interval_coverage_user",
    "chi2_contingency_cells",
    "pareto_frontier_parts",
    "shuffle_skew_report",
    "label_propagation_communities",
    "scd2_point_in_time_join",
    "ab_test_conversion",
    "survival_signup_to_purchase",
    "graph_assortativity_trade",
    "value_drift_report",
    # -- never externally checked: mining (7)
    "bm25_topk_docs",
    "lm_bigram_likelihood",
    "dup_token_spans",
    "dedup_span_scrub",
    "basket_pair_rules",
    "weighted_sample_per_source",
    "ordered_funnel_users",
    # -- never externally checked: similarity / k-means family (4)
    "embedding_gram_matrix",
    "kmeans_lloyd_embeddings",
    "ann_ivf_kmeans",
    "kmeans_cluster_quality",
    # -- never externally checked: ops (3), codecs (2), text (1),
    #    dedup (1)
    "snapshot_diff_orders",
    "fk_integrity_audit",
    "profile_orders_columns",
    "image_png_features",
    "video_y4m_frames",
    "vocab_coverage_curve",
    "dedup_incremental_minhash",
    # -- reference pipeline core (8, pinned every round)
    "warning_notification",
    "user_activity_category",
    "user_registration_latest",
    "latest_location",
    "sales_keyed_replace",
    "userhistory_pk_dedup",
    "history_by_user_join",
    "warning_streak_alerts",
    # -- new in round 6 (8): brand-new code gets first-exposure slots
    "bloom_prune_semijoin",
    "tfidf_cosine_pairs",
    "salted_skew_join_events",
    "time_weighted_avg_user",
    "mad_outlier_per_user",
    "decile_lift_orders",
    "seasonal_hour_of_week",
    "crossfold_assign_docs",
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
