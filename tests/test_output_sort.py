"""Round-15 optimization invariants: bounded_sort semantics and the
plan shapes the optimization round pinned (no range-sample exchange on
bounded final sorts; linear — not exponential — PCA iteration plan)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iot_sparkstreaming_spark.operators.output import bounded_sort
from tests.conftest import SF_DIR_ORACLE

BOUNDED_SORT_QUERIES = [
    "value_histogram_events",
    "event_transition_matrix",
    "value_equidepth_bins_events",
    "vocab_coverage_curve",
]


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan_tree(plan: str) -> list[str]:
    """The tree section of a formatted plan: the lines up to the first
    blank line (node details like ``(1) Scan parquet`` follow it, and
    repeat every node name — counting on the full text double-counts)."""
    lines = []
    for line in plan.splitlines():
        if not line.strip():
            break
        lines.append(line)
    return lines


def test_bounded_sort_equals_orderby_rows_and_order(spark):
    """bounded_sort must return the IDENTICAL row sequence orderBy
    returns — same asc/nulls-first defaults, ties and all — because the
    driver-facing queries that adopted it declare sorted output."""
    df = spark.createDataFrame(
        [(k, v) for k in ["b", "a", None, "c"] for v in [3, 1, None, 2]],
        "k string, v int",
    )
    via_orderby = df.orderBy("k", "v").collect()
    via_bounded = bounded_sort(df, "k", "v").collect()
    assert via_bounded == via_orderby


def test_bounded_sort_queries_have_no_range_exchange(spark):
    """The four bounded-output queries that swapped orderBy for
    bounded_sort must keep range partitioning OUT of their plans (the
    exchange + its sampling job are what the swap removed)."""
    from iot_sparkstreaming_spark.queries.registry import load_all

    reg = load_all()
    for name in BOUNDED_SORT_QUERIES:
        plan = _formatted_plan(reg[name].spark(spark, SF_DIR_ORACLE))
        assert "rangepartitioning" not in plan, name


def test_bounded_sort_queries_have_exchange_below_coalesce(spark):
    """coalesce(1) collapses its parent stage up to the nearest shuffle
    boundary into ONE task — safe only while an Exchange sits between
    the Coalesce and the corpus-sized operators below it (the single
    task then sees post-shuffle group rows, never the corpus). Pin that
    plan shape: in the tree, an Exchange must appear after the Coalesce
    and before the first parquet scan, so a future plan change that
    satisfies the aggregation's distribution from upstream partitioning
    (widening the pinned stage to corpus size) fails here instead of
    shipping."""
    from iot_sparkstreaming_spark.queries.registry import load_all

    reg = load_all()
    for name in BOUNDED_SORT_QUERIES:
        plan = _formatted_plan(reg[name].spark(spark, SF_DIR_ORACLE))
        tree = _plan_tree(plan)
        coalesce_at = next(
            i for i, ln in enumerate(tree) if "Coalesce" in ln
        )
        below = tree[coalesce_at + 1 :]
        first_exchange = next(
            (i for i, ln in enumerate(below) if "Exchange" in ln), None
        )
        first_scan = next(
            (i for i, ln in enumerate(below) if "Scan parquet" in ln), None
        )
        assert first_exchange is not None, (name, "no Exchange below Coalesce")
        assert first_scan is not None, (name, "no scan below Coalesce?")
        assert first_exchange < first_scan, (
            name,
            "Coalesce(1) stage reaches a parquet scan with no shuffle "
            "boundary in between — the pinned single task is corpus-sized",
        )


def test_pca_power_plan_is_linear_in_rounds(spark):
    """embedding_pca_power's per-round norm divisor must reference the
    iterate once (window form): the agg+crossJoin form duplicated the
    scatter join ~2^rounds times (14 scan nodes for 3 rounds). The
    linear plan scans the scatter artifact once per round — bound the
    count of actual scan NODES (counted in the tree section only; the
    node-details section repeats every node name) at rounds + 1, fail
    well before exponential blowup."""
    from iot_sparkstreaming_spark.queries.registry import load_all

    reg = load_all()
    plan = _formatted_plan(reg["embedding_pca_power"].spark(spark, SF_DIR_ORACLE))
    tree = _plan_tree(plan)
    n_scan_nodes = sum("Scan parquet" in ln for ln in tree)
    from iot_sparkstreaming_spark.queries.similarity import PCA_POWER_ROUNDS

    assert 0 < n_scan_nodes <= PCA_POWER_ROUNDS + 1, n_scan_nodes
