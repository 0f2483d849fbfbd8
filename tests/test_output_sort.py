"""Round-15 optimization invariants: bounded_sort semantics and the
plan shapes the optimization round pinned (no range-sample exchange on
bounded final sorts; linear — not exponential — PCA iteration plan)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iot_sparkstreaming_spark.operators.output import bounded_sort

SF_DIR = "/root/testdata/sf0.01"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


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
    for name in [
        "value_histogram_events",
        "event_transition_matrix",
        "value_equidepth_bins_events",
        "vocab_coverage_curve",
    ]:
        plan = _formatted_plan(reg[name].spark(spark, SF_DIR))
        assert "rangepartitioning" not in plan, name


def test_pca_power_plan_is_linear_in_rounds(spark):
    """embedding_pca_power's per-round norm divisor must reference the
    iterate once (window form): the agg+crossJoin form duplicated the
    scatter join ~2^rounds times (28 parquet scans for 3 rounds). The
    linear plan scans the scatter artifact once per round — allow a
    small constant margin, fail well before exponential blowup."""
    from iot_sparkstreaming_spark.queries.registry import load_all

    reg = load_all()
    plan = _formatted_plan(reg["embedding_pca_power"].spark(spark, SF_DIR))
    n_scans = plan.count("Scan parquet")
    from iot_sparkstreaming_spark.queries.similarity import PCA_POWER_ROUNDS

    assert n_scans <= 2 * PCA_POWER_ROUNDS + 2, n_scans
