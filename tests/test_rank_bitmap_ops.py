"""Engine-free property tests for the round-8 exact-statistic kernels.

The oracle-parity suite proves Spark == DuckDB on the fixture; these
prove the SHARED FORMULAS themselves against independent pure-Python
references on randomized inputs — the streak bit-fold, the
histogram-counted Mann-Whitney U, and the rank-formula Gini — all
evaluated through DuckDB (cheap, no JVM) since both engines run the
literal same expressions.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from iot_sparkstreaming_spark.queries.analytics import (
    BITMAP_DAYS,
    _streak_layers_sql,
)

SETTINGS = dict(max_examples=50, deadline=None)


def _py_longest_streak(bitmap: int) -> int:
    best = cur = 0
    for i in range(64):
        if (bitmap >> i) & 1:
            cur += 1
            best = max(best, cur)
        else:
            cur = 0
    return best


@settings(**SETTINGS)
@given(st.integers(min_value=0, max_value=(1 << BITMAP_DAYS) - 1))
def test_streak_fold_matches_bit_scan(bitmap: int) -> None:
    sql = (
        f"WITH bm AS (SELECT 1 AS user_id, CAST({bitmap} AS BIGINT) AS bitmap),\n"
        + _streak_layers_sql(BITMAP_DAYS)
        + f"\nSELECT acc FROM st{BITMAP_DAYS - 1}"
    )
    got = duckdb.sql(sql).fetchone()[0]
    assert got == _py_longest_streak(bitmap)


def test_streak_layers_sql_is_linear() -> None:
    """The naive expression inlining detonates at 2^steps text; the
    chained layers must stay comfortably linear."""
    assert len(_streak_layers_sql(64)) < 20_000


def _py_mann_whitney(a: list[int], b: list[int]) -> tuple[int, int]:
    """(u1_x2, tie_cubes) by definition: U1 = #{a>b} + 0.5*#{a=b}."""
    u1_x2 = sum(2 * (x > y) + (x == y) for x in a for y in b)
    from collections import Counter

    c = Counter(a + b)
    tie_cubes = sum(t**3 - t for t in c.values())
    return u1_x2, tie_cubes


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=30),
)
def test_mann_whitney_histogram_formula(a: list[int], b: list[int]) -> None:
    """The distribution-counting U (histogram + below-scan) equals the
    quadratic pair-count definition; small value domain forces heavy
    ties so the tie path is exercised."""
    va = " UNION ALL ".join(f"SELECT {x} AS v, 1 AS ca, 0 AS cb" for x in a)
    vb = " UNION ALL ".join(f"SELECT {x} AS v, 0 AS ca, 1 AS cb" for x in b)
    got = duckdb.sql(
        f"""
        WITH rows_in AS ({va} UNION ALL {vb}),
        hist AS (
          SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM rows_in GROUP BY v
        ),
        scan AS (
          SELECT ca, cb,
            COALESCE(SUM(cb) OVER (
              ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS cb_below
          FROM hist
        )
        SELECT CAST(SUM(2 * ca * cb_below + ca * cb) AS BIGINT),
               CAST(SUM((ca+cb)*(ca+cb)*(ca+cb) - (ca+cb)) AS BIGINT)
        FROM scan
        """
    ).fetchone()
    assert tuple(got) == _py_mann_whitney(a, b)


def _py_gini_num(xs: list[int]) -> int:
    """Sum (2i - n - 1) * x_(i) over ascending-sorted xs, 1-based."""
    xs = sorted(xs)
    n = len(xs)
    return sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40))
def test_gini_rank_formula_matches_mean_abs_diff(xs: list[int]) -> None:
    """The rank-formula numerator equals the mean-absolute-difference
    definition: sum_(i,j) |x_i - x_j| == 2 * sum (2i-n-1) x_(i) —
    the identity that makes the one-window Gini exact."""
    mad = sum(abs(x - y) for x in xs for y in xs)
    assert mad == 2 * _py_gini_num(xs)
