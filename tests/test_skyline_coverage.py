"""Structural invariants for the round-5 analytics additions:
interval-union coverage, skyline/Pareto frontier, chi-squared cells,
and the shuffle-skew report. Value-exact parity vs DuckDB is covered
by test_oracle_parity; these assert the SEMANTICS (dominance, sweep
bounds, contingency consistency) against brute-force recomputation.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR

from iot_sparkstreaming_spark.queries.analytics import (
    COVERAGE_WINDOW_MS,
    chi2_contingency_cells,
    interval_coverage_user,
    pareto_frontier_parts,
    shuffle_skew_report,
)
from iot_sparkstreaming_spark.tables import load_table


def test_coverage_bounds(spark):
    """Union length is bounded by [segments, intervals] x window, and
    merged segments never exceed interval count."""
    rows = interval_coverage_user(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_segments <= r.n_intervals
        assert r.n_segments * COVERAGE_WINDOW_MS <= r.covered_ms
        assert r.covered_ms <= r.n_intervals * COVERAGE_WINDOW_MS


def test_coverage_matches_bruteforce_merge(spark):
    """Sweep-line result equals the classic sort-and-merge union."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    per_user: dict[int, list[int]] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(int(r.ts.timestamp() * 1000))
    expected = {}
    for uid, starts in per_user.items():
        starts.sort()
        covered = segs = 0
        cur_s = cur_e = None
        for s in starts:
            e = s + COVERAGE_WINDOW_MS
            if cur_e is None or s >= cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
                segs += 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        expected[uid] = (segs, covered)
    got = {
        r.user_id: (r.n_segments, r.covered_ms)
        for r in interval_coverage_user(spark, SF_DIR).collect()
    }
    assert got == expected


def test_pareto_frontier_is_exactly_the_undominated_set(spark):
    parts = [
        (r.p_partkey, int(round(r.p_retailprice * 100)), r.p_size)
        for r in load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in parts
            if q[0] != p[0]
        )

    expected = {p[0] for p in parts if not dominated(p)}
    got = {r.p_partkey for r in pareto_frontier_parts(spark, SF_DIR).collect()}
    assert got == expected


def test_chi2_cells_consistent(spark):
    rows = chi2_contingency_cells(spark, SF_DIR).collect()
    n = sum(r.observed for r in rows)
    row_tot = Counter()
    col_tot = Counter()
    for r in rows:
        row_tot[r.event_type] += r.observed
        col_tot[r.bucket] += r.observed
    for r in rows:
        assert r.row_total == row_tot[r.event_type]
        assert r.col_total == col_tot[r.bucket]
        exp = r.row_total * r.col_total / n
        assert abs(r.chi2_term - (r.observed - exp) ** 2 / exp) < 1e-6


def test_skew_report_matches_bruteforce(spark):
    counts = sorted(
        Counter(
            r.user_id
            for r in load_table(spark, SF_DIR, "events").select("user_id").collect()
        ).values()
    )
    k, total = len(counts), sum(counts)
    r = shuffle_skew_report(spark, SF_DIR).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_key_rows) == (k, total, counts[-1])
    assert r.p50_key_rows == counts[(k + 1) // 2 - 1]
    assert r.p90_key_rows == counts[k - (k - 1) // 10 - 1]
    assert abs(r.skew_ratio - counts[-1] * k / total) < 1e-9
    gini = (2 * sum(i * c for i, c in enumerate(counts, 1)) - (k + 1) * total) / (
        k * total
    )
    assert abs(r.gini - gini) < 1e-9


def test_incremental_minhash_consistent_with_full_selfjoin(spark):
    """The incremental batch-vs-corpus screen must agree with the full
    self-join operator wherever they overlap: every dedup_minhash_lsh
    pair with exactly one batch-side doc makes that batch doc is_dup,
    and every is_dup verdict carries agreement >= the 0.5 bar."""
    from iot_sparkstreaming_spark.queries.dedup import (
        EST_THRESHOLD,
        INCR_BATCH_MOD,
        MINHASH_K,
        dedup_incremental_minhash,
        dedup_minhash_lsh,
    )
    from tests.conftest import SF_DIR_ORACLE

    report = {
        r.doc_id: r for r in dedup_incremental_minhash(spark, SF_DIR_ORACLE).collect()
    }
    for r in report.values():
        assert (r.n_candidates == 0) == (r.best_match_id is None)
        if r.is_dup:
            assert r.best_n_matching >= MINHASH_K * EST_THRESHOLD
    full = dedup_minhash_lsh(spark, SF_DIR_ORACLE).collect()
    cross = [
        p
        for p in full
        if (p.doc_a % INCR_BATCH_MOD == 0) != (p.doc_b % INCR_BATCH_MOD == 0)
    ]
    assert cross, "fixture must contain at least one batch-corpus dup pair"
    for p in cross:
        batch_doc = p.doc_a if p.doc_a % INCR_BATCH_MOD == 0 else p.doc_b
        assert report[batch_doc].is_dup
        assert report[batch_doc].best_n_matching >= p.n_matching
