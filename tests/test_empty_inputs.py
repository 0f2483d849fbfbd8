"""Zero-row robustness: every registered query must run — and match
its oracle — on schema-identical EMPTY tables. At 100 TB, empty
partitions/date-ranges/sources are routine, and this is where
driver-side collects, division-by-zero, and aggregate-over-nothing
semantics crack first (the quality-gate nullif guard and the BPE
trainer's empty-vocab path exist because of exactly this class).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from iot_sparkstreaming_spark.queries.registry import load_all

from tests.conftest import SF_DIR, TABLES, assert_matches_oracle_exact

REGISTRY = load_all()

#: Spark and DuckDB legitimately DISAGREE on empty input for grouping
#: sets containing the global () set: the SQL standard (and DuckDB)
#: treats () as a global aggregation — one row even over zero rows —
#: while Spark emits no rows from any grouped aggregate on empty
#: input. Real data always populates the () row identically (every
#: non-empty CORRECTNESS run is green), so this is pinned as a known
#: divergence rather than papered over in the queries.
EMPTY_GROUPING_SET_DIVERGENCE = {
    "grouping_sets_revenue",
    "rollup_customer_census",
    "cube_event_census",
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_tables(spark, empty_dir, empty_duck, name):
    q = REGISTRY[name]
    df = q.spark(spark, empty_dir)
    if q.oracle is None:
        assert df.count() >= 0
        return
    if name in EMPTY_GROUPING_SET_DIVERGENCE:
        spark_rows = df.count()
        duck_rows = len(empty_duck.execute(q.oracle).fetchall())
        assert spark_rows == 0 and duck_rows == 1  # the documented gap
        return
    assert_matches_oracle_exact(df, empty_duck, q.oracle)
