"""Shared pytest fixtures: one SparkSession per test run + a DuckDB
oracle comparator mimicking the driver harness (row-count, schema,
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from iot_sparkstreaming_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    def make(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    cons: dict[str, duckdb.DuckDBPyConnection] = {}

    def get(sf_dir: str = SF_DIR_ORACLE) -> duckdb.DuckDBPyConnection:
        if sf_dir not in cons:
            cons[sf_dir] = make(sf_dir)
        return cons[sf_dir]

    yield get
    for c in cons.values():
        c.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def assert_matches_oracle(spark_df, duck_con, sql, rel_tol=1e-9, abs_tol=1e-9):
    """Driver-harness twin: compare row count, column names, and
    order-insensitive values (floats with tolerance — the driver hashes
    exact values, so production queries must be *deterministic*; the
    tolerance here only guards against genuinely immaterial 1-ulp
    formatting noise, and a strict mode below catches the rest)."""
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm(row[c]) for c in spark_cols) for row in spark_df.collect()
    ]
    res = duck_con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in duck_rows_raw]

    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    def key(row):
        return tuple(
            (f"{x:.6e}" if isinstance(x, float) else x) for x in row
        )

    spark_sorted = sorted(spark_rows, key=lambda r: tuple(map(str, map(key, [r]))))
    duck_sorted = sorted(duck_rows, key=lambda r: tuple(map(str, map(key, [r]))))
    mismatches = []
    exact = 0
    for srow, drow in zip(spark_sorted, duck_sorted):
        for sv, dv in zip(srow, drow):
            if isinstance(sv, float) and isinstance(dv, float):
                if sv == dv:
                    exact += 1
                elif not math.isclose(sv, dv, rel_tol=rel_tol, abs_tol=abs_tol):
                    mismatches.append((srow, drow))
                    break
            elif sv != dv:
                mismatches.append((srow, drow))
                break
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[:3]}"
    return exact


def assert_matches_oracle_exact(spark_df, duck_con, sql):
    """Strict bitwise comparison — what the driver's value-hash needs."""
    assert_matches_oracle(spark_df, duck_con, sql, rel_tol=0.0, abs_tol=0.0)
