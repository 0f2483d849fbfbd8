"""Parquet table loading for the harness testdata.

One `spark.read.parquet` per table: the scan is the pushdown target —
filters and column pruning from downstream plans reach the parquet
reader via Catalyst (verify with ``df.explain`` → ``PushedFilters`` /
``ReadSchema``). Nothing is cached here: at 100 TB you want the scan
pruned per-query, not a materialized full table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from iot_sparkstreaming_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Cache the DataFrame HANDLE (logical plan + resolved file listing)
    # per session: repeated queries over the same table skip the
    # ~100 ms directory-listing/footer pass per spark.read call. This
    # caches no data — scans stay pruned per-query — and the cache
    # dies with the session object, so it can't leak across sessions.
    cache: dict[tuple[str, str], DataFrame] = spark.__dict__.setdefault(
        "_graft_table_cache", {}
    )
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — unsupported by the
        # Spark reader unless spark.sql.legacy.parquet.nanosAsLong
        # surfaces it as nanos-since-epoch bigint. Set the conf HERE,
        # at runtime, not only at session-build time: callers (the
        # external harness among them) hand us vanilla SparkSessions,
        # and a runtime conf.set before the read is sufficient for the
        # parquet schema converter. Safe to set repeatedly; read-time
        # conf, no session restart needed.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Convert nanos bigint via exact integer division (NOT float
        # division: ~1.7e18 ns exceeds the double mantissa) to
        # microseconds, matching DuckDB's own nanos→micros truncation
        # so oracles agree.
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every harness table as an unmaterialized DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
