"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partitioned writes accumulate small
files; at 100 TB a scan over millions of sub-megabyte files spends
more time on open/footer overhead than on data. ``compact`` rewrites
a parquet directory into ~``target_bytes``-sized files, preserving
hive-style partition columns if present.

Sizing: output file count = ceil(input_bytes / target_bytes), clamped
to ≥1. ``repartitionByRange`` on the sort columns gives range-
clustered output (better min/max pruning on those columns); plain
``repartition`` balances purely by size when no sort is given.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 256 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet dataset at ``path`` into ``out_path`` with
    ~target-sized files; returns the output file count chosen.

    Writes to a NEW directory, never in place: an in-place rewrite
    that fails mid-way corrupts the table; callers swap directories
    (or table pointers) atomically after success.
    """
    df: DataFrame = spark.read.parquet(path)
    n_files = max(1, -(-_dir_bytes(path) // target_bytes))  # ceil div
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files


def delete_keys(
    spark: SparkSession,
    path: str,
    out_path: str,
    keys_df: DataFrame,
    key_col: str,
) -> tuple[int, int]:
    """Propagate deletion requests (takedown / right-to-erasure) into
    an immutable parquet dataset: rewrite ``path`` minus every row
    whose ``key_col`` appears in ``keys_df``; returns (rows_before,
    rows_after).

    The delete is an anti join — keys shuffle, data rows stream —
    and, like :func:`compact`, writes to a NEW directory so a partial
    failure never corrupts the source; callers swap pointers after
    success. At lake scale you'd partition-prune first (only rewrite
    partitions containing hits) — compose with hive partitioning from
    ``formats.write_table``.
    """
    df = spark.read.parquet(path)
    before = df.count()
    kept = df.join(
        keys_df.select(key_col).distinct(),
        on=key_col,
        how="left_anti",
    )
    kept.write.mode("overwrite").parquet(out_path)
    after = spark.read.parquet(out_path).count()
    return before, after
