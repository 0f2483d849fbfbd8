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


# ---------------------------------------------------------------------------
# Z-order (Morton) interleave — multi-dimensional layout clustering
# ---------------------------------------------------------------------------

#: bit-spreading magic masks (public-domain "interleave by binary magic
#: numbers" bit trick): spread the low 16 bits of x so bit i lands at
#: position 2i. Identical integer arithmetic on any engine with 64-bit
#: &, |, << — which is what makes the z-value oracle-checkable.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits_sql(expr: str) -> str:
    """SQL expression (Spark AND DuckDB dialect-shared subset) that
    spreads the low 16 bits of ``expr`` to even positions."""
    s = f"({expr} & 65535)"
    for shift, mask in _SPREAD_STEPS:
        s = f"((({s} | ({s} << {shift})) & {mask}))"
    return s


def zvalue_sql(x: str, y: str) -> str:
    """64-bit Morton code of two 16-bit dimensions: x on even bits,
    y on odd."""
    return f"({spread_bits_sql(x)} | ({spread_bits_sql(y)} << 1))"


def zorder_rewrite(df, x: str, y: str, out_path: str, files: int = 32) -> None:
    """Rewrite a table Z-ORDERED on two dimensions: range-partition by
    the Morton code of the (16-bit-bucketed) keys, sort within files.
    Each output file then covers a small rectangle in (x, y) space, so
    min/max footer stats prune scans filtered on EITHER dimension —
    the multi-dimensional generalization of the single-key
    range-clustered rewrite in :func:`compact`. Same recipe as
    public lakehouse OPTIMIZE ZORDER BY implementations, built from
    repartitionByRange + sortWithinPartitions."""
    from pyspark.sql import functions as F

    z = df.withColumn("_z", F.expr(zvalue_sql(x, y)))
    (
        z.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
