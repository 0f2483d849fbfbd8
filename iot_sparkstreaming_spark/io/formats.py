"""File-format edges: Parquet / ORC / CSV / JSON-lines read & write.

The reference had NO file sources or sinks at all (SURVEY.md §2.8 —
Kafka and Cassandra only). A standalone engine needs the standard
lake edges; these helpers wrap the built-in DataFrame readers/writers
with the options that matter for correctness-at-scale:

* explicit schema on read for text formats (CSV/JSON) — schema
  inference is a full extra pass over 100 TB and non-deterministic
  under sampling; the engine always declares.
* columnar formats (parquet/orc) carry their own schema and support
  predicate pushdown + column pruning; text formats do not — the
  helpers exist so the text edge is an EDGE (ingest once, convert),
  never the analytical store.
* ``partition_by`` produces hive-style directory partitioning; a
  filter on the partition column prunes directories before any file
  is opened (PartitionFilters in the scan node — asserted in
  tests/test_formats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TEXT_FORMATS = {"csv", "json"}
COLUMNAR_FORMATS = {"parquet", "orc"}
FORMATS = TEXT_FORMATS | COLUMNAR_FORMATS


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
    if fmt in TEXT_FORMATS:
        if schema is None:
            raise ValueError(
                f"{fmt} requires an explicit schema: inference costs a full "
                "extra pass at scale and is non-deterministic under sampling"
            )
        r = r.schema(schema)
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)
