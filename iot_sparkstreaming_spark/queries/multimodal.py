"""Multimodal query surface: manifest (metadata-only, payload pruned)
and Pandas-UDF feature extraction — both oracle-checked.

The feature oracle is the interesting one: DuckDB recomputes the
byte-level statistics the ``mapInPandas`` extractor produced (byte
sum via hex-pair folding, sha256 via the built-in), proving the
Python/Arrow path computes exactly what a SQL engine would — the
Pandas boundary adds no drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from iot_sparkstreaming_spark.operators.multimodal import (
    assets_from_documents,
    extract_features,
)
from iot_sparkstreaming_spark.queries.registry import register
from iot_sparkstreaming_spark.tables import load_table

#: the same deterministic asset derivation, in DuckDB SQL
ASSETS_CTE = """
WITH assets AS (
  SELECT
    doc_id AS asset_id,
    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
    encode(text) AS payload,
    text,
    n_chars
  FROM documents
)
"""

MANIFEST_ORACLE = (
    ASSETS_CTE
    + """
SELECT modality,
  COUNT(*) AS n_assets,
  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes,
  CAST(SUM(CAST(n_chars % 640 AS BIGINT)) AS BIGINT) AS total_width
FROM assets
GROUP BY modality
"""
)


@register("multimodal_manifest", oracle=MANIFEST_ORACLE)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality manifest over binary assets. Metadata-only: the
    aggregation touches octet lengths and the meta struct, so at
    scale Catalyst prunes the payload bytes out of everything past
    the scan."""
    docs = load_table(spark, sf_dir, "documents")
    assets = assets_from_documents(docs)
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.octet_length(col("payload"))).cast("bigint").alias("total_bytes"),
        F.max(F.octet_length(col("payload"))).cast("bigint").alias("max_bytes"),
        F.sum(col("meta.width").cast("bigint")).cast("bigint").alias("total_width"),
    )


FEATURES_ORACLE = (
    ASSETS_CTE
    + """
SELECT asset_id, modality,
  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(generate_series(1, octet_length(payload)),
      i -> ('0x' || substr(hex(payload), i*2-1, 2))::BIGINT)),
    (a, x) -> a + x) AS BIGINT) AS byte_sum,
  lower(sha256(text)) AS sha256  -- duckdb sha256 is VARCHAR-only; text == UTF-8(payload)
FROM assets
"""
)


@register("multimodal_features", oracle=FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas feature extraction (mapInPandas) checked
    byte-for-byte against a pure-SQL recomputation — the engine's one
    sanctioned Python boundary, proven driftless."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(assets_from_documents(docs))
