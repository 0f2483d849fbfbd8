"""Query surface of the engine.

Every query is registered in :mod:`registry` with both its Spark
implementation and (where SQL-expressible) a DuckDB oracle SQL string.
``__spark_entry__.py`` exposes the registry to the driver harness.
"""

from iot_sparkstreaming_spark.queries.registry import QUERIES, Query, register

__all__ = ["QUERIES", "Query", "register"]
