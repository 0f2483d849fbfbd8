"""Column-expression function library (JVM-side, no Python UDFs).

Every scalar formula the reference implemented as per-row Scala
lambdas (SURVEY.md §2.7) is re-expressed here as built-in
``pyspark.sql.functions`` compositions so the whole scalar core stays
inside whole-stage codegen.
"""

from iot_sparkstreaming_spark.functions.health import (
    classify_warning,
    max_heart_rate,
    round_pulse,
    tuple_string,
)

__all__ = [
    "classify_warning",
    "max_heart_rate",
    "round_pulse",
    "tuple_string",
]
