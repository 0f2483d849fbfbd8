"""Health-telemetry scalar derivations from the reference pipeline.

All business logic of the reference lives in four formulas, each an
inline Scala lambda there; here each is a pure Column expression so it
compiles into whole-stage codegen (no Python boundary in the hot path).

Reference citations:
* max heart rate piecewise formula — workingTest.scala:121-123
* warning classifier (threshold θ)  — workingTest.scala:125-130
  (θ = 0.95 in workingTest.scala:126 / IOTSparkStreaming.scala:133;
  θ = 0.85 in test.scala:130 — therefore a parameter here)
* half-up pulse rounding            — workingTest.scala:115
* Scala-tuple output formatting     — workingTest.scala:131,140
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bp categories the classifier treats as hypertensive
#: (workingTest.scala:127 — List("HYP_1","HYP_2","HYP_CR"))
HYPERTENSIVE_CATS = ("HYP_1", "HYP_2", "HYP_CR")

#: default warning threshold θ (workingTest.scala:126)
DEFAULT_THRESHOLD = 0.95

WARN_CRITICAL = "critical"
WARN_SIMPLE = "simple"
WARN_NONE = "no-use"  # sentinel the reference filters out (workingTest.scala:133)


def max_heart_rate(age: Column) -> Column:
    """Piecewise max-HR: ``age < 40 → 220 - age`` else ``208 - 0.75*age``.

    Reference workingTest.scala:121-123. Pure arithmetic — stays in
    codegen.
    """
    return F.when(age < 40, 220 - age).otherwise(208 - 0.75 * age)


def round_pulse(pulse: Column) -> Column:
    """Half-up round to int, matching the reference's ``(x + 0.5).toInt``
    (workingTest.scala:115). Spark's ``round`` is HALF_UP for positive
    inputs, which is the whole physiological domain.
    """
    return F.round(pulse, 0).cast("int")


def classify_warning(
    pulse: Column,
    age: Column,
    bp_cat: Column,
    threshold: float = DEFAULT_THRESHOLD,
) -> Column:
    """3-way warning label (workingTest.scala:125-130).

    * pulse ≥ θ·maxHR and hypertensive bp  → ``critical``
    * pulse ≥ θ·maxHR otherwise            → ``simple``
    * else                                 → ``no-use``
    """
    hot = pulse >= threshold * max_heart_rate(age)
    return (
        F.when(hot & bp_cat.isin(*HYPERTENSIVE_CATS), F.lit(WARN_CRITICAL))
        .when(hot, F.lit(WARN_SIMPLE))
        .otherwise(F.lit(WARN_NONE))
    )


def tuple_string(*cols: Column) -> Column:
    """Scala ``Tuple.toString`` byte format — ``"(a,b,c)"`` — which the
    reference published verbatim to its output Kafka topics
    (workingTest.scala:131,140; FIXTURES.md §3).

    Null fields render as the literal ``null`` exactly like Scala's
    ``toString`` — ``concat_ws`` alone would silently DROP null columns
    ("(a,c)"), shifting every later field for positional consumers.
    """
    safe = [F.coalesce(c.cast("string"), F.lit("null")) for c in cols]
    return F.concat(F.lit("("), F.concat_ws(",", *safe), F.lit(")"))
