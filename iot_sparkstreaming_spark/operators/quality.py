"""Declarative data-quality expectations over any DataFrame.

The lakehouse-pipeline staple (DLT-style ``expect``): a rule set is
declared as named boolean column expressions; one pass over the data
produces per-rule violation counts, and the same rules split the
frame into a clean stream and a quarantine stream. The reference had
no bad-record path at all (SURVEY.md §1.2 — "a malformed CSV line
throws and would kill the task"); this is that path, engine-wide.

Scale shape: `audit` is a single scan with map-side partial
aggregation (each rule is a SUM of a 0/1 cast — no shuffle beyond
the 1-row rollup); `enforce` is the same predicate column reused for
two filtered writes, so Catalyst pushes the conjunction to the scan
of whichever branch is consumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row frame: total rows plus, per rule, how many rows
    VIOLATE it (rule columns are pass-predicates). NULL predicate
    results count as violations — an expectation that cannot be
    evaluated did not pass."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1))
            .cast("bigint")
            .alias(f"viol_{name}")
        )
    return df.agg(*aggs)


def passes_all(rules: dict[str, Column]) -> Column:
    """Conjunction of all pass-predicates (NULL-safe: NULL fails)."""
    out = F.lit(True)
    for pred in rules.values():
        out = out & F.coalesce(pred, F.lit(False))
    return out


def enforce(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split on the same predicates ``audit``
    counted — rows failing ANY expectation are quarantined with a
    ``failed_rules`` array naming the violated expectations."""
    ok = passes_all(rules)
    clean = df.filter(ok)
    failed_names = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules.items()
            ]
        )
    )
    quarantine = df.filter(~ok).withColumn("failed_rules", failed_names)
    return clean, quarantine
