"""Python UDTF: table-valued record exploding.

The reference dispatched one multiplexed CSV stream into per-type
pipelines with repeated split/filter passes (SURVEY.md §2.2 P1-P3).
``ExplodeRecord`` is the table-function formulation: one pass emits
``(tag, field_index, field_value)`` rows per input line — the
lateral-view shape for consumers that want records normalized long
instead of parsed wide (audit trails, schema-drift detection).

UDTFs are the one Python surface that RETURNS A TABLE per input row
(scalar UDFs return values; UDAFs aggregate). Spark 4 runs them
row-by-row in the Python worker, so at 100 TB this sits behind the
same caveat as every Python boundary: use for control-plane volumes
(schema audit of a sample) or switch on Arrow-optimized UDTF
evaluation; the CSV hot path stays on the codegen split/filter of
io/sources.py.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="tag: string, field_index: int, field_value: string")
class ExplodeRecord:
    """Explode one multiplexed CSV line into (tag, index, value) rows.

    Field 0 is the record tag (reference workingTest.scala:51); each
    remaining field is emitted with its positional index and trimmed
    value, mirroring the reference's pervasive ``.trim`` (P10).
    """

    def eval(self, line: str):  # noqa: D102
        if line is None:
            return
        parts = line.split(",")
        tag = parts[0].strip()
        for i, raw in enumerate(parts[1:], start=1):
            yield tag, i, raw.strip()
