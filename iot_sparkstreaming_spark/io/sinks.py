"""Sink edges: the output twin of :func:`sources.lines_stream`.

The reference PUBLISHED its pipeline outputs back to Kafka —
``warningNotification`` / ``notification`` topics carrying the
Scala-tuple payload strings (workingTest.scala:135-148, 190-208).
``payload_writer`` is that edge as a config switch over
``writeStream``: the kafka branch is the production path (needs only
a broker), the files/memory branches are the CI-testable edges that
exercise the identical payload column end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def payload_writer(
    out: DataFrame,
    sink: str = "files",
    payload_col: str = "payload",
    key_col: str | None = None,
    topic: str | None = None,
    kafka_bootstrap: str | None = None,
    path: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "payloads",
) -> DataStreamWriter:
    """Build a ``writeStream`` writer publishing ``payload_col``.

    * ``kafka``: the reference's producer edge (workingTest.scala:
      135-148). Spark's kafka sink consumes a ``value`` string column
      (plus optional ``key``); offsets + exactly-once bookkeeping ride
      the stream checkpoint — the hand-rolled ``KafkaProducer`` pool
      the reference built (workingTest.scala:137-146) is config here.
    * ``files``: text-file edge writing the same single payload
      column — the CI stand-in (no broker in the container).
    * ``memory``: named in-memory table for assertions.

    The caller still picks trigger/outputMode and calls ``.start()``.
    """
    if sink == "kafka":
        if not (topic and kafka_bootstrap):
            raise ValueError("kafka sink requires topic and kafka_bootstrap")
        cols = [F.col(payload_col).cast("string").alias("value")]
        if key_col is not None:
            cols.insert(0, F.col(key_col).cast("string").alias("key"))
        w = (
            out.select(*cols)
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("topic", topic)
        )
    elif sink == "files":
        if path is None:
            raise ValueError("files sink requires path")
        w = (
            out.select(F.col(payload_col).cast("string").alias("value"))
            .writeStream.format("text")
            .option("path", path)
        )
    elif sink == "memory":
        w = (
            out.select(F.col(payload_col).cast("string").alias("value"))
            .writeStream.format("memory")
            .queryName(query_name)
        )
    else:
        raise ValueError(f"unknown sink: {sink}")
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w
