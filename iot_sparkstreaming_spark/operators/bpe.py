"""BPE tokenizer training as a distributed iterative operator.

Greedy byte-pair-encoding training is a driver-controlled loop (like
:mod:`iot_sparkstreaming_spark.operators.graph`): each round counts
adjacent token pairs corpus-wide, picks the most frequent pair
(deterministic tie-break), and merges its occurrences greedily
left-to-right.

The greedy merge is a sequential recurrence — merge[i] = match[i] ∧
¬merge[i-1] — that window functions cannot express directly. The
run-parity identity closes it: within each maximal run of CONSECUTIVE
match positions, exactly the odd-ranked ones merge ("a a a a" with
pair (a,a) → "(a a)(a a)"). Runs longer than 1 only occur for
self-pairs (p1 == p2), but the identity is correct in general.

State is (doc_id, pos, tok) hash-partitioned by doc_id; every window
in a round is per-document, so one partitioning serves a whole round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def bpe_train(state: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE rounds over ``state`` (doc_id, pos, tok;
    pos dense 1..n per doc) and return the merge table
    [(step, p1, p2, n_occurrences), ...]. Stops early if no pair is
    left. The per-round driver action is the 1-row argmax collect —
    the same class as the components loop's convergence count."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        paired = state.select(
            "doc_id", "pos", "tok", F.lead("tok").over(w).alias("nxt")
        )
        tops = (
            paired.filter(col("nxt").isNotNull())
            .groupBy(col("tok").alias("p1"), col("nxt").alias("p2"))
            .agg(F.count("*").alias("n"))
            .orderBy(col("n").desc(), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not tops:
            break
        top = tops[0]
        merges.append((step, top.p1, top.p2, top.n))
        mt = (col("tok") == F.lit(top.p1)) & col("nxt").eqNullSafe(F.lit(top.p2))
        marked = (
            paired.withColumn("mt", mt)
            .withColumn(
                "head",
                (
                    col("mt") & ~F.coalesce(F.lag("mt").over(w), F.lit(False))
                ).cast("int"),
            )
            .withColumn(
                "grp",
                F.sum("head").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
        )
        rk_w = Window.partitionBy("doc_id", "grp", "mt").orderBy("pos")
        merged = marked.withColumn(
            "mrg",
            F.when(col("mt"), F.row_number().over(rk_w) % 2 == 1).otherwise(
                F.lit(False)
            ),
        ).withColumn("consumed", F.coalesce(F.lag("mrg").over(w), F.lit(False)))
        # state re-materializes each round: the next round's pair count
        # and merge transform both consume it, and lineage across many
        # merge rounds would otherwise deepen unboundedly
        state = (
            merged.filter(~col("consumed"))
            .select(
                "doc_id",
                F.row_number().over(w).cast("bigint").alias("pos"),
                F.when(
                    col("mrg"), F.concat_ws(" ", col("tok"), col("nxt"))
                ).otherwise(col("tok")).alias("tok"),
            )
            .localCheckpoint(eager=True)
        )
    return merges


def bpe_apply(state: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """ENCODE with a fixed merge table: replay each (p1, p2) merge in
    table order via the same run-parity greedy transform as training,
    without the per-round argmax. Returns the final (doc_id, pos,
    tok) state.

    Unlike training (whose per-round driver action forces
    materialization), apply has NO driver action — rounds lazy-chain
    into one plan, checkpointed every 3 merges only to keep lineage
    (and the window-stack depth) bounded. Order matters: a later
    merge may consume an earlier merge's output token, exactly like
    a shipped BPE tokenizer's ranked merge list."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    for i, (p1, p2) in enumerate(merges, 1):
        paired = state.select(
            "doc_id", "pos", "tok", F.lead("tok").over(w).alias("nxt")
        )
        mt = (col("tok") == F.lit(p1)) & col("nxt").eqNullSafe(F.lit(p2))
        marked = (
            paired.withColumn("mt", mt)
            .withColumn(
                "head",
                (
                    col("mt") & ~F.coalesce(F.lag("mt").over(w), F.lit(False))
                ).cast("int"),
            )
            .withColumn(
                "grp",
                F.sum("head").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
        )
        rk_w = Window.partitionBy("doc_id", "grp", "mt").orderBy("pos")
        merged = marked.withColumn(
            "mrg",
            F.when(col("mt"), F.row_number().over(rk_w) % 2 == 1).otherwise(
                F.lit(False)
            ),
        ).withColumn("consumed", F.coalesce(F.lag("mrg").over(w), F.lit(False)))
        state = merged.filter(~col("consumed")).select(
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("pos"),
            F.when(
                col("mrg"), F.concat_ws(" ", col("tok"), col("nxt"))
            ).otherwise(col("tok")).alias("tok"),
        )
        if i % 3 == 0:
            state = state.localCheckpoint(eager=True)
    return state
