"""Portable sketch building blocks shared by the batch queries
(queries/functions.py ``hll_portable_events`` / ``cms_heavy_hitters``)
and their streaming twins (streaming/stateful.py ``streaming_hll`` /
``streaming_cms``): HyperLogLog registers and the count-min grid.

Everything here is pure int64 arithmetic that BOTH engines (Spark
expressions here, DuckDB SQL in the oracle) and plain Python (the
streaming state fold) evaluate identically — that shared-by-
construction projection is what makes the streaming twin's parity a
statement about REGISTER MERGEABILITY rather than about hashing.

Geometry: p = 8 → m = 256 registers; the hashed key's top 8 bits pick
the register, the remaining HLL_W = 24 bits feed the leading-zero
rank (rho ∈ 1..25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^8 registers (p = 8).
HLL_M = 256
#: remainder width in bits.
HLL_W = 24
#: alpha_256 = 0.7182725932... (Flajolet et al. 2007), scaled by 1e6
#: and truncated — a FIXED public constant so every evaluator uses the
#: same alpha.
HLL_ALPHA_E6 = 718272
#: alpha_e6 * m^2 * 2^(HLL_W+1) — the estimator numerator, precomputed
#: exactly in Python ints (≈1.58e18, inside int64).
HLL_NUM = HLL_ALPHA_E6 * (1 << 41)
#: an empty register contributes 2^(W+1-0) = 2^25 to Z_num.
HLL_EMPTY_TERM = 1 << (HLL_W + 1)

#: exact integer bit-length of a 24-bit remainder via an unrolled CASE —
#: the one construct both engines evaluate identically (log2/bin() round
#: or format differently across engines; 24 integer compares cannot).
HLL_BITLEN_CASE = (
    "CASE "
    + " ".join(f"WHEN w >= {1 << (b - 1)} THEN {b}" for b in range(HLL_W, 0, -1))
    + " ELSE 0 END"
)


#: the daily-active user-day key over the events schema — the default
#: distinct-cardinality target (n >> 2.5m, the raw-estimator regime).
HLL_KEY_SQL_DEFAULT = (
    "user_id * 131072"
    " + datediff(CAST(ts AS DATE), DATE '1970-01-01') % 131072"
)


def hll_bucket_rho(df: DataFrame, key_sql: str, *carry: str) -> DataFrame:
    """Project ``key_sql`` (an int64-valued SQL expression over ``df``)
    to HLL ``(bucket, rho)`` via the public Thomas-Mueller/degski
    32-bit avalanche mix (h ^= h>>16; h *= 0x45d9f3b; twice; final
    xor-shift). Constants below 2^27 keep every product under 2^59, so
    the whole mix runs in int64 — no 128-bit ops, no engine-private
    hash. ``carry`` columns ride along untouched.

    (A plain Knuth multiplicative hash maps SEQUENTIAL ids to a
    near-perfect Weyl spread — 149 occupied buckets from 150 keys —
    silently voiding the estimator's randomness assumption; the mixer
    restores it.)
    """
    keys = df.select(*carry, F.expr(key_sql).alias("k"))
    m0 = keys.select(*carry, F.expr("k % 4294967296").alias("h0"))
    m1 = m0.select(
        *carry, F.expr("((h0 ^ (h0 div 65536)) * 73244475) % 4294967296").alias("h1")
    )
    m2 = m1.select(
        *carry, F.expr("((h1 ^ (h1 div 65536)) * 73244475) % 4294967296").alias("h2")
    )
    h = m2.select(*carry, F.expr("h2 ^ (h2 div 65536)").alias("h32"))
    return h.select(
        *carry,
        F.expr(f"h32 div {1 << HLL_W}").alias("bucket"),
        F.expr(
            f"{HLL_W + 1} - ("
            + HLL_BITLEN_CASE.replace("w >=", f"(h32 % {1 << HLL_W}) >=")
            + ")"
        ).alias("rho"),
    )


def hll_estimate_from_znum(z_num: int) -> int:
    """The harmonic-mean estimator as ONE bigint floor-division —
    the exact Python twin of the engines' ``HLL_NUM div (1e6*Z_num)``."""
    return HLL_NUM // (1000000 * z_num)


def hll_znum(registers: list[int]) -> int:
    """Z_num = sum(2^(W+1-M_j)) over all ``HLL_M`` registers (M_j = 0
    for an empty register) — the integer-rational harmonic denominator."""
    return sum(1 << (HLL_W + 1 - m) for m in registers)


# ---------------------------------------------------------------------------
# Count-min sketch geometry + shared projection (HLL's frequency twin)
# ---------------------------------------------------------------------------

#: sketch geometry: 4 rows x 1024 buckets = 4 KiB of counters per
#: (grain, row) — small enough to broadcast, mergeable by cell-wise add.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_j_bucket(df: DataFrame, key_col: str, *carry: str) -> DataFrame:
    """Project each input row to its ``CMS_DEPTH`` count-min cells
    ``(j, bucket)`` with ``bucket = xxhash64(key, j) mod CMS_WIDTH`` —
    the SHARED Spark-side expression used by both the batch
    ``cms_heavy_hitters`` sketch build (queries/functions.py) and the
    streaming register twin (streaming/stateful.py ``streaming_cms``),
    so twin parity is a statement about CELL-WISE ADD mergeability
    across micro-batches, not about replaying a hash. JVM-side
    (sequence/explode/xxhash64), no UDF; ``carry`` columns ride along
    untouched, as does ``key_col`` itself (probe-side consumers group
    back on it)."""
    return df.select(
        F.col(key_col),
        *carry,
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j"),
    ).select(
        F.col(key_col),
        *carry,
        F.col("j"),
        F.pmod(F.xxhash64(F.col(key_col), F.col("j")), F.lit(CMS_WIDTH)).alias(
            "bucket"
        ),
    )
