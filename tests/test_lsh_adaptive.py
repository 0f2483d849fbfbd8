"""Scale-adaptive sign-LSH banding (round 11): the per-band bit count
derives from the corpus size — bits(n) = clamp(floor(log2 n) -
BITS_OFFSET, PLANES_PER_BAND, MAX_BITS) — and the SAME derivation must
hold in three places at once: the Python clamp the Spark index build
uses, the SQL clamp every consumer oracle re-derives from COUNT(*),
and the wide-bucket-mask construction the oracles score with. These
tests pin (a) the clamp itself incl. the fixture floor (n <= 2047 →
4 bits, so every sf <= 0.1 hash is unchanged), (b) exact SQL/Python
agreement across the whole relevant n range, (c) Spark-vs-DuckDB
bucket parity at a FORCED bits > 4 (the geometry the scale fixtures
actually use, which the sf0.01 oracle gate alone would never
exercise), and (d) the linearity argument: candidate pairs per band
stay ~n * 2^BITS_OFFSET, not n^2/2^bits with fixed bits."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from iot_sparkstreaming_spark.queries.similarity import (
    BITS_OFFSET,
    MAX_BITS,
    N_BANDS,
    PLANES,
    PLANES_PER_BAND,
    _band_bucket_col,
    _band_bucket_sql,
    _geo_sql,
    _plane_index,
    lsh_bits,
)
from tests.conftest import SF_DIR_ORACLE


def test_bits_clamp_floor_and_cap():
    # fixture floor: every harness SF stays at the original geometry
    for n in (1, 50, 500, 2000, 2047):
        assert lsh_bits(n) == PLANES_PER_BAND
    assert lsh_bits(2048) == 5
    assert lsh_bits(20_000) == 8
    assert lsh_bits(200_000) == 11
    # cap: the literal plane table bounds bits at MAX_BITS
    assert lsh_bits(2 ** 40) == MAX_BITS


def test_sql_derivation_matches_python_exactly():
    con = duckdb.connect()
    for n in list(range(1, 4100, 7)) + [
        2 ** k + d for k in range(10, 30) for d in (-1, 0, 1)
    ]:
        got = con.execute(
            f"SELECT GREATEST({PLANES_PER_BAND}, LEAST({MAX_BITS}, "
            f"CAST(FLOOR(LOG2({n})) AS INT) - {BITS_OFFSET}))"
        ).fetchone()[0]
        assert got == lsh_bits(n), n


def test_plane_index_preserves_fixture_planes():
    # bits < PLANES_PER_BAND map to the ORIGINAL round-3 plane ids —
    # this is what keeps every sf <= 0.1 oracle hash unchanged
    for band in range(N_BANDS):
        for bit in range(PLANES_PER_BAND):
            assert _plane_index(band, bit) == band * PLANES_PER_BAND + bit
    # adaptive bits extend past the original table, no collisions
    seen = set()
    for band in range(N_BANDS):
        for bit in range(MAX_BITS):
            i = _plane_index(band, bit)
            assert 0 <= i < len(PLANES)
            assert i not in seen
            seen.add(i)
    assert len(seen) == N_BANDS * MAX_BITS


@pytest.mark.parametrize("bits", [4, 7, 11])
def test_spark_bucket_matches_duckdb_masked_wide(spark, bits):
    """The Spark build computes only the first `bits` planes; the
    oracle computes all MAX_BITS and masks. Same buckets, per band,
    at every width the scale fixtures can select."""
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    e = emb.select(
        "vec_id",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    got = {
        (r["vec_id"], b): r[f"b{b}"]
        for r in e.select(
            "vec_id",
            *[_band_bucket_col(col("v"), b, bits).alias(f"b{b}") for b in range(N_BANDS)],
        ).collect()
        for b in range(N_BANDS)
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR_ORACLE}/embeddings.parquet'"
    )
    sel = ", ".join(_band_bucket_sql("v", b) + f" AS b{b}" for b in range(N_BANDS))
    rows = con.execute(
        f"""
        WITH geo AS (SELECT {bits} AS bits),
        e AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)
        SELECT vec_id, {sel} FROM e, geo
        """
    ).fetchall()
    want = {(r[0], b): r[1 + b] for r in rows for b in range(N_BANDS)}
    assert got == want


def test_geo_sql_is_the_registered_derivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR_ORACLE}/embeddings.parquet'"
    )
    n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    got = con.execute(_geo_sql()).fetchone()[0]
    assert got == lsh_bits(n)


@pytest.fixture(scope="module")
def big_corpus(spark, tmp_path_factory):
    """A 4,500-vector corpus — 9 key-shifted sign-flipped copies of
    sf0.01's embeddings (the scale10 fixture model: within-copy
    geometry preserved, cross-copy cosines scattered), big enough
    that BOTH adaptive derivations leave their fixture floors:
    lsh_bits selects 6 and ivf_stride selects ceil(4500/67) = 68."""
    import hashlib

    src = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    n_src = src.count()
    copies = []
    for i in range(9):
        signs = F.array(
            *[F.lit(-1.0 if hashlib.md5(f"{i}:{d}".encode()).digest()[0] & 1 else 1.0)
              for d in range(64)]
        )
        c = src.select(
            (col("vec_id") + F.lit(i * n_src)).alias("vec_id"),
            "label",
            (F.zip_with(col("embedding"), signs, lambda x, s: (x * s).cast("float"))
             if i else col("embedding")).alias("embedding"),
        )
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    d = tmp_path_factory.mktemp("adaptive") / "corpus"
    d.mkdir()
    big.write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d), 9 * n_src


def _query_vs_oracle(spark, sf_dir, qname):
    from iot_sparkstreaming_spark.queries.registry import load_all

    q = load_all()[qname]
    sdf = q.spark(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(float(r[c]) if isinstance(r[c], float) else r[c] for c in scols)
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    res = con.execute(q.oracle)
    raw_cols = [dd[0] for dd in res.description]
    dcols = sorted(raw_cols)
    idx = [raw_cols.index(c) for c in dcols]
    drows = sorted(tuple(r[i] for i in idx) for r in res.fetchall())
    assert scols == dcols
    assert len(srows) == len(drows) > 0
    assert srows == drows


def test_full_lsh_query_parity_above_the_floor(spark, big_corpus, monkeypatch, tmp_path):
    """END-TO-END adaptive-geometry check: the registered
    dedup_embedding_cosine query AND its DuckDB oracle, hash-compared
    where lsh_bits selects 6 bits — the regime the sf0.01 driver gate
    can never reach (its 500-vector corpus floors at 4). If the Spark
    build and the SQL _geo_sql clamp ever derive different bit counts
    — or the masked wide bucket diverges from the first-bits
    construction — this splits."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "store"))
    d, n = big_corpus
    assert lsh_bits(n) == 6  # genuinely above the floor
    _query_vs_oracle(spark, d, "dedup_embedding_cosine")


def test_full_ivf_query_parity_above_the_floor(spark, big_corpus, monkeypatch, tmp_path):
    """Same end-to-end discipline for the adaptive IVF stride: the
    registered ann_ivf_cosine query and its oracle on the corpus
    where ivf_stride leaves the 30-floor (4,500 vectors -> stride 68,
    k ~ 66 cells), hash-compared row for row."""
    from iot_sparkstreaming_spark.queries.similarity import ivf_stride

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "store"))
    d, n = big_corpus
    assert ivf_stride(n) > 30  # genuinely above the floor
    _query_vs_oracle(spark, d, "ann_ivf_cosine")


def test_ivf_stride_clamp_and_sql_parity():
    from iot_sparkstreaming_spark.queries.similarity import (
        IVF_FLOOR_N,
        _ivf_stride_sql,
        ivf_stride,
    )

    # fixture floor: every harness SF keeps the stride-30 geometry
    for n in (1, 500, 2000, IVF_FLOOR_N - 1):
        assert ivf_stride(n) == 30
    # above: stride ~ sqrt(n), so k = n // stride ~ sqrt(n)
    assert ivf_stride(IVF_FLOOR_N) == 46
    assert ivf_stride(20_000) == 142
    assert ivf_stride(200_000) == 448
    con = duckdb.connect()
    sql = _ivf_stride_sql("(SELECT UNNEST(RANGE({n})) )")
    for n in list(range(1, 4300, 13)) + [
        k * k + d for k in range(45, 1000, 37) for d in (-1, 0, 1)
    ] + [200_000]:
        got = con.execute(sql.format(n=n)).fetchone()[0]
        assert got == ivf_stride(n), n


def test_candidate_mass_stays_linear_under_adaptive_bits():
    """The policy's point, checked arithmetically: expected candidate
    pairs per band under a uniform sign model is n^2/2^bits; with
    adaptive bits that is <= n * 2^(BITS_OFFSET+1) (linear in n), vs
    the fixed-4-bit n^2/16 the round-10 audit measured OOM-ing."""
    for n in (2_000, 20_000, 200_000, 2_000_000):
        bits = lsh_bits(n)
        if bits < MAX_BITS:  # inside the adaptive range
            expected_pairs = n * n / (2 ** bits)
            assert expected_pairs <= n * 2 ** (BITS_OFFSET + 1)
