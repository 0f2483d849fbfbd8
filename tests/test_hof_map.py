"""Higher-order array functions, map functions, and JSON round-trips:
the remaining scalar surface not exercised by registered queries,
pinned against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_higher_order_array_functions(spark):
    df = spark.createDataFrame([([3, 1, 4, 1, 5, 9, 2, 6],)], ["xs"])
    row = df.select(
        F.filter("xs", lambda x: x % 2 == 0).alias("evens"),
        F.exists("xs", lambda x: x > 8).alias("has_big"),
        F.forall("xs", lambda x: x > 0).alias("all_pos"),
        F.transform("xs", lambda x: x * x).alias("squares"),
        F.aggregate("xs", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("total"),
        F.zip_with("xs", "xs", lambda a, b: a + b).alias("doubled"),
        F.array_sort("xs").alias("sorted"),
        F.slice("xs", 2, 3).alias("sliced"),
        F.flatten(F.array(F.col("xs"), F.col("xs"))).alias("flat"),
    ).collect()[0]
    assert row.evens == [4, 2, 6]
    assert row.has_big is True and row.all_pos is True
    assert row.squares == [9, 1, 16, 1, 25, 81, 4, 36]
    assert row.total == 31
    assert row.doubled == [6, 2, 8, 2, 10, 18, 4, 12]
    assert row.sorted == [1, 1, 2, 3, 4, 5, 6, 9]
    assert row.sliced == [1, 4, 1]
    assert len(row.flat) == 16


def test_map_functions(spark):
    df = spark.range(1).select(
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit(1), F.lit(2))
        ).alias("m")
    )
    row = df.select(
        F.map_keys("m").alias("ks"),
        F.map_values("m").alias("vs"),
        F.element_at("m", F.lit("b")).alias("b"),
        F.size("m").alias("n"),
        F.map_concat(
            "m", F.map_from_arrays(F.array(F.lit("c")), F.array(F.lit(3)))
        ).alias("m2"),
        F.transform_values("m", lambda _k, v: v * 10).alias("v10"),
        F.map_filter("m", lambda k, _v: k == "a").alias("onlya"),
    ).collect()[0]
    assert sorted(row.ks) == ["a", "b"] and sorted(row.vs) == [1, 2]
    assert row.b == 2 and row.n == 2
    assert sorted(row.m2.items()) == [("a", 1), ("b", 2), ("c", 3)]
    assert sorted(row.v10.items()) == [("a", 10), ("b", 20)]
    assert dict(row.onlya) == {"a": 1}
    # str_to_map: the classic "k1:v1,k2:v2" config-string parse
    parsed = (
        spark.range(1)
        .select(F.str_to_map(F.lit("x:1,y:2"), F.lit(","), F.lit(":")).alias("m"))
        .collect()[0]
        .m
    )
    assert sorted(parsed.items()) == [("x", "1"), ("y", "2")]


def test_json_struct_round_trip(spark):
    """to_json(from_json(x)) == canonical form; struct access after
    parse matches the raw extraction path used by json_extract_events."""
    df = spark.createDataFrame([('{"k": 87}',), ('{"k": 0}',)], ["props"])
    parsed = df.select(
        F.from_json("props", "k BIGINT").alias("p"), "props"
    ).select(
        F.col("p.k").alias("k"),
        F.to_json("p").alias("rt"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k2"),
    )
    rows = {r.k: r for r in parsed.collect()}
    assert set(rows) == {87, 0}
    assert rows[87].rt == '{"k":87}' and rows[87].k2 == 87
    assert rows[0].k2 == 0
