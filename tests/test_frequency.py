"""Heavy hitters (Misra–Gries + exact verify) and Bloom-pruned join."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_heavy_hitters_equals_exact_groupby(spark):
    # skewed fixture: token i appears i times, plus one dominant token
    rows = [(f"t{i}",) for i in range(1, 40) for _ in range(i)] + [
        ("dominant",)
    ] * 300
    df = spark.createDataFrame(rows, ["term"]).repartition(8)
    n = df.count()
    frac = 0.02
    import math

    min_cnt = math.ceil(n * frac)
    exact = {
        (r["term"], r["cnt"])
        for r in df.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_cnt)
        .collect()
    }
    from knowledge_model_spark.operators.frequency import heavy_hitters

    got = {
        (r["item"], r["cnt"]) for r in heavy_hitters(df, "term", frac).collect()
    }
    assert got == exact and len(exact) > 0


def test_heavy_hitters_exact_at_threshold_edge(spark):
    # item exactly AT the ceil(n*frac) threshold must be kept
    rows = [("hot",)] * 10 + [(f"c{i}",) for i in range(90)]
    df = spark.createDataFrame(rows, ["term"]).repartition(4)
    from knowledge_model_spark.operators.frequency import heavy_hitters

    got = dict(
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "term", 0.10).collect()
    )
    assert got == {"hot": 10}


def test_heavy_hitters_empty_and_nulls(spark):
    from knowledge_model_spark.operators.frequency import heavy_hitters

    empty = spark.createDataFrame([], "term string")
    assert heavy_hitters(empty, "term", 0.5).count() == 0
    nulls = spark.createDataFrame([(None,), ("a",), ("a",)], "term string")
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(nulls, "term", 0.5).collect()}
    assert got == {("a", 2)}  # nulls don't count as items (but do count rows)


def test_bloom_pruned_join_equals_plain_join(spark, tables):
    from knowledge_model_spark.operators.bloom import bloom_member, bloom_pruned_join

    build = tables["orders"].filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_totalprice"
    )
    probe = tables["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    got = bloom_pruned_join(probe, build, "o_orderkey", num_bits=1 << 14)
    exp = probe.join(build, "o_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))

    # and the bitmap really prunes: membership keeps a strict subset
    from knowledge_model_spark.operators.bloom import build_bloom

    words = build_bloom(build.select("o_orderkey"), "o_orderkey", 1 << 14)
    kept = probe.filter(bloom_member(F.col("o_orderkey"), words)).count()
    assert exp.count() <= kept < probe.count()


def test_bloom_member_no_false_negatives_small_bitmap(spark):
    # tiny bitmap = many false positives, but NEVER a false negative
    from knowledge_model_spark.operators.bloom import bloom_member, build_bloom

    keys = spark.range(500).select((F.col("id") * 7).alias("k"))
    words = build_bloom(keys, "k", num_bits=64 * 4)
    survivors = keys.filter(bloom_member(F.col("k"), words)).count()
    assert survivors == 500
