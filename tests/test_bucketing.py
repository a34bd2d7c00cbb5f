"""Bucketed co-located join: correctness + the no-shuffle plan guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from knowledge_model_spark.sources.bucketing import bucketed_join, write_bucketed

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, str(base / "orders_b"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        str(base / "lineitem_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # At test scale Catalyst prefers broadcast (also shuffle-free but not
    # the property under test); force SMJ to expose the bucketing path a
    # 100 TB fact-fact join would take.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located: both sides report HashPartitioning(o_orderkey, 8),
        # so the sort-merge join needs no shuffle at all.
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
    n_bucketed = joined.count()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_plain = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert n_bucketed == n_plain > 0


def test_bucket_pruning_point_lookup(spark, bucketed_tables):
    # A point predicate on the bucket key scans a subset of buckets.
    some_key = spark.table("orders_b").select(F.min("o_orderkey")).first()[0]
    got = spark.table("orders_b").filter(F.col("o_orderkey") == some_key).count()
    assert got >= 1


def test_salted_join_parity_on_skewed_keys(spark):
    """salted_join must return exactly what a plain equi-join returns on a
    hot-key-dominated input, while spreading the hot key across salt
    partitions (the skew mitigation it exists for)."""
    from knowledge_model_spark.operators.relational import salted_join

    # 90% of left rows share key=1 — the classic skew shape.
    left = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (5, "a"), (15, "b"), (25, "c")], ["k", "v"]
    )
    got = sorted(map(tuple, salted_join(left, right, "k", n_salt=8).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want and len(got) > 4000

    # determinism: salt comes from a hash of the left row, not randomness
    again = sorted(map(tuple, salted_join(left, right, "k", n_salt=8).collect()))
    assert again == got


def test_hot_key_salted_join_parity_and_selective_replication(spark):
    """hot_key_salted_join must equal the plain equi-join while salting
    only the keys above the threshold (the tail is left untouched)."""
    from pyspark.sql import functions as F

    from knowledge_model_spark.operators.relational import hot_key_salted_join

    # key 0 is hot (3000 rows), keys 1..50 hold ~20 rows each
    left = (
        spark.range(4000)
        .select(
            F.when(F.col("id") < 3000, F.lit(0))
            .otherwise((F.col("id") % 50) + 1)
            .alias("k"),
            F.col("id").alias("lv"),
        )
    )
    right = spark.range(51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    want = sorted(map(tuple, left.join(right, "k").collect()))
    got = sorted(
        map(
            tuple,
            hot_key_salted_join(
                left, right, "k", n_salt=8, hot_threshold=100
            ).collect(),
        )
    )
    assert got == want and len(got) == 4000
    # determinism across partitionings
    again = sorted(
        map(
            tuple,
            hot_key_salted_join(
                left.repartition(16), right, "k", n_salt=8, hot_threshold=100
            ).collect(),
        )
    )
    assert again == want


def test_hot_key_salted_join_left_outer(spark):
    from pyspark.sql import functions as F

    from knowledge_model_spark.operators.relational import hot_key_salted_join

    left = spark.range(200).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("rv"))
    want = sorted(map(tuple, left.join(right, "k", "left").collect()))
    got = sorted(
        map(
            tuple,
            hot_key_salted_join(
                left, right, "k", n_salt=4, hot_threshold=10, how="left"
            ).collect(),
        )
    )
    assert got == want
