"""Connected components over dup-pair graphs (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.operators.graph import (
    connected_components,
    dedup_cluster_survivors,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        (r.node, r.component)
        for r in connected_components(df, **kw).collect()
    }


def test_triangle_and_isolated_pair(spark):
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges_by_pointer_jumping(spark):
    # a 64-node path: plain propagation needs 63 rounds; with pointer
    # jumping ~log2(63) — must finish well inside max_iter=10
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_iter=10)
    assert got == {(i, 0) for i in range(64)}


def test_component_is_min_reachable_id_regardless_of_edge_direction(spark):
    # edges deliberately point "away" from the minimum
    got = _cc(spark, [(9, 4), (4, 7), (8, 9)])
    assert got == {(4, 4), (7, 4), (8, 4), (9, 4)}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(20)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_cluster_survivors_keeps_min_per_cluster_and_all_nonmembers(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], ["id_a", "id_b"])
    kept = sorted(
        r.doc_id for r in dedup_cluster_survivors(docs, pairs, "doc_id").collect()
    )
    # cluster {1,2,5} keeps 1; cluster {6,7} keeps 6; 0,3,4 untouched
    assert kept == [0, 1, 3, 4, 6]


def test_deterministic_across_repartitionings(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components(df.repartition(7)).collect()))
    assert a == b
