"""PQ ANN: recall gate vs exact, determinism, codebook/codes invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.operators.quantization import pq_top_k, pq_train
from knowledge_model_spark.operators.similarity import brute_force_top_k

KW = dict(
    corpus_id="vec_id",
    corpus_vec="embedding",
    query_id="query_id",
    query_vec="qv",
    k=10,
)


def _queries(tables, n=5):
    return (
        tables["embeddings"]
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )


def test_pq_recall_gate(spark, tables):
    q = _queries(tables)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_top_k(tables["embeddings"], q, **KW).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in pq_top_k(tables["embeddings"], q, **KW).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.80, f"PQ recall {recall} below the reference gate"


def test_pq_deterministic_and_rescale_stable(spark, tables):
    q = _queries(tables)
    a = sorted(
        tuple(r) for r in pq_top_k(tables["embeddings"], q, **KW).collect()
    )
    b = sorted(
        tuple(r)
        for r in pq_top_k(
            tables["embeddings"].repartition(9), q.repartition(3), **KW
        ).collect()
    )
    assert a == b and len(a) > 0


def test_pq_train_shapes_and_reuse(spark, tables):
    cb = pq_train(tables["embeddings"], "vec_id", "embedding", m=8, ksub=16, n_iter=1)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8  # 64/8
    # pre-trained codebooks skip training inside pq_top_k and still rank
    q = _queries(tables)
    out = pq_top_k(tables["embeddings"], q, codebooks=cb, **KW).collect()
    assert len(out) == 5 * 10
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())
