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


def test_ivfpq_recall_gate_and_determinism(spark, tables):
    from knowledge_model_spark.operators.quantization import ivfpq_top_k

    q = _queries(tables)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_top_k(tables["embeddings"], q, **KW).collect()
    }
    out1 = sorted(map(tuple, ivfpq_top_k(tables["embeddings"], q, **KW).collect()))
    approx = {(r[0], r[1]) for r in out1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.80, f"IVFPQ recall {recall} below the reference gate"
    out2 = sorted(map(tuple, ivfpq_top_k(tables["embeddings"], q, **KW).collect()))
    assert out1 == out2


def test_ivfpq_multi_assign_improves_recall(spark, tables):
    """The n_assign lever must actually buy recall on this corpus —
    guards against the boundary-miss regression the default exists for."""
    from knowledge_model_spark.operators.quantization import ivfpq_top_k

    q = _queries(tables)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_top_k(tables["embeddings"], q, **KW).collect()
    }

    def recall(na):
        a = {
            (r["query_id"], r["vec_id"])
            for r in ivfpq_top_k(
                tables["embeddings"], q, n_assign=na, **KW
            ).collect()
        }
        return len(exact & a) / len(exact)

    assert recall(3) >= recall(1)


def test_all_ann_methods_pass_gate_at_oracle_sf(spark):
    """The recall gate must hold at the larger oracle SF too — IVFPQ
    regressed to 0.72 at a 4× corpus with an undersized re-rank
    shortlist while every sf0.001 test stayed green; this pins the
    cross-scale behavior."""
    from tests.conftest import ORACLE_SF_DIR
    from knowledge_model_spark.plans import load_registry

    reg = load_registry()
    rows = reg["eval_ann_recall_vs_exact"].fn(spark, ORACLE_SF_DIR).collect()
    recalls = {r["method"]: r["recall"] for r in rows}
    assert set(recalls) == {"lsh", "ivf", "pq", "ivfpq", "sq8"}
    for method, rec in recalls.items():
        assert rec >= 0.80, f"{method} recall {rec} below gate at oracle SF"


def test_sq8_recall_gate_and_determinism(spark, tables):
    """SQ8 (all-JVM scalar quantization): recall vs exact ≥ 0.9 — an
    8-bit-per-dim code is far finer than PQ's subspace codes, so the
    gate is tighter — and partition-invariant determinism."""
    from knowledge_model_spark.operators.quantization import sq8_top_k

    q = _queries(tables)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_top_k(tables["embeddings"], q, **KW).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in sq8_top_k(tables["embeddings"], q, **KW).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.90, f"SQ8 recall {recall} below gate"

    a = sorted(tuple(r) for r in sq8_top_k(tables["embeddings"], q, **KW).collect())
    b = sorted(
        tuple(r)
        for r in sq8_top_k(
            tables["embeddings"].repartition(9), q.repartition(3), **KW
        ).collect()
    )
    assert a == b and len(a) > 0


def test_sq8_no_python_in_scan_plan(spark, tables):
    """The SQ8 scoring scan must stay in whole-stage codegen — no
    Arrow/Python eval anywhere in the plan (PQ needs a kernel for
    encoding; SQ8's selling point is that it doesn't)."""
    from knowledge_model_spark.operators.quantization import sq8_top_k

    q = _queries(tables)
    df = sq8_top_k(tables["embeddings"], q, **KW)
    # final exact re-rank uses JVM dot too — the whole plan is Python-free
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "ArrowEval" not in plan
