"""JL projection, gazetteer tagging, and KL-divergence operator tests.

Oracle parity for all three is covered by the parametrized
test_oracle_parity sweep; these tests pin the operator-level contracts
the oracle can't see: distance preservation, partition invariance, and
distribution-theoretic sanity.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.operators.projection import (
    jl_project,
    jl_sign,
    jl_sign_matrix,
)
from tests.conftest import SF_DIR


def test_jl_sign_matrix_deterministic_and_balanced():
    m1 = jl_sign_matrix(64, 16)
    m2 = jl_sign_matrix(64, 16)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {-1, 1}
    # md5 nibbles are uniform: the sign balance should be near 50/50
    pos = sum(1 for s in flat if s > 0)
    assert 0.4 < pos / len(flat) < 0.6
    # rows must differ (distinct projection directions)
    assert len({tuple(r) for r in m1}) == 16


def test_jl_sign_is_content_addressed():
    # same (d, j) -> same sign, independent of call order / dimension
    assert jl_sign(3, 7) == jl_sign(3, 7)
    assert jl_sign_matrix(8, 4)[2][5] == jl_sign(5, 2)


@pytest.fixture(scope="module")
def projected(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    return jl_project(emb, "embedding", in_dim=64, out_dim=16).cache()


def test_jl_preserves_pairwise_distance_in_expectation(projected):
    """E[||proj(u)-proj(v)||^2] = ||u-v||^2 for a Rademacher JL matrix;
    at k=16 individual pairs fluctuate but the median ratio over many
    pairs must sit near 1."""
    rows = projected.collect()
    ratios = []
    for i in range(0, len(rows) - 1, 2):
        a, b = rows[i], rows[i + 1]
        d2 = sum(
            (float(x) - float(y)) ** 2 for x, y in zip(a["embedding"], b["embedding"])
        )
        p2 = sum(
            (a[f"proj_{j}"] - b[f"proj_{j}"]) ** 2 for j in range(16)
        )
        if d2 > 0:
            ratios.append(p2 / d2)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.6 < med < 1.6, f"median distortion {med}"


def test_jl_projection_partition_invariant(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    a = {
        r["vec_id"]: r["proj_0"]
        for r in jl_project(emb, out_dim=4).select("vec_id", "proj_0").collect()
    }
    b = {
        r["vec_id"]: r["proj_0"]
        for r in jl_project(emb.repartition(7), out_dim=4)
        .select("vec_id", "proj_0")
        .collect()
    }
    assert a == b  # bit-identical, not approximately


def test_jl_projection_is_jvm_only(projected):
    plan = projected._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # scan-speed map, no shuffle


def test_keyword_tags_are_dictionary_ordered_and_deduped(spark):
    from knowledge_model_spark.plans import load_registry

    out = load_registry()["text_keyword_tag"].fn(spark, SF_DIR).collect()
    from knowledge_model_spark.plans.text_queries import _GAZETTEER

    order = {w: i for i, w in enumerate(_GAZETTEER)}
    for r in out:
        tags = r["tags"].split(";") if r["tags"] else []
        assert len(tags) == len(set(tags))
        assert tags == sorted(tags, key=order.__getitem__)
        assert r["n_tags"] == len(tags)


def test_kl_divergence_nonnegative_and_stable(spark):
    from knowledge_model_spark.plans import load_registry

    fn = load_registry()["corpus_kl_divergence"].fn
    a = {r["source"]: r["kl"] for r in fn(spark, SF_DIR).collect()}
    assert a and all(v >= 0 for v in a.values())
    # determinism across runs (fold order may differ; round(.,6) absorbs it)
    b = {r["source"]: r["kl"] for r in fn(spark, SF_DIR).collect()}
    assert a == b


def test_jl_scale_factor_matches_definition(projected):
    # proj_j = sum_d sign*v_d / sqrt(k): reconstruct one row by hand
    row = projected.orderBy("vec_id").first()
    m = jl_sign_matrix(64, 16)
    expect = sum(s * float(v) for s, v in zip(m[0], row["embedding"])) / math.sqrt(16)
    assert abs(row["proj_0"] - expect) < 1e-9
