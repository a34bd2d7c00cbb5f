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
from knowledge_model_spark.session import load_tables
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


# ----------------------------------------- training-pipeline additions

def test_length_batching_beats_unsorted_on_padding(spark):
    """Sorting by length before batching is the whole point: total
    padding waste must be far below batching in doc_id order."""
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.plans.training_queries import _BATCH_DOCS

    sorted_out = (
        load_registry()["training_length_batching"].fn(spark, SF_DIR).collect()
    )
    sorted_waste = sum(r["pad_waste"] for r in sorted_out)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_tok = F.size(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")), " "
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    unsorted_waste = (
        docs.select("doc_id", n_tok.alias("n_tok"))
        .select(
            "n_tok",
            F.floor((F.row_number().over(w) - 1) / _BATCH_DOCS).alias("batch_id"),
        )
        .groupBy("batch_id")
        .agg((F.count("*") * F.max("n_tok") - F.sum("n_tok")).alias("waste"))
        .agg(F.sum("waste"))
        .first()[0]
    )
    assert sorted_waste < 0.5 * unsorted_waste, (sorted_waste, unsorted_waste)
    # every full batch's efficiency is Σlen/(n·max) ∈ (0, 1]
    assert all(0 < r["efficiency"] <= 1 for r in sorted_out)


def test_target_mixture_hits_quotas_and_is_stable(spark):
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.plans.training_queries import (
        _MIX_BUDGET,
        _MIX_TARGET,
    )

    fn = load_registry()["sample_target_mixture"].fn
    out = fn(spark, SF_DIR).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    for s, w in _MIX_TARGET.items():
        quota = int(_MIX_BUDGET * w)
        # quota met exactly when the source has enough docs
        assert len(by_src.get(s, set())) <= quota
    # content-addressed: a second run draws the identical set
    out2 = fn(spark, SF_DIR).collect()
    assert {(r["source"], r["doc_id"]) for r in out} == {
        (r["source"], r["doc_id"]) for r in out2
    }


def test_span_corruption_round_trips_tokens(spark):
    """Input with sentinels spliced back from the target must reproduce
    the normalized document — nothing lost, nothing duplicated."""
    import re

    from knowledge_model_spark.plans import load_registry

    out = load_registry()["training_span_corruption"].fn(spark, SF_DIR).collect()
    assert out
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.pmod("doc_id", F.lit(5)) == 0)
        .collect()
    }
    for r in out[:50]:
        # parse target into {sentinel: span}
        parts = re.split(r"(<extra_id_\d+>)", r["target_text"])
        spans = {}
        for i in range(1, len(parts) - 1, 2):
            spans[parts[i]] = parts[i + 1].strip()
        if parts and parts[-1].startswith("<extra_id_"):
            spans[parts[-1]] = ""
        rebuilt = re.sub(
            r"<extra_id_\d+>", lambda m: spans.get(m.group(0), "?"), r["input_text"]
        )
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        norm = re.sub(r"[^a-z0-9]+", " ", docs[r["doc_id"]].lower()).strip()
        norm = re.sub(r"\s+", " ", norm)
        assert rebuilt == norm, r["doc_id"]
        assert 0 <= r["corruption_ratio"] <= 1
        assert r["n_spans"] == len(spans)


def test_partition_balance_reports_current_layout(spark):
    from knowledge_model_spark.operators.relational import partition_balance

    df = spark.range(1000).repartition(8)
    rep = partition_balance(df).collect()
    assert len(rep) == 8
    assert sum(r["n_rows"] for r in rep) == 1000
    # round-robin repartition must be near-uniform
    counts = [r["n_rows"] for r in rep]
    assert max(counts) - min(counts) <= 2


def test_jl_pandas_fallback_bit_identical_to_codegen(spark):
    """The two jl_project paths (literal add-chain vs Arrow kernel) use
    the same content-addressed matrix and the same left-to-right float64
    fold — outputs must be BIT-identical, not just close."""
    from knowledge_model_spark.operators.projection import jl_project

    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"].select("vec_id", "embedding").limit(200)
    a = jl_project(emb, in_dim=64, out_dim=16)  # codegen (1024 terms)
    b = jl_project(emb, in_dim=64, out_dim=16, max_codegen_terms=1)  # pandas
    rows_a = {r["vec_id"]: [r[f"proj_{j}"] for j in range(16)] for r in a.collect()}
    rows_b = {r["vec_id"]: [r[f"proj_{j}"] for j in range(16)] for r in b.collect()}
    assert rows_a == rows_b  # exact equality, no tolerance


def test_jl_large_dims_auto_fall_back_past_codegen_limit(spark):
    """r3 verdict item: scaling dims past the term threshold must not
    hand Janino a 64KB+ method — the plan switches to ArrowEvalPython
    and still runs green."""
    from pyspark.sql import functions as F

    from knowledge_model_spark.operators.projection import jl_project

    t = load_tables(spark, SF_DIR)
    # synthesize a 128-dim input by concatenating the 64-dim embedding
    wide = t["embeddings"].select(
        "vec_id", F.concat("embedding", "embedding").alias("embedding")
    ).limit(50)
    out = jl_project(wide, in_dim=128, out_dim=64)  # 8192 terms > 4096
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["proj_63"] is not None for r in rows)
    # under the threshold the codegen path is kept
    small = jl_project(t["embeddings"].limit(1), in_dim=64, out_dim=16)
    assert "EvalPython" not in small._jdf.queryExecution().executedPlan().toString()


def test_zca_whitening_audit_gates(spark, tables):
    """embeddings_zca_whitening (r8): the whitened table's measured
    moments must be identity-like (mean ~0, var ~1, off-diag ~0), the
    result is byte-stable across runs, and W is verified ZCA on the
    driver (symmetric, whitens the measured covariance)."""
    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    rows = R["embeddings_zca_whitening"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 64
    for r in rows:
        assert abs(r["mean_w"]) < 1e-9
        assert abs(r["var_w"] - 1.0) < 1e-6
        assert r["max_abs_offdiag"] < 1e-6
    again = R["embeddings_zca_whitening"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_zca_whitening_rank_deficient_no_nan(spark):
    """r8 review fix: the cancellation-prone covariance form can hand
    eigh a tiny NEGATIVE eigenvalue; the clamp must keep W finite on
    rank-deficient, large-mean data."""
    import math

    from knowledge_model_spark.operators.projection import (
        zca_whitening_audit,
    )

    base = [1000.0 + (d % 3) for d in range(8)]
    rows = [
        (i, [v + (i % 2) * 1e-6 for v in base]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = zca_whitening_audit(df, "vec_id", "embedding", 8).collect()
    assert len(out) == 8
    for r in out:
        for c in ("mean_w", "var_w", "max_abs_offdiag"):
            assert math.isfinite(r[c]), (r["dim"], c)
