"""Embed-seam tests: pluggable model UDF (reference: build_faiss.py:69-85).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

def test_embed_seam_injected_model_and_default(spark):
    """embed() routes text through an injected pandas-UDF model verbatim
    and ships its vectors unchanged; the default path is hash_embed."""
    import math

    from knowledge_model_spark.operators.retrieval import embed, stats_model_udf

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta"), (2, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["v"]
        for r in embed(docs, "text", model_udf=stats_model_udf(), out_col="v").collect()
    }

    def expected(t):
        v = [
            float(len(t)),
            float(len([w for w in t.split() if w])),
            float(sum(t.lower().count(c) for c in "aeiou")),
            1.0,
        ]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    for doc_id, text in [(0, "alpha beta gamma"), (1, "delta"), (2, "")]:
        assert out[doc_id] == pytest.approx(expected(text), abs=1e-12)

    # default path: hash_embed, L2-normalized, deterministic
    dft = embed(docs.filter("doc_id < 2"), "text", dim=16, out_col="v").collect()
    for r in dft:
        assert abs(sum(x * x for x in r["v"]) - 1.0) < 1e-9

    # downstream parity: retrieval over injected-model vectors behaves
    # like retrieval over any normalized vector column (cosine of a doc
    # with itself is 1.0)
    from knowledge_model_spark.operators.similarity import brute_force_top_k

    vecs = embed(docs, "text", model_udf=stats_model_udf(), out_col="v")
    qs = vecs.filter("doc_id = 0").select(
        F.col("doc_id").alias("qid"), F.col("v").alias("qv")
    )
    top = brute_force_top_k(
        vecs, qs, "doc_id", "v", "qid", "qv", k=1, normalized=True
    ).collect()
    assert top[0]["doc_id"] == 0 and top[0]["score"] == pytest.approx(1.0)


def test_rrf_fuse_exact_values(spark):
    from knowledge_model_spark.operators.retrieval import rrf_fuse
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "ra"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["id", "rb"])
    got = {r["id"]: (r["rrf"], r["rnk"]) for r in rrf_fuse(a, b, "id", "ra", "rb").collect()}
    # doc 3: in both lists; docs 1,2 lexical-only; doc 4 vector-only
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 1)
    assert got[1] == (round(1 / 61, 6), 2)
    # ids 2 and 4 tie at 1/62 — id-ascending tiebreak
    assert got[2] == (round(1 / 62, 6), 3)
    assert got[4] == (round(1 / 62, 6), 4)


def test_mmr_rerank_diversifies(spark):
    """Plain top-3 picks the three near-identical high scorers; MMR must
    swap in the diverse candidate despite its lower relevance."""
    from knowledge_model_spark.operators.retrieval import mmr_rerank

    rows = [
        # three near-duplicate vectors with top relevance
        ("q", 1, 0.99, [1.0, 0.0, 0.0]),
        ("q", 2, 0.98, [0.999, 0.01, 0.0]),
        ("q", 3, 0.97, [0.998, 0.02, 0.0]),
        # orthogonal, lower relevance
        ("q", 4, 0.60, [0.0, 1.0, 0.0]),
        ("q", 5, 0.50, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["qid", "cid", "score", "vec"])
    out = {r["mmr_rank"]: r["cid"] for r in
           mmr_rerank(df, "qid", "cid", "score", "vec", k=3, lam=0.5).collect()}
    assert out[1] == 1          # highest relevance first
    assert set(out.values()) == {1, 4, 5}  # then the two orthogonal ones


def test_mmr_rerank_k_exceeds_candidates(spark):
    from knowledge_model_spark.operators.retrieval import mmr_rerank

    rows = [("q", 1, 0.9, [1.0, 0.0]), ("q", 2, 0.8, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["qid", "cid", "score", "vec"])
    got = mmr_rerank(df, "qid", "cid", "score", "vec", k=10).collect()
    assert sorted(r["mmr_rank"] for r in got) == [1, 2]


def test_scalar_iter_model_udf_matches_scalar_form(spark, tables):
    """The SCALAR_ITER embed seam (per-task init before the batch loop)
    must produce exactly the vectors of the SCALAR form."""
    from knowledge_model_spark.operators.retrieval import (
        embed,
        stats_model_iter_udf,
        stats_model_udf,
    )

    docs = tables["documents"].select("doc_id", "text").limit(100)
    a = embed(docs, "text", model_udf=stats_model_udf()).collect()
    b = embed(docs, "text", model_udf=stats_model_iter_udf()).collect()
    am = {r["doc_id"]: r["vector"] for r in a}
    bm = {r["doc_id"]: r["vector"] for r in b}
    assert am == bm


def test_weighted_fuse_normalization_and_absent_side(spark):
    from knowledge_model_spark.operators.retrieval import weighted_fuse

    lex = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "id long, sa double"
    )
    vec = spark.createDataFrame([(2, 0.9), (4, 0.1)], "id long, sb double")
    out = {r["id"]: r["fused"] for r in
           weighted_fuse(lex, vec, "id", "sa", "sb", w_a=0.6, w_b=0.4, k=10).collect()}
    # lex norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0 ; vec norms: 2 -> 1.0, 4 -> 0.0
    assert out[1] == 0.6          # lex only
    assert out[2] == 0.7          # 0.6*0.5 + 0.4*1.0
    assert out[3] == 0.0
    assert out[4] == 0.0          # vec-only, normalized to 0


def test_weighted_fuse_degenerate_equal_scores(spark):
    from knowledge_model_spark.operators.retrieval import weighted_fuse

    lex = spark.createDataFrame([(1, 3.0), (2, 3.0)], "id long, sa double")
    vec = spark.createDataFrame([(1, 0.5)], "id long, sb double")
    out = {r["id"]: r["fused"] for r in
           weighted_fuse(lex, vec, "id", "sa", "sb").collect()}
    # all-equal lex list normalizes to 1.0 (max==min guard), vec too
    assert out[1] == 1.0 and out[2] == 0.6
