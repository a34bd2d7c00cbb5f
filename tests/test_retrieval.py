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
