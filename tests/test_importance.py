"""DSIR importance weights: direction, determinism, and mass identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.operators.importance import dsir_importance


def _weights(spark, tables, docs):
    out = dsir_importance(
        docs.withColumn("__tgt", F.col("lang") == "en"), "doc_id", "text", "__tgt"
    )
    return {r["id"]: (r["dl"], r["dsir_weight"]) for r in out.collect()}


def test_target_docs_upweighted_on_average(spark, tables):
    docs = tables["documents"].select("doc_id", "text", "lang")
    w = _weights(spark, tables, docs)
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    en = [w[d][1] for d in w if langs[d] == "en"]
    other = [w[d][1] for d in w if langs[d] != "en"]
    assert en and other
    # resampling toward the target must rank target-domain docs higher in
    # expectation — the whole point of the weight
    assert sum(en) / len(en) > sum(other) / len(other)


def test_deterministic_across_partitionings(spark, tables):
    docs = tables["documents"].select("doc_id", "text", "lang")
    assert _weights(spark, tables, docs) == _weights(
        spark, tables, docs.repartition(13)
    )


def test_dl_matches_token_count(spark, tables):
    docs = tables["documents"].select("doc_id", "text", "lang").limit(50)
    w = _weights(spark, tables, docs)
    toks = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda t: F.length(t) >= 2,
                )
            ).alias("n"),
        )
        .collect()
    )
    for r in toks:
        if r["n"] > 0:
            assert w[r["doc_id"]][0] == r["n"]


def test_weighted_sample_bias_and_determinism(spark, tables):
    from knowledge_model_spark.operators.relational import weighted_sample_topk

    docs = tables["documents"].select("doc_id", "n_chars")
    a = [tuple(r) for r in weighted_sample_topk(docs, "doc_id", "n_chars", 50).collect()]
    b = [
        tuple(r)
        for r in weighted_sample_topk(
            docs.repartition(11), "doc_id", "n_chars", 50
        ).collect()
    ]
    assert a == b and len(a) == 50
    # inclusion probability ∝ weight → the sample skews long
    sample_ids = {t[0] for t in a}
    rows = docs.collect()
    mean_all = sum(r["n_chars"] for r in rows) / len(rows)
    mean_s = sum(r["n_chars"] for r in rows if r["doc_id"] in sample_ids) / 50
    assert mean_s > mean_all


def test_weighted_sample_stable_under_corpus_growth(spark, tables):
    # content-addressed keys: a doc's priority never changes when other
    # docs arrive, so the top-k only changes by displacement
    from knowledge_model_spark.operators.relational import weighted_sample_topk

    docs = tables["documents"].select("doc_id", "n_chars")
    half = docs.filter(F.col("doc_id") < 250)
    full_keys = {
        r["doc_id"]: r["es_key"]
        for r in weighted_sample_topk(docs, "doc_id", "n_chars", 500).collect()
    }
    half_keys = {
        r["doc_id"]: r["es_key"]
        for r in weighted_sample_topk(half, "doc_id", "n_chars", 500).collect()
    }
    for d, k in half_keys.items():
        assert full_keys[d] == k


def test_unigram_logppl_matches_reference(spark):
    """Hand-computed add-1 unigram log-perplexity on a 3-doc corpus."""
    import math

    from knowledge_model_spark.operators.importance import unigram_log_ppl

    docs = [(1, "aa bb aa"), (2, "aa cc"), (3, "bb bb dd")]
    df = spark.createDataFrame(docs, ["id", "text"])
    out = {r["id"]: (r["dl"], r["logppl"]) for r in
           unigram_log_ppl(df, "id", "text").collect()}
    # counts: aa=3, bb=3, cc=1, dd=1; V=4, tot=8 → denom=12
    p = {"aa": 4 / 12, "bb": 4 / 12, "cc": 2 / 12, "dd": 2 / 12}

    def ref(toks):
        s = -sum(math.log(p[t]) for t in toks) / len(toks)
        return round(s, 6)

    assert out[1] == (3, ref(["aa", "aa", "bb"]))
    assert out[2] == (2, ref(["aa", "cc"]))
    assert out[3] == (3, ref(["bb", "bb", "dd"]))


def test_hashed_linear_score_with_injected_weights(spark):
    """A real weight vector rides as one array literal: scoring with an
    all-positive vector must saturate toward 1, all-negative toward 0,
    and the default pseudo-weights must agree with a manual reference."""
    import math

    from knowledge_model_spark.operators.importance import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], ["id", "text"]
    )
    hi = {r["id"]: r["score"] for r in
          hashed_linear_score(df, "id", "text", weights=[5.0] * 4096).collect()}
    lo = {r["id"]: r["score"] for r in
          hashed_linear_score(df, "id", "text", weights=[-5.0] * 4096).collect()}
    assert all(v > 0.99 for v in hi.values())
    assert all(v < 0.01 for v in lo.values())

    # default pseudo-weights vs manual md5 reference
    import hashlib

    def ref(tokens):
        ws = sorted(
            (t, (int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 4096) / 4096 - 0.5)
            for t in tokens
        )
        s = 0.0
        for _, w in ws:
            s += w
        return round(1.0 / (1.0 + math.exp(-(s / len(ws)))), 6)

    got = {r["id"]: r["score"] for r in hashed_linear_score(df, "id", "text").collect()}
    assert got == {1: ref(["alpha", "beta", "gamma"]), 2: ref(["delta", "epsilon"])}
