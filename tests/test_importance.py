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
