"""BPE tokenizer: learning loop semantics + boundary safety.

Cross-engine apply parity is covered by test_oracle_parity.py
(text_bpe_tokenize); these tests pin the algorithmic claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.functions.tokenize import (
    bpe_tokens_expr,
    learn_bpe_merges,
)
from knowledge_model_spark.plans.text_queries import _BPE_MERGES


def _tokens(spark, text: str, merges):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(bpe_tokens_expr("text", merges).alias("t")).collect()[0]["t"]


def test_learn_recovers_dominant_pairs(spark):
    docs = spark.createDataFrame([("abab abab",)] * 50, ["text"])
    merges = learn_bpe_merges(docs, "text", n_merges=2)
    assert merges == [("a", "b"), ("ab", "ab")]


def test_merge_is_boundary_safe(spark):
    # 'fast' under [(s,t), (a,s)]: after s+t -> st the string is
    # 'f a st'; a cross-boundary match of 'a s' inside 'a st' would
    # produce the bogus token 'ast'
    toks = _tokens(spark, "fast", [("s", "t"), ("a", "s")])
    assert toks == ["f", "a", "st"]


def test_frozen_table_tokenizes_learned_words_whole(spark):
    toks = _tokens(spark, "batch join hash!", _BPE_MERGES)
    assert toks == ["batch", "join", "hash"]


def test_registered_learning_query_matches_frozen_prefix(spark):
    """text_bpe_learn_merges (rows-only in the driver) carries its exact
    gate HERE: the 12 learned merges at sf0.01 must equal the frozen
    _BPE_MERGES prefix text_bpe_tokenize applies — greedy learning is
    prefix-stable, and the word-table rewrite (one corpus scan) must
    reproduce the per-round-rescan output exactly."""
    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    rows = (
        R["text_bpe_learn_merges"].fn(spark, "/root/testdata/sf0.01")
        .orderBy("rank")
        .collect()
    )
    got = [(r["lhs"], r["rhs"]) for r in rows]
    assert got == _BPE_MERGES[:12]


def test_apply_is_deterministic_and_scan_shaped(spark, tables):
    docs = tables["documents"]
    out = docs.select(
        "doc_id", F.size(bpe_tokens_expr("text", _BPE_MERGES)).alias("n")
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b and len(a) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # zero Python on the apply path
    assert "Exchange" not in plan  # scan-speed projection
