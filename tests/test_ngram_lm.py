"""n-gram LM operators: vocabulary construction + stupid backoff.

Oracle parity is covered by tests/test_oracle_parity.py (both queries
are registered); these tests pin the operator-level contracts the
oracle can't see: id determinism under repartitioning, the backoff
branch actually firing, and OOV exclusion.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from knowledge_model_spark.operators.ngram_lm import (
    build_vocab,
    stupid_backoff_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_ids_deterministic_under_repartition(spark):
    rows = [(i, "alpha beta beta gamma gamma gamma rare") for i in range(6)]
    df = _docs(spark, rows)
    a = build_vocab(df, "doc_id", "text", min_count=2).collect()
    b = build_vocab(df.repartition(7), "doc_id", "text", min_count=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_term = {r["term"]: r for r in a}
    # (count desc, term asc) ids: gamma(18), beta(12), then the 6-count
    # tie {alpha, rare} broken alphabetically
    assert by_term["gamma"]["term_id"] == 1
    assert by_term["beta"]["term_id"] == 2
    assert by_term["alpha"]["term_id"] == 3
    assert by_term["rare"]["term_id"] == 4
    assert by_term["rare"]["df_docs"] == 6


def test_vocab_min_count_cutoff(spark):
    df = _docs(spark, [(1, "aa aa bb")])
    out = {r["term"]: r["c"] for r in build_vocab(df, "doc_id", "text", min_count=2).collect()}
    assert out == {"aa": 2}


def test_backoff_branch_scores_unseen_bigram(spark):
    # LM corpus sees "aa bb" only; scored doc contains "bb aa" (unseen
    # bigram over in-vocab tokens) -> backoff branch: ln(0.4 * c(aa)/N)
    lm = _docs(spark, [(0, "aa bb")])
    score_df = _docs(spark, [(1, "bb aa")])
    out = stupid_backoff_scores(score_df, "doc_id", "text", lm_df=lm).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bigrams"] == 1
    # N=2, c(aa)=1 -> ln(0.4 * 1/2)
    assert abs(r["sb_logscore"] - round(math.log(0.4) + math.log(0.5), 6)) < 1e-9


def test_seen_bigram_uses_conditional_count(spark):
    # LM: "aa bb" twice and "aa cc" once -> S(bb|aa) = 2/3
    lm = _docs(spark, [(0, "aa bb"), (1, "aa bb"), (2, "aa cc")])
    score_df = _docs(spark, [(9, "aa bb")])
    r = stupid_backoff_scores(score_df, "doc_id", "text", lm_df=lm).collect()[0]
    assert abs(r["sb_logscore"] - round(math.log(2 / 3), 6)) < 1e-9


def test_oov_positions_excluded(spark):
    # "zz" never appears in the LM corpus: both bigrams touching it are
    # dropped; only (aa,bb) is scored.
    lm = _docs(spark, [(0, "aa bb")])
    score_df = _docs(spark, [(1, "aa bb zz aa")])
    r = stupid_backoff_scores(score_df, "doc_id", "text", lm_df=lm).collect()[0]
    assert r["n_bigrams"] == 1


def test_in_corpus_self_scoring_matches_manual(spark):
    # Self-scoring: every bigram is seen, so all contributions are
    # ln(c_bi / c_prev) with counts over the same corpus.
    df = _docs(spark, [(1, "aa bb aa bb")])
    r = stupid_backoff_scores(df, "doc_id", "text").collect()[0]
    # bigrams: (aa,bb)x2, (bb,aa)x1; c(aa)=2, c(bb)=2
    expect = (math.log(2 / 2) + math.log(1 / 2) + math.log(2 / 2)) / 3
    assert r["n_bigrams"] == 3
    assert abs(r["sb_logscore"] - round(expect, 6)) < 1e-9


def test_incremental_vocab_equals_full_rebuild(spark):
    from knowledge_model_spark.operators.ngram_lm import (
        build_vocab,
        merge_vocab_counts,
    )

    month1 = _docs(spark, [(i, "alpha beta beta gamma") for i in range(4)])
    month2 = _docs(
        spark, [(10 + i, "beta gamma gamma delta rare") for i in range(3)]
    )
    # full-history vocab counts feed the merge WITHOUT the cutoff so
    # cumulative sub-threshold terms can clear min_count later
    v1_all = build_vocab(month1, "doc_id", "text", min_count=1)
    inc = merge_vocab_counts(v1_all, month2, "doc_id", "text", min_count=2)
    full = build_vocab(
        month1.unionByName(month2), "doc_id", "text", min_count=2
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_incremental_vocab_empty_batch_reranks_only(spark):
    from knowledge_model_spark.operators.ngram_lm import (
        build_vocab,
        merge_vocab_counts,
    )

    month1 = _docs(spark, [(1, "aa aa bb bb cc")])
    v1 = build_vocab(month1, "doc_id", "text", min_count=1)
    empty = _docs(spark, []).limit(0)
    inc = merge_vocab_counts(v1, empty, "doc_id", "text", min_count=2)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, build_vocab(month1, "doc_id", "text", min_count=2).collect())
    )
