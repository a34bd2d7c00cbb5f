"""Fuzzy q-gram join: prefix-filtered candidates must exactly equal the
brute-force levenshtein join (losslessness is the whole claim)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.operators.fuzzy import qgram_fuzzy_pairs
from knowledge_model_spark.operators.text_rank import bm25_rank


def _brute_force(spark, names, k):
    df = spark.createDataFrame([(n,) for n in names], ["s"])
    a, b = df.alias("a"), df.alias("b")
    return sorted(
        tuple(r)
        for r in a.join(b, F.col("a.s") < F.col("b.s"))
        .select(
            F.col("a.s"), F.col("b.s"), F.levenshtein(F.col("a.s"), F.col("b.s"))
        )
        .collect()
        if r[2] <= k
    )


def _fuzzy(spark, names, k, **kw):
    df = spark.createDataFrame([(n,) for n in names], ["s"])
    return sorted(tuple(r) for r in qgram_fuzzy_pairs(df, "s", "s", max_dist=k, **kw).collect())


NAMES = [
    "red widget", "red widgets", "ted widget", "blue bolt", "blue bolts",
    "glue bolt", "small ring", "small rings", "smalls ring", "green gear",
    "green gears", "greens gear", "copper pipe", "copper pipes", "chrome pipe",
]


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, k):
    want = _brute_force(spark, NAMES, k)
    assert _fuzzy(spark, NAMES, k) == want
    assert _fuzzy(spark, NAMES, k, prefix_filter=False) == want
    assert len(want) > 0


def test_short_string_sidecar(spark):
    # Strings below q*(k+1) chars share no q-gram at distance 1 ("a" vs
    # "b") — the sidecar must still pair them; long strings unaffected.
    names = ["a", "b", "ab", "abc", "xbc", "red widget", "ted widget"]
    want = _brute_force(spark, names, 1)
    got = _fuzzy(spark, names, 1)
    assert got == want
    assert ("a", "b", 1) in got


def test_real_names_prefix_equals_full(spark, tables):
    names = tables["part"].select("p_name").distinct()
    on = sorted(
        tuple(r)
        for r in qgram_fuzzy_pairs(names, "p_name", "p_name", max_dist=2).collect()
    )
    off = sorted(
        tuple(r)
        for r in qgram_fuzzy_pairs(
            names, "p_name", "p_name", max_dist=2, prefix_filter=False
        ).collect()
    )
    assert on == off and len(on) > 0


def _reference_bm25(rows, terms, k1=1.2, b=0.75):
    import re

    docs = {
        r["doc_id"]: [
            w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if len(w) >= 2
        ]
        for r in rows
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    out = {}
    for did, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (len(toks) / avgdl))))
        if any(t in toks for t in terms):
            out[did] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(120)
    rows = [r.asDict() for r in docs.collect()]
    terms = ["join", "vector", "slow"]
    want = _reference_bm25(rows, terms)
    got = bm25_rank(docs, "doc_id", "text", terms, k=10).collect()
    assert len(got) == min(10, len(want))
    expect = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [(r["id"], r["bm25"]) for r in sorted(got, key=lambda r: r["rnk"])] == expect


def test_bm25_deterministic_across_runs(spark, tables):
    docs = tables["documents"].select("doc_id", "text")
    terms = ["join", "vector", "slow"]
    a = [tuple(r) for r in bm25_rank(docs, "doc_id", "text", terms).collect()]
    b = [
        tuple(r)
        for r in bm25_rank(docs.repartition(7), "doc_id", "text", terms).collect()
    ]
    assert a == b


def test_udtf_splits_sentences(spark):
    from knowledge_model_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM split_sentences('One two. Three four! Five?')"
    ).collect()
    assert [(r["sentence_index"], r["sentence"]) for r in rows] == [
        (0, "One two."),
        (1, " Three four!"),
        (2, " Five?"),
    ]
