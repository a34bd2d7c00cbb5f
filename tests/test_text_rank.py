"""log-IDF TF-IDF vs an independent pandas reference implementation."""

from __future__ import annotations

import math
import re
from collections import Counter

from knowledge_model_spark.operators.text_rank import top_terms_tfidf


def _reference_tfidf(rows, k=3):
    docs = {r["doc_id"]: [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if len(w) >= 2] for r in rows}
    n = len(docs)
    dfreq = Counter()
    for toks in docs.values():
        dfreq.update(set(toks))
    out = {}
    for did, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((t, c * (math.log((n + 1) / (dfreq[t] + 1)) + 1)) for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )
        out[did] = [(t, round(s, 9)) for t, s in scored[:k]]
    return out


def test_tfidf_matches_pandas_reference(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(100)
    rows = [r.asDict() for r in docs.collect()]
    want = _reference_tfidf(rows, k=3)

    got = {}
    for r in top_terms_tfidf(docs, "doc_id", "text", k=3).collect():
        got.setdefault(r["id"], []).append((r["rnk"], r["term"], round(r["tfidf"], 9)))
    for did in want:
        ranked = [(t, s) for _, t, s in sorted(got[did])]
        assert ranked == want[did], f"doc {did}: {ranked} != {want[did]}"


# ------------------------------------------- all-pairs BoW cosine


def _bow_fixture(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
        (3, "one two three four five six seven eight nine"),
        (4, "totally different words appear in this document body"),
        # boilerplate pair sharing ONLY a stop shingle with everything
        (5, "the same header line unique tail five five five"),
        (6, "the same header line another tail nine nine nine"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bow_cosine_finds_near_dups_and_orders(spark):
    from knowledge_model_spark.operators.text_rank import bow_cosine_pairs

    df = _bow_fixture(spark)
    out = bow_cosine_pairs(df, "doc_id", "text", k=3, threshold=0.2).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert (5, 6) in pairs  # shared 'the same header' / 'same header line'
    assert pairs[(5, 6)] < pairs[(1, 2)]  # graded, not binary, similarity
    assert all(a < b for a, b in pairs)  # strict ordered pairs, no self-pairs


def test_bow_cosine_max_df_prunes_stop_terms(spark):
    from knowledge_model_spark.operators.text_rank import bow_cosine_pairs

    # every doc shares the boilerplate prefix -> without a df cut the
    # candidate set is all pairs; with max_df the hot terms drop and only
    # the genuinely similar tails remain
    rows = [(i, f"common boiler plate prefix here doc tail {i} {i} {i}") for i in range(10)]
    rows += [(100, "real duplicate body text alpha beta"), (101, "real duplicate body text alpha beta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncut = bow_cosine_pairs(df, "doc_id", "text", k=3, threshold=0.1).count()
    cut = bow_cosine_pairs(df, "doc_id", "text", k=3, threshold=0.1, max_df=5)
    got = {(r.id_a, r.id_b) for r in cut.collect()}
    assert got == {(100, 101)}  # survivors: the true dup pair only
    assert uncut > len(got)  # the cut collapsed the candidate blowup


def test_bow_cosine_short_docs_drop_out(spark):
    from knowledge_model_spark.operators.text_rank import bow_cosine_pairs

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "xx yy zz xx yy zz"), (4, "xx yy zz xx yy zz")],
        ["doc_id", "text"],
    )
    out = {(r.id_a, r.id_b) for r in bow_cosine_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()}
    # docs 1/2 have < 3 tokens -> no 3-grams -> excluded; 3/4 identical
    assert out == {(3, 4)}
