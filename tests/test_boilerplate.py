"""Tests for cross-document boilerplate scrubbing and winnowing
containment dedup (the asymmetric doc-inside-doc detector)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.operators.boilerplate import (
    frequent_units,
    scrub_frequent_units,
)
from knowledge_model_spark.operators.dedup import (
    ngram_jaccard_pairs,
    winnow_containment_pairs,
)


def _corpus(spark):
    # 'spam' appears in 4/5 docs (df 0.8); 'rare' in 1/5.
    rows = [
        (1, "spam alpha beta spam gamma"),
        (2, "spam delta epsilon"),
        (3, "zeta spam eta"),
        (4, "theta iota spam"),
        (5, "rare kappa lam"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_frequent_units_document_frequency(spark):
    d = _corpus(spark)
    hot = {r["unit"]: r["df"] for r in frequent_units(d, "doc_id", "text", " ", 0.8).collect()}
    # 'spam' occurs twice in doc 1 but counts that doc once (df=4, not 5)
    assert hot == {"spam": 4}


def test_scrub_drops_hot_keeps_rare_preserves_order(spark):
    d = _corpus(spark)
    out = {
        r["doc_id"]: (r["scrubbed"], r["n_dropped"])
        for r in scrub_frequent_units(d, "doc_id", "text", " ", 0.8).collect()
    }
    assert out[1] == ("alpha beta gamma", 2)  # both occurrences dropped, order kept
    assert out[5] == ("rare kappa lam", 0)  # rare units untouched
    assert out[4] == ("theta iota", 1)


def test_scrub_fully_hot_doc_yields_empty_string(spark):
    rows = [(1, "x x"), (2, "x"), (3, "x y")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["scrubbed"] for r in
           scrub_frequent_units(d, "doc_id", "text", " ", 1.0).collect()}
    assert out[1] == "" and out[2] == ""  # empty string, never null
    assert out[3] == "y"


def test_scrub_no_hot_units_is_identity_modulo_whitespace(spark):
    rows = [(1, "a b"), (2, "c  d")]  # double space collapses via unit filter
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["scrubbed"], r["n_dropped"]) for r in
           scrub_frequent_units(d, "doc_id", "text", " ", 0.99).collect()}
    assert out[1] == ("a b", 0)
    assert out[2] == ("c d", 0)


def _containment_corpus(spark):
    short = "unique marker phrase alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(120))
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler[::-1].lower()),
        (3, " ".join(f"q{i}" for i in range(60))),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_containment_catches_doc_inside_doc(spark):
    d = _containment_corpus(spark)
    pairs = winnow_containment_pairs(
        d, "doc_id", "text", threshold=0.9, max_df=None, min_fps=3
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert not any(3 in p for p in got)
    # the symmetric detector misses the same pair: Jaccard of a short doc
    # vs a long superset is tiny — the reason containment exists
    jac = ngram_jaccard_pairs(d, "doc_id", "text", k=5, threshold=0.3).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in jac)


def test_containment_min_fps_floors_ratio_noise(spark):
    # Docs sharing ONE fingerprint with tiny pruned sets must not pair.
    d = _containment_corpus(spark)
    noisy = winnow_containment_pairs(
        d, "doc_id", "text", threshold=0.9, max_df=None, min_fps=10**6
    ).collect()
    assert noisy == []


def test_containment_deterministic(spark):
    d = _containment_corpus(spark)
    a = sorted(map(tuple, winnow_containment_pairs(d, "doc_id", "text").collect()))
    b = sorted(map(tuple, winnow_containment_pairs(d, "doc_id", "text").collect()))
    assert a == b


def test_span_dedup_first_seen_semantics(spark):
    rows = [(1, "AAAABBBBCCCC"), (2, "BBBBXXXXAAAA"), (3, "AAAA")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    from knowledge_model_spark.operators.boilerplate import dedup_spans_first_seen

    out = {
        r["doc_id"]: (r["deduped_text"], r["n_spans_dropped"])
        for r in dedup_spans_first_seen(d, "doc_id", "text", span_chars=4).collect()
    }
    # doc 1 is first for all its spans: untouched
    assert out[1] == ("AAAABBBBCCCC", 0)
    # doc 2 loses BBBB and AAAA (seen in doc 1), keeps its unique middle
    assert out[2] == ("XXXX", 2)
    # doc 3 is entirely duplicate: empty string (never null), count right
    assert out[3] == ("", 1)


def test_span_dedup_short_tail_kept(spark):
    d = spark.createDataFrame([(1, "AAAAB"), (2, "B")], "doc_id int, text string")
    from knowledge_model_spark.operators.boilerplate import dedup_spans_first_seen

    out = {
        r["doc_id"]: (r["deduped_text"], r["n_spans_dropped"])
        for r in dedup_spans_first_seen(d, "doc_id", "text", span_chars=4).collect()
    }
    # the 1-char tail span of doc 1 and doc 2's whole text are the same
    # exact span: first seen (doc 1, pos 1) wins
    assert out[1] == ("AAAAB", 0)
    assert out[2] == ("", 1)
