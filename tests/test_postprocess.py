"""Golden tests for the answer-postprocess battery
(reference: inference/postprocess.py:57-171)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.functions import postprocess as pp


def _one(spark, raw: str, col):
    df = spark.createDataFrame([(raw,)], ["t"])
    return df.select(col(F.col("t")).alias("out")).first()["out"]


def test_strip_special_tokens(spark):
    out = _one(spark, "<s>hello <pad>world</s> <|endoftext|> ### done", pp.strip_special_tokens)
    assert "<" not in out and "###" not in out
    assert "hello" in out and "world" in out


def test_strip_prompt_header(spark):
    assert _one(spark, "### Response: the answer", pp.strip_prompt_header) == "the answer"
    assert _one(spark, "Response the answer", pp.strip_prompt_header) == "the answer"
    # only a LEADING header is stripped
    assert "Response" in _one(spark, "keep Response: inline", pp.strip_prompt_header)


def test_trim_to_last_period(spark):
    assert _one(spark, "Done. Half a sente", pp.trim_to_last_period) == "Done."
    assert _one(spark, "no terminator at all", pp.trim_to_last_period) == "no terminator at all"
    # terminator only at position 0 → unchanged (reference: idx > 0)
    assert _one(spark, ".abc", pp.trim_to_last_period) == ".abc"


def test_dedup_sentences(spark):
    out = _one(spark, "A is true. B is new. A is true. C ends.", pp.dedup_sentences)
    assert out == "A is true. B is new. C ends."


def test_dedup_bullets_caps_and_rejoins(spark):
    raw = "• one • two • one • three"
    out = _one(spark, raw, lambda c: pp.dedup_bullets(c, 10))
    assert out == "• one\n• two\n• three"
    capped = _one(spark, raw, lambda c: pp.dedup_bullets(c, 2))
    assert capped == "• one\n• two"
    single = _one(spark, "just a line", lambda c: pp.dedup_bullets(c, 10))
    assert single == "just a line"


def test_remove_boilerplate(spark):
    out = _one(spark, "Real content here. Funding: NIH grant 123", pp.remove_boilerplate)
    assert "NIH" not in out and "Real content" in out


def test_cap_words(spark):
    out = _one(spark, "one two three four five", lambda c: pp.cap_words(c, 3))
    assert out == "one two three…"
    assert _one(spark, "one two", lambda c: pp.cap_words(c, 3)) == "one two"


def test_extract_citations_unique_ordered(spark):
    out = _one(
        spark,
        "see PMID: 123 then DOI:10.1/x and PMID: 123 again PMCID: PMC9",
        pp.extract_citations,
    )
    assert out == ["PMID: 123", "DOI:10.1/x", "PMCID: PMC9"]


def test_looks_unhelpful(spark):
    cases = {
        "ok.": True,  # under 3 words
        "I’m not sure about that": True,
        "honestly I AM NOT SURE at all": True,
        "there is insufficient evidence here": True,
        "a perfectly reasonable answer": False,
    }
    for raw, want in cases.items():
        assert _one(spark, raw, pp.looks_unhelpful) is want, raw


def test_strip_page_furniture(spark):
    from knowledge_model_spark.functions.text_cleaning import strip_page_furniture

    raw = "Page 3 of 12\nreal content line\n 42 \nCopyright 2024 X\nmore text\nAll rights reserved."
    out = _one(spark, raw, strip_page_furniture)
    assert out == "real content line\nmore text"


def test_full_battery(spark):
    raw = (
        "### Response: The drug works. The drug works. It lowers risk. "
        "See PMID: 42. Funding: agency <pad> trailing fragm"
    )
    out = _one(spark, raw, pp.postprocess_answer)
    assert out.startswith("The drug works.")
    assert out.count("The drug works.") == 1
    assert "Funding" not in out and "<pad>" not in out and "fragm" not in out
    assert "PMID: 42" in out
