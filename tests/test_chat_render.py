"""Chat rendering with loss-mask spans + phrase search + preference pairs.

Oracle parity runs in tests/test_oracle_parity.py; these pin the
operator contracts directly: span offsets index the rendered string
exactly, phrase adjacency is strict, preference extrema are
deterministic under ties.
"""

from __future__ import annotations

from knowledge_model_spark.functions.prompting import render_chat_with_spans
from knowledge_model_spark.operators.text_rank import phrase_search


def test_spans_slice_exactly_to_assistant_text(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "hello", "world"),
            (1, 20, "second question", "a longer answer"),
            (2, 5, "solo", "turn"),
        ],
        "conv long, ord long, u string, a string",
    )
    out = {
        r["conv"]: r
        for r in render_chat_with_spans(df, "conv", "ord", "u", "a").collect()
    }
    assert out[1]["n_turns"] == 2 and out[2]["n_turns"] == 1
    for conv, answers in ((1, ["world", "a longer answer"]), (2, ["turn"])):
        rendered = out[conv]["rendered"]
        spans = out[conv]["asst_spans"].split(";")
        assert len(spans) == len(answers)
        for span, expect in zip(spans, answers):
            s, t = map(int, span.split(":"))
            assert rendered[s:t] == expect


def test_render_deterministic_under_repartition(spark):
    rows = [(i // 3, i, f"q{i}", f"answer {i} text") for i in range(30)]
    df = spark.createDataFrame(rows, "conv long, ord long, u string, a string")
    a = sorted(map(tuple, render_chat_with_spans(df, "conv", "ord", "u", "a").collect()))
    b = sorted(
        map(
            tuple,
            render_chat_with_spans(
                df.repartition(7), "conv", "ord", "u", "a"
            ).collect(),
        )
    )
    assert a == b


def test_phrase_search_requires_adjacency(spark):
    df = spark.createDataFrame(
        [
            (1, "big table value row end"),       # match at pos 1
            (2, "table xx value row"),            # broken adjacency: no match
            (3, "table value row table value row"),  # two matches
            (4, "value row table"),               # wrong order: no match
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "doc_id", "text", "table value row").collect()
    }
    assert out == {1: (1, 1), 3: (2, 0)}


def test_phrase_search_single_term(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    out = {
        r["id"]: r["n_matches"]
        for r in phrase_search(df, "doc_id", "text", "alpha").collect()
    }
    assert out == {1: 2}


def test_indexed_phrase_search_matches_inline(spark, tmp_path):
    from knowledge_model_spark.operators.text_rank import (
        build_positional_index,
        phrase_search,
        phrase_search_indexed,
    )

    df = spark.createDataFrame(
        [(1, "big table value row end"), (2, "table value table value row")],
        "doc_id long, text string",
    )
    inline = sorted(map(tuple, phrase_search(df, "doc_id", "text", "table value row").collect()))
    # index materialized to parquet, read back — the scale path
    idx_path = str(tmp_path / "postings")
    build_positional_index(df, "doc_id", "text").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    indexed = sorted(map(tuple, phrase_search_indexed(idx, "table value row").collect()))
    assert inline == indexed
