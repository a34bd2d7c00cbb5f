"""Genuine Python UDTFs (Spark 4 table functions) — the §2.10 surface
beyond UDF/UDAF: one input row → N output rows with their own schema,
usable in SQL via LATERAL.

The repo's hot-path 1-to-N shapes stay on vectorized primitives
(posexplode column expressions, Arrow pandas UDFs) because a Python
UDTF is row-at-a-time; this module exists because a complete engine
must still OFFER the table-function extension point (sentence
splitting is the canonical NLP example, reference:
text_cleaner.py:136-160's sentence walk).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from knowledge_model_spark.functions.chunking import SENTENCE_RE

_SENT = re.compile(SENTENCE_RE)


@udtf(returnType="sentence_index: int, sentence: string")
class SplitSentencesUDTF:
    """text → one row per sentence (terminator-run regex, same boundary
    rule as the sentence-aware chunker so the two stay consistent)."""

    def eval(self, text: str):  # noqa: D102 — Spark UDTF contract
        if text is None:
            return
        for i, s in enumerate(_SENT.findall(text)):
            yield i, s


def register_udtfs(spark) -> None:
    """Idempotently register the module's UDTFs for SQL/LATERAL use."""
    spark.udtf.register("split_sentences", SplitSentencesUDTF)
