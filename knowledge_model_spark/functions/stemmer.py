"""Rule-based light stemmer (Porter step-1 subset) for search-side
token normalization.

The retrieval stack (BM25, phrase search, TF-IDF) benefits from folding
plural/participle inflections — "values"→"value", "hashing"→"hash" —
before indexing.  A full Porter/Snowball stemmer needs measure
calculations no SQL engine shares, so this is deliberately the
high-precision RULE subset expressible as an anchored regex chain, with
BOTH engine expressions generated from ONE rule table (the
functions/pii.py builder pattern): the Spark chain and the DuckDB
oracle chain cannot drift.

Rules fire sequentially; each is end-anchored (≤1 match) and guarded so
a later rule never re-fires on an earlier rule's output:

    sses$      → ss          (caresses → caress)
    ies$       → i           (ponies → poni)
    ([^su])s$  → $1          (values → value; keeps 'ss'/'us' endings)
    ([aeiou][a-z]{2,})ing$ → $1   (hashing → hash; needs a 3+-char
                                   vowel-bearing stem: 'sing','ring' stay)
    ([aeiou][a-z]{2,})ed$  → $1   (merged → merg)

Scan-speed whole-stage-codegen expressions — zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, spark_repl, duck_repl) — $1 vs \1 backreference dialects
_RULES: list[tuple[str, str, str]] = [
    (r"sses$", "ss", "ss"),
    (r"ies$", "i", "i"),
    (r"([^su])s$", "$1", r"\1"),
    (r"([aeiou][a-z]{2,})ing$", "$1", r"\1"),
    (r"([aeiou][a-z]{2,})ed$", "$1", r"\1"),
]


def light_stem(col: Column) -> Column:
    """Apply the rule chain to a single lowercase token column."""
    out = col
    for pat, repl, _ in _RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def oracle_sql_stem(expr: str) -> str:
    """DuckDB twin of :func:`light_stem` over SQL expression ``expr``."""
    out = expr
    for pat, _, repl in _RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}')"
    return out
