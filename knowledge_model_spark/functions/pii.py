"""PII redaction battery for training-data pipelines (engine extension).

A large-scale pretraining pipeline scrubs personally identifiable
information before text reaches the training corpus.  The reference has
no PII stage (its corpus is published biomedical literature); this is a
north-star addition in the same style as its cleaning battery
(reference: knowledge_model/processing/text_cleaner.py:48-67 — compiled
regex chain applied in one pass): pure `regexp_replace` column
expressions, RE2-compatible (no lookarounds) so the DuckDB oracle can
replicate them, running at scan speed over a 100 TB corpus with zero
Python on the hot path.

Patterns are deliberately conservative (precision over recall — a false
positive deletes signal from the corpus forever); a production pipeline
would layer an NER model behind the same seam the embed stage uses
(operators/retrieval.py embed()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: emails before the digit rules (an address like
# a.b+1@host2.com contains digit runs), IPs and long card numbers before
# phones (the un-separated phone pattern would otherwise consume the
# tail of a 16-digit card number).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"(\+\d{1,2}[-. ]?)?\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b"
CARD_RE = r"\b\d{13,16}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

_STAGES: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (SSN_RE, "[SSN]"),
    (CARD_RE, "[NUMBER]"),
    (PHONE_RE, "[PHONE]"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses, SSNs, phone numbers, and long card
    numbers with typed placeholder tokens."""
    out = col
    for pat, repl in _STAGES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> Column:
    """struct of per-category match counts — the audit metric a pipeline
    tracks per source/partition to spot anomalous documents."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(name)
            for (pat, _), name in zip(_STAGES, ["emails", "ips", "ssns", "cards", "phones"])
        ]
    )


def oracle_sql_redact(expr: str) -> str:
    """The DuckDB twin of :func:`redact_pii` over SQL expression ``expr``
    — kept HERE so the pattern list can never drift from the oracle."""
    out = expr
    for pat, repl in _STAGES:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out
