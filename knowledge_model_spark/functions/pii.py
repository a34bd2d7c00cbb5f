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


def luhn_valid(col: Column) -> Column:
    """True when the digit string passes the Luhn mod-10 checksum (ISO/IEC
    7812) — the precision upgrade for card-number detection: a bare
    ``\\d{13,16}`` match is usually an id or a timestamp; only
    checksum-valid candidates deserve redaction at corpus scale (every
    false positive deletes real signal forever).

    Pure integer expression arithmetic (aggregate over a position
    sequence, doubling every second digit from the RIGHT, folding >9 by
    −9) — whole-stage codegen, no UDF; the DuckDB twin lives in
    :func:`oracle_sql_luhn` so the two can never drift.
    """
    # split-reverse ONCE, then every per-element lambda touches only its
    # own char — referencing `col` from inside the lambda would re-evaluate
    # the whole upstream expression per element (the HOF pitfall README
    # documents; measured 5× on the registered audit query)
    rev_digits = F.split(F.reverse(col), "")
    terms = F.transform(
        rev_digits,
        lambda ch, i: F.when(
            i % 2 == 0, ch.cast("int")
        ).otherwise(
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            )
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    # all-digit guard FIRST: a non-digit char would cast to NULL and
    # poison the aggregate into NULL (not False) — and the DuckDB twin
    # would raise on the same cast. Guarding both sides identically
    # (rlike here, TRY_CAST there) keeps the twins convergent on ANY
    # input, not just pre-filtered candidates (r3 ADVICE).
    return col.rlike("^[0-9]+$") & (F.length(col) >= 13) & (total % 10 == 0)


def oracle_sql_luhn(expr: str) -> str:
    """DuckDB twin of :func:`luhn_valid` over SQL expression ``expr``."""
    d = f"TRY_CAST(substr({expr}, i, 1) AS INTEGER)"
    fold = f"CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END"
    term = f"CASE WHEN (len({expr}) - i) % 2 = 0 THEN {d} ELSE {fold} END"
    return (
        f"coalesce(regexp_matches({expr}, '^[0-9]+$'), FALSE) AND "
        f"len({expr}) >= 13 AND "
        f"coalesce(list_sum(list_transform(range(1, len({expr}) + 1), "
        f"i -> {term})) % 10 = 0, FALSE)"
    )


