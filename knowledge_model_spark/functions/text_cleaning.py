"""Text-cleaning battery as pure Column expressions (no UDFs).

Re-expresses the reference's regex cleaning pipeline
(reference: knowledge_model/processing/text_cleaner.py:48-133) as composed
``regexp_replace`` / ``translate`` column expressions.  Because these stay
JVM-side they run inside whole-stage codegen — at 100 TB this is the
difference between a scan-speed pipeline and a Python-bound one.

Each constituent is exposed separately so callers can compose a custom
battery; ``clean_text`` applies the full reference-equivalent sequence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- individual cleaners (each mirrors one compiled pattern in
# text_cleaner.py:48-67) -------------------------------------------------


def strip_citation_tags(col: Column) -> Column:
    """Remove numeric citation tags like ``[1]``, ``[2,3]``, ``[4-6]``.

    (reference: text_cleaner.py:48,122)
    """
    return F.regexp_replace(col, r"\[\s*\d+(?:\s*[,–-]\s*\d+)*\s*\]", "")


def strip_figure_refs(col: Column) -> Column:
    """Remove figure/table refs ``(fig 3)``, ``(figure 2a)``, ``(table 1)``.

    (reference: text_cleaner.py:49,125)
    """
    return F.regexp_replace(col, r"(?i)\(\s*(?:fig(?:ure)?|table)\.?\s*[\w.\-]*\s*\)", "")


def strip_author_year_citations(col: Column) -> Column:
    """Remove author-year citations ``(Smith et al., 2020)``.

    (reference: text_cleaner.py:51,123)
    """
    return F.regexp_replace(
        col, r"\(\s*[A-Z][A-Za-z\-]+(?:\s+et\s+al\.?)?,?\s+(?:19|20)\d{2}[a-z]?\s*\)", ""
    )


def truncate_at_references(col: Column) -> Column:
    """Truncate the document at a References/Bibliography heading.

    (reference: text_cleaner.py:50,70-81,128)
    """
    return F.split(col, r"(?i)\b(?:references|bibliography|literature\s+cited)\b").getItem(0)


def truncate_at_backmatter(col: Column) -> Column:
    """Truncate at Methods / Acknowledg(e)ments / Funding /
    Conflict-of-interest — the reference's UNWANTED_SECTIONS_RE includes
    ``methods?`` (reference: text_cleaner.py:53-56,84-95,129).
    """
    return F.split(
        col,
        r"(?i)\b(?:methods?|acknowledg(?:e)?ments?|funding|conflicts?\s+of\s+interest|competing\s+interests)\b",
    ).getItem(0)


def strip_html_tags(col: Column) -> Column:
    """Remove HTML/XML tags. (reference: text_cleaner.py:58,117)"""
    return F.regexp_replace(col, r"<[^>]+>", " ")


def strip_control_chars(col: Column) -> Column:
    """Remove control characters. (reference: text_cleaner.py:59,118)"""
    return F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")


def collapse_dup_punctuation(col: Column) -> Column:
    """Collapse runs of the same punctuation ``!!`` → ``!``.

    (reference: text_cleaner.py:60,119-120)
    """
    return F.regexp_replace(col, r"([!?.,;:])\1+", "$1")


def normalize_quotes(col: Column) -> Column:
    """Translate smart quotes/dashes to ASCII. (reference: text_cleaner.py:61-63,101)"""
    return F.translate(col, "‘’“”–— ", "''\"\"--  ")


def rejoin_hyphen_linebreaks(col: Column) -> Column:
    """Rejoin hyphen-linebreak splits ``transfor-\\nmation`` → ``transformation``.

    (reference: text_cleaner.py:65,131; parse_pdfs.py:30-42)
    """
    return F.regexp_replace(col, r"(\w)-\s*\n\s*(\w)", "$1$2")


def collapse_whitespace(col: Column) -> Column:
    """Collapse all whitespace runs to single spaces and trim.

    (reference: text_cleaner.py:66,133)
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_text(col: Column) -> Column:
    """Full reference-equivalent cleaning battery, order-preserving.

    Mirrors clean_text (reference: text_cleaner.py:105-133): normalize
    quotes → strip html/control → rejoin hyphenation → strip citations,
    figure refs, author-year cites → truncate references/backmatter →
    collapse duplicate punctuation → collapse whitespace.
    """
    c = normalize_quotes(col)
    c = strip_html_tags(c)
    c = strip_control_chars(c)
    c = rejoin_hyphen_linebreaks(c)
    c = strip_citation_tags(c)
    c = strip_figure_refs(c)
    c = strip_author_year_citations(c)
    c = truncate_at_references(c)
    c = truncate_at_backmatter(c)
    c = collapse_dup_punctuation(c)
    c = collapse_whitespace(c)
    return c


PAGE_FURNITURE_RE = (
    r"(?i)^(?:Page \d+(?: of \d+)?|©.*|Copyright.*|All rights reserved\.?)$"
)
DIGIT_LINE_RE = r"^\s*\d+\s*$"


def strip_page_furniture(col: Column) -> Column:
    """Drop page-number / header / footer / copyright lines from PDF text
    (reference: ingestion/parse_pdfs.py:23-24,44-54): split on newlines,
    filter furniture lines, rejoin — an array filter, not a multiline
    regex, so each line predicate stays simple and RE2-safe."""
    lines = F.split(col, "\n")
    kept = F.filter(
        lines,
        lambda l: (~l.rlike(PAGE_FURNITURE_RE)) & (~l.rlike(DIGIT_LINE_RE)),
    )
    return F.array_join(kept, "\n")


def normalize_pmcid(col: Column) -> Column:
    """Normalize a PMCID: strip ``pmc-id:`` prefix and ``;`` suffix, ensure
    ``PMC`` prefix.  (reference: fetch_pubmed.py:229-237,370-377,
    pipeline.py:100-106, download_pdf.py:35-37)
    """
    c = F.regexp_replace(col, r"(?i)^pmc-id:\s*", "")
    c = F.regexp_replace(c, r";.*$", "")
    c = F.trim(c)
    return F.when(c == "", F.lit(None)).otherwise(
        F.concat(F.lit("PMC"), F.regexp_replace(c, r"(?i)^PMC", ""))
    )


# ---------------------------------------------------------- unicode folding
# The reference folds unicode with unidecode, falling back to NFKD-strip
# (reference: text_cleaner.py:25-36).  No Spark builtin exists, so these
# are Arrow-batched pandas UDFs (the one cleaning step that can't be a
# column expression).


def _fold_series(s, form: str, ascii_only: bool):
    import unicodedata

    import pandas as pd

    def fold(t):
        if t is None:
            return None
        d = unicodedata.normalize(form, t)
        out = "".join(ch for ch in d if not unicodedata.combining(ch))
        out = unicodedata.normalize("NFC", out)
        if ascii_only:
            out = out.encode("ascii", "ignore").decode("ascii")
        return out

    return pd.Series([fold(t) for t in s])


def accent_fold(col: Column) -> Column:
    """Canonical accent strip: NFD → drop combining marks → NFC.

    Matches DuckDB's ``strip_accents`` (the oracle), so it is
    hash-checkable; compatibility characters (ligatures, superscripts)
    are preserved.
    """
    return F.pandas_udf(lambda s: _fold_series(s, "NFD", False), "string")(col)


def nfkc_ascii_fold(col: Column) -> Column:
    """Aggressive fold: NFKD (compatibility) decomposition → drop
    combining marks → ASCII-encode-ignore.  The unidecode-fallback
    analog (reference: text_cleaner.py:25-36); lossy by design."""
    return F.pandas_udf(lambda s: _fold_series(s, "NFKD", True), "string")(col)
