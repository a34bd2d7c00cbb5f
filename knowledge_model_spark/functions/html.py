"""HTML landing-page link scraping as column expressions.

The reference falls back to scraping a publisher landing page for the
first PDF link when the canonical PDF URLs fail (BeautifulSoup over all
``<a href=...>`` anchors, first one whose anchor text contains "pdf" or
whose href ends with ".pdf"; root-relative links get an ``https:``
prefix — knowledge_model/ingestion/download_pdf.py:83-105).  This module
is the engine's analog: pure RE2-safe ``regexp_extract_all`` +
higher-order-function column expressions, scan-speed over a corpus of
fetched landing pages, zero Python on the hot path, with a DuckDB twin
built from the SAME patterns so engine and oracle cannot drift.

Per the hot-path HOF rule (README / quality_luhn_audit lesson): the
anchor array is materialized ONCE per row and every lambda touches only
its own element, never the upstream html column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Full anchor tags in document order. [^<]* in the body keeps the match
# within one anchor (no nested tags in the text we care about — the
# reference reads a.get_text() the same way for simple anchors).
ANCHOR_RE = r'(?i)<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'
HREF_RE = r'(?i)href="([^"]*)"'
# Matches the OPENING TAG explicitly (mirror of ANCHOR_RE with a
# capture group on the body) rather than anchoring to any '>' before
# </a>: href="[^"]*" consumes a '>' inside the attribute value, and the
# [^<]* body class admits a literal '>' in the anchor TEXT — both match
# the reference's get_text(), which neither truncates text at '>' nor
# leaks href bytes into it.
TEXT_RE = r'(?i)<a\s[^>]*href="[^"]*"[^>]*>([^<]*)</a>'


def anchors(col: Column) -> Column:
    """All ``<a href=...>text</a>`` tags of an HTML column, in document
    order (array<string>)."""
    return F.regexp_extract_all(col, F.lit(ANCHOR_RE), 0)


def _href(a: Column) -> Column:
    return F.regexp_extract(a, HREF_RE, 1)


def _text(a: Column) -> Column:
    return F.regexp_extract(a, TEXT_RE, 1)


def first_pdf_link(col: Column) -> Column:
    """First candidate PDF link of a landing page, mirroring the
    reference's scrape rule exactly (download_pdf.py:87-97): scan
    anchors in document order, take the first whose anchor text contains
    "pdf" (case-insensitive) or whose href ends with ".pdf"
    (case-insensitive), strip it, and prefix root-relative links with
    ``https:`` (the reference's literal behavior). NULL when no anchor
    qualifies.
    """
    tags = anchors(col)
    hits = F.filter(
        tags,
        lambda a: F.lower(_text(a)).contains("pdf")
        | F.lower(_href(a)).endswith(".pdf"),
    )
    # try_element_at: NULL (not an ANSI error) when no anchor qualifies
    link = F.trim(_href(F.try_element_at(hits, F.lit(1))))
    return F.when(
        link.startswith("/"), F.concat(F.lit("https:"), link)
    ).otherwise(link)


def oracle_sql_anchors(expr: str) -> str:
    """DuckDB twin of :func:`anchors` over SQL expression ``expr``."""
    return f"regexp_extract_all({expr}, '{ANCHOR_RE}')"


def oracle_sql_first_pdf_link(expr: str) -> str:
    """DuckDB twin of :func:`first_pdf_link` — built from the same
    regexes so the two engines cannot drift."""
    href = f"regexp_extract(a, '{HREF_RE}', 1)"
    txt = f"regexp_extract(a, '{TEXT_RE}', 1)"
    hits = (
        f"list_filter({oracle_sql_anchors(expr)}, "
        f"a -> contains(lower({txt}), 'pdf') "
        f"OR ends_with(lower({href}), '.pdf'))"
    )
    link = f"trim(regexp_extract(list_extract({hits}, 1), '{HREF_RE}', 1))"
    return (
        f"CASE WHEN {link} LIKE '/%' THEN 'https:' || {link} "
        f"ELSE {link} END"
    )
