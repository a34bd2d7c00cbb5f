"""Text-analysis operators for training-data pipelines (engine extension).

Beyond the reference surface (north-star addition): language ID, quality
scoring, token counting, and document fingerprinting — all pure Column
expressions so they run at scan speed over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately simple + deterministic so the DuckDB oracle can replicate.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "les", "des", "est"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (empty-safe)."""
    return F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda w: F.length(w) > 0))


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate BPE token count: alnum runs + individual punctuation
    marks (a regex stand-in for a real tokenizer).  RE2-compatible (no
    lookarounds) so the DuckDB oracle can replicate it."""
    pieces = F.regexp_extract_all(col, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)
    return F.size(pieces)


def _marker_hits(col: Column, markers: list[str]) -> Column:
    """Count of words in ``col`` that appear in ``markers``."""
    words = F.split(F.lower(col), r"[^a-zà-ÿäöüß]+")
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hits, 'und' if none.

    Ties resolve to the lexicographically GREATEST language code:
    ``array_max`` over (hits, lang) structs compares lang as the second
    sort key, so on equal hits 'fr' beats 'de'.  The registered oracle
    (ORDER BY h DESC, pred DESC) mirrors exactly this behavior.
    """
    entries = [
        F.struct(_marker_hits(col, m).alias("hits"), F.lit(lang).alias("lang"))
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*entries))  # max by (hits, lang)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from simple surface statistics.

    mean of: length score (chars/500 capped at 1), alpha ratio,
    non-excessive-punctuation score. Mirrors the quality heuristics an
    LLM-data pipeline applies before training (north-star addition; the
    reference's closest analog is the unhelpful-answer predicate,
    main.py:242-250).
    """
    n = F.length(col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(col, r"[^!?.,;:]", "")).cast("double")
    punct_score = F.when(n > 0, 1.0 - F.least(punct * 10.0 / n, F.lit(1.0))).otherwise(F.lit(0.0))
    return F.round((len_score + alpha_ratio + punct_score) / 3.0, 6)


def normalize_for_dedup(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    normalized dedup key (reference analog: alpha-only lowercase key,
    main.py:283-291)."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text (md5
    hex).  md5 is available in both Spark and DuckDB, making this
    oracle-checkable."""
    return F.md5(normalize_for_dedup(col))


def shingles(col: Column, k: int = 5) -> Column:
    """``array<string>`` of distinct word k-shingles of normalized text.

    Built from ``arrays_zip`` of k shifted slices so the (regex-heavy)
    word-split subtree is evaluated O(k) times per row, never inside a
    lambda body — referencing it from a ``transform`` lambda would
    re-evaluate it once per *element* (~10× slower at k=5).
    """
    words = F.filter(F.split(normalize_for_dedup(col), " "), lambda w: F.length(w) > 0)
    n = F.size(words)
    m = F.greatest(n - (k - 1), F.lit(0))  # number of k-grams
    zipped = F.arrays_zip(*[F.slice(words, j + 1, m) for j in range(k)])
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)]))
    return F.when(n < k, F.array(F.array_join(words, " "))).otherwise(F.array_distinct(grams))


def char_ngrams(col: Column, n: int = 3) -> Column:
    """``array<string>`` of distinct character n-grams of normalized text.

    Same shifted-slice construction as :func:`shingles` — the normalize
    subtree must not be referenced from inside a lambda body.
    """
    chars = F.split(normalize_for_dedup(col), "")
    ln = F.size(chars)
    m = F.greatest(ln - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(chars, j + 1, m) for j in range(n)])
    grams = F.transform(zipped, lambda s: F.concat_ws("", *[s[str(j)] for j in range(n)]))
    return F.when(ln == 0, F.array().cast("array<string>")).otherwise(F.array_distinct(grams))
