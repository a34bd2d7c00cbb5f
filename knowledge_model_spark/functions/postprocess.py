"""Answer post-processing battery as pure Column expressions (no UDFs).

Re-expresses the reference's raw-model-output cleanup
(reference: inference/postprocess.py:57-171 and main.py:253-296):
special-token strip, prompt-header strip, trim-to-last-period, exact
sentence dedup, bullet split/dedup/cap/rejoin, boilerplate-section cut,
word cap, inline citation extraction.

Every stage is a JVM-side expression (regexp/translate/higher-order
functions), so at 100 TB the battery runs inside whole-stage codegen at
scan speed.  Patterns are deliberately RE2-safe (no lookbehind/backrefs)
so each stage has an exact DuckDB twin for the oracle gate: sentence
splitting uses an inserted marker character instead of ``(?<=\\.)\\s+``,
and order-preserving dedup uses index lambdas (Spark ``filter(x, i)`` is
0-based; DuckDB's is 1-based — both mirrored in plans).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference token set (postprocess.py:25-34).  `</s>` before `<s>` so the
# alternation can't leave a dangling `</`.
SPECIAL_TOKENS = ["<pad>", "<unk>", "</s>", "<s>", "<|endoftext|>", "<|assistant|>", "<|user|>", "###"]
SPECIAL_TOKENS_RE = "(?:" + "|".join(
    t.replace("|", r"\|") for t in SPECIAL_TOKENS
) + ")"

HEADER_RE = r"^\s*(?:#+\s*)?[Rr][Ee][Ss][Pp][Oo][Nn][Ss][Ee]\s*:?\s*"

BOILERPLATE_RE = (
    r"(?i)\b(?:acknowledg(?:e)?ments?|funding|disclosure|"
    r"conflict(?:s)?\s+of\s+interest|author(?:ship)?\s+statement|"
    r"disclaimer|references|source)\s*:"
)

CITATION_RE = r"(?i)(?:PMID|PMCID|DOI):\s*\S+"

BULLET_SPLIT_RE = r"(?:\n|\s*[•\-\*]\s+|\s*\d+\.\s+)"

# Marker used to split sentences without lookbehind: replace ".<ws>" with
# ".<marker>" then split on the marker.  U+241E (SYMBOL FOR RECORD
# SEPARATOR) — never occurs in real text.
_SENT_MARK = "␞"


def strip_special_tokens(col: Column) -> Column:
    """Remove tokenizer/prompt marker tokens (reference: postprocess.py:57-62)."""
    return F.trim(F.regexp_replace(col, SPECIAL_TOKENS_RE, ""))


def strip_prompt_header(col: Column) -> Column:
    """Remove a leading '### Response:' artifact (reference: postprocess.py:66-68)."""
    return F.regexp_replace(col, HEADER_RE, "")


def trim_to_last_period(col: Column) -> Column:
    """Cut a half-finished sentence back to the last `.?!`; if the only
    terminator is at position 0 or none exists, keep the text unchanged
    (reference: postprocess.py:70-73 — ``idx > 0``)."""
    cut = F.regexp_replace(col, r"[^.!?]*$", "")
    return F.when(F.length(cut) > 1, cut).otherwise(col)


def _dedup_keep_first(arr: Column, cap: int | None = None) -> Column:
    """Order-preserving dedup of a string array, empties dropped; Spark
    ``filter`` index lambda is 0-based, so elements before position i are
    ``slice(arr, 1, i)``."""
    deduped = F.filter(
        arr,
        lambda x, i: (F.length(x) > 0) & (F.array_position(F.slice(arr, F.lit(1), i), x) == 0),
    )
    return F.slice(deduped, 1, cap) if cap is not None else deduped


def dedup_sentences(col: Column) -> Column:
    """Drop exact duplicate sentences, keeping order (reference:
    postprocess.py:76-87 — split after '.', join with single spaces)."""
    marked = F.regexp_replace(col, r"\.\s+", "." + _SENT_MARK)
    arr = F.transform(F.split(marked, _SENT_MARK), lambda s: F.trim(s))
    return F.array_join(_dedup_keep_first(arr), " ")


def dedup_bullets(col: Column, max_bullets: int = 10) -> Column:
    """Split into bullet items (•/-/*/numbered/newline), trim, dedup
    keeping first occurrence, cap at ``max_bullets``, rejoin: ≥2 bullets →
    '• ...' block, 1 → bare line, 0 → '' (reference: postprocess.py:94-124,
    main.py:253-296)."""
    trimmed = F.transform(F.split(col, BULLET_SPLIT_RE), lambda s: F.trim(s))
    bullets = _dedup_keep_first(trimmed, cap=max_bullets)
    return (
        F.when(F.size(bullets) >= 2, F.concat(F.lit("• "), F.array_join(bullets, "\n• ")))
        .when(F.size(bullets) == 1, bullets.getItem(0))
        .otherwise(F.lit(""))
    )


def remove_boilerplate(col: Column) -> Column:
    """Cut trailing boiler-plate sections that leak from training docs
    (reference: postprocess.py:150-156)."""
    return F.split(col, BOILERPLATE_RE).getItem(0)


def cap_words(col: Column, max_words: int = 200) -> Column:
    """Hard word cap with ellipsis (reference: postprocess.py:159-166)."""
    words = F.filter(F.split(col, r"\s+"), lambda w: F.length(w) > 0)
    return F.when(F.size(words) <= max_words, col).otherwise(
        F.concat(F.array_join(F.slice(words, 1, max_words), " "), F.lit("…"))
    )


def extract_citations(col: Column) -> Column:
    """Unique inline citations like 'PMID: 123456', order-preserving
    (reference: postprocess.py:169-171, _CIT_RE at :36)."""
    return _dedup_keep_first(F.regexp_extract_all(col, F.lit(CITATION_RE), 0))


UNHELPFUL_PHRASES = ["i’m not sure", "i am not sure", "insufficient evidence"]


def looks_unhelpful(col: Column) -> Column:
    """Boolean: empty/evasive answer — under 3 words or a hedging phrase
    (reference: main.py:242-250).  The caller routes these to the
    parameter-only fallback path instead of returning them."""
    words = F.filter(F.split(col, r"\s+"), lambda w: F.length(w) > 0)
    cond = F.size(words) < 3
    lo = F.lower(col)
    for p in UNHELPFUL_PHRASES:
        cond = cond | lo.contains(p)
    return cond


def postprocess_answer(col: Column, max_words: int = 200, max_bullets: int = 10) -> Column:
    """Full battery in reference order (postprocess.py:197-205): tokens →
    header → trim-to-period → sentence dedup → bullet dedup/cap →
    boilerplate cut → word cap.  Citation extraction runs on the result
    via :func:`extract_citations` (the reference extracts from the final
    text too)."""
    c = strip_special_tokens(col)
    c = strip_prompt_header(c)
    c = trim_to_last_period(c)
    c = dedup_sentences(c)
    c = dedup_bullets(c, max_bullets)
    c = remove_boilerplate(c)
    c = cap_words(c, max_words)
    return F.trim(c)
