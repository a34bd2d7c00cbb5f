"""Prompt assembly as column expressions (reference:
inference/prompt_utils.py:43-111, main.py:404).

Generation itself is out of engine scope, but assembling the prompt is
batch data processing: template sections joined with blank lines, the
retrieved evidence wrapped in <context> tags, and a keep-the-LAST-N
truncation (the reference truncates token ids from the front so the
user message always survives; the word-level analog here behaves the
same way).  All UDF-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's system message is model persona text; the engine treats
# it as an opaque configurable string (default mirrors its shape, not its
# branding)
DEFAULT_SYSTEM_MSG = "Answer only from the provided context; reply 'insufficient evidence' when the context lacks the facts."

MAX_INPUT_WORDS = 1024  # reference: MAX_INPUT_TOKENS (token-level there)


def build_prompt(
    user_msg: Column,
    context: Column | None = None,
    conversation: Column | None = None,
    system_msg: str = DEFAULT_SYSTEM_MSG,
) -> Column:
    """Assemble ### System / <context> / history / ### User / ### Assistant
    sections joined by blank lines (reference: prompt_utils.py:79-111,
    including the pre-seeded '• ' assistant bullet)."""
    parts = [F.concat(F.lit("### System:\n"), F.lit(system_msg.strip()))]
    if context is not None:
        parts.append(
            F.concat(F.lit("<context>\n"), F.trim(context), F.lit("\n</context>"))
        )
    if conversation is not None:
        parts.append(F.trim(conversation))
    parts.append(F.concat(F.lit("### User:\n"), F.trim(user_msg)))
    parts.append(F.lit("### Assistant:\n• "))
    return F.concat_ws("\n\n", *parts)


def truncate_keep_last(col: Column, max_words: int = MAX_INPUT_WORDS) -> Column:
    """Keep only the LAST ``max_words`` whitespace words — the reference's
    tokens[-max_len:] (prompt_utils.py:70-72): front-truncation preserves
    the most recent turns and the user question."""
    words = F.filter(F.split(col, r"\s+"), lambda w: F.length(w) > 0)
    n = F.size(words)
    return F.when(n <= max_words, col).otherwise(
        F.array_join(F.slice(words, n - max_words + 1, max_words), " ")
    )
