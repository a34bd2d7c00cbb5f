"""Answer-postprocess queries, oracle-checked.

The battery (functions/postprocess.py, reference: inference/
postprocess.py:57-171) runs over a deterministic synthetic "raw model
output" built from each document: prompt header + duplicated sentences +
duplicated bullets + citations + a boilerplate section + special tokens
+ a dangling fragment — so every stage demonstrably fires.

The Spark pipeline applies stages in separate projections: Catalyst's
CollapseProject declines to inline a projection whose output is consumed
more than once by non-cheap expressions, so the staged form keeps the
expression tree linear in battery length instead of exponential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_model_spark.functions import postprocess as pp
from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables

MAX_WORDS = 60

# ---- synthetic raw model output, identical on both engines ------------

_RAW_SQL = """
    '### Response: ' || s || '. ' || s ||
    '. • alpha point • alpha point • beta point. See PMID: ' ||
    CAST(doc_id AS VARCHAR) || ' and DOI:10.1000/x' ||
    CAST(doc_id % 7 AS VARCHAR) ||
    '. Funding: agency money. <pad> trailing frag'
"""


def _raw_col() -> F.Column:
    s = F.trim(F.substring("text", 1, 180))
    return F.concat(
        F.lit("### Response: "), s, F.lit(". "), s,
        F.lit(". • alpha point • alpha point • beta point. See PMID: "),
        F.col("doc_id").cast("string"),
        F.lit(" and DOI:10.1000/x"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(". Funding: agency money. <pad> trailing frag"),
    )


# ---- DuckDB twin of the battery (RE2-safe, stage-per-CTE) -------------

_TOK_RE = pp.SPECIAL_TOKENS_RE
_ORACLE = f"""
    WITH raw AS (
      SELECT doc_id, {_RAW_SQL} AS t
      FROM (SELECT doc_id, trim(substring(text, 1, 180)) AS s FROM documents)
    ),
    s1 AS (SELECT doc_id,
                  regexp_replace(trim(regexp_replace(t, '{_TOK_RE}', '', 'g')),
                                 '{pp.HEADER_RE}', '') AS t
           FROM raw),
    s2 AS (SELECT doc_id,
                  CASE WHEN len(regexp_replace(t, '[^.!?]*$', '')) > 1
                       THEN regexp_replace(t, '[^.!?]*$', '') ELSE t END AS t
           FROM s1),
    s3 AS (SELECT doc_id,
                  list_transform(
                    regexp_split_to_array(
                      regexp_replace(t, '\\.\\s+', '.{pp._SENT_MARK}', 'g'),
                      '{pp._SENT_MARK}'),
                    s -> trim(s)) AS sents
           FROM s2),
    s4 AS (SELECT doc_id,
                  array_to_string(
                    list_filter(sents, (x, i) ->
                      len(x) > 0 AND NOT list_contains(sents[1:i-1], x)),
                    ' ') AS t
           FROM s3),
    s5 AS (SELECT doc_id,
                  list_transform(
                    regexp_split_to_array(t, '{pp.BULLET_SPLIT_RE}'),
                    s -> trim(s)) AS parts
           FROM s4),
    s6 AS (SELECT doc_id,
                  list_slice(
                    list_filter(parts, (x, i) ->
                      len(x) > 0 AND NOT list_contains(parts[1:i-1], x)),
                    1, 10) AS b
           FROM s5),
    s7 AS (SELECT doc_id,
                  CASE WHEN len(b) >= 2
                         THEN '• ' || array_to_string(b, chr(10) || '• ')
                       WHEN len(b) = 1 THEN b[1]
                       ELSE '' END AS t
           FROM s6),
    s8 AS (SELECT doc_id,
                  regexp_split_to_array(t, '{pp.BOILERPLATE_RE}')[1] AS t
           FROM s7),
    s9 AS (SELECT doc_id, t,
                  list_filter(regexp_split_to_array(t, '\\s+'),
                              w -> len(w) > 0) AS words
           FROM s8),
    s10 AS (SELECT doc_id,
                   trim(CASE WHEN len(words) <= {MAX_WORDS} THEN t
                        ELSE array_to_string(list_slice(words, 1, {MAX_WORDS}), ' ')
                             || '…' END) AS answer
            FROM s9),
    fin AS (SELECT doc_id, answer,
                   regexp_extract_all(answer, '{pp.CITATION_RE}', 0) AS cits
            FROM s10)
    SELECT doc_id, answer,
           array_to_string(
             list_filter(cits, (x, i) ->
               len(x) > 0 AND NOT list_contains(cits[1:i-1], x)), ';') AS citations
    FROM fin
"""


@register(
    "text_page_furniture",
    """
    WITH raw AS (
      SELECT doc_id,
             'Page 1 of 12' || chr(10) || substring(text, 1, 120) || chr(10)
             || ' ' || CAST(doc_id AS VARCHAR) || ' ' || chr(10)
             || 'Copyright 2024 Elsevier Inc.' || chr(10)
             || substring(text, 121, 120) || chr(10)
             || 'All rights reserved.' AS t
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(t, chr(10)), l ->
               NOT regexp_matches(l,
                 '(?i)^(?:Page \\d+(?: of \\d+)?|©.*|Copyright.*|All rights reserved\\.?)$')
               AND NOT regexp_matches(l, '^\\s*\\d+\\s*$')),
             chr(10)) AS cleaned
    FROM raw
    """,
    doc="page-number/header/footer/copyright line drop from PDF text "
    "(reference: ingestion/parse_pdfs.py:23-24,44-54) — per-line array "
    "filter over planted furniture lines",
)
def text_page_furniture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.functions.text_cleaning import strip_page_furniture

    t = load_tables(spark, sf_dir)
    raw = F.concat(
        F.lit("Page 1 of 12\n"),
        F.substring("text", 1, 120),
        F.lit("\n "),
        F.col("doc_id").cast("string"),
        F.lit(" \nCopyright 2024 Elsevier Inc.\n"),
        F.substring("text", 121, 120),
        F.lit("\nAll rights reserved."),
    )
    return t["documents"].select(
        "doc_id", strip_page_furniture(raw).alias("cleaned")
    )


@register(
    "postprocess_unhelpful_flag",
    """
    WITH answers AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'ok.'
                  WHEN doc_id % 5 = 1
                    THEN 'Honestly, I am not sure this is answerable.'
                  WHEN doc_id % 5 = 2
                    THEN 'There is insufficient evidence to say more.'
                  ELSE substring(text, 1, 100) END AS answer
      FROM documents
    )
    SELECT doc_id, answer,
           (len(list_filter(regexp_split_to_array(answer, '\\s+'),
                            w -> len(w) > 0)) < 3
            OR contains(lower(answer), 'i am not sure')
            OR contains(lower(answer), 'i’m not sure')
            OR contains(lower(answer), 'insufficient evidence')) AS unhelpful
    FROM answers
    """,
    doc="unhelpful-answer predicate (reference: main.py:242-250): under 3 "
    "words or a hedging phrase — routes to the parameter-only fallback",
)
def postprocess_unhelpful_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    answer = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("ok."))
        .when(F.col("doc_id") % 5 == 1, F.lit("Honestly, I am not sure this is answerable."))
        .when(F.col("doc_id") % 5 == 2, F.lit("There is insufficient evidence to say more."))
        .otherwise(F.substring("text", 1, 100))
    )
    return (
        t["documents"]
        .select("doc_id", answer.alias("answer"))
        .select("doc_id", "answer", pp.looks_unhelpful(F.col("answer")).alias("unhelpful"))
    )


# no apostrophes: the string is embedded in a single-quoted SQL literal
PROMPT_SYS = 'Answer only from the provided context; reply "insufficient evidence" when the context lacks the facts.'
PROMPT_CAP = 120  # words — small enough that real documents trigger truncation


@register(
    "retrieval_build_prompt",
    f"""
    WITH built AS (
      SELECT doc_id,
             '### System:' || chr(10) || '{PROMPT_SYS}' || chr(10) || chr(10)
             || '<context>' || chr(10) || trim(substring(text, 101, 400))
             || chr(10) || '</context>' || chr(10) || chr(10)
             || '### User:' || chr(10) || trim(substring(text, 1, 100))
             || chr(10) || chr(10) || '### Assistant:' || chr(10) || '• '
               AS prompt
      FROM documents
    ),
    capped AS (
      SELECT doc_id, prompt,
             list_filter(regexp_split_to_array(prompt, '\\s+'),
                         w -> len(w) > 0) AS words
      FROM built
    )
    SELECT doc_id,
           CASE WHEN len(words) <= {PROMPT_CAP} THEN prompt
                ELSE array_to_string(
                       list_slice(words, len(words) - {PROMPT_CAP} + 1, len(words)),
                       ' ') END AS prompt,
           CAST(least(len(words), {PROMPT_CAP}) AS BIGINT) AS n_words
    FROM capped
    """,
    doc="prompt assembly (reference: prompt_utils.py:79-111, truncation "
    ":70-72 and main.py:404): system + <context> + user + pre-seeded "
    "assistant bullet, front-truncated to the LAST N words so the user "
    "question always survives",
)
def retrieval_build_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.functions.prompting import (
        build_prompt,
        truncate_keep_last,
    )

    t = load_tables(spark, sf_dir)
    built = t["documents"].select(
        "doc_id",
        build_prompt(
            user_msg=F.substring("text", 1, 100),
            context=F.substring("text", 101, 400),
            system_msg=PROMPT_SYS,
        ).alias("p0"),
    )
    capped = built.select(
        "doc_id", truncate_keep_last(F.col("p0"), PROMPT_CAP).alias("prompt")
    )
    return capped.select(
        "doc_id",
        "prompt",
        F.least(
            F.size(F.filter(F.split("prompt", r"\s+"), lambda w: F.length(w) > 0)),
            F.lit(PROMPT_CAP),
        ).cast("long").alias("n_words"),
    )


@register(
    "postprocess_battery",
    _ORACLE,
    doc="answer postprocess battery (reference: inference/postprocess.py:57-171, "
    "main.py:253-296): special-token strip, header strip, trim-to-last-period, "
    "sentence dedup, bullet dedup/cap 10, boilerplate cut, word cap, unique "
    "inline citation extraction — all UDF-free column expressions",
)
def postprocess_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.session import ensure_min_partitions

    t = load_tables(spark, sf_dir)
    # one stage per projection — see module docstring for why; the battery
    # is heavy per-row (regex chains + array lambdas), so spread a
    # single-split local scan across cores (no-op at cluster scale)
    docs = ensure_min_partitions(t["documents"])
    df = docs.select("doc_id", _raw_col().alias("t"))
    df = df.select("doc_id", pp.strip_prompt_header(pp.strip_special_tokens(F.col("t"))).alias("t"))
    df = df.select("doc_id", pp.trim_to_last_period(F.col("t")).alias("t"))
    df = df.select("doc_id", pp.dedup_sentences(F.col("t")).alias("t"))
    df = df.select("doc_id", pp.dedup_bullets(F.col("t"), 10).alias("t"))
    df = df.select("doc_id", pp.remove_boilerplate(F.col("t")).alias("t"))
    df = df.select("doc_id", F.trim(pp.cap_words(F.col("t"), MAX_WORDS)).alias("answer"))
    # citations emitted as a ';'-joined scalar, not array<string>: the
    # driver's canonicalizer sorts all columns through pandas, which cannot
    # hash list cells (r02 red row) — a string column is canon-safe
    return df.select(
        "doc_id",
        "answer",
        F.array_join(pp.extract_citations(F.col("answer")), ";").alias("citations"),
    )
