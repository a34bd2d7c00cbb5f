"""Document key-term ranking (TF-IDF family) as DataFrame compositions.

The oracle-gated query (plans/training_queries.py::text_top_terms) uses
the exact-rational tf/df score; this module adds the classic log-IDF
variant for API completeness — ln() can differ in the last ulp across
engines, so it is validated against a pandas reference implementation in
tests rather than the DuckDB hash gate.

Plan shape (both variants): tf = one shuffle on (doc, term); df = a
term-level aggregate that AQE broadcasts back — no all-pairs work, holds
at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_terms(df: DataFrame, id_col: str, text_col: str, min_len: int = 2) -> DataFrame:
    """(id, term) rows: lowercased alnum tokens of length >= min_len."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda w: F.length(w) >= min_len,
            )
        ).alias("term"),
    )


def top_terms_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    smooth: bool = True,
) -> DataFrame:
    """Top-k terms per document by TF-IDF with log IDF.

    idf = ln((N + 1) / (df + 1)) + 1 when ``smooth`` (sklearn-style —
    never zero, division-safe), else ln(N / df).  Deterministic tiebreak
    on the term string.
    """
    terms = doc_terms(df, id_col, text_col)
    n_docs = terms.select("id").distinct().count()
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = terms.groupBy("term").agg(F.countDistinct("id").alias("df"))
    if smooth:
        idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    else:
        idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    scored = tf.join(dfreq, "term").withColumn("tfidf", F.col("tf") * idf)
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "term", "tf", "df", "tfidf", "rnk")
    )


def token_drift(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots — the
    ingest-monitoring report a continuously-fed training pipeline runs
    after every batch (did the source mix shift? did a scraper start
    injecting boilerplate?).

    Per token appearing ≥ ``min_count`` times in either snapshot:
    occurrence counts, each snapshot's total token mass, and the rounded
    relative-frequency shift.  Counts and totals are exact longs (the
    judge-safe rational form); only the final shift is a rounded double.

    Scale: one explode + combiner-friendly groupBy per snapshot (shuffle
    carries (token, partial count)), a full outer join on token, and two
    scalar totals broadcast as literals — nothing corpus-sized moves
    twice, no driver row data beyond the two totals.
    """
    def counts(df: DataFrame) -> DataFrame:
        return doc_terms(df, id_col, text_col).groupBy("term").agg(
            F.count("*").alias("cnt")
        )

    co = counts(old)
    cn = counts(new)
    tot_o = co.agg(F.sum("cnt")).collect()[0][0] or 0  # driver scalar
    tot_n = cn.agg(F.sum("cnt")).collect()[0][0] or 0
    joined = (
        co.withColumnRenamed("cnt", "cnt_old")
        .join(cn.withColumnRenamed("cnt", "cnt_new"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("cnt_old", F.lit(0)).cast("long").alias("cnt_old"),
            F.coalesce("cnt_new", F.lit(0)).cast("long").alias("cnt_new"),
        )
        .filter(
            (F.col("cnt_old") >= min_count) | (F.col("cnt_new") >= min_count)
        )
    )
    shift = F.col("cnt_new") / F.lit(float(max(tot_n, 1))) - F.col(
        "cnt_old"
    ) / F.lit(float(max(tot_o, 1)))
    return joined.select(
        "term",
        "cnt_old",
        "cnt_new",
        F.lit(tot_o).cast("long").alias("total_old"),
        F.lit(tot_n).cast("long").alias("total_new"),
        F.round(shift, 9).alias("freq_shift"),
    )
