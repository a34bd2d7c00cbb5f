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
