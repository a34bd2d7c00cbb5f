"""Train/eval decontamination (engine extension).

Before fine-tuning or benchmarking, a training pipeline must drop
training documents that textually overlap the evaluation set — otherwise
eval scores measure memorization.  The standard formulation (used by
GPT-3/PaLM/Llama data cards) is n-gram overlap: a train doc is
contaminated if it shares ≥ ``min_shared`` word k-grams with any eval
doc.

Scale shape: explode both sides to (id, shingle) and equi-join on the
shingle — the eval side is tiny relative to a 100 TB corpus, so its
shingle index BROADCASTS and the probe is a map-side hash join over the
train scan; no shuffle of the corpus.  Reuses :func:`shingles` (distinct
word k-grams of normalized text) so decontamination, Jaccard dedup, and
the DuckDB oracle all agree on tokenization.

The reference has no eval-decontamination stage (its recall eval uses
held-out queries, pipelines/tasks/eval_snapshot.py:58-68); this is a
north-star addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from knowledge_model_spark.functions.text_analysis import shingles


def _shingle_index(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("s")
    )


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """(train_id, eval_id, n_shared): eval docs each train doc overlaps,
    with the count of shared k-grams — the audit report a pipeline
    publishes alongside the cleaned corpus."""
    t = _shingle_index(train, id_col, text_col, k).withColumnRenamed("id", "train_id")
    e = _shingle_index(eval_df, id_col, text_col, k).withColumnRenamed("id", "eval_id")
    return (
        t.join(broadcast(e), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Training rows with every contaminated document removed.

    The doomed-id set is small (it IS the contamination), so the
    anti-join broadcasts — same shape as dedup_cluster_survivors.
    """
    doomed = (
        contamination_pairs(train, eval_df, id_col, text_col, k, min_shared)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(broadcast(doomed), id_col, "left_anti")
