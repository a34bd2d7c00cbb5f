"""Column-expression function library (UDF-free wherever possible)."""

from knowledge_model_spark.functions.text_cleaning import clean_text
from knowledge_model_spark.functions.chunking import split_passages
from knowledge_model_spark.functions.vectors import cosine_sim, dot, l2_normalize

__all__ = ["clean_text", "split_passages", "cosine_sim", "dot", "l2_normalize"]
