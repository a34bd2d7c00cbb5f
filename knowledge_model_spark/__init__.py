"""knowledge_model_spark — a PySpark-native analytics engine.

Re-expresses the dataflow capabilities of the NaS-Research/knowledge-model
reference (biomedical-literature RAG platform: ingest → clean → chunk →
embed → top-k retrieval → eval) as an idiomatic Spark DataFrame/SQL
library, extended with the relational operator surface and LLM-training-
data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB-scale corpus engine needs.

Design principles
-----------------
- DataFrame/SQL first: declare logical plans, let Catalyst pick physical
  strategy (predicate pushdown, column pruning, broadcast joins, AQE).
- JVM-side expressions in hot paths; Arrow-batched pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Every operator is designed for a 1000-executor cluster: broadcast small
  dims, partial aggregation, no driver-side collects in operators.
"""

from knowledge_model_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
