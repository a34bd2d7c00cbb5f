"""Query catalog: every declared operator as a (spark_fn, oracle_sql) pair.

``REGISTRY`` maps query name → QuerySpec.  The driver contract
(`__spark_entry__.py`) is generated from this registry: ``queries()``
returns the Spark callables, ``oracle_sql()`` the DuckDB-equivalent SQL
for every oracle-checkable entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Iteration-order priority for the driver's correctness gate.  Round 1
# recorded rows for exactly the first 50 registry entries, leaving 15
# locally-green queries without a driver row; these (plus the queries
# added since) iterate FIRST so a bounded harness reaches them.  The
# remaining round-1-green queries follow in their original order —
# their green rows are on record in CORRECTNESS_r01.json.
_GATE_PRIORITY = [
    # round-1 registry entries the driver never reached
    "retrieval_threshold_cascade",
    "retrieval_pack_context",
    "eval_recall_label_at_10",
    "agg_percentiles",
    "embeddings_label_centroids",
    "chunk_word_budget",
    "corpus_dual_variant",
    "corpus_weighted_merge",
    "map_event_type_shares",
    "unpivot_flag_metrics",
    "subquery_scalar_above_avg",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_image_features",
    "multimodal_frame_sample",
    # added in round 2
    "retrieval_rerank_topk",
    "chunk_sentence_budget",
    "udaf_label_centroid",
    "postprocess_battery",
    "sample_train_split",
    "pack_training_sequences",
    "text_top_terms",
    "text_page_furniture",
    "postprocess_unhelpful_flag",
    "multimodal_audio_features",
    "retrieval_build_prompt",
    "eval_ann_recall_vs_exact",
]


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: fills REGISTRY)."""
    from knowledge_model_spark.plans import (  # noqa: F401
        relational_queries,
        text_queries,
        dedup_queries,
        events_queries,
        similarity_queries,
        retrieval_queries,
        pipeline_queries,
        postprocess_queries,
        training_queries,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _GATE_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
