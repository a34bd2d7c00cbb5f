"""Dup-graph clustering queries, oracle-checked.

The dedup ladder's missing last rung as registered queries: near-dup
PAIRS → connected-component CLUSTERS → one SURVIVOR per cluster (the
reference's first-seen-wins key dedup, knowledge_model/main.py:283-291 +
inference/postprocess.py:75-112, is the 2-node special case).

The edge fixture is derived deterministically from the documents table
(chains of 5 consecutive doc_ids per decade), so both engines build the
identical graph; the DuckDB oracle computes components with a recursive
label-propagation CTE, while the Spark side runs the distributed
pointer-jumping algorithm (operators/graph.py) — two entirely different
algorithms agreeing on the fixpoint is exactly the signal we want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_model_spark.operators.graph import (
    connected_components,
    dedup_cluster_survivors,
)
from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables

# Chains 10k—10k+1—…—10k+4 per decade: nodes with doc_id % 10 in 0..3
# emit an edge to doc_id + 1.  Diameter 4 → exercises >1 pointer-jump
# round; ids 10k+5..10k+9 stay out of the graph entirely.
_EDGE_SQL = "SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 < 4"

_CC_CTE = f"""
    WITH RECURSIVE
    edges AS ({_EDGE_SQL}),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    walk(node, label) AS (
      SELECT DISTINCT a AS node, a AS label FROM sym
      UNION
      SELECT s.b AS node, w.label FROM walk w JOIN sym s ON s.a = w.node
    ),
    cc AS (SELECT node, min(label) AS component FROM walk GROUP BY node)
"""


def _edges(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % 10 < 4).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )


@register(
    "dedup_connected_components",
    _CC_CTE + "SELECT node, component FROM cc",
    doc="connected components over the dup-pair graph via distributed "
    "min-label propagation + pointer jumping (O(log diameter) rounds, "
    "operators/graph.py) — oracle is a recursive label-walk CTE; "
    "component = min reachable id, deterministic at any parallelism",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return connected_components(_edges(t["documents"]))


@register(
    "dedup_cluster_survivors",
    _CC_CTE
    + """
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT node FROM cc WHERE node != component)
    """,
    doc="first-seen-wins survivor per near-dup cluster: non-minimal "
    "cluster members are anti-joined away (the doomed set is tiny — it "
    "IS the duplicates — so the anti-join broadcasts); completes the "
    "pairs → clusters → survivors dedup ladder",
)
def dedup_cluster_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    return dedup_cluster_survivors(docs, _edges(docs), "doc_id").select(
        "doc_id", "lang", "source"
    )
