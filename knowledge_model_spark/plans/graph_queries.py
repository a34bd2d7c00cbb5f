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
    pagerank,
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


# PageRank over the customer↔supplier trade graph (who-bought-from-whom,
# made symmetric).  The oracle unrolls the identical FIXED-POINT integer
# recurrence for the same 3 rounds (scale 1e12, damping as the rational
# 17/20): integer sums are exactly commutative/associative, so both
# engines agree bit-for-bit with no float-ordering gymnastics at all.
_PR_ITER = """
    c{i} AS (
      SELECT e.dst AS node, CAST(sum(r.rank_fp // deg.outdeg) AS BIGINT) AS recv
      FROM e JOIN r{p} r ON e.src = r.node JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.node,
             CAST((SELECT t FROM tp) + (coalesce(c{i}.recv, 0) * 17) // 20
                  AS BIGINT) AS rank_fp
      FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node
    )"""

_PR_SQL = (
    """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    tp AS (SELECT (1000000000000 * 15) // (100 * n) AS t FROM nn),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node,
                  CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS rank_fp
           FROM nodes),
    """
    + ",".join(_PR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, rank_fp AS rank_e12 FROM r3
    """
)


@register(
    "graph_pagerank_trade",
    _PR_SQL,
    doc="PageRank (3 synchronous rounds, damping 17/20) over the symmetric "
    "customer↔supplier trade graph — iterative BSP DataFrame algorithm "
    "(operators/graph.py::pagerank): fixed-point int64 ranks, plain "
    "map-side-combinable integer sums (bit-deterministic by construction); "
    "oracle unrolls the identical integer recurrence",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(
            # numeric node ids (customers even, suppliers odd): long keys
            # shuffle/sort ~2× faster than 'c:123'-style strings through
            # the distinct + outdeg window over 1.2M edges
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
    )
    # no pre-distinct here: pagerank() dedups its edge input once — a
    # distinct on each side of the union would add two more full
    # shuffles of the edge list for nothing
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(sym, iterations=3, damping=0.85)
    return ranks.select("node", "rank_e12")
