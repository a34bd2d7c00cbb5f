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
        # r12: NO lazy checkpoint here — unlike ppr/assortativity (whose
        # union branches consume the orders⋈lineitem join twice), this
        # edge list has exactly one consumer (pagerank's ed build), so
        # the checkpoint only paid a 1.2M-row cache write for nothing
        # (measured 1.63 → 1.50 s at sf0.1, rows identical)
    )
    # no pre-distinct here: pagerank() dedups its edge input once — a
    # distinct on each side of the union would add two more full
    # shuffles of the edge list for nothing
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # symmetric=True: sym carries both directions by construction, so
    # the node set is the distinct src column — no union-of-ends pass
    ranks = pagerank(sym, iterations=3, damping=0.85, symmetric=True)
    return ranks.select("node", "rank_e12")


# Triangle counting over a deterministic fixture graph with overlapping
# triangles: per decade d = 10k the edges {(d,d+1), (d,d+2), (d+1,d+2),
# (d+2,d+3), (d+1,d+3)} form triangles (d,d+1,d+2) and (d+1,d+2,d+3)
# sharing the edge (d+1,d+2).  Both engines derive the identical edge
# list from the documents table; the oracle enumerates each triangle
# once in canonical x<y<z order via a 3-way self-join, while the Spark
# side runs the degree-oriented wedge-close algorithm — two different
# enumeration strategies agreeing on exact integer counts.
_TRI_EDGE_SQL = """
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id AS a, doc_id + 2 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1 AS a, doc_id + 2 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2 AS a, doc_id + 3 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1 AS a, doc_id + 3 AS b FROM documents WHERE doc_id % 10 = 0
"""


@register(
    "graph_triangle_count",
    f"""
    WITH e0 AS ({_TRI_EDGE_SQL}),
    e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e0),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, count(*) AS triangles FROM corners GROUP BY node
    """,
    doc="per-node triangle counts via degree-oriented wedge enumeration "
    "(Suri-Vassilvitskii orientation bounds per-node wedge fan-out by "
    "O(sqrt(m)) on any degree distribution — operators/graph.py::"
    "triangle_count); the oracle 3-way-self-joins canonical x<y<z "
    "triples — different algorithm, identical exact counts",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.graph import triangle_count

    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    d = F.col("doc_id")
    parts = [
        base.select(d.alias("id_a"), (d + 1).alias("id_b")),
        base.select(d.alias("id_a"), (d + 2).alias("id_b")),
        base.select((d + 1).alias("id_a"), (d + 2).alias("id_b")),
        base.select((d + 2).alias("id_a"), (d + 3).alias("id_b")),
        base.select((d + 1).alias("id_a"), (d + 3).alias("id_b")),
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return triangle_count(edges)


# Entity resolution end-to-end: fuzzy-match pairs (edit distance ≤ 2 via
# the lossless q-gram prefix filter) → connected components → one
# canonical representative per cluster.  The cluster step runs on
# md5-derived 52-bit integer node ids (CC's convergence witness needs
# numeric labels); the REPRESENTATIVE is the lexicographically smallest
# member name, so the output is pure strings and the oracle — brute-force
# levenshtein pairs + a recursive label-walk CTE on the names themselves —
# never needs to reproduce the internal ids.
_ER_CTE = """
    WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
    pairs AS (
      SELECT a.p_name AS na, b.p_name AS nb
      FROM n a JOIN n b
        ON a.p_name < b.p_name
       AND abs(len(a.p_name) - len(b.p_name)) <= 2
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    sym AS (SELECT na, nb FROM pairs UNION ALL SELECT nb AS na, na AS nb FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT na AS node, na AS label FROM sym
      UNION
      SELECT s.nb AS node, w.label FROM walk w JOIN sym s ON s.na = w.node
    ),
    cc AS (SELECT node, min(label) AS rep FROM walk GROUP BY node)
"""


@register(
    "er_name_clusters",
    _ER_CTE
    + """
    SELECT node AS p_name, rep AS cluster_rep,
           count(*) OVER (PARTITION BY rep) AS cluster_size
    FROM cc
    """,
    doc="entity resolution: q-gram fuzzy pairs (edit dist <= 2, "
    "operators/fuzzy.py) -> connected components on md5-52-bit node ids "
    "(operators/graph.py) -> lexicographic-min representative per "
    "cluster; oracle = brute-force levenshtein pairs + recursive "
    "label-walk CTE over the names themselves",
)
def er_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.fuzzy import qgram_fuzzy_pairs

    t = load_tables(spark, sf_dir)
    names = t["part"].select("p_name").distinct()
    pairs = qgram_fuzzy_pairs(names, "p_name", "p_name", max_dist=2, q=2)

    def _nid(c: str):
        return F.conv(F.substring(F.md5(F.col(c)), 1, 13), 16, 10).cast("long")

    id_pairs = pairs.select(
        _nid("id_a").alias("id_a"), _nid("id_b").alias("id_b")
    )
    comp = connected_components(id_pairs)
    # map hashed node ids back to names (the name->id map is the distinct
    # name set — broadcastable), then representative = min member name
    name_ids = names.select(
        F.col("p_name"), _nid("p_name").alias("node")
    )
    from pyspark.sql import Window

    member = comp.join(F.broadcast(name_ids), "node").select("p_name", "component")
    w = Window.partitionBy("component")
    return member.select(
        "p_name",
        F.min("p_name").over(w).alias("cluster_rep"),
        F.count("*").over(w).cast("long").alias("cluster_size"),
    )


# k-core fixture: per decade d = 10k a 4-clique {d..d+3} with a 3-node
# tendril d+3—d+4—d+5—d+6.  Peeling at k=2 removes the tendril in a
# 3-round cascade (d+6 first, then d+5, then d+4) — a real iteration
# test — leaving the clique as the 2-core with within-core degree 3.
_KCORE_EDGE_SQL = """
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id AS a, doc_id + 2 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id AS a, doc_id + 3 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1 AS a, doc_id + 2 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1 AS a, doc_id + 3 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2 AS a, doc_id + 3 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 3 AS a, doc_id + 4 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 4 AS a, doc_id + 5 AS b FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 5 AS a, doc_id + 6 AS b FROM documents WHERE doc_id % 10 = 0
"""

# one peel round: survivors of s{p} with >= 2 surviving neighbors
_KCORE_PEEL = """,
    s{i} AS (
      SELECT s.a AS node FROM sym s
      WHERE s.a IN (SELECT node FROM s{p}) AND s.b IN (SELECT node FROM s{p})
      GROUP BY s.a HAVING count(*) >= 2
    )"""

_KCORE_SQL = (
    f"""
    WITH edges AS ({_KCORE_EDGE_SQL}),
    sym AS (SELECT DISTINCT a, b FROM
            (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges)
            WHERE a <> b),
    s0 AS (SELECT DISTINCT a AS node FROM sym)"""
    + "".join(_KCORE_PEEL.format(i=i, p=i - 1) for i in range(1, 7))
    + """
    SELECT s.a AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM sym s
    WHERE s.a IN (SELECT node FROM s6) AND s.b IN (SELECT node FROM s6)
    GROUP BY s.a
    """
)


@register(
    "graph_kcore_decomposition",
    _KCORE_SQL,
    doc="2-core decomposition by iterative peel (degree agg + semi join "
    "per round, localCheckpoint lineage truncation, exact shrinking "
    "node-count witness — operators/graph.py::kcore); the tendril "
    "fixture forces a 3-round peel cascade; oracle unrolls 6 peel "
    "rounds in chained CTEs (fixpoint by round 4, house pagerank style)",
)
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.graph import kcore

    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") % 10 == 0).select("doc_id")
    parts = []
    for (da, db) in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]:
        parts.append(
            d.select(
                (F.col("doc_id") + da).alias("id_a"),
                (F.col("doc_id") + db).alias("id_b"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return kcore(edges, k=2)


_BFS_SQL = f"""
    WITH RECURSIVE
    edges AS ({_EDGE_SQL}),
    sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
    src AS (SELECT doc_id AS node FROM documents WHERE doc_id % 100 = 0),
    walk(node, d) AS (
      SELECT node, 0 FROM src
      UNION
      SELECT s.b AS node, w.d + 1 FROM walk w JOIN sym s ON s.a = w.node
      WHERE w.d < 40
    )
    SELECT node, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


@register(
    "graph_bfs_hops",
    _BFS_SQL,
    doc="minimum hop count from the century-head source set over the "
    "chain graph, by synchronous frontier BFS (frontier ⋈ edges + "
    "anti join vs visited per round, O(diameter) rounds — "
    "operators/graph.py::bfs_hops); oracle is a recursive min-distance "
    "walk CTE; unreachable nodes absent from both engines",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.graph import bfs_hops

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    edges = _edges(docs)
    sources = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("node")
    )
    return bfs_hops(edges, sources)


# Personalized PageRank: teleport returns to the CUSTOMER side (even
# node ids) of the same trade graph — topic-sensitive importance as
# seen from customers (Haveliwala WWW'02).  Identical fixed-point
# integer recurrence, unrolled; the only differences from _PR_SQL are
# the seeded r0 and the per-node CASE teleport term.
_PPR_ITER = """,
    c{i} AS (
      SELECT e.dst AS node, CAST(sum(r.rank_fp // deg.outdeg) AS BIGINT) AS recv
      FROM e JOIN r{p} r ON e.src = r.node JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.node,
             CAST(CASE WHEN nodes.node % 2 = 0 THEN (SELECT t FROM tp)
                       ELSE 0 END
                  + (coalesce(c{i}.recv, 0) * 17) // 20
                  AS BIGINT) AS rank_fp
      FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node
    )"""

_PPR_SQL = (
    """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
    ns AS (SELECT count(*) AS s FROM nodes WHERE node % 2 = 0),
    tp AS (SELECT (1000000000000 * 15) // (100 * s) AS t FROM ns),
    ini AS (SELECT 1000000000000 // s AS v FROM ns),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node,
                  CAST(CASE WHEN node % 2 = 0 THEN (SELECT v FROM ini)
                            ELSE 0 END AS BIGINT) AS rank_fp
           FROM nodes)"""
    + "".join(_PPR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, rank_fp AS rank_e12 FROM r3
    """
)


@register(
    "graph_ppr_customer_seeds",
    _PPR_SQL,
    doc="personalized PageRank (Haveliwala WWW'02 topic-sensitive "
    "teleport) seeded at the customer side of the trade graph — the "
    "graph-relevance signal a retrieval stack mixes with BM25/vector "
    "scores; same bit-deterministic fixed-point int64 machinery as "
    "graph_pagerank_trade (operators/graph.py::personalized_pagerank), "
    "oracle unrolls the identical seeded integer recurrence",
)
def graph_ppr_customer_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.graph import personalized_pagerank

    t = load_tables(spark, sf_dir)
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        # both union branches consume the orders⋈lineitem join — the
        # graph_assortativity_trade barrier (one scan, not two)
        .localCheckpoint(eager=False)
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = t["customer"].select(
        (F.col("c_custkey") * 2).cast("long").alias("node")
    )
    # symmetric=True: sym carries both directions by construction
    ranks = personalized_pagerank(
        sym, seeds, iterations=3, damping=0.85, symmetric=True
    )
    return ranks.select("node", "rank_e12")


@register(
    "embeddings_single_link_clusters",
    """
    WITH RECURSIVE
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    ),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT a AS node, a AS label FROM sym
      UNION
      SELECT s.b AS node, w.label FROM walk w JOIN sym s ON s.a = w.node
    ),
    cc AS (SELECT node, min(label) AS component FROM walk GROUP BY node)
    SELECT e.vec_id, coalesce(cc.component, e.vec_id) AS cluster_id
    FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.node
    """,
    doc="single-link semantic clustering: hyperplane-LSH cosine pairs "
    "(>= 0.95, the dedup_embedding_cosine generator) fed through "
    "distributed connected components — SLINK's 'friends-of-friends' "
    "merge rule IS transitive closure, so clusters = components; "
    "singletons keep their own id; the composition SemDeDup-style "
    "semantic dedup runs before choosing per-cluster survivors",
)
def embeddings_single_link_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.dedup import embedding_near_dup_pairs_lsh
    from knowledge_model_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    emb = t["embeddings_spread"]
    pairs = embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.95, dim=64
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    # cc is node-grain and eager-checkpointed (cheap count, size-opaque
    # to Catalyst): broadcast while it fits (pagerank's 5M gate) so the
    # corpus side is not shuffled+sorted for the label lookup; the
    # id-only left side reads the plain table — the pandas-kernel
    # spread belongs to the pair generator, not this projection
    ccb = F.broadcast(cc) if cc.count() <= 5_000_000 else cc
    ids = t["embeddings"].select("vec_id")
    return (
        ids.join(ccb, ids["vec_id"] == ccb["node"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("cluster_id"),
        )
    )


@register(
    "dedup_cluster_best_survivors",
    _CC_CTE
    + """
    , members AS (
      SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    )
    SELECT cluster_id,
           (max({'s': n_chars, 'i': doc_id})).i AS survivor_id,
           (max({'s': n_chars, 'i': doc_id})).s AS survivor_chars,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM members GROUP BY cluster_id
    """,
    doc="quality-aware survivor per near-dup cluster: instead of "
    "first-seen-wins (dedup_cluster_survivors — the reference's rule, "
    "main.py:283-291), keep the cluster member with the BEST score "
    "(longest here; the struct ordering key is the quality-model "
    "seam) — the curation-grade dedup rule that keeps the fullest "
    "copy of a duplicated article; clusters via pointer-jumping CC, "
    "survivor via ONE struct-extrema hash agg",
)
def dedup_cluster_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    cc = connected_components(_edges(docs))
    members = (
        docs.select("doc_id", "n_chars")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            "doc_id",
            "n_chars",
        )
    )
    key = F.struct(F.col("n_chars").alias("s"), F.col("doc_id").alias("i"))
    return members.groupBy("cluster_id").agg(
        F.max(key)["i"].alias("survivor_id"),
        F.max(key)["s"].alias("survivor_chars"),
        F.count("*").cast("long").alias("cluster_size"),
    )


@register(
    "graph_degree_powerlaw",
    """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
    dist AS (SELECT d, count(*) AS n_nodes FROM deg GROUP BY d),
    hill AS (
      SELECT count(*) AS n_tail,
             sum(ln(CAST(d AS DOUBLE) / 2.0) ORDER BY node) AS s
      FROM deg WHERE d >= 2
    )
    SELECT CAST(dist.d AS BIGINT) AS degree,
           CAST(dist.n_nodes AS BIGINT) AS n_nodes,
           round(CASE WHEN h.s > 0 THEN 1.0 + h.n_tail / h.s END, 6)
             AS hill_alpha
    FROM dist CROSS JOIN hill h
    """,
    doc="degree distribution + Hill power-law exponent (alpha = 1 + "
    "n/Σ ln(d/d_min), d_min = 2) over the trade graph — the skew "
    "pre-flight for graph algorithms: alpha near 2 means hub nodes "
    "will dominate any per-node fan-out (triangle counting's "
    "degree-orientation and the salted joins exist exactly for this); "
    "the Hill sum folds in node order on BOTH engines over the "
    "node-level degree table; distribution rows are degree-level "
    "(tiny); the alpha column is a broadcast 1-row cross join",
)
def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    # The reversed copy can never collide with a forward row: forward
    # endpoints are (even, odd) by the 2k / 2k+1 node encoding and the
    # reversal is (odd, even), and each side is already distinct — so
    # the union-level distinct dedups nothing.  Dropping it removes a
    # full (src, dst) exchange + aggregate over 2·|E| rows (r11,
    # guide §2.3); row multiset unchanged by the parity argument.
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    dist = deg.groupBy("d").agg(F.count("*").alias("n_nodes"))
    tail = deg.filter(F.col("d") >= 2).select(
        "node", F.log(F.col("d").cast("double") / 2.0).alias("l")
    )
    hill = tail.agg(
        F.count("*").alias("n_tail"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("node", "l"))),
            F.lit(0.0),
            lambda acc, x: acc + x["l"],
        ).alias("s"),
    )
    return dist.crossJoin(F.broadcast(hill)).select(
        F.col("d").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.round(
            F.when(F.col("s") > 0, 1.0 + F.col("n_tail") / F.col("s")), 6
        ).alias("hill_alpha"),
    )


@register(
    "dedup_cluster_size_histogram",
    _CC_CTE
    + """
    , members AS (
      SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    ),
    sizes AS (SELECT cluster_id, count(*) AS sz FROM members GROUP BY cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
    doc="duplicate-cluster size histogram — the dedup-rate report a "
    "pipeline publishes after the ladder runs (how much of the corpus "
    "is singletons vs small clusters vs boilerplate floods; the "
    "n_docs column decomposes corpus mass by redundancy level); two "
    "tiny aggregates on top of the connected-components output, "
    "singletons counted via the same left-join-coalesce as the "
    "survivor queries",
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    cc = connected_components(_edges(docs))
    members = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"))
    )
    sizes = members.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return sizes.groupBy("sz").agg(F.count("*").alias("n_clusters")).select(
        F.col("sz").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        (F.col("sz") * F.col("n_clusters")).cast("long").alias("n_docs"),
    )


@register(
    "graph_link_prediction_jaccard",
    f"""
    WITH e0 AS ({_TRI_EDGE_SQL}),
    e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e0),
    sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
            FROM sym GROUP BY a),
    wedge AS (
      SELECT s1.b AS id_a, s2.b AS id_b, CAST(count(*) AS BIGINT) AS common
      FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
      GROUP BY s1.b, s2.b
    ),
    cand AS (
      SELECT w.id_a, w.id_b, w.common
      FROM wedge w ANTI JOIN e ON w.id_a = e.a AND w.id_b = e.b
    )
    SELECT c.id_a, c.id_b, c.common,
           CAST(c.common AS DOUBLE) / (da.d + db.d - c.common) AS jaccard
    FROM cand c
    JOIN deg da ON da.node = c.id_a
    JOIN deg db ON db.node = c.id_b
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
    doc="link prediction by neighborhood Jaccard (Liben-Nowell/Kleinberg "
    "2003): score every NON-adjacent pair sharing >=1 neighbor by "
    "|N(a) n N(b)| / |N(a) u N(b)|, top-20 with (score, id_a, id_b) "
    "tiebreak.  Wedge self-join through the shared neighbor costs "
    "sum(deg^2); unlike triangle counting, orientation cannot shrink "
    "the wedge count (every wedge IS a scored pair), so the 100 TB "
    "lever is a hub-degree cap — drop or sample neighbors of nodes "
    "above a degree cut, the graph twin of the dedup max_df stop "
    "shingle (hub-mediated wedges carry near-zero Jaccard anyway: "
    "common/(da+db-common) vanishes as hub degree grows).  Degrees "
    "broadcast back; the existing-edge anti join prunes before "
    "scoring; exact integer counts, the one double is a shared "
    "division.  The recommend-next-citation / "
    "suggest-duplicate-candidate primitive",
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") % 10 == 0).select("doc_id")
    e0 = (
        d.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
        .unionByName(d.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 2).alias("b")))
        .unionByName(d.select((F.col("doc_id") + 1).alias("a"), (F.col("doc_id") + 2).alias("b")))
        .unionByName(d.select((F.col("doc_id") + 2).alias("a"), (F.col("doc_id") + 3).alias("b")))
        .unionByName(d.select((F.col("doc_id") + 1).alias("a"), (F.col("doc_id") + 3).alias("b")))
    )
    from knowledge_model_spark.operators.graph import link_prediction_jaccard

    return link_prediction_jaccard(e0, "a", "b", k=20)


@register(
    "graph_modularity_lang",
    f"""
    WITH edges AS ({_EDGE_SQL}),
    lab AS (SELECT doc_id, lang FROM documents),
    typed AS (
      SELECT la.lang AS lang_a, lb.lang AS lang_b
      FROM edges e
      JOIN lab la ON la.doc_id = e.a
      JOIN lab lb ON lb.doc_id = e.b
    ),
    m AS (SELECT count(*) AS m FROM typed),
    intra AS (
      SELECT lang_a AS lang, count(*) AS intra_edges
      FROM typed WHERE lang_a = lang_b GROUP BY lang_a
    ),
    deg AS (
      SELECT lang, CAST(sum(d) AS BIGINT) AS degree_sum FROM (
        SELECT lang_a AS lang, count(*) AS d FROM typed GROUP BY lang_a
        UNION ALL
        SELECT lang_b AS lang, count(*) AS d FROM typed GROUP BY lang_b
      ) GROUP BY lang
    ),
    nodes AS (
      SELECT lang, count(*) AS n_nodes FROM (
        SELECT DISTINCT la.lang, e.a AS node FROM edges e
          JOIN lab la ON la.doc_id = e.a
        UNION
        SELECT DISTINCT lb.lang, e.b AS node FROM edges e
          JOIN lab lb ON lb.doc_id = e.b
      ) GROUP BY lang
    )
    SELECT n.lang, CAST(n.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           d.degree_sum,
           (coalesce(i.intra_edges, 0) / CAST(m.m AS DOUBLE))
             - (d.degree_sum / (2.0 * m.m)) * (d.degree_sum / (2.0 * m.m))
             AS q_contrib
    FROM nodes n
    JOIN deg d USING (lang)
    LEFT JOIN intra i USING (lang)
    CROSS JOIN m
    """,
    doc="Newman modularity of the LANGUAGE partition over the dup-pair "
    "graph — per community c: Q_c = m_c/m − (d_c/2m)², the standard "
    "'does this attribute explain the graph' diagnostic (a corpus "
    "whose dup clusters align with language partitions cleanly for "
    "per-lang dedup; Q≈0 means cross-lingual dups dominate).  All "
    "inputs are exact integer counts; each Q_c is two divisions and "
    "one multiply of identical doubles — no order-sensitive fold, "
    "per-community rows so no global float sum.  Scale: edges join "
    "the broadcast node→lang map twice, two count shuffles on the "
    "lang key — never materializes anything larger than the edge list",
)
def graph_modularity_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    lab = docs.select("doc_id", "lang")
    edges = _edges(docs)
    typed = (
        edges.join(
            lab.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")),
            "id_a",
        )
        .join(
            lab.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")),
            "id_b",
        )
        .select("id_a", "id_b", "lang_a", "lang_b")
        # four consumers (m, intra, deg, nodes) — materialize the
        # edge-typing joins once (graph_hits_trade's edge-list barrier)
        .localCheckpoint(eager=False)
    )
    m = typed.agg(F.count("*").alias("m"))
    intra = (
        typed.filter(F.col("lang_a") == F.col("lang_b"))
        .groupBy(F.col("lang_a").alias("lang"))
        .agg(F.count("*").alias("intra_edges"))
    )
    deg = (
        typed.select(F.col("lang_a").alias("lang"))
        .unionAll(typed.select(F.col("lang_b").alias("lang")))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("degree_sum"))
    )
    nodes = (
        typed.select(F.col("lang_a").alias("lang"), F.col("id_a").alias("node"))
        .unionAll(typed.select(F.col("lang_b").alias("lang"), F.col("id_b").alias("node")))
        .distinct()
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    return (
        # deg/intra are language-grain (a handful of rows) behind
        # aggregations — broadcast so the two lookups don't SMJ
        nodes.join(broadcast(deg), "lang")
        .join(broadcast(intra), "lang", "left")
        .crossJoin(broadcast(m))
        .select(
            "lang",
            "n_nodes",
            F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long").alias("intra_edges"),
            "degree_sum",
            (
                F.coalesce(F.col("intra_edges"), F.lit(0))
                / F.col("m").cast("double")
                - (F.col("degree_sum") / (F.lit(2.0) * F.col("m")))
                * (F.col("degree_sum") / (F.lit(2.0) * F.col("m")))
            ).alias("q_contrib"),
        )
    )


# HITS fixed-point recurrence, unrolled.  Scale 1e6; every round
# renormalizes by the integer MAX (not the L2 norm — a float sqrt
# would break bit-determinism), so values stay in [0, 1e6]: a = Σ h
# over in-edges (≤ indeg·1e6), then a·1e6 // max(a).  Overflow bound:
# the renorm product a·1e6 ≤ indeg·1e12, so int64 holds up to ~9.2e6
# distinct in-edges on one node — far above this graph's fan-in; a
# graph beyond that drops the fixed-point scale to 1e3 (bound halves
# per decade of degree), the documented knob.
_HITS_SQL = """
    WITH e AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
    h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
    a1r AS (SELECT e.dst AS node, CAST(sum(h0.h) AS BIGINT) AS a
            FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
    a1 AS (SELECT node, a * 1000000 // (SELECT max(a) FROM a1r) AS a FROM a1r),
    h1r AS (SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
            FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
    h1 AS (SELECT node, h * 1000000 // (SELECT max(h) FROM h1r) AS h FROM h1r),
    a2r AS (SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
            FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
    a2 AS (SELECT node, a * 1000000 // (SELECT max(a) FROM a2r) AS a FROM a2r),
    h2r AS (SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS h
            FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
    h2 AS (SELECT node, h * 1000000 // (SELECT max(h) FROM h2r) AS h FROM h2r)
    SELECT n.node,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub_e6,
           CAST(coalesce(a2.a, 0) AS BIGINT) AS auth_e6
    FROM nodes n
    LEFT JOIN h2 ON h2.node = n.node
    LEFT JOIN a2 ON a2.node = n.node
"""


@register(
    "graph_hits_trade",
    _HITS_SQL,
    doc="HITS hubs & authorities (Kleinberg '99; 2 synchronous rounds) "
    "over the DIRECTED customer→supplier trade graph: customers score "
    "as hubs (buy from many strong suppliers), suppliers as "
    "authorities — completes the link-analysis family beside pagerank "
    "and personalized PageRank.  Same bit-determinism recipe as "
    "graph_pagerank_trade: int64 fixed-point scores, integer-MAX "
    "renormalization each half-step (no float norm anywhere), the "
    "oracle unrolls the identical integer recurrence.  Per round: one "
    "edge-key join + one dst-key agg + a 1-row broadcast max — "
    "edge-count bound, O(rounds) BSP",
)
def graph_hits_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    t = load_tables(spark, sf_dir)
    e = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # edges feed every half-step
    )
    # Every half-step's raw-sum table is referenced twice (renorm max +
    # next join) — without a materialization barrier each reference
    # re-executes its whole subtree, and the 4 half-steps unroll into a
    # 2^4-duplicated 46-SortMergeJoin plan (measured: an 828-node
    # physical plan at sf0.1).  Same BSP recipe as pagerank: eager
    # localCheckpoint per half-step, broadcast the node-sized score
    # table into the edge join (localCheckpoint erases size stats, so
    # Catalyst would otherwise SMJ), and fetch the 1-row renorm max as
    # a driver scalar exactly like pagerank's node count — the
    # recurrence itself is unchanged, integral DIV and all.
    # r12 (guide §1.2 step 1 — one action per materialization): the
    # node count and each half-step's renorm MAX ride the checkpoint's
    # materializing job via observe() (the kcore/pagerank recipe) —
    # 9 actions (4 checkpoints + 4 max scans + 1 count) drop to 5.
    # max/count are exact integers, so the values are bit-identical to
    # the former separate jobs.
    from pyspark.sql import Observation

    nobs = Observation()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .observe(nobs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # same size gate as pagerank: node-sized score tables broadcast
    # while they plausibly fit executor memory; beyond that the SMJ is
    # correct anyway (score exchanges reuse the node-key partitioning)
    bcast = broadcast if nobs.get["n"] <= 5_000_000 else (lambda d: d)
    h = nodes.select("node", F.lit(1_000_000).cast("long").alias("h"))
    a = None
    for _ in range(2):
        aobs = Observation()
        ar = (
            e.join(bcast(h.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").cast("long").alias("a"))
            .observe(aobs, F.max("a").alias("m"))
            .localCheckpoint(eager=True)
        )
        amax = aobs.get["m"] or 1  # None only when empty
        # integral DIV, not double /: at 1e15-scale numerators a double
        # quotient one ulp below an integer would cast UP where // floors
        a = ar.select("node", F.expr(f"(a * 1000000) DIV {amax}").alias("a"))
        hobs = Observation()
        hr = (
            e.join(bcast(a.withColumnRenamed("node", "dst")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").cast("long").alias("h"))
            .observe(hobs, F.max("h").alias("m"))
            .localCheckpoint(eager=True)
        )
        hmax = hobs.get["m"] or 1
        h = hr.select("node", F.expr(f"(h * 1000000) DIV {hmax}").alias("h"))
    return (
        nodes.join(bcast(h.withColumnRenamed("h", "hub_e6")), "node", "left")
        .join(bcast(a.withColumnRenamed("a", "auth_e6")), "node", "left")
        .select(
            "node",
            F.coalesce("hub_e6", F.lit(0)).cast("long").alias("hub_e6"),
            F.coalesce("auth_e6", F.lit(0)).cast("long").alias("auth_e6"),
        )
    )


@register(
    "graph_assortativity_trade",
    """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS DECIMAL(19,0)) AS d
            FROM e GROUP BY src),
    pairs AS (
      SELECT ds.d AS x, dd.d AS y
      FROM e JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs
    )
    SELECT m AS m_edges,
           round((m * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS assortativity
    FROM m
    """,
    doc="degree assortativity (Newman 2002): Pearson correlation of "
    "endpoint degrees over the symmetrized trade graph — negative for "
    "hub-and-spoke topologies (high-degree customers trade with "
    "low-degree suppliers), the structural diagnostic that decides "
    "whether degree-based partitioning/salting will face hub-hub "
    "hotspots.  Degrees are exact integers; the five moments "
    "accumulate as DECIMAL(19,0) products (order-free, no overflow); "
    "one O(1) float formula at the end, round-6.  Two edge-key joins "
    "against the broadcast-size degree table + one global agg",
)
def graph_assortativity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e0 = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
        # both unionAll branches consume e0 — without the barrier the
        # orders⋈lineitem join + distinct runs twice (same one-liner as
        # graph_hits_trade's edge list)
        .localCheckpoint(eager=False)
    )
    e = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # deg is consumed by BOTH endpoint joins — materialize it once
    # (otherwise the groupBy over the edge list runs twice) and
    # broadcast the node-grain table while it fits (pagerank's 5M
    # gate): the edge list then streams through two build-side hash
    # lookups with ZERO edge shuffles instead of two SMJ exchanges
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("decimal(19,0)").alias("d"))
        .localCheckpoint(eager=True)
    )
    bcast = F.broadcast if deg.count() <= 5_000_000 else (lambda d: d)
    pairs = (
        e.join(bcast(deg.select(F.col("node").alias("src"), F.col("d").alias("x"))), "src")
        .join(bcast(deg.select(F.col("node").alias("dst"), F.col("d").alias("y"))), "dst")
        .select("x", "y")
    )
    m = pairs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    mm = F.col("m")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        F.col("m").alias("m_edges"),
        F.round(
            (mm * sxy - sx * sy)
            / F.sqrt((mm * sxx - sx * sx) * (mm * syy - sy * sy)),
            6,
        ).alias("assortativity"),
    )
