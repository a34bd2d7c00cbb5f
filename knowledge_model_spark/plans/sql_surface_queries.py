"""Spark 4 SQL-surface queries: recursive CTEs and pipe syntax.

Two capabilities that landed in Spark 4 and round out the engine's SQL
surface next to the DataFrame API:

- ``WITH RECURSIVE`` (UNION ALL form — Spark does not yet support the
  UNION-dedup form, so the recursion must be acyclic/bounded; cyclic
  closure stays on the dataframe pointer-jumping path in
  operators/graph.py, which is also the right shape at scale).
- SQL pipe syntax (``|>``), the linear query form.

Both queries share semantics with their DuckDB oracles; the recursive
one runs the IDENTICAL SQL text on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables

# The decade-chain fixture from graph_queries: nodes with doc_id%10 in
# 0..3 link to doc_id+1 → each head (doc_id%10 == 0) reaches h..h+4.
# Acyclic and depth-bounded, so UNION ALL recursion terminates on both
# engines; the join back to documents keeps it honest (only existing
# nodes are walked).
_RCTE = """
    WITH RECURSIVE walk(head, node, depth) AS (
      SELECT doc_id AS head, doc_id AS node, 0 AS depth
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT w.head, w.node + 1, w.depth + 1
      FROM walk w JOIN documents d ON d.doc_id = w.node + 1
      WHERE (w.node + 1) % 10 BETWEEN 1 AND 4
    )
    SELECT head, node, depth FROM walk
"""


@register(
    "sql_recursive_chain_walk",
    _RCTE,
    doc="WITH RECURSIVE (Spark 4) transitive walk over the decade-chain "
    "graph — the IDENTICAL SQL text runs on both engines; UNION ALL "
    "form, acyclic by construction (cyclic closure stays on the "
    "dataframe pointer-jumping path, operators/graph.py)",
)
def sql_recursive_chain_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)  # registers the temp views
    return spark.sql(_RCTE)


@register(
    "sql_pipe_syntax_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (|>, Spark 4): linear scan → filter → aggregate "
    "form compiling to the same plan as the classic query — oracle "
    "states the classic form",
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 10
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             GROUP BY l_returnflag, l_linestatus
        """
    )


_LATERAL_SQL = """
    SELECT n.n_name, t.s_name, t.s_acctbal
    FROM nation n,
    LATERAL (
      SELECT s_name, s_acctbal FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name LIMIT 2
    ) t
"""


@register(
    "sql_lateral_topk_per_group",
    _LATERAL_SQL,
    doc="correlated LATERAL subquery (top-2 suppliers per nation by "
    "account balance): the IDENTICAL SQL text runs on Spark and DuckDB "
    "— Catalyst decorrelates the per-row subquery into a window-ranked "
    "join rather than executing it N times (DecorrelateInnerQuery), "
    "the at-scale requirement for lateral; deterministic via the "
    "(acctbal, name) total order",
)
def sql_lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_SETOP_ALL_SQL = """
    WITH lo AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 10),
    hi AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
    ex AS (SELECT 'except_all' AS op, k
           FROM (SELECT * FROM lo EXCEPT ALL SELECT * FROM hi)),
    ia AS (SELECT 'intersect_all' AS op, k
           FROM (SELECT * FROM lo INTERSECT ALL SELECT * FROM hi))
    SELECT op, k, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM ex UNION ALL SELECT * FROM ia)
    GROUP BY op, k
"""


@register(
    "setop_multiset_all",
    _SETOP_ALL_SQL,
    doc="multiset set operations (EXCEPT ALL / INTERSECT ALL): bag "
    "semantics over duplicate supplier keys — min/difference of "
    "per-side multiplicities, which the DISTINCT variants the rest of "
    "§2.7 covers cannot express; the IDENTICAL SQL text runs on both "
    "engines",
)
def setop_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_SETOP_ALL_SQL)


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "sql_group_by_all_revenue",
    _GROUP_BY_ALL_SQL,
    doc="GROUP BY ALL + ORDER BY ALL (the DuckDB-originated SQL "
    "ergonomics Spark 4 adopted): non-aggregate select items become the "
    "grouping key implicitly — the IDENTICAL SQL text runs on both "
    "engines and compiles to the same partial/final hash-agg plan as "
    "the explicit form (no semantic or plan cost for the sugar).",
)
def sql_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "sql_array_hof_battery",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               w -> len(w) > 1) AS tk
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
           array_to_string(list_sort(list_distinct(tk))[1:3], ' ')
             AS first3_sorted,
           len(list_filter(tk, t -> len(t) > 6)) > 0 AS has_long,
           CAST(len(list_intersect(list_distinct(tk),
                    ['table', 'value', 'row', 'data'])) AS BIGINT) AS n_common,
           CAST(len(flatten([tk[1:2], tk[3:4]])) AS BIGINT) AS n_flat
    FROM toks
    """,
    doc="higher-order array-function surface in one oracle-checked "
    "query: filter / distinct / sort / slice / join / exists-shape / "
    "intersect / flatten — all whole-stage-codegen JVM lambdas at scan "
    "speed (the API family every chunker/dedup operator in the engine "
    "composes; registered so the surface itself is contract-tested); "
    "array outputs stringify (canonicalizer-safe)",
)
def sql_array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t["documents_spread"].select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda w: F.length(w) > 1,
        ).alias("tk"),
    )
    uniq = F.array_distinct("tk")
    return toks.select(
        "doc_id",
        F.size(uniq).cast("long").alias("n_uniq"),
        F.array_join(F.slice(F.array_sort(uniq), 1, 3), " ").alias(
            "first3_sorted"
        ),
        F.exists("tk", lambda t_: F.length(t_) > 6).alias("has_long"),
        F.size(
            F.array_intersect(uniq, F.array(*[F.lit(w) for w in
                ["table", "value", "row", "data"]]))
        ).cast("long").alias("n_common"),
        F.size(
            F.flatten(F.array(F.slice("tk", 1, 2), F.slice("tk", 3, 2)))
        ).cast("long").alias("n_flat"),
    )


@register(
    "sql_star_except_projection",
    """
    SELECT * EXCLUDE (l_tax, l_discount, l_extendedprice)
    FROM lineitem WHERE l_orderkey % 1000 = 0
    """,
    doc="SELECT * EXCEPT projection (Spark 4) / DuckDB EXCLUDE — the "
    "wide-table ergonomics for dropping a few columns without "
    "enumerating hundreds; column pruning still reaches the scan "
    "(ReadSchema excludes the dropped columns, same as an explicit "
    "projection — asserted in plan tests)",
)
def sql_star_except_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (l_tax, l_discount, l_extendedprice) "
        "FROM lineitem WHERE l_orderkey % 1000 = 0"
    )


@register(
    "sql_scalar_udf_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(4,2))), 2)
                AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SQL scalar UDF (Spark 4, CREATE TEMPORARY FUNCTION ... RETURN "
    "expr): the discounted-revenue business rule defined ONCE as a "
    "catalog function and reused by name — Catalyst inlines the body, "
    "so the physical plan is the identical whole-stage-codegen "
    "aggregate as the handwritten expression (zero Python, no UDF "
    "call overhead; plan-guarded in tests).  The body uses the exact-"
    "decimal money recipe shared with the TPC-H queries, so the sum "
    "is fold-order-exact; the exact sum rounds (round(x,2) on the DECIMAL — half-up on both engines; a decimal CAST would truncate in DuckDB) "
    "BEFORE the double cast — at sf0.1 the raw 8-dp sum carries 17 "
    "significant digits and the engines' decimal→double conversions "
    "differ by one ulp there, while the 2-dp value converts "
    "identically.  Oracle states the inlined form",
)
def sql_scalar_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(22,8)
        RETURN CAST(p AS DECIMAL(18,6)) * CAST(1 - d AS DECIMAL(4,2))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(disc_rev(l_extendedprice, l_discount)), 2)
                 AS DOUBLE)
                 AS revenue
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_qualify_topk",
    """
    SELECT n_name, s_name, s_acctbal
    FROM (SELECT n.n_name, s.s_name, s.s_acctbal, s.s_suppkey
          FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey)
    QUALIFY row_number() OVER (PARTITION BY n_name
                               ORDER BY s_acctbal DESC, s_suppkey) <= 2
    """,
    doc="top-2 suppliers by account balance per nation — the QUALIFY "
    "surface row (DuckDB/BigQuery/Snowflake syntax; Spark expresses "
    "the same plan as window + filter, which Catalyst collapses to "
    "one ranked shuffle on the partition key with the rank predicate "
    "pushed into the window operator as a TopK-per-group limit).  "
    "Deterministic tiebreak on s_suppkey; the nation dim broadcasts",
)
def sql_qualify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    joined = t["supplier"].join(
        F.broadcast(t["nation"]),
        F.col("n_nationkey") == F.col("s_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        joined.select(
            "n_name", "s_name", "s_acctbal", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 2)
        .select("n_name", "s_name", "s_acctbal")
    )
