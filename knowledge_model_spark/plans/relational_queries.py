"""Relational operator battery — oracle-checked on the TPC-H-ish testdata.

Each query exercises one operator family from SURVEY.md §2 (joins §2.3,
aggregations §2.4, windows §2.5, sort/limit/top-k §2.6, set ops §2.7) and
carries a DuckDB-equivalent oracle.  Column names are aliased identically
on both sides; money aggregates round to 2 decimals, ratios to 6, so the
driver's value-hash is FP-stable across engines.

Scale notes (local[32] correctness, 100 TB design):
- nation/region/supplier/part are dimensions → Catalyst broadcasts them
  (autoBroadcastJoinThreshold); fact-fact joins (orders⋈lineitem) hash-
  partition on the key and AQE handles skew.
- every aggregation here is partial-agg friendly (sum/count/avg/min/max),
  so map-side combine cuts the shuffle to |groups| per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from knowledge_model_spark.operators.relational import asof_join, dedup_first_seen
from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables


# ------------------------------------------------------------ aggregation

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: multi-agg groupBy with pushed-down date filter",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey, revenue, orderdate, o_orderpriority FROM (
      SELECT o.o_orderkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d')                   AS orderdate,
             o.o_orderpriority
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    )
    """,
    doc="TPC-H Q3: 3-way join, agg, global top-10 (TakeOrderedAndProject)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT r.r_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="snowflake join through two dimension hops, broadcast all dims",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "agg_distinct_counts",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)       AS n_customers,
           count(*)                        AS n_orders,
           round(sum(o_totalprice), 2)     AS total,
           round(min(o_totalprice), 2)     AS min_price,
           round(max(o_totalprice), 2)     AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="distinct aggregation (expand + two-phase agg)",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"), F.count("*").alias("n")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS via SQL",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ------------------------------------------------------------------ joins

@register(
    "join_semi_orders_with_big_items",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
    """,
    doc="left-semi join (EXISTS)",
)
def join_semi_orders_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["lineitem"].filter(F.col("l_quantity") >= 45)
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-anti join (NOT EXISTS) — the reference's dup-suppression pattern (pipeline.py:78-81)",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "join_left_outer_order_counts",
    """
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="left outer join + agg with null-preserving count",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_full_outer_nation_activity",
    """
    SELECT n.n_name,
           count(DISTINCT c.c_custkey) AS n_cust,
           count(DISTINCT s.s_suppkey) AS n_supp
    FROM nation n
      FULL JOIN customer c ON c.c_nationkey = n.n_nationkey
      FULL JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="full outer joins with distinct counts",
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"), "full")
        .join(t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"), "full")
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


@register(
    "join_theta_price_above_retail",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey,
           round(l.l_extendedprice, 2) AS l_extendedprice,
           round(p.p_retailprice, 2)   AS p_retailprice
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_extendedprice > 50 * p.p_retailprice
    """,
    doc="theta join: equi key + non-equi residual predicate",
)
def join_theta_price_above_retail(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            broadcast(t["part"]),
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_extendedprice") > 50 * F.col("p_retailprice")),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_partkey",
            F.round("l_extendedprice", 2).alias("l_extendedprice"),
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


@register(
    "join_range_acctbal_band",
    """
    SELECT b.band_id, count(*) AS n_suppliers, round(sum(s.s_acctbal), 2) AS total_bal
    FROM (SELECT CAST(0 AS BIGINT) AS band_id, -1000.0 AS lo, 1000.0 AS hi UNION ALL
          SELECT 1, 1000.0, 3000.0 UNION ALL
          SELECT 2, 3000.0, 6000.0 UNION ALL
          SELECT 3, 6000.0, 100000.0) b
    JOIN supplier s ON s.s_acctbal >= b.lo AND s.s_acctbal < b.hi
    GROUP BY b.band_id
    """,
    doc="pure range (interval) join against a small band table — broadcast-NL",
)
def join_range_acctbal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [(0, -1000.0, 1000.0), (1, 1000.0, 3000.0), (2, 3000.0, 6000.0), (3, 6000.0, 100000.0)],
        ["band_id", "lo", "hi"],
    )
    return (
        t["supplier"]
        .join(
            broadcast(bands),
            (F.col("s_acctbal") >= F.col("lo")) & (F.col("s_acctbal") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "join_asof_last_event_before_order",
    """
    SELECT o.o_orderkey, o.o_custkey, e.event_type AS last_event_type
    FROM (SELECT o_orderkey, o_custkey, o_custkey % 20 AS uid,
                 TIMESTAMP '2024-01-01' + to_minutes(o_orderkey % 40000) AS ots
          FROM orders) o
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_type
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) e
      ON o.uid = e.user_id AND o.ots >= e.ts
    """,
    doc="as-of join (backward): latest event per key at-or-before a synthetic order time; "
    "union+window formulation scales linearly vs per-row range probes",
)
def join_asof_last_event_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(F.col("o_orderkey"), F.lit(40000)).cast("int"))
        ).alias("ots"),
        F.pmod(F.col("o_custkey"), F.lit(20)).alias("uid"),
    )
    # Dedup ties (same user_id+ts) to make the as-of value deterministic.
    events = (
        t["events"]
        .select("user_id", "ts", "event_type", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    joined = asof_join(
        orders,
        events.withColumnRenamed("user_id", "uid"),
        on="uid",
        left_time="ots",
        right_time="ts",
        direction="backward",
        right_cols=["event_type"],
    )
    return joined.select(
        "o_orderkey", "o_custkey", F.col("event_type").alias("last_event_type")
    )


@register(
    "join_asof_tolerance_event_order",
    """
    SELECT o_orderkey, o_custkey,
           CASE WHEN e.ts IS NOT NULL
                 AND o.ots - e.ts <= INTERVAL 6 HOUR
                THEN e.event_type END AS last_event_type
    FROM (SELECT o_orderkey, o_custkey, o_custkey % 20 AS uid,
                 TIMESTAMP '2024-01-01' + to_minutes(o_orderkey % 40000) AS ots
          FROM orders) o
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_type
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) e
      ON o.uid = e.user_id AND o.ots >= e.ts
    """,
    doc="as-of join with tolerance (pandas merge_asof tolerance= "
    "semantics): a carried backward match further than 6 hours from "
    "the order time is nulled while the left row survives — the "
    "staleness bound every feature-join at training time needs; zero "
    "added shuffle over the plain as-of (the tolerance is a post-"
    "filter on the carried match time), oracle = DuckDB ASOF LEFT "
    "JOIN with the same CASE guard",
)
def join_asof_tolerance_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(F.col("o_orderkey"), F.lit(40000)).cast("int"))
        ).alias("ots"),
        F.pmod(F.col("o_custkey"), F.lit(20)).alias("uid"),
    )
    events = (
        t["events"]
        .select("user_id", "ts", "event_type", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    joined = asof_join(
        orders,
        events.withColumnRenamed("user_id", "uid"),
        on="uid",
        left_time="ots",
        right_time="ts",
        direction="backward",
        tolerance="6 hours",
        right_cols=["event_type"],
    )
    return joined.select(
        "o_orderkey", "o_custkey", F.col("event_type").alias("last_event_type")
    )


# ---------------------------------------------------------------- windows

@register(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
    doc="top-k per group via row_number window (partial TakeOrdered per partition)",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "window_lead_lag_order_gap",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           datediff('day', lag(o_orderdate) OVER w, o_orderdate)  AS days_since_prev,
           datediff('day', o_orderdate, lead(o_orderdate) OVER w) AS days_until_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lead/lag analytic windows",
)
def window_lead_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
        .cast("long")
        .alias("days_until_next"),
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg3
    FROM orders
    """,
    doc="cumulative + sliding ROWS frames (the reference's budget-packing primitive, main.py:355-363)",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
    )


@register(
    "window_ntile_percent_rank",
    """
    SELECT c_custkey,
           ntile(4)        OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 6) AS cume
    FROM customer
    """,
    doc="ntile / percent_rank / cume_dist ranking windows — API-surface demo whose SQL semantics REQUIRE one global ordering; production use partitions these by a tenant/segment key (or grid-decomposes via operators/ordering.py) so no single task sees the corpus",
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_dense_rank_parts",
    """
    SELECT p_brand, p_partkey, p_size,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)            AS drnk
    FROM part
    """,
    doc="rank vs dense_rank — partitioned by p_brand (25-ish values): fine while a brand's parts fit one task, the grid decomposition in operators/ordering.py is the 100 TB form",
)
def window_dense_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank()
        .over(Window.partitionBy("p_brand").orderBy(F.col("p_size").desc(), "p_partkey"))
        .cast("long")
        .alias("rnk"),
        F.dense_rank()
        .over(Window.partitionBy("p_brand").orderBy(F.col("p_size").desc()))
        .cast("long")
        .alias("drnk"),
    )


# -------------------------------------------------------- set ops / dedup

@register(
    "setop_nations_with_both",
    """
    SELECT n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       INTERSECT
       SELECT DISTINCT s_nationkey FROM supplier)
    """,
    doc="INTERSECT set operation",
)
def setop_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    return c.intersect(s)


@register(
    "setop_customer_only_nations",
    """
    SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier
    """,
    doc="EXCEPT set operation",
)
def setop_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    return c.exceptAll(s).distinct()


@register(
    "setop_union_all_keys",
    """
    SELECT n_nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) GROUP BY n_nationkey
    """,
    doc="UNION ALL + agg",
)
def setop_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("n_nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("n_nationkey"))
    return c.unionByName(s).groupBy("n_nationkey").agg(F.count("*").alias("n"))


@register(
    "dedup_first_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders) WHERE rn = 1
    """,
    doc="first-seen-wins dedup (reference: main.py:283-291 normalized-key dedup)",
)
def dedup_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = dedup_first_seen(t["orders"], ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return out.select(
        "o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
    )


# ------------------------------------------------------------- date/scalar

@register(
    "date_functions_orders",
    """
    SELECT year(o_orderdate)  AS yr,
           month(o_orderdate) AS mo,
           strftime(last_day(min(o_orderdate)), '%Y-%m-%d') AS first_month_end,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    """,
    doc="date part extraction + last_day (reference's month bounds, pipeline.py:57-63)",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.date_format(F.last_day(F.min("o_orderdate")), "yyyy-MM-dd").alias(
                "first_month_end"
            ),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "month_sequence_gap_scan",
    """
    WITH months AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1996-12-01', INTERVAL 1 MONTH))::DATE AS m
    )
    SELECT strftime(m, '%Y-%m-%d') AS month_start,
           coalesce(n_orders, 0) AS n_orders
    FROM months LEFT JOIN (
      SELECT date_trunc('month', o_orderdate)::DATE AS m, count(*) AS n_orders
      FROM orders GROUP BY 1
    ) o USING (m)
    """,
    doc="calendar sequence anti/left join — the reference's first-missing-month scan "
    "(fetch_clean.py:35-53) as sequence() + left join",
)
def month_sequence_gap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("m")
    )
    per_month = (
        t["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("m"))
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        months.join(per_month, "m", "left")
        .select(
            F.date_format("m", "yyyy-MM-dd").alias("month_start"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "case_when_price_tiers",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier,
           o_orderstatus,
           count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    doc="CASE WHEN routing (the reference's intent short-circuit pattern, main.py:16-31)",
)
def case_when_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        t["orders"]
        .groupBy(tier.alias("tier"), F.col("o_orderstatus"))
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


@register(
    "window_range_frame_revenue",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             datediff('day', DATE '1970-01-01', o_orderdate) AS day
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
                                         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2)
             AS revenue_30d,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
                               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS orders_30d
    FROM o
    """,
    doc="RANGE frame over epoch-day ordering: per-customer trailing-30-day "
    "revenue and order count — value-based frames (peers at the same day "
    "all see the same window), completing the ROWS/RANGE frame surface of "
    "SURVEY §2.5; epoch-day longs keep Spark and DuckDB frame arithmetic "
    "identical",
)
def window_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_totalprice", day.alias("day"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
            F.count("*").over(w).cast("long").alias("orders_30d"),
        )
    )


@register(
    "join_fuzzy_name_qgram",
    """
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a JOIN n b
      ON a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="edit-distance<=2 fuzzy self-join over distinct part names — the "
    "reference's near-identical entity-name linkage as an Ed-Join-style "
    "q-gram prefix-filtered candidate join + exact JVM levenshtein "
    "verify (operators/fuzzy.py); the oracle is the brute-force "
    "all-pairs join the prefix filter provably equals",
)
def join_fuzzy_name_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.fuzzy import qgram_fuzzy_pairs

    t = load_tables(spark, sf_dir)
    names = t["part"].select("p_name").distinct()
    pairs = qgram_fuzzy_pairs(names, "p_name", "p_name", max_dist=2, q=2)
    return pairs.select(
        F.col("id_a").alias("name_a"),
        F.col("id_b").alias("name_b"),
        F.col("dist").cast("long").alias("dist"),
    )


@register(
    "join_asof_cogrouped",
    """
    SELECT o.o_orderkey, o.o_custkey, e.event_type AS last_event_type
    FROM (SELECT o_orderkey, o_custkey, o_custkey % 20 AS uid,
                 TIMESTAMP '2024-01-01' + to_minutes(o_orderkey % 40000) AS ots
          FROM orders) o
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_type
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) e
      ON o.uid = e.user_id AND o.ots >= e.ts
    """,
    doc="the SAME as-of semantics as join_asof_last_event_before_order, "
    "computed through the cogrouped-pandas seam "
    "(groupBy().cogroup().applyInPandas + per-key merge_asof) — two "
    "formulations, one oracle; the union+window twin remains the "
    "JVM-side hot path",
)
def join_asof_cogrouped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.relational import asof_join_cogrouped

    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(F.col("o_orderkey"), F.lit(40000)).cast("int"))
        ).alias("ots"),
        F.pmod(F.col("o_custkey"), F.lit(20)).alias("uid"),
    )
    events = (
        t["events"]
        .select("user_id", "ts", "event_type", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col("user_id").alias("uid"), "ts", "event_type")
    )
    joined = asof_join_cogrouped(
        orders,
        events,
        on="uid",
        left_time="ots",
        right_time="ts",
        direction="backward",
        right_cols=["event_type"],
    )
    return joined.select(
        "o_orderkey", "o_custkey", F.col("event_type").alias("last_event_type")
    )


@register(
    "agg_incremental_state",
    """
    SELECT event_type, count(*) AS n_rows,
           round(sum(value), 2) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="incremental view maintenance: the state table is built by folding "
    "three disjoint batches (event_id mod 3) through merge_partial_aggs — "
    "batch aggregated alone (cost ∝ batch), merged with prior state by "
    "re-aggregating partials; the oracle is the FULL recompute, so the "
    "green row proves incremental == full (sum/count/min/max are "
    "algebraic; avg derives at read time)",
)
def agg_incremental_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.relational import merge_partial_aggs

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type", "value")
    state = None
    for i in range(3):
        batch = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
        state = merge_partial_aggs(state, batch, ["event_type"], ["value"])
    return state.select(
        "event_type",
        "n_rows",
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


def _zorder_oracle() -> str:
    from knowledge_model_spark.operators.layout import bucket_expr, morton_expr

    bx = bucket_expr(
        "d", "(SELECT dlo FROM b)", "(SELECT dhi FROM b)", 4096, div_op="//"
    )
    by = bucket_expr(
        "k", "(SELECT klo FROM b)", "(SELECT khi FROM b)", 4096, div_op="//"
    )
    z = morton_expr([f"({bx})", f"({by})"], 12)
    return f"""
    WITH base AS (
      SELECT o_orderkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             o_custkey AS k
      FROM orders
    ),
    b AS (SELECT min(d) AS dlo, max(d) AS dhi, min(k) AS klo, max(k) AS khi
          FROM base)
    SELECT o_orderkey, {z} AS zkey FROM base
    """


@register(
    "layout_zorder_keys",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering key over (order date, customer): "
    "exact integer bucket + bit-interleave expressions shared verbatim "
    "with the DuckDB oracle; operators/layout.py::write_zordered uses "
    "this key with repartitionByRange + sortWithinPartitions so parquet "
    "files carry narrow min/max on EVERY interleaved dim (file skipping "
    "for filters on any of them — tests/test_layout.py proves the "
    "pruning against a single-dim-sorted layout)",
)
def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.layout import zorder_key

    t = load_tables(spark, sf_dir)
    base = t["orders"].select(
        "o_orderkey",
        F.expr("unix_date(cast(o_orderdate as date))").alias("d"),
        F.col("o_custkey").alias("k"),
    )
    lo_hi = base.agg(
        F.min("d"), F.max("d"), F.min("k"), F.max("k")
    ).collect()[0]
    if lo_hi[0] is None:
        # empty table: no bounds to bucket against — schema-correct empty
        return base.select(
            "o_orderkey", F.lit(0).cast("long").alias("zkey")
        ).limit(0)
    keyed = zorder_key(
        base,
        ["d", "k"],
        [(lo_hi[0], lo_hi[1]), (lo_hi[2], lo_hi[3])],
        bits=12,
    )
    return keyed.select("o_orderkey", "zkey")


def _zorder_skipping_oracle() -> str:
    from knowledge_model_spark.operators.layout import bucket_expr, morton_expr

    bx = bucket_expr(
        "d", "(SELECT dlo FROM b)", "(SELECT dhi FROM b)", 4096, div_op="//"
    )
    by = bucket_expr(
        "k", "(SELECT klo FROM b)", "(SELECT khi FROM b)", 4096, div_op="//"
    )
    z = morton_expr([f"({bx})", f"({by})"], 12)
    return f"""
    WITH base AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             o_custkey AS k
      FROM orders
    ),
    b AS (SELECT min(d) AS dlo, max(d) AS dhi, min(k) AS klo, max(k) AS khi
          FROM base),
    z AS (SELECT {z} AS zkey, d, k FROM base),
    f AS (
      SELECT zkey // 65536 AS file_id, count(*) AS n_rows,
             min(d) AS d_min, max(d) AS d_max,
             min(k) AS k_min, max(k) AS k_max
      FROM z GROUP BY 1
    ),
    p AS (
      SELECT dlo + ((dhi - dlo) * 9) // 20   AS plo_d,
             dlo + ((dhi - dlo) * 11) // 20  AS phi_d,
             klo + ((khi - klo) * 9) // 20   AS plo_k,
             klo + ((khi - klo) * 11) // 20  AS phi_k
      FROM b
    )
    SELECT file_id, n_rows, d_min, d_max, k_min, k_max,
           (d_max < plo_d OR d_min > phi_d) AS skip_date_band,
           (k_max < plo_k OR k_min > phi_k) AS skip_cust_band,
           (d_max < plo_d OR d_min > phi_d
            OR k_max < plo_k OR k_min > phi_k) AS skip_conjunction
    FROM f, p
    """


@register(
    "layout_zorder_skipping",
    _zorder_skipping_oracle(),
    doc="file-skipping PROOF for the z-order layout as a registered "
    "diagnostic (extends layout_zorder_keys, whose key expressions it "
    "shares verbatim with the oracle): rows are binned into files by "
    "fixed-width z-ranges (zkey div 2^16 — the catalog-free proxy for "
    "write_zordered's repartitionByRange boundaries), each file "
    "carries its per-dimension min/max exactly as parquet footers "
    "would, and three canonical predicates — a 10%-of-range date "
    "band, a 10% customer band, and their conjunction — are evaluated "
    "against those stats ONLY.  A file is skipped when its min/max "
    "interval misses the band; because the z-curve interleaves both "
    "dimensions, BOTH single-dimension bands skip the large majority "
    "of files, which is the property a single-dim sort cannot give "
    "(tests/test_layout.py proves that contrast).  Everything is "
    "exact integer arithmetic on bucket ids, so the whole skipping "
    "decision table is oracle-checkable; at 100 TB the same stats "
    "exist per parquet file and the scan planner applies the "
    "identical interval test.",
)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.layout import zorder_key

    t = load_tables(spark, sf_dir)
    base = t["orders"].select(
        F.expr("unix_date(cast(o_orderdate as date))").alias("d"),
        F.col("o_custkey").alias("k"),
    )
    lo_hi = base.agg(F.min("d"), F.max("d"), F.min("k"), F.max("k")).collect()[0]
    if lo_hi[0] is None:
        return spark.createDataFrame(
            [],
            "file_id long, n_rows long, d_min long, d_max long, "
            "k_min long, k_max long, skip_date_band boolean, "
            "skip_cust_band boolean, skip_conjunction boolean",
        )
    dlo, dhi, klo, khi = (int(v) for v in lo_hi)
    keyed = zorder_key(base, ["d", "k"], [(dlo, dhi), (klo, khi)], bits=12)
    files = keyed.select(
        F.expr("zkey div 65536").alias("file_id"), "d", "k"
    ).groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("d").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )
    plo_d, phi_d = dlo + (dhi - dlo) * 9 // 20, dlo + (dhi - dlo) * 11 // 20
    plo_k, phi_k = klo + (khi - klo) * 9 // 20, klo + (khi - klo) * 11 // 20
    skip_d = (F.col("d_max") < plo_d) | (F.col("d_min") > phi_d)
    skip_k = (F.col("k_max") < plo_k) | (F.col("k_min") > phi_k)
    return files.select(
        "file_id",
        "n_rows",
        "d_min",
        "d_max",
        "k_min",
        "k_max",
        skip_d.alias("skip_date_band"),
        skip_k.alias("skip_cust_band"),
        (skip_d | skip_k).alias("skip_conjunction"),
    )


@register(
    "join_bloom_pruned",
    """
    WITH hot AS (SELECT o_orderkey, o_orderdate
                 FROM orders WHERE o_totalprice > 400000)
    SELECT h.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN hot h ON l.l_orderkey = h.o_orderkey
    GROUP BY h.o_orderkey
    """,
    doc="big-to-big join with Bloom-filter probe pruning "
    "(operators/bloom.py): the selective build side (orders > 400k) is "
    "compacted into a 2^17-bit bitmap via one bit_or aggregation, "
    "shipped to the lineitem scan as an array<long> literal, and the "
    "membership test (pure codegen bit arithmetic) drops non-matching "
    "probe rows BEFORE the join shuffle — no false negatives, so the "
    "result is provably the plain join, which is what the oracle "
    "states; at 100 TB only plausibly-matching fact rows pay the "
    "shuffle",
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.bloom import bloom_pruned_join

    t = load_tables(spark, sf_dir)
    build = t["orders"].filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey"), F.col("o_orderdate")
    )
    probe = t["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    joined = bloom_pruned_join(probe, build, "o_orderkey", num_bits=1 << 17)
    return joined.groupBy("o_orderkey").agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        ).cast("double").alias("revenue"),
    )


@register(
    "agg_corr_regression",
    """
    WITH s AS (
      SELECT n_name,
             count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(28,6)))        AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(28,6)))   AS sy,
             sum(CAST(l_quantity AS DECIMAL(28,6))
                 * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy,
             sum(CAST(l_quantity AS DECIMAL(28,6))
                 * CAST(l_quantity AS DECIMAL(28,6)))      AS sxx,
             sum(CAST(l_extendedprice AS DECIMAL(28,6))
                 * CAST(l_extendedprice AS DECIMAL(28,6))) AS syy
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS corr_qty_price,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_price_per_qty
    FROM s
    """,
    doc="per-nation Pearson correlation and OLS slope of price vs "
    "quantity, computed from EXACT decimal moment sums (Σx Σy Σxy Σx² "
    "Σy² are order-independent decimals; only the final scalar formula "
    "touches floats) — the standard trick that makes statistical "
    "aggregates bit-identical across engines and partitionings, where "
    "the builtin corr()/regr_slope() float accumulators are "
    "summation-order-dependent",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    x = F.col("l_quantity").cast("decimal(28,6)")
    y = F.col("l_extendedprice").cast("decimal(28,6)")
    s = (
        t["lineitem"]
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    nD = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = nD * sxy - sx * sy
    var_x = nD * sxx - sx * sx
    var_y = nD * syy - sy * sy
    return s.select(
        "n_name",
        F.col("n").cast("long").alias("n"),
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(cov_n / var_x, 6).alias("slope_price_per_qty"),
    )


@register(
    "diag_key_skew",
    """
    WITH lc AS (SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
    oc AS (SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY 1)
    SELECT 'lineitem.l_suppkey' AS keyset, count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt,
           round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS top_share_ppm,
           round(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt), 4) AS max_over_avg
    FROM lc
    UNION ALL
    SELECT 'orders.o_custkey', count(*), CAST(sum(cnt) AS BIGINT), max(cnt),
           round(quantile_cont(cnt, 0.5), 4), round(quantile_cont(cnt, 0.99), 4),
           CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT),
           round(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt), 4)
    FROM oc
    """,
    doc="join-key skew audit (n_keys, max/p50/p99 counts, top-key share): "
    "the pre-flight profile that decides between plain shuffle join, AQE "
    "skew splitting, and hot-key salting — two map-side-combined shuffles "
    "per keyset, integer top-share, shared percentile interpolation",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.relational import key_skew_audit

    t = load_tables(spark, sf_dir)
    a = key_skew_audit(t["lineitem"], "l_suppkey", "lineitem.l_suppkey")
    b = key_skew_audit(t["orders"], "o_custkey", "orders.o_custkey")
    return a.unionByName(b)


# ------------------------------------------------ TPC-H classic shapes


@register(
    "q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts — a "
    "LEFT OUTER join (zero-order customers survive as c_count=0) feeding "
    "a second aggregation OVER the first's result. Scale: both aggs are "
    "partial-agg friendly; the second one's input is |customers| rows, "
    "already shrunk 10x from the fact table, and its key space (distinct "
    "counts) is tiny, so the second shuffle is negligible. Reference "
    "semantics: corpus histogram reporting (pipeline.py run summaries).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue_ratio",
    """
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY strftime(l_shipdate, '%Y-%m')
    """,
    doc="TPC-H Q14 shape: promo-revenue share per ship month — a "
    "conditional-sum ratio across a fact-to-dim join. Scale: part is a "
    "dimension, explicitly broadcast, so the fact table never shuffles "
    "for the join; the groupBy key (month) is low-cardinality, so the "
    "agg shuffle moves |months| rows per partition after map-side "
    "combine. The ratio is computed per-group AFTER both sums (never "
    "sum-of-ratios).",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 6).alias("promo_pct")
        )
    )


@register(
    "q18_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice, round(total_qty, 2) AS total_qty
    FROM big JOIN orders   ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey LIMIT 50
    """,
    doc="TPC-H Q18 shape: large-volume orders — a HAVING-filtered "
    "aggregate over the fact table DRIVES the join back to orders and "
    "customer, then a global top-50. Scale: the aggregate shrinks "
    "lineitem to |orders| rows before any join; the HAVING cut shrinks "
    "further (~20% here), and orders⋈lineitem share the orderkey "
    "partitioning so AQE can plan the survivors' join without a second "
    "full-fact shuffle; top-50 is TakeOrderedAndProject (no global sort).",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery → LeftSemi join "
    "(Catalyst rewrites the subquery; no per-row probe), date-range "
    "filter pushed to the orders scan, tiny priority-key agg. The "
    "late-shipment predicate evaluates inside the join condition, so "
    "lineitem prunes to (orderkey, shipdate) columns only.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("date"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter + scalar aggregate — the predicate-"
    "pushdown showcase. All three predicates reach the parquet scan as "
    "PushedFilters (plan-guarded in tests/test_plan_shapes.py), the "
    "scan reads only 4 columns, and the aggregate is a partial/final "
    "pair moving one double per partition.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@register(
    "agg_winsorized_mean",
    """
    WITH geo AS (
      SELECT n_name, c_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    bounds AS (
      SELECT n_name,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM geo GROUP BY n_name
    )
    SELECT g.n_name,
           round(avg(least(greatest(g.c_acctbal, b.lo), b.hi)), 4)
             AS winsorized_mean,
           round(avg(g.c_acctbal), 4) AS raw_mean,
           count(*) AS n_customers
    FROM geo g JOIN bounds b ON g.n_name = b.n_name
    GROUP BY g.n_name
    """,
    doc="winsorized mean (clamp to [p05, p95] before averaging) — the "
    "robust-aggregation answer to heavy-tailed metrics a plain mean "
    "lets a few outliers dominate. Two passes: an exact interpolated-"
    "percentile agg produces a TINY per-group bounds table that "
    "broadcasts back onto the fact scan (no second shuffle of raw "
    "rows); at 100 TB swap the exact percentile for the KLL sketch "
    "bounds (operators/sketches.py) — same plan, mergeable first pass.",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    geo = t["customer"].join(
        broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name", "c_acctbal")
    # one shared percentile buffer for both clamp bounds (the
    # agg_percentiles array-form optimization; same interpolation)
    bounds = geo.groupBy("n_name").agg(
        F.expr("percentile(c_acctbal, array(0.05, 0.95))").alias("__pp")
    ).select(
        "n_name",
        F.element_at("__pp", 1).alias("lo"),
        F.element_at("__pp", 2).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    return (
        geo.join(broadcast(bounds), "n_name")
        .groupBy("n_name")
        .agg(
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "agg_winsorized_mean_kll",
    None,  # sketch-approximate bounds by design — the winsorized mean
    # and the rank of each KLL bound are gated against the exact
    # agg_winsorized_mean in tests/test_sketches.py at sf0.01 AND sf0.1
    doc="the 100 TB path for agg_winsorized_mean made driver-visible: "
    "the [p05, p95] clamp bounds come from ONE map-side-combinable "
    "KLL(2048) aggregate per group (operators/sketches."
    "kll_group_quantiles) instead of exact percentile() whose buffer "
    "holds every group value; the clamp-and-average second pass stays "
    "EXACT (broadcast bounds onto the fact scan, no second raw "
    "shuffle).  The KLL bounds are true stream items with rank within "
    "~1.65/√k of 0.05/0.95, so the winsorization differs only in which "
    "tail sliver gets clamped; bound-gated vs the exact twin",
)
def agg_winsorized_mean_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.sketches import kll_group_quantiles

    t = load_tables(spark, sf_dir)
    geo = t["customer"].join(
        broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name", "c_acctbal")
    bounds = kll_group_quantiles(
        geo, ["n_name"], "c_acctbal", [0.05, 0.95]
    ).select("n_name", F.col("q_5").alias("lo"), F.col("q_95").alias("hi"))
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    return (
        geo.join(broadcast(bounds), "n_name")
        .groupBy("n_name")
        .agg(
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "join_hot_key_salted",
    """
    SELECT e.event_type, n.n_name, count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY e.event_type, n.n_name
    """,
    doc="hot-key-adaptive salted join, oracle-proven IDENTICAL to the "
    "plain join (the whole point: salting redistributes work, never "
    "changes results). Events map to 25 nation keys — a deliberately "
    "coarse key; the operator counts left-side key frequencies, "
    "broadcasts the (tiny) hot set, salts ONLY those keys 8 ways and "
    "replicates matching right rows 8×, while the tail joins untouched "
    "— the production skew shape when AQE's sort-merge skew split "
    "doesn't apply (operators/relational.py::hot_key_salted_join).",
)
def join_hot_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.relational import hot_key_salted_join

    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("join_key", (F.col("user_id") % 25).cast("int"))
    nat = t["nation"].withColumn("join_key", F.col("n_nationkey").cast("int"))
    # hot_threshold low enough that every key salts at this SF — the
    # oracle equality then covers the salted path, not the bypass
    joined = hot_key_salted_join(
        ev, nat.select("join_key", "n_name"), "join_key",
        n_salt=8, hot_threshold=100,
    )
    return joined.groupBy("event_type", "n_name").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(rev.r AS DOUBLE), 2) AS total_rev
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT max(r) FROM rev)
    """,
    doc="TPC-H Q15 shape: per-supplier quarterly revenue view, then the "
    "supplier(s) achieving the maximum — aggregate-then-argmax with a "
    "scalar subquery over the aggregate's own result.  Revenue sums in "
    "EXACT decimal (floats only in the final display cast), so the "
    "argmax comparison can never flip on float fold order; the revenue "
    "view is supplier-count-sized, so the max and the supplier join "
    "both broadcast",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("r")
        )
    )
    mx = rev.agg(F.max("r").alias("mx"))
    top = rev.join(F.broadcast(mx), rev["r"] == mx["mx"]).select("l_suppkey", "r")
    return (
        t["supplier"]
        .join(F.broadcast(top), F.col("s_suppkey") == top["l_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r").cast("double"), 2).alias("total_rev"),
        )
    )


@register(
    "market_basket_rules",
    """
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n_ord AS (SELECT count(DISTINCT ok) AS n FROM basket),
    item AS (SELECT pk, count(*) AS c FROM basket GROUP BY pk),
    pair AS (
      SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
      FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT p1, p2, support,
           round(CAST(support AS DOUBLE) / i1.c, 6) AS confidence,
           round(CAST(support AS DOUBLE) * (SELECT n FROM n_ord)
                 / (CAST(i1.c AS DOUBLE) * i2.c), 6) AS lift
    FROM pair
    JOIN item i1 ON i1.pk = p1
    JOIN item i2 ON i2.pk = p2
    WHERE support >= 3
    """,
    doc="market-basket association rules (support / confidence / lift) "
    "over parts co-occurring in an order — the classic co-purchase "
    "mining shape.  Pair enumeration is a basket self-join on the order "
    "key, so candidate count is bounded by per-basket size squared "
    "(<= 13 items/order here), never by catalog size; item counts and "
    "the order total are exact integers, floats only in the final "
    "confidence/lift ratios; the item-count table is catalog-sized and "
    "broadcasts onto the pair table.  The support>=3 cut is the "
    "standard min-support prune (at 100 TB it also bounds the output); "
    "for ultra-hot items the same max_df stop cut as ngram-Jaccard "
    "applies before the self-join",
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    t = load_tables(spark, sf_dir)
    # r11 (guide §2.3, §3.2): per-order sorted distinct item sets in ONE
    # orderkey exchange.  The old shape paid an (ok, pk) distinct
    # exchange, re-shuffled BOTH self-join sides by ok into a
    # sort-merge join, and shuffled the join output again for the pair
    # groupBy; collect_set performs the same dedup inside the ok
    # aggregation, and pairs explode map-side from the sorted array
    # (bounded by basket size — ≤13 items/order — never catalog size),
    # identical (p1 < p2) pairs by the ascending sort.  The order total
    # rides the checkpoint's materializing job via observe(); item
    # counts re-derive from the checkpointed sets (each (ok, pk) occurs
    # exactly once in the exploded sets, so counts match the old
    # distinct-basket counts row for row).
    obs = Observation()
    baskets = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("pks"))
        .observe(obs, F.count(F.lit(1)).alias("n_ord"))
        .localCheckpoint(eager=True)
    )
    n_ord = int(obs.get["n_ord"])
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(pks, (x, i) -> "
                    "transform(slice(pks, i + 2, size(pks) - i - 1), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )
    item = (
        baskets.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("c"))
    )
    i1 = item.select(F.col("pk").alias("p1"), F.col("c").alias("c1"))
    i2 = item.select(F.col("pk").alias("p2"), F.col("c").alias("c2"))
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .withColumn("n", F.lit(n_ord).cast("long"))
        .select(
            "p1",
            "p2",
            "support",
            F.round(F.col("support").cast("double") / F.col("c1"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("support").cast("double")
                * F.col("n")
                / (F.col("c1").cast("double") * F.col("c2")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "join_asof_forward_next_event",
    """
    SELECT o.o_orderkey, o.o_custkey, e.event_type AS next_event_type
    FROM (SELECT o_orderkey, o_custkey, o_custkey % 20 AS uid,
                 TIMESTAMP '2024-01-01' + to_minutes(o_orderkey % 40000) AS ots
          FROM orders) o
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_type
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) e
      ON o.uid = e.user_id AND o.ots <= e.ts
    """,
    doc="as-of join (FORWARD): earliest event per key at-or-after a "
    "synthetic order time — the direction twin of "
    "join_asof_last_event_before_order (completes merge_asof's "
    "backward/forward surface as registered oracle queries); same "
    "union+window formulation, descending time order, single key "
    "shuffle",
)
def join_asof_forward_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(F.col("o_orderkey"), F.lit(40000)).cast("int"))
        ).alias("ots"),
        F.pmod(F.col("o_custkey"), F.lit(20)).alias("uid"),
    )
    events = (
        t["events"]
        .select("user_id", "ts", "event_type", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col("user_id").alias("uid"), "ts", F.col("event_type").alias("next_event_type"))
    )
    joined = asof_join(
        orders,
        events,
        on="uid",
        left_time="ots",
        right_time="ts",
        direction="forward",
        right_cols=["next_event_type"],
    )
    return joined.select("o_orderkey", "o_custkey", "next_event_type")


@register(
    "q22_global_sales_opportunity",
    """
    WITH pos AS (
      SELECT c_custkey, c_nationkey % 5 AS grp,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
    ),
    thr AS (
      SELECT CAST(sum(bal) AS DOUBLE) / count(*) AS a
      FROM pos WHERE bal > 0
    ),
    cand AS (
      SELECT * FROM pos WHERE CAST(bal AS DOUBLE) > (SELECT a FROM thr)
    )
    SELECT grp, count(*) AS n_cust,
           round(CAST(sum(bal) AS DOUBLE), 2) AS total_bal
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY grp
    """,
    doc="TPC-H Q22 shape: above-average-balance customers (scalar "
    "subquery threshold) with no RECENT orders (NOT EXISTS over a "
    "date-filtered orders scan → left anti join), "
    "grouped — the three-way composition of scalar subquery + anti "
    "join + aggregate.  The threshold derives from an EXACT decimal "
    "sum (float only in the final division), so the > comparison is "
    "fold-order-stable; the 1-row threshold broadcasts; the anti join "
    "needs only orders' customer keys (2-column scan)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pos = (
        t["customer"]
        .filter(F.pmod(F.col("c_nationkey"), F.lit(5)).isin(0, 1, 2))
        .select(
            "c_custkey",
            F.pmod(F.col("c_nationkey"), F.lit(5)).cast("int").alias("grp"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    thr = pos.filter(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count("*")).alias("a")
    )
    cand = pos.crossJoin(F.broadcast(thr)).filter(
        F.col("bal").cast("double") > F.col("a")
    )
    noord = cand.join(
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return noord.groupBy("grp").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("bal").cast("double"), 2).alias("total_bal"),
    )


@register(
    "join_null_safe_counts",
    """
    WITH f AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 10 END AS k
      FROM orders
    ),
    dim AS (
      SELECT DISTINCT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                           ELSE n_nationkey % 10 END AS k,
             'bucket' AS tag
      FROM nation
    )
    SELECT f.k AS k, CAST(count(*) AS BIGINT) AS n
    FROM f JOIN dim ON f.k IS NOT DISTINCT FROM dim.k
    GROUP BY f.k
    """,
    doc="null-safe equi join (Spark eqNullSafe <=> / SQL IS NOT DISTINCT "
    "FROM): NULL keys MATCH each other instead of vanishing — the join "
    "semantics a late-arriving-dimension pipeline needs when 'unknown' "
    "is itself a bucket; still hash-joinable (null-safe equality is an "
    "equi condition, not a theta residual), so the plan stays "
    "broadcast/shuffled-hash, never nested-loop",
)
def join_null_safe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    f = t["orders"].select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 10)
        .alias("k")
    )
    dim = (
        t["nation"]
        .select(
            F.when(F.col("n_nationkey") % 5 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("n_nationkey") % 10)
            .alias("k"),
            F.lit("bucket").alias("tag"),
        )
        .distinct()
    )
    joined = f.join(dim, f["k"].eqNullSafe(dim["k"]))
    return joined.groupBy(f["k"].alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )


@register(
    "window_cume_dist_nth",
    """
    SELECT c_custkey, c_nationkey,
           cume_dist() OVER w AS cd,
           nth_value(c_custkey, 3) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_richest,
           first_value(c_custkey) OVER w AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="cume_dist / nth_value / first_value — completes the window "
    "ranking-function family (row_number, rank, dense_rank, ntile, "
    "percent_rank, lead/lag already registered); nth_value takes the "
    "full-partition frame so every row sees the 3rd-richest customer "
    "of its nation; one nation-key Exchange serves all three functions "
    "(25 nations: fine while a nation's customers fit one task — the "
    "grid decomposition in operators/ordering.py is the 100 TB form)",
)
def window_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        # no rounding: cd = k/n is ONE integer division, bit-identical
        # cross-engine; round() would REINTRODUCE divergence (at n=640,
        # k/640 has exact 7-decimal halves — Spark rounds half-up,
        # DuckDB half-to-even; found by the sf0.1 sweep)
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 3).over(wfull).alias("third_richest"),
        F.first_value("c_custkey").over(w).alias("richest"),
    )


@register(
    "agg_mode_quantity",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus, l_quantity, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus, l_quantity
    )
    SELECT l_returnflag, l_linestatus,
           (min({'nc': -n, 'v': l_quantity})).v AS modal_quantity,
           CAST(-((min({'nc': -n, 'v': l_quantity})).nc) AS BIGINT) AS modal_n
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
    doc="deterministic MODE aggregation (most frequent value per group, "
    "ties broken toward the smallest value via a (−count, value) "
    "struct-min — unlike the built-in mode(), whose tie choice is "
    "unspecified): one (group, value) count aggregate + one "
    "struct-extrema hash agg, both map-side-combinable; the SQL "
    "surface completion for §2.4",
)
def agg_mode_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["lineitem"].groupBy("l_returnflag", "l_linestatus", "l_quantity").agg(
        F.count("*").alias("n")
    )
    key = F.struct((-F.col("n")).alias("nc"), F.col("l_quantity").alias("v"))
    return c.groupBy("l_returnflag", "l_linestatus").agg(
        F.min(key)["v"].alias("modal_quantity"),
        (-F.min(key)["nc"]).cast("long").alias("modal_n"),
    )


@register(
    "join_asof_nearest_event",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_custkey % 20 AS uid,
             TIMESTAMP '2024-01-01' + to_minutes(o_orderkey % 40000) AS ots
      FROM orders
    ),
    e AS (
      SELECT user_id, ts, event_type
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) = 1
    ),
    b AS (
      SELECT o.o_orderkey, e.ts AS bt, e.event_type AS btype
      FROM o ASOF LEFT JOIN e ON o.uid = e.user_id AND o.ots >= e.ts
    ),
    f AS (
      SELECT o.o_orderkey, e.ts AS ft, e.event_type AS ftype
      FROM o ASOF LEFT JOIN e ON o.uid = e.user_id AND o.ots <= e.ts
    )
    SELECT o.o_orderkey, o.o_custkey,
           CASE WHEN b.bt IS NOT NULL AND (f.ft IS NULL OR
                     epoch_us(o.ots) - epoch_us(b.bt)
                     <= epoch_us(f.ft) - epoch_us(o.ots))
                THEN b.btype ELSE f.ftype END AS nearest_event_type,
           CASE WHEN b.bt IS NOT NULL AND (f.ft IS NULL OR
                     epoch_us(o.ots) - epoch_us(b.bt)
                     <= epoch_us(f.ft) - epoch_us(o.ots))
                THEN -(epoch_us(o.ots) - epoch_us(b.bt))
                ELSE CASE WHEN f.ft IS NOT NULL
                          THEN epoch_us(f.ft) - epoch_us(o.ots) END
           END AS asof_dt_us
    FROM o JOIN b USING (o_orderkey) JOIN f USING (o_orderkey)
    """,
    doc="nearest-direction as-of join (pandas merge_asof "
    "direction='nearest'; ties go backward — documented, "
    "partition-invariant): two union+window passes re-joined on the "
    "unique left key — completes the backward/forward/tolerance/"
    "nearest as-of surface; oracle composes DuckDB's >= and <= ASOF "
    "JOINs with the identical exact-microsecond pick",
)
def join_asof_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.relational import asof_join_nearest

    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.pmod(F.col("o_orderkey"), F.lit(40000)).cast("int"))
        ).alias("ots"),
        F.pmod(F.col("o_custkey"), F.lit(20)).alias("uid"),
    )
    events = (
        t["events"]
        .select("user_id", "ts", "event_type", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col("user_id").alias("uid"), "ts", "event_type")
    )
    out = asof_join_nearest(
        orders,
        events,
        on="uid",
        left_time="ots",
        right_time="ts",
        left_id="o_orderkey",
        right_cols=["event_type"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.col("event_type").alias("nearest_event_type"),
        "asof_dt_us",
    )
