"""Mergeable-sketch rollup queries (DataSketches HLL / KLL builtins).

Why these are oracle-checkable even though they are "approximate":
DataSketches HLL stays in exact coupon/sparse mode below its promotion
threshold (~thousands of distincts at lgK=12), and KLL(k) retains every
item until ~k of them arrive — so at the driver's oracle scale (sf0.01:
~300 customers per region) the HLL estimate IS the exact distinct count
and the KLL quantile IS the exact order statistic DuckDB's
``quantile_disc`` returns.  The approximate regime (larger n) is gated
in tests/test_sketches.py by relative error and by the merge invariant
(union-of-parts == direct sketch).  Determinism in exact mode is
order-independent, so collect_list/merge ordering cannot change values.

The scale story (operators/sketches.py): sketch once per fine group
map-side, re-aggregate any coarser level from the sketch bytes — never
re-shuffle raw values per rollup level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_model_spark.operators.sketches import hll_rollup, kll_quantile_rollup
from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables


def _cust_geo(t) -> DataFrame:
    cust, nat, reg = t["customer"], t["nation"], t["region"]
    return (
        cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .select("r_name", "n_name", "c_custkey", "c_acctbal")
    )


@register(
    "agg_hll_region_rollup",
    """
    SELECT r_name, count(DISTINCT n_name) AS n_fine_groups,
           count(DISTINCT c_custkey) AS est_distinct
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="distinct-customer rollup via HLL sketches: one sketch per nation "
    "(map-side partials), lossless register-max union to region level, "
    "estimate — exact in sparse mode at oracle scale, ~1.6%/sqrt(2^lgK) "
    "beyond; merge invariant + error gated in tests/test_sketches.py",
)
def agg_hll_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return hll_rollup(
        _cust_geo(t),
        fine_keys=["r_name", "n_name"],
        coarse_keys=["r_name"],
        value_col="c_custkey",
    )


@register(
    "agg_kll_quantile_merge",
    """
    SELECT r_name,
           quantile_disc(c_acctbal, 0.25) AS q_25,
           quantile_disc(c_acctbal, 0.5)  AS q_50,
           quantile_disc(c_acctbal, 0.75) AS q_75
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="account-balance quantiles via KLL(2048) sketches: one sketch per "
    "nation, binary-merge fold to region, order-statistic answers — "
    "exact while n < k (the oracle regime), published ~1.65/sqrt(k) rank "
    "error beyond, gated in tests/test_sketches.py",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return kll_quantile_rollup(
        _cust_geo(t),
        fine_keys=["r_name", "n_name"],
        coarse_keys=["r_name"],
        value_col="c_acctbal",
        quantiles=[0.25, 0.5, 0.75],
    )


@register(
    "agg_heavy_hitter_terms",
    """
    WITH toks AS (
      SELECT unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               w -> len(w) > 1)) AS term
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT term AS item, count(*) AS cnt
    FROM toks, tot
    GROUP BY term, tot.n
    HAVING count(*) >= ceil(tot.n / 512.0)
    """,
    doc="exact heavy-hitter tokens (freq ≥ 1/512 of all token "
    "occurrences) via per-partition Misra–Gries summaries + exact "
    "verification of the bounded candidate set "
    "(operators/frequency.py::heavy_hitters) — the full-vocabulary "
    "groupBy shuffle a 100 TB corpus cannot afford is replaced by "
    "map-side k-entry summaries and a candidate-only count; the MG "
    "superset guarantee makes the result exactly the naive answer, "
    "which is what the oracle states",
)
def agg_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.frequency import heavy_hitters

    t = load_tables(spark, sf_dir)
    toks = t["documents_spread"].select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: F.length(w) >= 2,
            )
        ).alias("term")
    )
    return heavy_hitters(toks, "term", threshold_frac=1.0 / 512)


@register(
    "agg_bitmap_distinct_rollup",
    """
    WITH fine AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             count(DISTINCT user_id) AS n_distinct
      FROM events GROUP BY 1, 2
    ),
    coarse AS (
      SELECT event_type, count(DISTINCT user_id) AS n_distinct
      FROM events GROUP BY 1
    )
    SELECT event_type, CAST(epoch(day) AS BIGINT) AS day_epoch, n_distinct,
           'fine' AS level
    FROM fine
    UNION ALL
    SELECT event_type, CAST(-1 AS BIGINT), n_distinct, 'coarse' FROM coarse
    """,
    doc="EXACT distinct-user rollup via 64-bit bitmap chunks (bit_or of "
    "1<<id%64 per id div 64): the coarse level re-ORs the fine CHUNK "
    "table — rows ∝ distinct-ids/64 — never re-shuffling raw events; "
    "exact where HLL approximates, sized by id range not event count",
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.sketches import bitmap_distinct_rollup

    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("day", F.col("ts").cast("date"))
    fine, coarse = bitmap_distinct_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id"
    )
    return fine.select(
        "event_type",
        F.unix_timestamp(F.col("day").cast("timestamp")).alias("day_epoch"),
        "n_distinct",
        F.lit("fine").alias("level"),
    ).unionByName(
        coarse.select(
            "event_type",
            F.lit(-1).cast("long").alias("day_epoch"),
            "n_distinct",
            F.lit("coarse").alias("level"),
        )
    )


@register(
    "agg_cms_frequency",
    """
    WITH rows AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
    cells AS (
      SELECT d.depth,
             CAST(('0x' || substring(md5(CAST(d.depth AS VARCHAR) || ':' || k),
                                     1, 4)) AS INTEGER) % 512 AS bucket,
             count(*) AS n
      FROM rows CROSS JOIN (SELECT unnest(range(4)) AS depth) d
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT CAST(o_custkey AS VARCHAR) AS k, o_custkey, count(*) AS true_n
      FROM orders GROUP BY 1, 2
      ORDER BY true_n DESC, o_custkey LIMIT 20
    ),
    probe AS (
      SELECT t.o_custkey, t.true_n, d.depth,
             CAST(('0x' || substring(md5(CAST(d.depth AS VARCHAR) || ':' || t.k),
                                     1, 4)) AS INTEGER) % 512 AS bucket
      FROM truth t CROSS JOIN (SELECT unnest(range(4)) AS depth) d
    )
    SELECT p.o_custkey, CAST(max(p.true_n) AS BIGINT) AS true_n,
           CAST(min(c.n) AS BIGINT) AS est_n
    FROM probe p JOIN cells c ON p.depth = c.depth AND p.bucket = c.bucket
    GROUP BY p.o_custkey
    """,
    doc="count-min sketch point-frequency estimates for the 20 hottest "
    "order keys, vs exact truth (Cormode & Muthukrishnan 2005). The "
    "sketch is a fixed 4x512 counter table built by ONE map-side-"
    "combined shuffle — at 100 TB the exact per-key count table is "
    "itself fact-sized, while the CMS broadcasts to any probe join; "
    "est >= true always, over by <= eN/512 w.h.p. Buckets are md5-"
    "derived so the oracle computes the identical cells; the min-over-"
    "depth estimate is engine-identical integer arithmetic.",
)
def agg_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.sketches import cms_build, cms_estimate

    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    cms = cms_build(orders, "o_custkey", depth=4, width=512)
    truth = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("o_custkey"))
        .limit(20)
    )
    est = cms_estimate(cms, truth.select("o_custkey"), "o_custkey", depth=4, width=512)
    return truth.join(est, "o_custkey").select(
        "o_custkey", "true_n", F.col("est_n").cast("long").alias("est_n")
    )


@register(
    "agg_hll_set_intersection",
    """
    WITH a AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             count(DISTINCT user_id) AS n_click
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             count(DISTINCT user_id) AS n_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    u AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             count(DISTINCT user_id) AS n_union
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
    )
    SELECT a.week, a.n_click, b.n_purchase,
           a.n_click + b.n_purchase - u.n_union AS est_intersection
    FROM a JOIN b ON a.week = b.week JOIN u ON a.week = u.week
    """,
    doc="set-intersection cardinality WITHOUT joining the raw key sets: "
    "|A∩B| = |A| + |B| - |A∪B| by inclusion-exclusion over HLL "
    "sketches (lossless register-max union). At 100 TB, 'how many "
    "users did both X and Y' as an exact distinct needs a key-level "
    "join/shuffle of both fact slices; the sketch path builds one "
    "sketch per (week, side) map-side and combines BYTES. Exact in "
    "sparse mode at oracle scale (~150 users/week << 2^12 registers); "
    "the approximate regime rides the HLL error gates in "
    "tests/test_sketches.py.",
)
def agg_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn(
        "week", F.date_trunc("week", F.col("ts")).cast("date")
    )
    lg_k = 12

    def side(evt: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == evt)
            .groupBy("week")
            .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias(f"__sk_{out}"))
        )

    a, b = side("click", "a"), side("purchase", "b")
    joined = a.join(b, "week")
    n_a = F.hll_sketch_estimate("__sk_a")
    n_b = F.hll_sketch_estimate("__sk_b")
    n_union = F.hll_sketch_estimate(F.hll_union("__sk_a", "__sk_b"))
    return joined.select(
        "week",
        n_a.alias("n_click"),
        n_b.alias("n_purchase"),
        (n_a + n_b - n_union).alias("est_intersection"),
    )


@register(
    "events_rolling_7d_distinct",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT d.day, count(DISTINCT e.user_id) AS n_users_7d
    FROM days d JOIN events e
      ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    doc="EXACT trailing-7-day distinct users per day — the classic "
    "'distincts don't window-sum' problem. The naive form re-scans 7 "
    "days of raw events per output day (the oracle states it); the "
    "engine instead builds ONE daily 64-bit bitmap-chunk table (rows ∝ "
    "distinct-users/64 per day), fans each day's chunks out to the ≤7 "
    "windows it feeds (explode of a 7-int array — no raw-event "
    "re-shuffle), re-ORs per (target_day, chunk) and popcounts: exact "
    "answers with work ∝ chunk rows × 7, the Druid/ClickHouse rolling-"
    "bitmap shape.",
)
def events_rolling_7d_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        F.col("ts").cast("date").alias("day"),
        F.expr("user_id div 64").alias("chunk"),
        F.expr("shiftleft(1L, CAST(pmod(user_id, 64) AS INT))").alias("bit"),
    )
    daily = ev.groupBy("day", "chunk").agg(F.expr("bit_or(bit)").alias("bits"))
    days = daily.select(F.col("day").alias("target_day")).distinct()
    contrib = daily.select(
        "bits",
        "chunk",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select(
        F.date_add("day", F.col("off")).alias("target_day"), "chunk", "bits"
    )
    rolled = (
        contrib.join(F.broadcast(days), "target_day")
        .groupBy("target_day", "chunk")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .groupBy("target_day")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias("n_users_7d"))
    )
    return rolled.select(F.col("target_day").alias("day"), "n_users_7d")
