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


_KMV_K = 1000  # <= spark.sql.optimizer.windowGroupLimitThreshold (1000):
# one more and the bottom-k window loses its map-side WindowGroupLimit prune
_KMV_ONE = 1 << 60  # theta in hash units: md5-15-hex keys are uniform in [0, 2^60)
_KMV_OPS = [
    ("click", "n_a"),
    ("purchase", "n_b"),
    ("union", "n_union"),
    ("intersection", "n_inter"),
    ("click_minus_purchase", "n_ab"),
    ("purchase_minus_click", "n_ba"),
]


def _kmv_oracle() -> str:
    k, one = _KMV_K, _KMV_ONE
    ops = "\n      UNION ALL\n".join(
        f"      SELECT '{op}' AS op, {col} AS n_retained FROM c"
        for op, col in _KMV_OPS
    )
    return f"""
    WITH pts AS (
      SELECT DISTINCT event_type AS side,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    keep AS (
      SELECT side, h, rn FROM (
        SELECT side, h,
               row_number() OVER (PARTITION BY side ORDER BY h) AS rn
        FROM pts) WHERE rn <= {k}
    ),
    st AS (
      SELECT side,
             CASE WHEN count(*) = {k}
                  THEN max(CASE WHEN rn = {k} THEN h END)
                  ELSE {one} END AS theta
      FROM keep GROUP BY side
    ),
    th AS (SELECT min(theta) AS theta FROM st),
    below AS (SELECT side, h FROM keep, th WHERE h < th.theta),
    flags AS (
      SELECT h,
             max(CASE WHEN side = 'click' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN side = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM below GROUP BY h
    ),
    c AS (
      SELECT sum(in_a) AS n_a, sum(in_b) AS n_b, count(*) AS n_union,
             sum(in_a * in_b) AS n_inter,
             sum(in_a * (1 - in_b)) AS n_ab,
             sum((1 - in_a) * in_b) AS n_ba
      FROM flags
    ),
    ops AS (
{ops}
    ),
    est0 AS (
      SELECT o.op, CAST(o.n_retained AS BIGINT) AS n_retained,
             CAST(t.theta AS DOUBLE) / {one}.0 AS theta,
             CAST(o.n_retained AS DOUBLE)
               / (CAST(t.theta AS DOUBLE) / {one}.0) AS est,
             CASE WHEN t.theta = {one} THEN 0.0
                  ELSE 2.0 / sqrt({k} - 1.0) END AS rel
      FROM ops o, th t
    )
    SELECT op, n_retained, theta, est,
           est * (1.0 - rel) AS lb, est * (1.0 + rel) AS ub
    FROM est0
    """


@register(
    "agg_theta_sketch_setops",
    _kmv_oracle(),
    doc="theta-sketch (bottom-k / KMV) set-operation cardinalities over "
    "the click vs purchase (user, day) activity sets: union, "
    "intersection, and BOTH differences with error bounds — the set "
    "algebra HLL cannot do (hll can union; inclusion-exclusion gives "
    "intersection but never A\\\\B; agg_hll_set_intersection is the "
    "sibling).  Hashes are md5-derived int64s so the DuckDB oracle "
    "computes the IDENTICAL sketch — the estimate regime itself is "
    "oracle-exact (k=1000 < |sides| at sf0.01), not just the sparse "
    "mode.  Scale shape: one distinct shuffle over (side, key), then "
    "a per-side bottom-k window whose WindowGroupLimit prunes to k "
    "rows per map task BEFORE the shuffle (the KMV merge property, "
    "mechanically); every set operation happens on the <= 2k retained "
    "hashes under the global theta = min(theta_a, theta_b).  At "
    "100 TB the sketch tables are KB-sized regardless of corpus; "
    "rel error 2/sqrt(k-1) ~ 6.3%, lb/ub columns carry it.  Exact "
    "mode (theta = 1) collapses bounds to the exact count.  "
    "tests/test_sketches.py gates the estimate against exact truth "
    "and repartition determinism.",
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    k, one = _KMV_K, _KMV_ONE
    t = load_tables(spark, sf_dir)
    key = F.concat_ws(
        ":",
        F.col("user_id").cast("string"),
        F.expr("unix_date(CAST(ts AS DATE))").cast("string"),
    )
    pts = (
        t["events"]
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("event_type").alias("side"),
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    keep = (
        pts.withColumn(
            "rn", F.row_number().over(W.partitionBy("side").orderBy("h"))
        )
        .filter(F.col("rn") <= k)
        .localCheckpoint(eager=False)
    )
    st = keep.groupBy("side").agg(
        F.count("*").alias("n"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    th = st.select(
        F.when(F.col("n") == k, F.col("kth"))
        .otherwise(F.lit(one))
        .alias("theta")
    ).agg(F.min("theta").alias("theta"))
    below = keep.crossJoin(F.broadcast(th)).filter(F.col("h") < F.col("theta"))
    flags = below.groupBy("h").agg(
        F.max((F.col("side") == "click").cast("int")).alias("in_a"),
        F.max((F.col("side") == "purchase").cast("int")).alias("in_b"),
    )
    c = flags.agg(
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
        F.count("*").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("n_ab"),
        F.sum((1 - F.col("in_a")) * F.col("in_b")).alias("n_ba"),
    )
    stack = ", ".join(f"'{op}', {col}" for op, col in _KMV_OPS)
    rows = c.crossJoin(F.broadcast(th)).select(
        F.expr(f"stack({len(_KMV_OPS)}, {stack}) AS (op, n_retained)"),
        "theta",
    )
    theta_frac = F.col("theta").cast("double") / float(one)
    est = F.col("n_retained").cast("double") / theta_frac
    rel = F.when(F.col("theta") == one, F.lit(0.0)).otherwise(
        F.lit(2.0) / F.sqrt(F.lit(float(k) - 1.0))
    )
    return rows.select(
        "op",
        F.col("n_retained").cast("long").alias("n_retained"),
        theta_frac.alias("theta"),
        est.alias("est"),
        (est * (1.0 - rel)).alias("lb"),
        (est * (1.0 + rel)).alias("ub"),
    )
