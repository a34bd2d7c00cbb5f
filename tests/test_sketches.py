"""Gates for the mergeable-sketch operators, the PageRank iteration, and
SCD2 history collapse.

The registry parity tests (test_oracle_parity.py) prove the exact-regime
oracle equality; these tests gate the APPROXIMATE regime the oracle
can't reach (large-cardinality HLL error, post-compaction KLL rank
error, merge invariants) plus unit semantics for PageRank and SCD2.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from knowledge_model_spark.operators.graph import pagerank
from knowledge_model_spark.operators.relational import scd2_collapse
from knowledge_model_spark.operators.sketches import hll_rollup, kll_quantile_rollup


# ------------------------------------------------------------------ HLL


def test_hll_rollup_exact_regime_and_merge_invariant(spark):
    # 40k rows, 10k distinct ids spread over 20 fine groups / 4 coarse
    df = spark.range(40000).select(
        (F.col("id") % 20).alias("fine"),
        (F.col("id") % 4).alias("coarse"),
        (F.col("id") % 10000).alias("val"),
    )
    rolled = hll_rollup(df, ["coarse", "fine"], ["coarse"], "val").orderBy("coarse")
    exact = (
        df.groupBy("coarse").agg(F.countDistinct("val").alias("exact")).orderBy("coarse")
    )
    est = {r["coarse"]: r["est_distinct"] for r in rolled.collect()}
    ex = {r["coarse"]: r["exact"] for r in exact.collect()}
    for k in ex:
        rel = abs(est[k] - ex[k]) / ex[k]
        assert rel < 0.03, f"coarse={k}: est {est[k]} vs exact {ex[k]} (rel {rel:.3f})"

    # merge invariant: union of fine sketches == sketch built directly on
    # the coarse group (register-wise max is lossless at equal lgK)
    direct = (
        df.groupBy("coarse")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("val", F.lit(12))).alias("d"))
        .collect()
    )
    direct = {r["coarse"]: r["d"] for r in direct}
    assert est == direct


# ------------------------------------------------------------------ KLL


def test_kll_rollup_rank_error_beyond_exact_regime(spark):
    # 50k values per coarse group — far beyond k=2048, so the sketch is
    # compacted; gate the published ~1.65/sqrt(k) rank error (≈0.036)
    df = spark.range(100000).select(
        (F.col("id") % 10).alias("fine"),
        (F.col("id") % 2).alias("coarse"),
        (F.hash(F.col("id")) % 1000000).cast("double").alias("val"),
    )
    out = kll_quantile_rollup(
        df, ["coarse", "fine"], ["coarse"], "val", [0.25, 0.5, 0.75]
    ).collect()
    rows = df.select("coarse", "val").toPandas()
    for r in out:
        vals = np.sort(rows[rows["coarse"] == r["coarse"]]["val"].to_numpy())
        n = len(vals)
        for q, col in ((0.25, "q_25"), (0.5, "q_50"), (0.75, "q_75")):
            got = r[col]
            true_rank = np.searchsorted(vals, got, side="right") / n
            assert abs(true_rank - q) < 0.05, (
                f"coarse={r['coarse']} q={q}: value {got} has rank {true_rank:.3f}"
            )


# ------------------------------------------------------------- PageRank


def _int_pagerank(edges, iterations=3, p=85, q=100, scale=10**12):
    """Pure-Python mirror of the fixed-point integer recurrence."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    teleport = (scale * (q - p)) // (q * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        recv = {v: 0 for v in nodes}
        for a, b in edges:
            recv[b] += rank[a] // out[a]
        rank = {v: teleport + (recv[v] * p) // q for v in nodes}
    return rank


def test_pagerank_matches_reference_on_known_graph(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1), (3, 4), (4, 3)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    rows = pagerank(e, iterations=3).collect()
    got = {r["node"]: r["rank_e12"] for r in rows}
    want = _int_pagerank(edges, iterations=3)
    assert got == want  # exact integer equality, no tolerance
    # no dangling nodes in a symmetric graph → mass conserved up to the
    # deterministic integer-division truncation
    total = sum(r["rank"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-9)


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    sym = edges + [(b, a) for a, b in edges]
    e1 = spark.createDataFrame(sym, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(sym, ["src", "dst"]).repartition(16)
    r1 = sorted(pagerank(e1).collect())
    r2 = sorted(pagerank(e2).collect())
    assert [(r["node"], r["rank"]) for r in r1] == [(r["node"], r["rank"]) for r in r2]


# ----------------------------------------------------------------- SCD2


def test_scd2_collapse_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: A A B A  → 3 versions
        (1, t0, "A", 10),
        (1, t0 + dt.timedelta(hours=1), "A", 11),
        (1, t0 + dt.timedelta(hours=2), "B", 12),
        (1, t0 + dt.timedelta(hours=3), "A", 13),
        # user 2: single event → 1 current version
        (2, t0, "X", 14),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    hist = scd2_collapse(df, "user_id", "ts", "event_type", "event_id")
    got = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in hist.collect()
    }
    assert got[(1, 1)] == ("A", t0, t0 + dt.timedelta(hours=2), 2, False)
    assert got[(1, 2)] == (
        "B",
        t0 + dt.timedelta(hours=2),
        t0 + dt.timedelta(hours=3),
        1,
        False,
    )
    assert got[(1, 3)] == ("A", t0 + dt.timedelta(hours=3), None, 1, True)
    assert got[(2, 1)] == ("X", t0, None, 1, True)
    # effectivity intervals tile the timeline: every non-current
    # valid_to equals the next version's valid_from
    assert len(got) == 4


def test_scd2_same_timestamp_tiebreak_deterministic(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "B", 2), (1, t0, "A", 1), (1, t0 + dt.timedelta(hours=1), "B", 3)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out1 = sorted(
        scd2_collapse(df, "user_id", "ts", "event_type", "event_id").collect()
    )
    out2 = sorted(
        scd2_collapse(
            df.repartition(8), "user_id", "ts", "event_type", "event_id"
        ).collect()
    )
    assert out1 == out2
    # event_id tiebreak: A (id 1) before B (id 2) → versions A, B
    types = [r["event_type"] for r in sorted(out1, key=lambda r: r["version"])]
    assert types == ["A", "B"]


# ------------------------------------------- cogrouped as-of twin / IVM


def test_asof_cogrouped_equals_window_formulation(spark, tables):
    from knowledge_model_spark.operators.relational import (
        asof_join,
        asof_join_cogrouped,
    )

    orders = tables["orders"].select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("ots")
    )
    events = tables["events"].select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").alias("ets"),
        F.col("value").alias("ev_value"),
    )
    a = asof_join(orders, events, "o_custkey", "ots", "ets", right_cols=["ev_value"])
    b = asof_join_cogrouped(
        orders, events, "o_custkey", "ots", "ets", right_cols=["ev_value"]
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_asof_cogrouped_same_time_column_name(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=2), "L")], ["k", "ts", "lv"]
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=1), 42.0), (1, t0 + dt.timedelta(hours=3), 43.0)],
        ["k", "ts", "rv"],
    )
    from knowledge_model_spark.operators.relational import asof_join_cogrouped

    out = asof_join_cogrouped(left, right, "k", "ts", "ts").collect()
    assert len(out) == 1 and out[0]["rv"] == 42.0 and out[0]["ts"] is not None


def test_merge_partial_aggs_incremental_equals_full(spark, tables):
    from knowledge_model_spark.operators.relational import merge_partial_aggs

    ev = tables["events"].select("event_type", "value")
    batches = [ev.filter(F.pmod(F.hash("value"), F.lit(3)) == i) for i in range(3)]
    state = None
    for b in batches:
        state = merge_partial_aggs(state, b, ["event_type"], ["value"])
    full = merge_partial_aggs(None, ev, ["event_type"], ["value"])
    # sums of doubles depend on addition order → compare to a tolerance;
    # counts/min/max must be exact
    s = {r["event_type"]: r for r in state.collect()}
    f = {r["event_type"]: r for r in full.collect()}
    assert set(s) == set(f)
    for k in f:
        assert s[k]["n_rows"] == f[k]["n_rows"]
        assert s[k]["min_value"] == f[k]["min_value"]
        assert s[k]["max_value"] == f[k]["max_value"]
        assert s[k]["sum_value"] == pytest.approx(f[k]["sum_value"], rel=1e-12)
    # derived avg at read time
    avg = state.select(
        "event_type", (F.col("sum_value") / F.col("n_rows")).alias("avg")
    ).collect()
    assert all(r["avg"] is not None for r in avg)


def test_asof_cogrouped_forward_direction(spark):
    import datetime as dt

    from knowledge_model_spark.operators.relational import (
        asof_join,
        asof_join_cogrouped,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(k, t0 + dt.timedelta(hours=h), f"L{k}{h}") for k in (1, 2) for h in (0, 2, 5)],
        ["k", "lts", "lv"],
    )
    right = spark.createDataFrame(
        [(k, t0 + dt.timedelta(hours=h), float(h)) for k in (1, 2) for h in (1, 3, 4)],
        ["k", "rts", "rv"],
    )
    a = sorted(
        map(
            tuple,
            asof_join(
                left, right, "k", "lts", "rts", direction="forward", right_cols=["rv"]
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            asof_join_cogrouped(
                left, right, "k", "lts", "rts", direction="forward", right_cols=["rv"]
            ).collect(),
        )
    )
    assert a == b and len(a) == 6
    # h=5 has no following right row → null fill in both formulations
    assert any(t[-1] is None for t in a)


def test_cdc_apply_latest_semantics(spark):
    from knowledge_model_spark.operators.cdc import cdc_apply_latest

    rows = [
        ("U", 1, 1, "a"), ("U", 1, 3, "c"), ("U", 1, 2, "b"),   # last write wins
        ("U", 2, 1, "x"), ("D", 2, 2, None),                     # deleted
        ("D", 3, 1, None), ("U", 3, 2, "alive"),                 # resurrected
        ("U", 4, 5, "keep"), ("D", 4, 5, None),                  # tie: delete wins
    ]
    log = spark.createDataFrame(rows, ["op", "k", "seq", "val"])
    got = {r["k"]: r["val"] for r in cdc_apply_latest(log, ["k"], "seq").collect()}
    assert got == {1: "c", 3: "alive"}


def test_cdc_snapshot_diff_roundtrip(spark):
    """Applying the diff as a change log over `old` must reproduce `new`."""
    from knowledge_model_spark.operators.cdc import cdc_apply_latest, cdc_snapshot_diff
    import pyspark.sql.functions as F

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)], ["k", "s", "x"]
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", None), (4, "d", 4.0)], ["k", "s", "x"]
    )
    diff = cdc_snapshot_diff(old, new, ["k"])
    ops = {(r["op"], r["k"]) for r in diff.collect()}
    assert ops == {("U", 2), ("D", 3), ("I", 4)}  # unchanged k=1 absent

    log = old.select(F.lit("U").alias("op"), "k", "s", "x").withColumn(
        "seq", F.lit(0)
    ).unionByName(diff.withColumn("seq", F.lit(1)))
    applied = cdc_apply_latest(log, ["k"], "seq")
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


def test_gap_fill_forward_semantics(spark):
    import datetime

    from knowledge_model_spark.operators.relational import gap_fill_forward

    T = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    rows = [
        (1, T(1, 30), 10.0, 1),
        (1, T(1, 45), 11.0, 2),   # same hour, later ts wins
        (1, T(4, 5), 40.0, 3),    # hours 2,3 are gaps -> carry 11.0
        (2, T(2, 0), 7.0, 4),
        (2, T(2, 0), 8.0, 5),     # identical ts: higher event_id wins
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value", "event_id"])
    got = {
        (r["key"], r["bucket_ts"].hour): (r["value"], r["observed"])
        for r in gap_fill_forward(
            ev, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert got == {
        (1, 1): (11.0, True),
        (1, 2): (11.0, False),
        (1, 3): (11.0, False),
        (1, 4): (40.0, True),
        (2, 2): (8.0, True),
    }


def test_gap_fill_interpolate_semantics(spark):
    import datetime

    from knowledge_model_spark.operators.relational import gap_fill_interpolate

    T = lambda h: datetime.datetime(2024, 1, 1, h)
    rows = [(1, T(1), 10.0, 1), (1, T(4), 40.0, 2), (1, T(6), 40.0, 3)]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value", "event_id"])
    got = {
        (r["key"], r["bucket_ts"].hour): (r["value"], r["observed"])
        for r in gap_fill_interpolate(
            ev, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert got == {
        (1, 1): (10.0, True),
        (1, 2): (20.0, False),   # 10 + (40-10)*1/3
        (1, 3): (30.0, False),   # 10 + (40-10)*2/3
        (1, 4): (40.0, True),
        (1, 5): (40.0, False),   # flat segment interpolates flat
        (1, 6): (40.0, True),
    }


# ------------------------------------------- exact bitmap rollup


def test_bitmap_rollup_exact_and_mergeable(spark, tables):
    from pyspark.sql import functions as F

    from knowledge_model_spark.operators.sketches import bitmap_distinct_rollup

    ev = tables["events"].withColumn("day", F.col("ts").cast("date"))
    fine, coarse = bitmap_distinct_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id"
    )
    # exact at both levels vs countDistinct ground truth
    want_fine = {
        (r.event_type, r.day): r.n
        for r in ev.groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got_fine = {(r.event_type, r.day): r.n_distinct for r in fine.collect()}
    assert got_fine == want_fine
    want_coarse = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    got_coarse = {r.event_type: r.n_distinct for r in coarse.collect()}
    assert got_coarse == want_coarse
    # merge invariant is structural (coarse re-ORs fine chunks), and the
    # coarse count is NOT the sum of fine counts (users repeat across days)
    assert sum(want_fine.values()) > sum(want_coarse.values())


def test_attribution_last_touch_semantics(spark):
    import datetime as dt

    from knowledge_model_spark.operators.funnel import attribute_last_touch

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click -> click -> purchase (latest click wins)
        (1, 1, base, "click", 0.0),
        (2, 1, base + dt.timedelta(hours=1), "click", 0.0),
        (3, 1, base + dt.timedelta(hours=2), "purchase", 9.5),
        # user 2: click 30h before purchase -> outside the 24h window
        (4, 2, base, "click", 0.0),
        (5, 2, base + dt.timedelta(hours=30), "purchase", 3.0),
        # user 3: purchase with no click at all
        (6, 3, base, "purchase", 1.0),
        # user 4: click at the EXACT purchase instant is attributable
        (7, 4, base, "click", 0.0),
        (8, 4, base, "purchase", 2.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    for n_parts in (1, 5):
        out = {
            r.conv_id: r
            for r in attribute_last_touch(
                df.repartition(n_parts), "user_id", "ts", "event_type", "event_id",
                conv_type="purchase", touch_type="click",
            ).collect()
        }
        assert out[3].touch_id == 2
        assert out[5].touch_id is None and out[5].lag_us is None
        assert out[6].touch_id is None
        assert out[8].touch_id == 7 and out[8].lag_us == 0


def test_cms_overestimates_and_bounds_error(spark):
    """CMS guarantees est >= true for EVERY key, and the min-over-depth
    estimate is within the eN/width bound for all probes here."""
    from knowledge_model_spark.operators.sketches import cms_build, cms_estimate
    import pyspark.sql.functions as F

    # skewed key distribution: key k appears k times, keys 1..60
    rows = [(k,) for k in range(1, 61) for _ in range(k)]
    df = spark.createDataFrame(rows, ["key"]).repartition(7)
    n_total = len(rows)
    width, depth = 128, 4

    cms = cms_build(df, "key", depth=depth, width=width)
    truth = df.groupBy("key").agg(F.count("*").alias("true_n"))
    est = cms_estimate(cms, truth.select("key"), "key", depth=depth, width=width)
    joined = {r.key: (r.true_n, r.est_n) for r in truth.join(est, "key").collect()}

    assert len(joined) == 60
    import math

    bound = math.e * n_total / width
    for key, (true_n, est_n) in joined.items():
        assert est_n >= true_n, f"key {key}: CMS underestimated"
        assert est_n - true_n <= bound, f"key {key}: over by {est_n - true_n}"


def test_cms_merge_is_sketch_of_union(spark):
    """Cell-wise sum of two part-sketches == the sketch of the union —
    the mergeable-monoid contract that lets 100 TB builds proceed
    per-partition/per-month and combine."""
    from knowledge_model_spark.operators.sketches import cms_build
    import pyspark.sql.functions as F

    a = spark.createDataFrame([(k % 17,) for k in range(200)], ["key"])
    b = spark.createDataFrame([(k % 13,) for k in range(150)], ["key"])
    merged = (
        cms_build(a, "key").unionByName(cms_build(b, "key"))
        .groupBy("depth", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = cms_build(a.unionByName(b), "key")
    m = {(r.depth, r.bucket): r.n for r in merged.collect()}
    d = {(r.depth, r.bucket): r.n for r in direct.collect()}
    assert m == d


def test_asof_join_tolerance_nulls_distant_matches(spark):
    """pandas merge_asof tolerance semantics: a carried match further
    than the tolerance is NO match (nulls), without changing which row
    would otherwise carry."""
    import datetime as dt

    from knowledge_model_spark.operators.relational import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, ts(0)), (1, ts(100)), (2, ts(50))], ["k", "lt"]
    )
    right = spark.createDataFrame(
        [(1, ts(-5), "a"), (1, ts(40), "b")], ["k", "rt", "val"]
    )
    no_tol = {
        (r.k, r.lt): r.val
        for r in asof_join(left, right, "k", "lt", "rt").collect()
    }
    assert no_tol == {(1, ts(0)): "a", (1, ts(100)): "b", (2, ts(50)): None}

    tol = {
        (r.k, r.lt): r.val
        for r in asof_join(
            left, right, "k", "lt", "rt", tolerance="30 minutes"
        ).collect()
    }
    # (1, t+100) carried "b" at t+40 — 60 min away → nulled by tolerance
    assert tol == {(1, ts(0)): "a", (1, ts(100)): None, (2, ts(50)): None}

    fwd = {
        (r.k, r.lt): r.val
        for r in asof_join(
            left, right, "k", "lt", "rt",
            direction="forward", tolerance="30 minutes",
        ).collect()
    }
    # forward: t0 → rt t+40 is 40 min ahead → nulled; t+100 has nothing ahead
    assert fwd == {(1, ts(0)): None, (1, ts(100)): None, (2, ts(50)): None}


def test_hll_intersection_error_beyond_exact_regime(spark):
    """agg_hll_set_intersection leaves HLL's sparse-exact regime on big
    inputs (its oracle row holds at the driver's sf0.01). Gate the
    approximate regime: inclusion-exclusion amplifies per-sketch error
    by ~(|A|+|B|+|A∪B|)/|A∩B|, so bound the intersection estimate
    relative to that amplification, not the raw 1.6% HLL error."""
    from knowledge_model_spark.plans import load_registry

    q = load_registry()["agg_hll_set_intersection"].fn
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.1/events.parquet')"
    )
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            load_registry()["agg_hll_set_intersection"].oracle
        ).fetchall()
    }
    con.close()
    got = {r.week: r for r in q(spark, "/root/testdata/sf0.1").collect()}
    assert set(got) == set(exact)
    for wk, (n_a, n_b, inter) in exact.items():
        r = got[wk]
        union = n_a + n_b - inter
        amp = (n_a + n_b + union) / max(inter, 1)
        # per-sketch rel error ~1.6% at lgK=12; allow 3x headroom
        tol = 0.016 * 3 * amp
        rel = abs(r.est_intersection - inter) / max(inter, 1)
        assert rel <= tol, f"{wk}: est {r.est_intersection} vs {inter} (rel {rel:.3f} > {tol:.3f})"
        # the marginals themselves stay within plain HLL error
        assert abs(r.n_click - n_a) / n_a < 0.05
        assert abs(r.n_purchase - n_b) / n_b < 0.05


def test_asof_nearest_tie_goes_backward(spark):
    from knowledge_model_spark.operators.relational import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00")], "lid long, k long, lt string"
    ).select("lid", "k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", "before"),   # 5 min back
            (1, "2024-01-01 00:15:00", "after"),    # 5 min forward (tie)
            (1, "2024-01-01 00:30:00", "far"),
        ],
        "k long, rt string, tag string",
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
    out = asof_join_nearest(
        left, right, on="k", left_time="lt", right_time="rt",
        left_id="lid", right_cols=["tag"],
    ).collect()[0]
    assert out["tag"] == "before" and out["asof_dt_us"] == -300_000_000


def test_asof_nearest_prefers_closer_forward(spark):
    from knowledge_model_spark.operators.relational import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00"), (2, 2, "2024-01-01 00:10:00")],
        "lid long, k long, lt string",
    ).select("lid", "k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "b"),   # 10 min back
            (1, "2024-01-01 00:12:00", "f"),   # 2 min forward -> wins
            (2, "2024-01-01 00:20:00", "only_fwd"),
        ],
        "k long, rt string, tag string",
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
    out = {
        r["lid"]: (r["tag"], r["asof_dt_us"])
        for r in asof_join_nearest(
            left, right, on="k", left_time="lt", right_time="rt",
            left_id="lid", right_cols=["tag"],
        ).collect()
    }
    assert out[1] == ("f", 120_000_000)
    assert out[2] == ("only_fwd", 600_000_000)  # backward absent -> forward


def test_asof_nearest_validate_unique_rejects_duplicate_left_id(spark):
    """r3 ADVICE: a duplicated left_id silently cross-products backward
    × forward candidates; validate_unique=True must refuse it."""
    import pytest as _pytest

    from knowledge_model_spark.operators.relational import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00"), (1, 1, "2024-01-01 00:20:00")],
        "lid long, k long, lt string",
    ).select("lid", "k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", "x")], "k long, rt string, tag string"
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "tag")
    with _pytest.raises(ValueError, match="not unique"):
        asof_join_nearest(
            left, right, on="k", left_time="lt", right_time="rt",
            left_id="lid", right_cols=["tag"], validate_unique=True,
        )
    # unique key passes the guard and still returns the match
    ok = asof_join_nearest(
        left.limit(1), right, on="k", left_time="lt", right_time="rt",
        left_id="lid", right_cols=["tag"], validate_unique=True,
    ).collect()
    assert ok[0]["tag"] == "x"


def test_ks_d_kll_within_rank_error_bound_vs_exact(spark):
    """The KLL-backed KS variant (the 100 TB path: one scan, no
    value-level window) must land within its published error bound of
    the exact registered query at BOTH sf0.01 and sf0.1."""
    from knowledge_model_spark.operators.sketches import ks_d_kll
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.session import load_tables

    R = load_registry()
    k, n_probe = 2048, 256
    bound = 2 * 1.65 / k**0.5 + 2 / n_probe
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact = R["stats_ks_test"].fn(spark, sf).collect()[0]
        pooled = load_tables(spark, sf)["events"].filter(
            F.col("event_type").isin("click", "view")
        )
        approx = ks_d_kll(
            pooled, F.col("event_type") == "click", "value", k=k, n_probe=n_probe
        ).collect()[0]
        assert approx["n_a"] == exact["n_a"]
        assert approx["n_b"] == exact["n_b"]
        assert 0.0 <= approx["d_stat"] <= 1.0
        assert abs(approx["d_stat"] - exact["d_stat"]) <= bound, (
            sf, approx["d_stat"], exact["d_stat"], bound,
        )


def test_funnel_latency_kll_within_rank_error_bound_vs_exact(spark):
    """The KLL funnel-latency twin (the 100 TB path: one bounded-state
    aggregate, no exact-percentile buffer holding every lag) must give
    p50/p90 whose TRUE rank among the exact lags is within the
    published rank-error bound, at BOTH sf0.01 and sf0.1."""
    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    eps = 1.65 / 2048**0.5  # published KLL(k=2048) rank error
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact_rows = {
            r["step_pair"]: r for r in R["events_funnel_latency"].fn(spark, sf).collect()
        }
        kll_rows = {
            r["step_pair"]: r
            for r in R["events_funnel_latency_kll"].fn(spark, sf).collect()
        }
        assert set(kll_rows) == {"view->click", "click->purchase"}
        # rebuild the raw lags once to rank-check the sketch answers
        from knowledge_model_spark.operators.funnel import funnel_times
        from knowledge_model_spark.session import load_tables
        import pyspark.sql.functions as F

        times = funnel_times(
            load_tables(spark, sf)["events"], "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within="2 DAY",
        ).localCheckpoint()
        lags = {
            "view->click": np.sort(
                times.filter(F.col("t2").isNotNull())
                .select((F.unix_micros("t2") - F.unix_micros("t1")).alias("l"))
                .toPandas()["l"].to_numpy()
            ),
            "click->purchase": np.sort(
                times.filter(F.col("t3").isNotNull())
                .select((F.unix_micros("t3") - F.unix_micros("t2")).alias("l"))
                .toPandas()["l"].to_numpy()
            ),
        }
        for pair, kr in kll_rows.items():
            vals = lags[pair]
            n = len(vals)
            assert kr["n_users"] == exact_rows[pair]["n_users"] == n
            for q, col in ((0.5, "p50_us"), (0.9, "p90_us")):
                # KLL returns a true stream item; its rank must be close
                rank = np.searchsorted(vals, kr[col], side="right") / n
                lo_rank = np.searchsorted(vals, kr[col], side="left") / n
                # with ties, any rank in [left, right] is the item's rank
                err = min(abs(rank - q), abs(lo_rank - q))
                assert err <= eps + 1.0 / n, (sf, pair, col, kr[col], rank, q)


def test_winsorized_mean_kll_within_rank_error_bound_vs_exact(spark):
    """The KLL winsorized-mean twin must (a) produce clamp bounds whose
    true rank is within the published KLL error of 0.05/0.95 per group
    (checked on the kll_group_quantiles helper, which also pins the
    q_95 column naming — int(0.95*100) would floor to 94), and (b)
    agree with the exact twin's winsorized mean to the accuracy those
    bounds imply, at BOTH sf0.01 and sf0.1."""
    from knowledge_model_spark.operators.sketches import kll_group_quantiles
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.session import load_tables

    R = load_registry()
    eps = 1.65 / 2048**0.5
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact = {r["n_name"]: r for r in R["agg_winsorized_mean"].fn(spark, sf).collect()}
        kll = {r["n_name"]: r for r in R["agg_winsorized_mean_kll"].fn(spark, sf).collect()}
        assert set(exact) == set(kll)
        t = load_tables(spark, sf)
        geo_df = (
            t["customer"]
            .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
            .select("n_name", "c_acctbal")
        )
        geo = geo_df.toPandas()
        qb = {
            r["n_name"]: r
            for r in kll_group_quantiles(
                geo_df, ["n_name"], "c_acctbal", [0.05, 0.95]
            ).collect()
        }
        for name, kr in kll.items():
            ex = exact[name]
            assert kr["n_customers"] == ex["n_customers"]
            assert kr["raw_mean"] == ex["raw_mean"]  # untouched by sketching
            vals = np.sort(geo[geo["n_name"] == name]["c_acctbal"].to_numpy(float))
            n = len(vals)
            # (a) bound ranks from the helper (fresh sketch, same contract)
            for q, col in ((0.05, "q_5"), (0.95, "q_95")):
                rank = np.searchsorted(vals, qb[name][col], side="right") / n
                assert abs(rank - q) <= eps + 1.0 / n, (sf, name, col, rank)
            # (b) a mis-ranked bound shifts the mean by at most the clamp
            # mass it moves: (eps+1/n) of rows moved by <= value range
            tol = (eps + 1.0 / n) * (vals[-1] - vals[0]) * 2 + 1e-9
            assert abs(kr["winsorized_mean"] - ex["winsorized_mean"]) <= tol, (
                sf, name, kr["winsorized_mean"], ex["winsorized_mean"], tol,
            )


def test_agg_percentiles_kll_within_rank_error_bound_vs_exact(spark):
    """The KLL twin of agg_percentiles (the last exact-percentile plan
    without a sketch twin, r5 verdict item 3): each returned quantile's
    TRUE rank among the exact column values must be within the
    published KLL(2048) rank error of its target, the exact avg_disc
    must match the exact twin bit-for-bit, and the group keys must
    agree — at BOTH sf0.01 and sf0.1."""
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.session import load_tables

    R = load_registry()
    eps = 1.65 / 2048**0.5
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact = {r["l_returnflag"]: r for r in R["agg_percentiles"].fn(spark, sf).collect()}
        kll = {r["l_returnflag"]: r for r in R["agg_percentiles_kll"].fn(spark, sf).collect()}
        assert set(exact) == set(kll)
        li = (
            load_tables(spark, sf)["lineitem"]
            .select("l_returnflag", "l_quantity", "l_extendedprice")
            .toPandas()
        )
        for flag, kr in kll.items():
            assert kr["avg_disc"] == exact[flag]["avg_disc"]  # exact lane untouched
            grp = li[li["l_returnflag"] == flag]
            assert kr["n"] == len(grp)
            for col, q, name in (
                ("l_quantity", 0.5, "med_qty"),
                ("l_extendedprice", 0.25, "p25_price"),
                ("l_extendedprice", 0.9, "p90_price"),
            ):
                vals = np.sort(grp[col].to_numpy(float))
                n = len(vals)
                rank = np.searchsorted(vals, kr[name], side="right") / n
                lo_rank = np.searchsorted(vals, kr[name], side="left") / n
                err = min(abs(rank - q), abs(lo_rank - q))
                assert err <= eps + 1.0 / n, (sf, flag, name, kr[name], rank, q)


def test_mwu_p_kll_within_rank_error_bound_vs_exact(spark):
    """The KLL-backed Mann-Whitney effect size (the 100 TB path: one
    scan, no value-level rank window) must land within its published
    error bound of the exact registered query's U/(n_a*n_b) at BOTH
    sf0.01 and sf0.1.  (The z statistics are NOT compared: z scales the
    P error by n_a*n_b/sigma, and the exact query additionally
    tie-corrects — the P scale is the gate, per the operator docstring.)"""
    from knowledge_model_spark.operators.sketches import mwu_p_kll
    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.session import load_tables

    R = load_registry()
    k, n_probe = 2048, 256
    bound = 2 * 1.65 / k**0.5 + 1 / n_probe
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact = R["stats_mannwhitney_u"].fn(spark, sf).collect()[0]
        p_exact = exact["u_stat"] / (exact["n_x"] * exact["n_y"])
        pooled = load_tables(spark, sf)["events"].filter(
            F.col("event_type").isin("click", "view")
        )
        approx = mwu_p_kll(
            pooled, F.col("event_type") == "click", "value", k=k, n_probe=n_probe
        ).collect()[0]
        assert 0.0 <= approx["p_a_gt_b"] <= 1.0
        assert abs(approx["p_a_gt_b"] - p_exact) <= bound, (
            sf, approx["p_a_gt_b"], p_exact, bound,
        )


def test_ppl_buckets_kll_twin_rank_error_gate(spark):
    """quality_ppl_buckets_kll (r8): per-(lang,bucket) counts may differ
    from the exact ntile twin only within the KLL rank-error
    neighborhood — gate at max(2, 2% of the language total) at two SFs,
    and the bucket sets must agree exactly."""
    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            (r["lang"], r["bucket"]): r["n_docs"]
            for r in R["quality_ppl_buckets"].fn(spark, sf).collect()
        }
        approx = {
            (r["lang"], r["bucket"]): r["n_docs"]
            for r in R["quality_ppl_buckets_kll"].fn(spark, sf).collect()
        }
        assert set(exact) == set(approx), sf
        lang_total: dict[str, int] = {}
        for (lang, _), n in exact.items():
            lang_total[lang] = lang_total.get(lang, 0) + n
        for key, n in exact.items():
            tol = max(2, int(0.02 * lang_total[key[0]]))
            assert abs(n - approx[key]) <= tol, (sf, key, n, approx[key])


def test_rfm_scores_kll_twin_rank_error_gate(spark):
    """events_rfm_scores_kll (r9): the scale twin's threshold buckets may
    differ from the exact global-ntile twin only by (a) the KLL rank
    error (2·1.65/√2048 of n per boundary) and (b) tie runs — ntile
    forces equal bucket sizes splitting tied values arbitrarily, while
    value thresholds keep ties together.  Gate per-score bucket counts
    with that combined tolerance at BOTH sf0.01 and sf0.1, and require
    every user's twin score within ±1 quintile of exact unless the
    user's value ties with the boundary neighborhood."""
    import math as _math

    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    eps = 1.65 / _math.sqrt(2048)
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact_rows = R["events_rfm_scores"].fn(spark, sf).collect()
        twin_rows = R["events_rfm_scores_kll"].fn(spark, sf).collect()
        assert len(exact_rows) == len(twin_rows), sf
        n = len(exact_rows)
        exact = {r["user_id"]: r for r in exact_rows}
        twin = {r["user_id"]: r for r in twin_rows}
        assert set(exact) == set(twin), sf
        for metric, score in (
            ("recency_days", "r_score"),
            ("frequency", "f_score"),
            ("monetary_micros", "m_score"),
        ):
            # raw metrics must agree exactly — same per-event rollup
            for uid in exact:
                assert exact[uid][metric] == twin[uid][metric], (
                    sf, metric, uid,
                )
            # largest tie run in this metric (ntile splits it, the
            # threshold twin keeps it whole)
            freq: dict = {}
            for r in exact_rows:
                freq[r[metric]] = freq.get(r[metric], 0) + 1
            tie_run = max(freq.values())
            tol = max(3, _math.ceil(2 * eps * n) + tie_run)
            for q in range(1, 6):
                n_exact = sum(1 for r in exact_rows if r[score] == q)
                n_twin = sum(1 for r in twin_rows if r[score] == q)
                assert abs(n_exact - n_twin) <= tol, (
                    sf, score, q, n_exact, n_twin, tol,
                )
            # per-user scores land in 1..5 and deviate ≤1 quintile
            # except inside a boundary tie run
            big_dev = sum(
                1
                for uid in exact
                if abs(exact[uid][score] - twin[uid][score]) > 1
            )
            assert all(1 <= r[score] <= 5 for r in twin_rows), (sf, score)
            assert big_dev <= max(1, tie_run), (sf, score, big_dev)
        # segment string is consistent with the three scores
        for r in twin_rows:
            assert r["rfm_segment"] == (
                f"{r['r_score']}{r['f_score']}{r['m_score']}"
            )


def test_theta_sketch_setops_error_gate_and_determinism(spark):
    """agg_theta_sketch_setops: at sf0.01 the sides exceed k=1000, so
    the ESTIMATE regime is live — every estimate must land inside its
    own [lb, ub] band around exact truth, and the whole table must be
    bit-identical under a different input partitioning (the KMV sketch
    is order-free: the bottom-k of a set does not depend on scan
    order)."""
    import duckdb

    from knowledge_model_spark.plans import load_registry

    sf_dir = "/root/testdata/sf0.01"
    R = load_registry()
    rows = {
        r["op"]: r
        for r in R["agg_theta_sketch_setops"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "click", "purchase", "union", "intersection",
        "click_minus_purchase", "purchase_minus_click",
    }
    # estimate regime is actually live at this SF
    assert rows["click"]["theta"] < 1.0
    exact = dict(
        duckdb.sql(
            f"""
        WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d
                   FROM '{sf_dir}/events.parquet' WHERE event_type = 'click'),
             b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d
                   FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase')
        SELECT 'click', (SELECT count(*) FROM a) UNION ALL
        SELECT 'purchase', (SELECT count(*) FROM b) UNION ALL
        SELECT 'union', (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) UNION ALL
        SELECT 'intersection', (SELECT count(*) FROM a JOIN b USING (user_id, d)) UNION ALL
        SELECT 'click_minus_purchase', (SELECT count(*) FROM a ANTI JOIN b USING (user_id, d)) UNION ALL
        SELECT 'purchase_minus_click', (SELECT count(*) FROM b ANTI JOIN a USING (user_id, d))
        """
        ).fetchall()
    )
    for op, r in rows.items():
        assert r["lb"] <= r["est"] <= r["ub"]
        # truth inside the +/- 2/sqrt(k-1) band (2 std devs, and the
        # fixed md5 hash makes this a deterministic, not flaky, check)
        assert r["lb"] <= exact[op] <= r["ub"], (op, exact[op], r)
    # identity consistency: union = a + b - intersection on RETAINED
    # counts (they share one theta)
    assert (
        rows["union"]["n_retained"]
        == rows["click"]["n_retained"] + rows["purchase"]["n_retained"]
        - rows["intersection"]["n_retained"]
    )
    assert (
        rows["click_minus_purchase"]["n_retained"]
        == rows["click"]["n_retained"] - rows["intersection"]["n_retained"]
    )

    # partitioning determinism: re-run with a different shuffle
    # parallelism — the distinct and the bottom-k window repartition
    # differently, and the sketch must come out bit-identical
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            r["op"]: r
            for r in R["agg_theta_sketch_setops"].fn(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
