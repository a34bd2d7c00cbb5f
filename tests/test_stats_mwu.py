"""Mann-Whitney U: hand-computed fixtures through the registered oracle.

The Spark and DuckDB sides of `stats_mannwhitney_u` share the same
formula by construction, so oracle parity alone can't catch a formula
error.  These fixtures pin U and z against hand-derived values
(cross-checked with the standard normal-approximation definition,
tie-corrected), by pointing the registered oracle SQL at tiny tables.
"""

from __future__ import annotations

import duckdb
import pytest

from knowledge_model_spark.plans import load_registry


@pytest.fixture(scope="module")
def mwu_sql() -> str:
    return load_registry()["stats_mannwhitney_u"].oracle


def _run(sql: str, rows: list[tuple[str, float]]):
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    return con.sql(sql).fetchone()


def test_no_ties_hand_computed(mwu_sql):
    # x(click) = [1,2], y(purchase) = [3,4]: ranks 1..4, R_x = 3,
    # U = 3 - 2*3/2 = 0; sigma = sqrt(4*5/12) = 1.290994; z = -1.549193
    rows = [("click", 1.0), ("click", 2.0), ("purchase", 3.0), ("purchase", 4.0)]
    n_x, n_y, u, z = _run(mwu_sql, rows)
    assert (n_x, n_y) == (2, 2)
    assert u == 0.0
    assert abs(z - (-1.549193)) < 1e-6


def test_tie_correction_hand_computed(mwu_sql):
    # x = [1,2,2], y = [2,3]: the three 2s share avg rank 3, so
    # R_x = 1 + 3 + 3 = 7, U = 7 - 3*4/2 = 1; ties term = 3^3-3 = 24;
    # sigma^2 = (6/12)*(6 - 24/20) = 2.4 -> sigma = 1.549193;
    # z = (1 - 3)/1.549193 = -1.290994
    rows = [
        ("click", 1.0),
        ("click", 2.0),
        ("click", 2.0),
        ("purchase", 2.0),
        ("purchase", 3.0),
    ]
    n_x, n_y, u, z = _run(mwu_sql, rows)
    assert (n_x, n_y) == (3, 2)
    assert u == 1.0
    assert abs(z - (-1.290994)) < 1e-6


def test_other_event_types_excluded(mwu_sql):
    rows = [
        ("click", 1.0),
        ("purchase", 2.0),
        ("view", 100.0),
        ("error", -5.0),
    ]
    n_x, n_y, u, _z = _run(mwu_sql, rows)
    assert (n_x, n_y) == (1, 1)
    assert u == 0.0


def test_bh_fdr_hand_computed(spark):
    # Classic BH example: sorted p = [.005, .01, .03, .04], n = 4 ->
    # raw n·p/i = [.02, .02, .04, .04]; reverse cummin leaves
    # q = [.02, .02, .04, .04].
    from knowledge_model_spark.plans.quality_queries import bh_adjust

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        "seg string, p_value double",
    )
    out = {r["seg"]: (r["rnk"], r["q_value"]) for r in
           bh_adjust(df, "seg", "p_value").collect()}
    assert out == {"d": (1, 0.02), "a": (2, 0.02), "c": (3, 0.04), "b": (4, 0.04)}


def test_bh_fdr_cap_at_one(spark):
    from knowledge_model_spark.plans.quality_queries import bh_adjust

    df = spark.createDataFrame(
        [("a", 0.9), ("b", 0.99)], "seg string, p_value double"
    )
    out = {r["seg"]: r["q_value"] for r in bh_adjust(df, "seg", "p_value").collect()}
    # raw n·p/i: a = 1.8 (capped to 1), b = 0.99; step-up takes
    # q_a = min(raw_a, q_b) = 0.99, and nothing exceeds 1
    assert out == {"a": 0.99, "b": 0.99}


def test_ks_hand_computed():
    # x = [1,2], y = [3,4]: ECDFs never overlap mid-range; at value 2,
    # F_a = 1.0, F_b = 0.0 -> D = 1.0 (max separation)
    import duckdb

    sql = load_registry()["stats_ks_test"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [("click", 1.0), ("click", 2.0), ("view", 3.0), ("view", 4.0)],
    )
    n_a, n_b, d, rej = con.sql(sql).fetchone()
    assert (n_a, n_b, d) == (2, 2, 1.0)
    # D=1 with n=2+2: crit = 1.358*sqrt(4/4) = 1.358 -> not rejected
    assert rej == False  # noqa: E712


def test_ks_interleaved_small_d():
    import duckdb

    sql = load_registry()["stats_ks_test"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    rows = []
    for i in range(50):
        rows += [("click", float(i)), ("view", float(i) + 0.5)]
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    n_a, n_b, d, rej = con.sql(sql).fetchone()
    # shifted-interleave ECDFs stay within 1/50 of each other
    assert (n_a, n_b) == (50, 50)
    assert abs(d - 0.02) < 1e-9 and rej == False  # noqa: E712
