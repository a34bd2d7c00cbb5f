"""Funnel semantics and URL normalization unit fixtures."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_funnel_ordered_and_budgeted(spark):
    from knowledge_model_spark.operators.funnel import funnel_counts, funnel_times

    rows = [
        # u1 completes in order: view@1, click@2, buy@3
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "buy"),
        # u2: click BEFORE view — click@1 < view@2, then a valid click@4, no buy
        (2, _ts(1), "click"), (2, _ts(2), "view"), (2, _ts(4), "click"),
        # u3: view only
        (3, _ts(5), "view"),
        # u4: buy before click — must NOT count step 3
        (4, _ts(1), "view"), (4, _ts(3), "buy"), (4, _ts(4), "click"),
        # u5: completes but buy is outside the 6-hour budget from view
        (5, _ts(1), "view"), (5, _ts(2), "click"), (5, _ts(9), "buy"),
        # u6: never views — not in the funnel at all
        (6, _ts(1), "click"), (6, _ts(2), "buy"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    times = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_times(
            ev, "user_id", "ts", "event_type", ["view", "click", "buy"],
            within="6 HOUR",
        ).collect()
    }
    assert set(times) == {1, 2, 3, 4, 5}  # u6 excluded
    assert times[1] == (_ts(1), _ts(2), _ts(3))
    assert times[2] == (_ts(2), _ts(4), None)  # pre-view click ignored
    assert times[3] == (_ts(5), None, None)
    assert times[4][2] is None  # buy before click doesn't count
    assert times[5] == (_ts(1), _ts(2), None)  # buy outside budget

    counts = {
        r["step"]: (r["event_type"], r["n_users"], r["frac_of_first"])
        for r in funnel_counts(
            ev, "user_id", "ts", "event_type", ["view", "click", "buy"],
            within="6 HOUR",
        ).collect()
    }
    assert counts[1] == ("view", 5, 1.0)
    assert counts[2] == ("click", 4, 0.8)  # u1, u2, u4, u5
    assert counts[3] == ("buy", 1, 0.2)


def test_funnel_no_budget(spark):
    from knowledge_model_spark.operators.funnel import funnel_times

    rows = [(1, _ts(1), "a"), (1, _ts(20), "b")]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    r = funnel_times(ev, "user_id", "ts", "event_type", ["a", "b"]).first()
    assert r["t2"] == _ts(20)  # unbounded when within=None


def test_url_battery(spark):
    from knowledge_model_spark.functions.url import (
        url_host,
        url_normalize,
        url_registered_domain,
    )

    cases = [
        ("HTTP://WWW.Example.COM:80", "http://example.com/", "www.example.com", "example.com"),
        ("https://a.b.Example.org:443/x?utm_source=f&q=1#frag",
         "https://a.b.example.org/x?q=1", "a.b.example.org", "example.org"),
        ("https://example.com:8443/x", "https://example.com:8443/x",
         "example.com", "example.com"),  # non-default port kept
        ("http://user:pw@host.net/p", "http://user:pw@host.net/p", "host.net", "host.net"),
        ("https://x.io/?gclid=abc", "https://x.io/", "x.io", "x.io"),
        ("https://x.io/a?p=1&utm_medium=m&q=2", "https://x.io/a?p=1&q=2", "x.io", "x.io"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], ["url"])
    got = df.select(
        "url",
        url_normalize(F.col("url")).alias("n"),
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    by_url = {r["url"]: r for r in got}
    for u, n, h, d in cases:
        r = by_url[u]
        assert r["n"] == n, f"{u}: norm {r['n']} != {n}"
        assert r["h"] == h, f"{u}: host {r['h']} != {h}"
        assert r["d"] == d, f"{u}: domain {r['d']} != {d}"
