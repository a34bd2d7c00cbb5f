"""Property-based tests (hypothesis) for operator invariants.

SURVEY §5 calls for property testing alongside the oracle gate: these
pin semantics the fixed fixtures can't sweep — arbitrary geometries for
the chunker, arbitrary time series for the as-of join (checked against
pandas.merge_asof as an independent reference), packing invariants, and
partitioning-invariance of the deterministic sketches.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knowledge_model_spark.functions.chunking import split_passages
from knowledge_model_spark.operators.relational import asof_join, greedy_budget_pack

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    n=st.integers(min_value=0, max_value=900),
    size=st.integers(min_value=2, max_value=400),
    overlap=st.integers(min_value=0, max_value=100),
)
@settings(**_SETTINGS)
def test_split_passages_geometry_properties(spark, n, size, overlap):
    if overlap >= size:
        return  # contract: overlap < size (raise tested elsewhere)
    text = "".join(chr(97 + (i % 26)) for i in range(n))
    arr = (
        spark.range(1)
        .select(split_passages(F.lit(text), size, overlap).alias("p"))
        .first()["p"]
    )
    step = size - overlap
    if n == 0:
        assert arr == []
        return
    # full coverage: concatenating each window's fresh suffix rebuilds the text
    rebuilt = arr[0] + "".join(p[overlap:] for p in arr[1:])
    assert rebuilt == text
    # every window obeys the geometry
    for i, p in enumerate(arr):
        assert p == text[i * step : i * step + size]


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    rights=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights):
    """Backward as-of join ≡ pandas.merge_asof on a single key."""
    rights = sorted(set(rights))
    ldf = spark.createDataFrame([(1, t, i) for i, t in enumerate(lefts)], ["k", "lt", "lid"])
    rdf = spark.createDataFrame([(1, t, t * 10) for t in rights], ["k", "rt", "rv"])
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt").collect()
    }
    lpd = pd.DataFrame({"k": 1, "lt": lefts, "lid": range(len(lefts))}).sort_values("lt")
    rpd = pd.DataFrame({"k": 1, "rt": rights, "rv": [t * 10 for t in rights]})
    want_df = pd.merge_asof(lpd, rpd, left_on="lt", right_on="rt", by="k")
    want = {
        int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
        for r in want_df.itertuples()
    }
    assert got == want


@given(
    costs=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
    budget=st.integers(min_value=1, max_value=120),
)
@settings(**_SETTINGS)
def test_greedy_budget_pack_is_maximal_prefix(spark, costs, budget):
    """Kept rows = the longest rank-order prefix whose cost sum fits the
    budget (the reference's pack_context contract, main.py:355-363)."""
    rows = [(1, -i, c) for i, c in enumerate(costs)]  # score desc == input order
    df = spark.createDataFrame(rows, ["g", "score", "cost"])
    kept = greedy_budget_pack(df, ["g"], order_col="score", cost_col="cost", budget=budget)
    got = sorted(-r["score"] for r in kept.collect())
    run, want = 0, []
    for i, c in enumerate(costs):
        run += c
        if run > budget:
            break
        want.append(i)
    assert got == want


@given(parts=st.sampled_from([1, 3, 8, 17]))
@settings(**_SETTINGS)
def test_minhash_sketch_invariant_to_partitioning(spark, tables, parts):
    """Sketches must not depend on physical partitioning — the property
    that makes results reproducible across cluster sizes."""
    from knowledge_model_spark.operators.dedup import minhash_signatures

    docs = tables["documents"].limit(40).repartition(parts)
    sigs = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    base = getattr(test_minhash_sketch_invariant_to_partitioning, "_base", None)
    if base is None:
        test_minhash_sketch_invariant_to_partitioning._base = sigs
    else:
        assert sigs == base


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4),
        min_size=1,
        max_size=200,
    ),
    st.sampled_from([0.05, 0.1, 0.3]),
)
@settings(**_SETTINGS)
def test_heavy_hitters_equals_naive_on_random_data(spark, items, frac):
    import math

    from knowledge_model_spark.operators.frequency import heavy_hitters

    df = spark.createDataFrame([(x,) for x in items], ["v"]).repartition(5)
    min_cnt = math.ceil(len(items) * frac)
    naive = {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_cnt)
        .collect()
    }
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "v", frac).collect()}
    assert got == naive


@given(
    st.lists(
        st.from_regex(
            r"https?://[A-Za-z][A-Za-z0-9.]{0,12}(:\d{1,4})?(/[a-z0-9/]{0,8})?"
            r"(\?(utm_x=1|q=2)(&(utm_y=3|p=4))?)?(#[a-z]{0,4})?",
            fullmatch=True,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_url_normalize_is_idempotent(spark, urls):
    from knowledge_model_spark.functions.url import url_normalize

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(url_normalize(F.col("url")).alias("n"))
    twice = once.select(url_normalize(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),          # user
            st.integers(min_value=0, max_value=96),         # hour offset
            st.sampled_from(["view", "click", "buy", "other"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_funnel_step_times_are_ordered_and_counts_monotone(spark, evs):
    import datetime

    from knowledge_model_spark.operators.funnel import funnel_counts, funnel_times

    base = datetime.datetime(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(hours=h), t) for u, h, t in evs]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "buy"]
    times = funnel_times(ev, "user_id", "ts", "event_type", steps).collect()
    for r in times:
        ts = [r[f"t{i}"] for i in range(1, 4)]
        # a reached step implies all earlier steps reached, in time order
        for i in range(1, 3):
            if ts[i] is not None:
                assert ts[i - 1] is not None and ts[i] >= ts[i - 1]
    counts = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, "user_id", "ts", "event_type", steps).collect()
    }
    if counts:
        assert counts[1] >= counts[2] >= counts[3]


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=10,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=10,
             unique=True),
    st.data(),
)
@settings(**_SETTINGS)
def test_cdc_diff_apply_roundtrip(spark, old_keys, new_keys, data):
    """apply(old, diff(old, new)) == new for arbitrary keyed snapshots
    with arbitrary (possibly NULL) payloads."""
    from knowledge_model_spark.operators.cdc import cdc_apply_latest, cdc_snapshot_diff

    payload = st.one_of(st.none(), st.text(alphabet="xyz", max_size=2))
    old_rows = [(k, data.draw(payload)) for k in old_keys]
    new_rows = [(k, data.draw(payload)) for k in new_keys]
    schema = "k long, val string"
    old = spark.createDataFrame(old_rows, schema) if old_rows else spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows else spark.createDataFrame([], schema)
    diff = cdc_snapshot_diff(old, new, ["k"])
    log = old.selectExpr("'U' AS op", "k", "val", "0 AS seq").unionByName(
        diff.selectExpr("op", "k", "val", "1 AS seq")
    )
    applied = cdc_apply_latest(log, ["k"], "seq")
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


def test_content_defined_chunks_edit_resilience(spark):
    """The CDC selling point: prepending an edit re-chunks only the edit
    neighborhood — every chunk fingerprint beyond the first resync
    boundary survives (fixed windows would shift and invalidate ALL of
    them), and boundaries depend only on local k-gram context."""
    from knowledge_model_spark.functions.chunking import content_defined_chunks

    base = (
        "the quick brown fox jumps over the lazy dog while rain falls "
        "softly on the rooftops and distant thunder echoes through the "
        "valley below where the river bends around old stone bridges "
    ) * 30
    edited = "INSERTED NEW LEADING SENTENCE ABOUT OTHER THINGS. " + base

    df = spark.createDataFrame([(0, base), (1, edited)], ["doc_id", "text"])
    out = content_defined_chunks(df, "text", ["doc_id"], k=8, divisor=256)
    rows = out.collect()
    fps = {d: [] for d in (0, 1)}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_index)):
        fps[r.doc_id].append(r.chunk_fp)
    assert len(fps[0]) > 5, "fixture should produce several chunks"
    # all base chunks except the (possibly merged/split) first one
    # reappear verbatim in the edited doc
    surviving = set(fps[0][1:]) & set(fps[1])
    assert surviving == set(fps[0][1:])

    # fixed-window control: every window shifts, nothing survives
    from knowledge_model_spark.functions.chunking import explode_passages

    fixed = explode_passages(df, "text", ["doc_id"], size=256, overlap=0)
    fx = {d: set() for d in (0, 1)}
    for r in fixed.collect():
        fx[r.doc_id].add(r.chunk_text)
    assert len(fx[0] & fx[1]) <= 1  # at most an accidental tail match


def test_content_defined_chunks_cover_text_exactly(spark):
    """Chunks partition each document: offsets are contiguous from 0 to
    len(text), lengths positive, and empty docs emit nothing."""
    from knowledge_model_spark.functions.chunking import content_defined_chunks
    import pyspark.sql.functions as F

    rows = [(0, "x" * 1000), (1, ""), (2, "short"), (3, "abc " * 500)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = content_defined_chunks(df, "text", ["doc_id"]).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_index)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc
    for doc_id, chunks in by_doc.items():
        expect_len = len(rows[doc_id][1])
        pos = 0
        for c in chunks:
            assert c.char_start == pos and c.chunk_len > 0
            pos += c.chunk_len
        assert pos == expect_len


def test_poisson_bootstrap_ci_brackets_point_and_tightens(spark):
    """The bootstrap CI must bracket the point estimate, and its width
    must shrink roughly as 1/sqrt(n) when the corpus grows."""
    from knowledge_model_spark.plans import load_registry

    q = load_registry()["stats_bootstrap_ci"].fn
    small = q(spark, "/root/testdata/sf0.001").collect()[0]
    assert small.ci_lo <= small.point_est <= small.ci_hi
    assert small.n_replicates == 64
    width_small = small.ci_hi - small.ci_lo
    assert 0 < width_small < small.point_est  # sane scale
    big = q(spark, "/root/testdata/sf0.1").collect()[0]
    width_big = big.ci_hi - big.ci_lo
    # 10x the docs → ~3.2x tighter; allow slack for bootstrap noise
    assert width_big < width_small / 1.5


# ---- session-4 operators: graph + phrase search vs pure-Python refs ----

_GRAPH_SETTINGS = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def _py_bfs(edges: list[tuple[int, int]], sources: list[int]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in sources}
    frontier = list(dict.fromkeys(sources))
    d = 0
    while frontier:
        d += 1
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        frontier = nxt
    return dist


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    ),
    k=st.integers(1, 3),
)
@settings(**_GRAPH_SETTINGS)
def test_kcore_matches_python_reference(spark, edges, k):
    from knowledge_model_spark.operators.graph import kcore

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["node"]: r["core_degree"] for r in kcore(df, k=k).collect()}
    assert got == _py_kcore(edges, k)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    ),
    sources=st.lists(st.integers(0, 12), min_size=1, max_size=3),
)
@settings(**_GRAPH_SETTINGS)
def test_bfs_matches_python_reference(spark, edges, sources):
    from knowledge_model_spark.operators.graph import bfs_hops

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    src = spark.createDataFrame([(int(s),) for s in sources], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, src).collect()}
    # reference counts only nodes present in the edge list or sources
    assert got == _py_bfs(edges, sources)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    )
)
@settings(**_GRAPH_SETTINGS)
def test_phrase_search_matches_python_scan(spark, docs):
    from knowledge_model_spark.operators.text_rank import phrase_search

    phrase = ["aa", "bb"]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "doc_id", "text", "aa bb").collect()
    }
    expect = {}
    for i, toks in enumerate(docs):
        hits = [p for p in range(len(toks) - 1) if toks[p : p + 2] == phrase]
        if hits:
            expect[i] = (len(hits), hits[0])
    assert got == expect


def _py_stupid_backoff(lm_docs, score_docs, alpha=0.4):
    import math

    def toks(t):
        import re
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if len(w) >= 2]

    uni, bi = {}, {}
    for _, t in lm_docs:
        ws = toks(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    out = {}
    for i, t in score_docs:
        ws = toks(t)
        contribs = []
        for a, b in zip(ws, ws[1:]):
            if a not in uni or b not in uni:
                continue  # OOV positions excluded
            if (a, b) in bi:
                contribs.append(math.log(bi[(a, b)] / uni[a]))
            else:
                contribs.append(math.log(alpha) + math.log(uni[b] / n))
        if contribs:
            out[i] = (len(contribs), round(sum(contribs) / len(contribs), 6))
    return out


@given(
    lm=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=2, max_size=6),
        min_size=1,
        max_size=5,
    ),
    score=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "zz"]), min_size=0, max_size=6),
        min_size=1,
        max_size=4,
    ),
)
@settings(**_GRAPH_SETTINGS)
def test_stupid_backoff_matches_python_reference(spark, lm, score):
    from knowledge_model_spark.operators.ngram_lm import stupid_backoff_scores

    lm_rows = [(i, " ".join(ws)) for i, ws in enumerate(lm)]
    sc_rows = [(100 + i, " ".join(ws)) for i, ws in enumerate(score)]
    lm_df = spark.createDataFrame(lm_rows, "doc_id long, text string")
    sc_df = spark.createDataFrame(sc_rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["sb_logscore"])
        for r in stupid_backoff_scores(sc_df, "doc_id", "text", lm_df=lm_df).collect()
    }
    expect = _py_stupid_backoff(lm_rows, sc_rows)
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 2e-6


@given(
    turns=st.lists(
        st.tuples(
            st.integers(0, 3),                          # conversation
            st.text(alphabet="ab c", min_size=0, max_size=12),  # user
            st.text(alphabet="xy z", min_size=0, max_size=12),  # assistant
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_GRAPH_SETTINGS)
def test_chat_render_spans_always_slice_to_assistant(spark, turns):
    from knowledge_model_spark.functions.prompting import render_chat_with_spans

    rows = [(c, i, u, a) for i, (c, u, a) in enumerate(turns)]
    df = spark.createDataFrame(rows, "conv long, ord long, u string, a string")
    by_conv = {}
    for c, i, u, a in rows:
        by_conv.setdefault(c, []).append((i, a))
    for r in render_chat_with_spans(df, "conv", "ord", "u", "a").collect():
        answers = [a for _, a in sorted(by_conv[r["conv"]])]
        spans = r["asst_spans"].split(";")
        assert len(spans) == len(answers) == r["n_turns"]
        for span, a in zip(spans, answers):
            s, t = map(int, span.split(":"))
            assert r["rendered"][s:t] == a


# ------------------------------------------------- codec round-trips (r5)
# Pure-Python/numpy codecs: hypothesis sweeps geometries, palettes,
# filter choices, and adversarial text the fixed fixtures can't.


@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interlaced=st.booleans(),
)
@settings(**_SETTINGS)
def test_png_roundtrip_property(h, w, filters, seed, interlaced):
    import numpy as np

    from knowledge_model_spark.sources.multimodal import decode_png
    from tests.test_sources import _make_png, _make_png_adam7

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    b = (
        _make_png_adam7(img, filters)
        if interlaced
        else _make_png(img, 2, filters)
    )
    got = decode_png(b)
    assert got is not None and np.array_equal(got, img)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    n_colors=st.integers(min_value=2, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interlaced=st.booleans(),
)
@settings(**_SETTINGS)
def test_gif_roundtrip_property(h, w, n_colors, seed, interlaced):
    import numpy as np

    from knowledge_model_spark.sources.multimodal import decode_gif
    from tests.test_sources import _make_gif

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3), np.uint8)
    idx = rng.randint(0, n_colors, (h, w)).astype(np.uint8)
    got = decode_gif(_make_gif(idx, palette, interlaced=interlaced))
    assert got is not None and np.array_equal(got, palette[idx])


@given(
    pages=st.lists(
        st.text(
            # printable ASCII + the PDF-special characters + newline;
            # excludes lone \r (the writer normalizes real newlines)
            alphabet=st.sampled_from(
                list("abc XYZ09()\\<>[]/%#\n\t'\"!$&*+,-.:;=?@_~")
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_pdf_roundtrip_property(pages):
    from knowledge_model_spark.sources.pdf import decode_pdf_pages, encode_simple_pdf

    got = decode_pdf_pages(encode_simple_pdf(pages))
    assert got is not None
    # blank pages are RETAINED as '' (r5 ADVICE: the reference joins
    # every page.get_text() including empty ones), so page count is
    # exact; line-splitting inside a page collapses empty lines the
    # same way the extractor does (no show -> no line)
    assert len(got) == len(pages)
    norm = lambda p: "\n".join(ln for ln in p.split("\n") if ln != "")
    assert [norm(g) for g in got if norm(g)] == [
        norm(p) for p in pages if norm(p)
    ]


@given(
    n=st.integers(min_value=1, max_value=2000),
    mcs=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_gif_lzw_codec_property(n, mcs, seed):
    """LZW encode/decode round-trip across code-width growth
    boundaries for every min-code-size."""
    import numpy as np

    from knowledge_model_spark.sources.multimodal import _gif_lzw_decode
    from tests.test_sources import _gif_lzw_encode

    idx = np.random.RandomState(seed).randint(0, 1 << mcs, n).tolist()
    data = _gif_lzw_encode(idx, mcs)
    assert _gif_lzw_decode(data, mcs, n) == idx


@given(
    n=st.integers(min_value=0, max_value=6000),
    alphabet=st.integers(min_value=2, max_value=256),
    early=st.integers(min_value=0, max_value=1),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_pdf_lzw_codec_property(n, alphabet, early, seed):
    """PDF-variant (MSB, early-change) LZW round-trip across width
    growth boundaries, both EarlyChange values, table-fill Clear
    resets, and skewed alphabets."""
    import numpy as np

    from knowledge_model_spark.sources.lzw import lzw_decode_pdf, lzw_encode_pdf

    data = np.random.RandomState(seed).randint(0, alphabet, n).astype(
        np.uint8
    ).tobytes()
    enc = lzw_encode_pdf(data, early_change=early)
    assert lzw_decode_pdf(enc, early_change=early) == data


@given(
    h=st.integers(min_value=1, max_value=21),
    w=st.integers(min_value=1, max_value=21),
    comp=st.sampled_from(["none", "lzw", "packbits"]),
    pred=st.sampled_from([1, 2]),
    rps=st.one_of(st.none(), st.integers(min_value=1, max_value=9)),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_tiff_roundtrip_property(h, w, comp, pred, rps, seed):
    """Strip-TIFF round-trip over every compression × predictor ×
    strip-height combination, arbitrary small dimensions."""
    import numpy as np

    from knowledge_model_spark.sources.multimodal import (
        decode_tiff,
        encode_simple_tiff,
    )

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    got = decode_tiff(encode_simple_tiff(img, comp, pred, rps))
    assert got is not None and (got == img).all()


@given(
    h=st.integers(min_value=8, max_value=33),
    w=st.integers(min_value=8, max_value=33),
    quality=st.integers(min_value=70, max_value=98),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_jpeg_roundtrip_property(h, w, quality, seed):
    """Smooth gradients survive baseline JPEG at reasonable PSNR for
    EVERY geometry (incl. non-multiple-of-8 edge replication)."""
    import numpy as np

    from knowledge_model_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a, bfreq = rng.uniform(4, 16), rng.uniform(4, 16)
    img = np.stack(
        [
            (128 + 100 * np.sin(xx / a)).clip(0, 255),
            (128 + 100 * np.cos(yy / bfreq)).clip(0, 255),
            ((xx * 3 + yy * 5) % 256),
        ],
        axis=2,
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality))
    assert got is not None and got.shape == img.shape
    mse = np.mean((got.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 28.0


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # grid
            st.integers(min_value=0, max_value=9),  # tiebreak id component
            st.integers(min_value=0, max_value=100),  # value
            st.integers(min_value=0, max_value=1),  # partition key
        ),
        min_size=1,
        max_size=60,
    ),
    asc=st.booleans(),
)
@settings(**_SETTINGS)
def test_grid_ordering_equals_single_window_incl_null_grids(spark, rows, asc):
    """The grid-decomposed ordering helpers must equal the
    single-partition window forms they replace EXACTLY — including NULL
    grid cells (r5 ADVICE fix: null-safe offsets join; NULLS FIRST
    under asc / NULLS LAST under desc, Spark's default null ordering)
    and duplicate order keys broken by a unique id."""
    from pyspark.sql import Window

    from knowledge_model_spark.operators.ordering import (
        grid_global_row_number,
        grid_global_running_sum,
        grid_partitioned_rank_and_sum,
    )

    data = [
        (i, g, (g if g is not None else -1) * 10 + t, v, p)
        for i, (g, t, v, p) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, g long, ord long, v long, p long")
    gcol = F.col("g").asc_nulls_first() if asc else F.col("g").desc_nulls_last()
    order = [gcol, "id"]

    w = Window.orderBy(*order)
    truth_rn = {r["id"]: r["rn"] for r in df.select(
        "id", F.row_number().over(w).alias("rn")).collect()}
    got = grid_global_row_number(df, F.col("g"), order, grid_asc=asc, out="rn",
                                 out_total="tot")
    got_rows = got.collect()
    assert {r["id"]: r["rn"] for r in got_rows} == truth_rn  # no dropped NULLs
    assert {r["tot"] for r in got_rows} == {len(data)}

    truth_cum = {r["id"]: r["c"] for r in df.select(
        "id", F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("c")).collect()}
    got2 = grid_global_running_sum(df, F.col("g"), order, F.col("v"),
                                   grid_asc=asc, out="c")
    assert {r["id"]: r["c"] for r in got2.collect()} == truth_cum

    if asc:  # the partitioned helper is asc-only by contract
        wp = Window.partitionBy("p").orderBy(*order)
        truth = {
            r["id"]: (r["rn"], r["c"])
            for r in df.select(
                "id",
                F.row_number().over(wp).alias("rn"),
                F.sum("v").over(
                    wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ).alias("c"),
            ).collect()
        }
        got3 = grid_partitioned_rank_and_sum(
            df, ["p"], F.col("g"), order, F.col("v"), out_rn="rn", out_cum="c"
        )
        assert {r["id"]: (r["rn"], r["c"]) for r in got3.collect()} == truth


@given(
    n_rows=st.integers(min_value=1, max_value=12),
    columns=st.integers(min_value=1, max_value=24),
    colors=st.integers(min_value=1, max_value=4),
    predictor=st.sampled_from([2, 10, 11, 12, 13, 14, 15]),
    filters=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=5
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_pdf_predictor_roundtrip_property(
    n_rows, columns, colors, predictor, filters, seed
):
    """filter_rows → unfilter_rows is the identity for every predictor
    the PDF spec defines (2 = TIFF differencing, 10–15 = PNG row
    filters) across geometries, color counts, and per-row filter-type
    rotations — encoder and decoder are independent inverse paths
    (the LZW/ADPCM conformance method)."""
    import numpy as np

    from knowledge_model_spark.sources.predictors import (
        filter_rows,
        unfilter_rows,
    )

    data = (
        np.random.RandomState(seed)
        .randint(0, 256, n_rows * columns * colors, np.uint8)
        .tobytes()
    )
    enc = filter_rows(data, predictor, columns, colors, 8, filter_types=filters)
    assert unfilter_rows(enc, predictor, columns, colors, 8) == data
    # non-row-aligned truncation refuses honestly (never a misdecode);
    # stride-aligned truncation legitimately decodes the shorter rowset
    stride = columns * colors + (1 if predictor >= 10 else 0)
    if stride > 1:
        assert unfilter_rows(enc[:-1], predictor, columns, colors, 8) is None


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=96),
    density=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_ccitt_g4_roundtrip_property(h, w, density, seed):
    """g4_encode → g4_decode is the identity across geometries and ink
    densities (dense noise forces horizontal-mode MH runs; sparse
    images exercise vertical and pass modes) — encoder and decoder are
    independently written, so identity is a real conformance check."""
    import numpy as np

    from knowledge_model_spark.sources.ccitt import g4_decode, g4_encode

    img = np.random.RandomState(seed).rand(h, w) < density
    enc = g4_encode(img)
    got = g4_decode(enc, w)
    assert got is not None and np.array_equal(got, img)
    # rows hint (the PDF /Rows path) must agree
    got2 = g4_decode(enc, w, rows=h)
    assert got2 is not None and np.array_equal(got2, img)


@given(
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=96),
    density=st.floats(min_value=0.0, max_value=1.0),
    with_eol=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_ccitt_g3_1d_roundtrip_property(h, w, density, with_eol, seed):
    """g3_1d_encode → g3_1d_decode identity, with and without per-line
    EOL+fill (the decoder must tolerate both framings)."""
    import numpy as np

    from knowledge_model_spark.sources.ccitt import g3_1d_decode, g3_1d_encode

    img = np.random.RandomState(seed).rand(h, w) < density
    enc = g3_1d_encode(img, with_eol=with_eol)
    got = g3_1d_decode(enc, w)
    assert got is not None and np.array_equal(got, img)
    got2 = g3_1d_decode(enc, w, rows=h)
    assert got2 is not None and np.array_equal(got2, img)


@given(
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=96),
    density=st.floats(min_value=0.0, max_value=1.0),
    k=st.sampled_from([1, 2, 4, 8]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_ccitt_g3_mixed_roundtrip_property(h, w, density, k, seed):
    """g3_mixed_encode → g3_mixed_decode identity across K values
    (every-K-th-line 1-D, the rest 2-D against the previous line)."""
    import numpy as np

    from knowledge_model_spark.sources.ccitt import (
        g3_mixed_decode,
        g3_mixed_encode,
    )

    img = np.random.RandomState(seed).rand(h, w) < density
    enc = g3_mixed_encode(img, k=k)
    got = g3_mixed_decode(enc, w)
    assert got is not None and np.array_equal(got, img)


@given(
    w=st.text(alphabet="abcdefghij0123", min_size=0, max_size=24),
    vocab_pieces=st.sets(
        st.text(alphabet="abcdefghij0123", min_size=1, max_size=4),
        min_size=1,
        max_size=12,
    ),
    unk=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_viterbi_pieces_exact_cover(w, vocab_pieces, unk):
    """viterbi_pieces (r10): whatever the vocab, a returned segmentation
    must CONCATENATE BACK TO THE WORD EXACTLY (no drops, no overlaps),
    every piece must come from the vocab or be a single UNK char, and
    the call must be deterministic.  With unk enabled the DP is total;
    without it, the known-coverage case (all chars in vocab as singles)
    must still segment."""
    import math

    from knowledge_model_spark.functions.tokenize import viterbi_pieces

    logp = {p: -float(len(p)) for p in vocab_pieces}
    maxlen = max(len(p) for p in logp)
    if unk:
        pieces = viterbi_pieces(w, logp, maxlen, unk_logp=-50.0)
        assert "".join(pieces) == w
        for p in pieces:
            assert p in logp or len(p) == 1
        assert pieces == viterbi_pieces(w, logp, maxlen, unk_logp=-50.0)
    else:
        # make coverage total: add every char as a single
        full = dict(logp)
        for ch in set(w):
            full.setdefault(ch, -30.0)
        if w and not full:
            return
        ml = max((len(p) for p in full), default=1)
        pieces = viterbi_pieces(w, full, ml)
        assert "".join(pieces) == w
        assert all(p in full for p in pieces)
        # optimality sanity vs brute force on short words: the DP score
        # must equal the max over all segmentations
        if 0 < len(w) <= 8:
            def best(s):
                if not s:
                    return 0.0
                return max(
                    full[s[:i]] + best(s[i:])
                    for i in range(1, min(ml, len(s)) + 1)
                    if s[:i] in full
                )
            got = sum(full[p] for p in pieces)
            assert math.isclose(got, best(w), rel_tol=0, abs_tol=1e-9)


@given(data=st.binary(min_size=0, max_size=600))
@settings(max_examples=150, deadline=None)
def test_triage_never_raises_on_garbage(data):
    """triage_pdf_pages (r10): arbitrary bytes — including %PDF-prefixed
    garbage — must return None or a well-formed row list, never raise
    (the refuse-never-misguess contract under fuzz)."""
    from knowledge_model_spark.sources.pdf import triage_pdf_pages

    for payload in (data, b"%PDF-1.4\n" + data):
        rows = triage_pdf_pages(payload)
        assert rows is None or all(
            r["triage"] in ("text", "hybrid", "image_only", "empty")
            and r["page"] == i + 1
            for i, r in enumerate(rows)
        )
