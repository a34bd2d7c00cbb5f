"""End-to-end retrieval pipeline + eval — the reference's flagship query.

Reproduces the `/ask` dataflow (reference: knowledge_model/main.py:365-421)
and the recall@K eval gate (pipelines/tasks/eval_snapshot.py:74-108,
flows/continuous.py:34-36) as batch DataFrame jobs:

  clean → split passages → embed (hash stub or pluggable pandas_udf) →
  exact top-k scored join → threshold cascade → context packing budget.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_model_spark.functions.chunking import explode_passages
from knowledge_model_spark.functions.text_cleaning import clean_text
from knowledge_model_spark.functions.vectors import hash_embed
from knowledge_model_spark.operators.relational import greedy_budget_pack
from knowledge_model_spark.operators.similarity import brute_force_top_k

DEFAULT_TOP_K = 12  # reference: vector_store.py:19
MIN_SCORE = 0.75  # reference: vector_store.py:134
FALLBACK_MIN_SCORE = 0.55  # reference: main.py:380
CONTEXT_TOKEN_BUDGET = 800  # reference: main.py:355


def build_passage_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 300,
    overlap: int = 50,
    dim: int = 64,
) -> DataFrame:
    """documents → cleaned, chunked, hash-embedded passage table.

    The batch analog of the reference ingest (pipeline.py:96-259 →
    build_faiss.py:88-141), with the FAISS index replaced by a first-class
    embeddings column.
    """
    cleaned = docs.select(
        F.col(id_col), clean_text(F.col(text_col)).alias("clean_text")
    )
    passages = explode_passages(cleaned, "clean_text", [id_col], size, overlap)
    return passages.withColumn("vector", hash_embed(F.col("chunk_text"), dim))


def embed(
    df: DataFrame,
    text_col: str = "chunk_text",
    model_udf=None,
    out_col: str = "vector",
    dim: int = 64,
) -> DataFrame:
    """Embedding stage with a pluggable-model seam — the embed-side twin
    of the rerank hook (:func:`rerank_top_k`).

    ``model_udf`` is any pandas UDF mapping a text Series to an
    array<float|double> Series: the real-model slot (reference:
    build_faiss.py:69-85 — SentenceTransformer.encode, batch 64,
    normalize_embeddings=True).  Arrow batching is the reference's
    batch-64 analog; per-executor lazy model init belongs INSIDE the UDF
    closure (load on first batch, reuse for the executor's lifetime —
    the @lru_cache analog of re_rank.py:20-24; see
    :func:`stats_model_udf` for the canonical shape).  Defaults to the
    deterministic :func:`hash_embed` expression so pipelines run without
    model downloads.
    """
    if model_udf is None:
        return df.withColumn(out_col, hash_embed(F.col(text_col), dim))
    return df.withColumn(out_col, model_udf(F.col(text_col)))


def stats_model_udf():
    """Deterministic fake "model" for the embed seam, shaped exactly like
    a real SentenceTransformer UDF: lazy per-executor init in the
    closure, Arrow-batched encode, L2-normalized output — but computing a
    4-dim text-stats embedding [n_chars, n_words, n_vowels, 1]/‖·‖ that a
    SQL oracle can reproduce bit-for-bit."""
    state: dict = {}

    @F.pandas_udf("array<double>")
    def model(texts: pd.Series) -> pd.Series:
        import math
        import re

        if "vowel" not in state:  # lazy init: once per executor process
            state["vowel"] = re.compile(r"[aeiou]")
            state["ws"] = re.compile(r"\s+")
        vowel_re, ws_re = state["vowel"], state["ws"]
        out = []
        for t in texts:
            t = t or ""
            v = [
                float(len(t)),
                float(len([w for w in ws_re.split(t) if w])),
                float(len(vowel_re.findall(t.lower()))),
                1.0,
            ]
            n = math.sqrt(sum(x * x for x in v))
            out.append([x / n for x in v])
        return pd.Series(out)

    return model


def stats_model_iter_udf():
    """SCALAR_ITER twin of :func:`stats_model_udf` — the canonical
    per-partition model-loading form (SPARK-26412): the UDF receives an
    ITERATOR of Arrow batches, so expensive init (loading SentenceTransformer
    weights onto the device, reference build_faiss.py:69-78) runs exactly
    once per task before the batch loop, not once per batch and not once
    per row.  Same contract as the SCALAR form — embed() accepts either —
    and parity between the two is gated in tests/test_retrieval.py."""
    @F.pandas_udf("array<double>")
    def model(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import math
        import re

        # expensive-init site: ONCE per task, before any batch
        vowel_re = re.compile(r"[aeiou]")
        ws_re = re.compile(r"\s+")
        for texts in batches:
            out = []
            for t in texts:
                t = t or ""
                v = [
                    float(len(t)),
                    float(len([w for w in ws_re.split(t) if w])),
                    float(len(vowel_re.findall(t.lower()))),
                    1.0,
                ]
                n = math.sqrt(sum(x * x for x in v))
                out.append([x / n for x in v])
            yield pd.Series(out)

    return model


def retrieve(
    index: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = DEFAULT_TOP_K,
    min_score: float = MIN_SCORE,
    fallback_min_score: float = FALLBACK_MIN_SCORE,
    dim: int = 64,
) -> DataFrame:
    """Top-k passages per query with the two-phase threshold cascade.

    Phase 1 keeps hits with score >= min_score; queries with no phase-1
    hit fall back to score >= fallback_min_score (reference:
    main.py:374-381).  Expressed as one scored join + per-query max-score
    bookkeeping — no second retrieval pass needed because the exact scored
    join already materializes all candidates above the weaker threshold.
    """
    qv = queries.select(
        F.col(query_id), hash_embed(F.col(query_text), dim).alias("qvec")
    )
    hits = brute_force_top_k(
        index.withColumn("__pid", F.concat_ws("#", F.col("doc_id"), F.col("chunk_index"))),
        qv,
        corpus_id="__pid",
        corpus_vec="vector",
        query_id=query_id,
        query_vec="qvec",
        k=k,
        min_score=fallback_min_score,
        normalized=True,
    )
    wq = Window.partitionBy(query_id)
    return (
        hits.withColumn("__best", F.max("score").over(wq))
        .filter(
            (F.col("score") >= min_score)
            | (F.col("__best") < min_score)  # cascade: whole query fell back
        )
        .drop("__best")
    )


def pack_context(
    hits: DataFrame,
    query_id: str = "query_id",
    text_col: str = "chunk_text",
    budget: int = CONTEXT_TOKEN_BUDGET,
    order_col: str = "score",
) -> DataFrame:
    """Greedy token-budget packing of ranked hits (reference:
    main.py:355-363): keep hits while the running whitespace-token total
    stays within budget.  ``order_col`` is the walk order — pass the
    rerank score when packing reranked hits."""
    with_cost = hits.withColumn(
        "n_tok", F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0))
    )
    return greedy_budget_pack(
        with_cost, [query_id], order_col=order_col, cost_col="n_tok", budget=budget
    )


def lexical_overlap_scorer():
    """Deterministic stub cross-encoder: word-set Jaccard between query
    and passage text, as an Arrow-batched pandas UDF.

    Stands in for the reference's CrossEncoder.predict
    (reference: embeddings/re_rank.py:44-47) so the rerank seam is
    testable (and DuckDB-expressible) without model downloads; a real
    model plugs in as any ``(query_text, doc_text) -> double`` pandas UDF
    with per-executor lazy model init (the reference's @lru_cache analog,
    re_rank.py:20-24).
    """
    import re as _re

    @F.pandas_udf("double")
    def scorer(q: pd.Series, d: pd.Series) -> pd.Series:
        def toks(t):
            return {w for w in _re.split(r"[^a-z0-9]+", (t or "").lower()) if w}

        out = []
        for a, b in zip(q, d):
            ta, tb = toks(a), toks(b)
            u = ta | tb
            out.append(len(ta & tb) / len(u) if u else 0.0)
        return pd.Series(out, dtype=float)

    return scorer


def rerank_top_k(
    hits: DataFrame,
    scorer,
    k: int,
    query_id: str = "query_id",
    query_text: str = "query_text",
    doc_text: str = "chunk_text",
    tiebreak: str | None = None,
    score_name: str = "re_score",
    rank_name: str = "re_rank",
) -> DataFrame:
    """Cross-encoder rerank hook: score each (query, passage) pair with a
    pluggable pandas-UDF ``scorer``, keep the top-k per query by the new
    score (reference: embeddings/re_rank.py:28-51 — CE.predict +
    argsort[:top_k]).

    The batch analog scores every candidate (the reference's
    skip-when-len<=k short-circuit is a serving-latency optimization;
    queries with ≤ k candidates keep all rows here too, just re-ordered
    by the new score).  Scoring is one Arrow-batched UDF pass; the top-k
    is a per-query window — no collect, no per-row Python.
    """
    order = [F.col(score_name).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        hits.withColumn(score_name, scorer(F.col(query_text), F.col(doc_text)))
        .withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def recall_at_k(
    hits: DataFrame,
    golden: DataFrame,
    query_id: str = "query_id",
    hit_doc: str = "doc_id",
    expected_doc: str = "expected_doc_id",
    k: int = 10,
) -> DataFrame:
    """recall@K over a golden label set (reference: eval_snapshot.py:91-100).

    One row: (n_queries, n_hit, recall).  Join golden labels to top-K hits
    (semi-join semantics), average the hit indicator.
    """
    topk = hits.filter(F.col("rank") <= k).select(query_id, hit_doc)
    hit_flags = (
        golden.join(
            topk,
            (golden[query_id] == topk[query_id])
            & (golden[expected_doc] == topk[hit_doc]),
            "left_semi",
        )
        .select(query_id)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        golden.select(query_id)
        .distinct()
        .join(hit_flags, query_id, "left")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
            F.round(F.avg(F.coalesce(F.col("hit"), F.lit(0))), 6).alias("recall"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    rank_a: str,
    rank_b: str,
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked candidate lists (hybrid
    lexical+vector retrieval; Cormack et al., SIGIR'09).

    rrf(d) = Σ_lists 1/(k0 + rank_list(d)), a document absent from a
    list contributing 0.  Because the score is derived ONLY from small
    integer ranks, both engines compute bit-identical doubles — no
    ln()/sum-order hazard — so ordering on the raw score is stable.
    Fixed addition order (list a, then b); ties (symmetric rank swaps)
    break on id.

    Scale: a full-outer join of two k-row lists per query and a top-k —
    nothing corpus-sized; the expensive work happened upstream in the
    per-list retrievers.
    """
    a = ranked_a.select(F.col(id_col).alias("id"), F.col(rank_a).alias("ra"))
    b = ranked_b.select(F.col(id_col).alias("id"), F.col(rank_b).alias("rb"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        (
            F.coalesce(1.0 / (F.lit(k0) + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    topk = fused.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "id", F.round("rrf", 6).alias("rrf"), "rnk"
    )


def mmr_rerank(
    cands: DataFrame,
    query_id: str,
    cand_id: str,
    score_col: str,
    vec_col: str,
    k: int = 3,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR'98): greedily select ``k`` of each query's
    candidates maximizing

        λ·rel(c) − (1−λ)·max_{s ∈ selected} cos(c, s)

    — the standard fix for top-k lists full of near-duplicates (which a
    dedup'd-but-not-perfectly corpus always produces).

    One Arrow task per query (``applyInPandas``): the candidate set is
    an upstream top-N (small by contract — the same bounded-fanout
    contract as rerank_top_k), so the greedy loop is an in-memory numpy
    matmul per query, never a cross join.  Engine-stable determinism:
    every quantity entering a comparison is rounded to 6 dp (relevance
    upstream, pairwise cosines, marginals) and ties break to the
    smallest candidate id — the DuckDB oracle unrolls the identical
    greedy steps.

    Returns (query_id, cand_id, mmr_rank, mmr_score).
    """
    import numpy as np

    id_types = dict(cands.dtypes)
    out_schema = (
        f"{query_id} {id_types[query_id]}, {cand_id} {id_types[cand_id]}, "
        "mmr_rank long, mmr_score double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(cand_id, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        V = V / norms[:, None]
        sims = np.round(V @ V.T, 6)
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        ids = pdf[cand_id].to_numpy()
        selected: list[int] = []
        maxsim = np.zeros(n)
        out_rows = []
        avail = np.ones(n, dtype=bool)
        for step in range(1, min(k, n) + 1):
            if step == 1:
                marg = np.round(lam * rel, 6)
            else:
                marg = np.round(lam * rel - (1.0 - lam) * maxsim, 6)
            # argmax with smallest-id tiebreak: ids are ascending, so
            # the FIRST occurrence of the max marginal wins
            cand_idx = np.where(avail)[0]
            pick = cand_idx[np.argmax(marg[cand_idx])]
            out_rows.append(
                (pdf[query_id].iloc[0], ids[pick], step, float(marg[pick]))
            )
            avail[pick] = False
            selected.append(pick)
            maxsim = np.maximum(maxsim, sims[:, pick])
        return pd.DataFrame(
            out_rows, columns=[query_id, cand_id, "mmr_rank", "mmr_score"]
        )

    return cands.groupBy(query_id).applyInPandas(kernel, out_schema)


def weighted_fuse(
    scored_a: DataFrame,
    scored_b: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    w_a: float = 0.6,
    w_b: float = 0.4,
    k: int = 10,
) -> DataFrame:
    """Min-max-normalized weighted score fusion of two candidate lists —
    the score-level complement of :func:`rrf_fuse` (rank-level): each
    list's scores normalize to [0, 1] over ITS OWN candidates, then
    combine as w_a·norm_a + w_b·norm_b (absent side contributes 0).

    Cross-engine determinism: inputs are the retrievers' round-6
    scores, so min/max/normalize/combine are identical double
    arithmetic in both engines (the ln() ulp hazard was already
    absorbed upstream); final ordering ties break on id.  A
    degenerate all-equal list normalizes to 1.0 (max==min guard).

    Scale: two global min/max windows over k-row candidate lists plus
    one full-outer join — nothing corpus-sized.
    """
    wall = Window.partitionBy()

    def norm(df, sc):
        mn, mx = F.min(sc).over(wall), F.max(sc).over(wall)
        return df.select(
            F.col(id_col).alias("id"),
            F.when(mx == mn, F.lit(1.0))
            .otherwise((F.col(sc) - mn) / (mx - mn))
            .alias("n"),
        )

    a = norm(scored_a, score_a).withColumnRenamed("n", "na")
    b = norm(scored_b, score_b).withColumnRenamed("n", "nb")
    fused = a.join(b, "id", "full_outer").select(
        "id",
        (
            F.lit(w_a) * F.coalesce("na", F.lit(0.0))
            + F.lit(w_b) * F.coalesce("nb", F.lit(0.0))
        ).alias("fused"),
    )
    w = Window.orderBy(F.round("fused", 6).desc(), F.col("id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", F.round("fused", 6).alias("fused"), "rnk")
    )


# --------------------------------------------------- real-model UDF builders

def sentence_transformer_udf(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    batch_size: int = 64,
):
    """Real-model pandas UDF for the :func:`embed` seam (reference:
    embeddings/build_faiss.py:69-85 — SentenceTransformer.encode with
    batch_size=64, normalize_embeddings=True).

    SCALAR_ITER shape: the model loads ONCE per task before the batch
    loop (the distributed analog of the reference's module-level model
    singleton), then encodes Arrow batches.  Raises ImportError at
    BUILD time when sentence-transformers is absent so a misconfigured
    cluster fails on the driver, not task-by-task on executors; the
    deterministic :func:`stats_model_udf` / :func:`hash_embed` remain
    the model-free twins (parity gated by embed_seam_parity).
    """
    import importlib.util

    if importlib.util.find_spec("sentence_transformers") is None:
        raise ImportError(
            "sentence-transformers is not installed; use "
            "stats_model_udf()/hash_embed for the deterministic seam"
        )

    @F.pandas_udf("array<float>")
    def model(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from sentence_transformers import SentenceTransformer

        m = SentenceTransformer(model_name)  # once per task
        for texts in batches:
            vecs = m.encode(
                texts.fillna("").tolist(),
                batch_size=batch_size,
                normalize_embeddings=True,
                show_progress_bar=False,
            )
            yield pd.Series([[float(x) for x in v] for v in vecs])

    return model


def cross_encoder_udf(
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
    batch_size: int = 64,
):
    """Real cross-encoder scorer for :func:`rerank_top_k` (reference:
    embeddings/re_rank.py:28-51 — CrossEncoder.predict over
    (query, passage) pairs, lazy-cached model re_rank.py:20-24).

    Same contract as :func:`lexical_overlap_scorer`:
    ``(query_text, doc_text) -> double``; same build-time import guard
    as :func:`sentence_transformer_udf`.
    """
    import importlib.util

    if importlib.util.find_spec("sentence_transformers") is None:
        raise ImportError(
            "sentence-transformers is not installed; use "
            "lexical_overlap_scorer() for the deterministic seam"
        )

    @F.pandas_udf("double")
    def scorer(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        from sentence_transformers import CrossEncoder

        m = CrossEncoder(model_name)  # once per task
        for q, d in batches:
            pairs = list(zip(q.fillna(""), d.fillna("")))
            scores = m.predict(pairs, batch_size=batch_size)
            yield pd.Series([float(s) for s in scores])

    return scorer
