"""Dedup operator correctness vs constructed ground truth.

The xxhash64-based operators (MinHash-LSH, SimHash) have no DuckDB
oracle; here they are validated against documents with KNOWN duplicate
structure: planted exact dups, near-dups (small edits), and unrelated
text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill and birds sing in the garden trees all day "
    "long through spring summer and early autumn afternoons quietly"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("quick", "rapid")),  # near-dup of 0 (1-word edit)
        (3, BASE.replace("sleeps", "rests").replace("sing", "chirp")),  # near-dup
        (4, "completely different content about database engines and "
            "columnar storage formats with vectorized execution kernels "
            "processing analytical workloads at petabyte scale every day"),
        (5, "Thé Quick—brown FOX!! jumps over the lazy dog while the cat sleeps "
            "on the warm windowsill and birds sing in the garden trees all day "
            "long through spring summer and early autumn afternoons quietly"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keep_id"] == 0 and g["dup_ids"] == [1] and g["n_dups"] == 2

    survivors = dedup_exact(docs, "doc_id", "text")
    assert survivors.count() == 6  # 7 docs − 1 exact dup


def test_ngram_jaccard_ground_truth(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # single-word edit keeps most shingles
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical signatures
    assert (0, 2) in pairs  # near-dup caught by banding
    assert not any(4 in p for p in pairs)


def test_minhash_estimates_track_exact_jaccard(spark, tables):
    """On real corpus data: est_jaccard within 0.2 of exact for all
    reported pairs (128 hashes → σ ≈ 0.04)."""
    docs = tables["documents"]
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # every high-similarity exact pair (≥0.7) must be found by LSH
    for pair, j in exact.items():
        if j >= 0.7:
            assert pair in est, f"LSH missed high-sim pair {pair} (jaccard={j})"
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) < 0.2


def test_simhash_ground_truth(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in simhash_pairs(docs, "doc_id", "text", max_distance=8).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0  # identical text
    assert (0, 5) in pairs and pairs[(0, 5)] <= 4  # case/punct variant
    assert not any(4 in p for p in pairs)


def test_embedding_near_dup(spark, tables):
    emb = tables["embeddings"].limit(200)
    pairs = embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.99)
    rows = pairs.collect()
    for r in rows:
        assert r["cosine"] >= 0.99


def test_embedding_lsh_matches_exact_on_planted_dups(spark, tables):
    """LSH-bucketed near-dup must find every planted ≥0.95 pair that the
    exact brute-force baseline finds (full recall at this threshold), and
    report identical cosines (precision is structural: every candidate is
    re-verified)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base_rows = tables["embeddings"].limit(100).collect()
    planted = []
    next_id = 100000
    for r in base_rows[:20]:  # plant a tiny-perturbation near-dup per vector
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        noise = rng.standard_normal(v.shape) * 0.02
        planted.append((next_id, (v + noise).tolist()))
        next_id += 1
    all_rows = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in base_rows]
    df = spark.createDataFrame(all_rows + planted, ["vec_id", "embedding"])

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, "vec_id", "embedding", 0.95).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs_lsh(
            df, "vec_id", "embedding", 0.95, dim=64
        ).collect()
    }
    assert len(exact) >= 20  # the planted pairs are really there
    assert set(lsh) == set(exact)  # full recall AND structural precision
    for p, c in lsh.items():
        assert c == exact[p]
