"""Product quantization (PQ) ANN: codebook training, encoding, and
asymmetric-distance (ADC) top-k with exact re-rank.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the memory-compression scale path FAISS's
IVFPQ indexes use: a d-dim float vector becomes ``m`` small codes
(default 8 codes × 5 bits ≈ 50× smaller than float32), so a 100 TB
embedding corpus's quantized form fits in cluster RAM and the exact
vectors are only touched for the final shortlist.

Spark-first shape:

- **Training** reuses the deterministic k-means recipe proved out by
  semantic dedup (operators/dedup.py::semantic_dedup_pairs):
  content-addressed seeds (smallest md5(id)), Lloyd updates as ONE
  corpus scan per iteration producing (subspace, code, dim) partial
  sums — an m·ksub·dsub-key shuffle with map-side combine and a
  bounded driver fetch.  All m subspaces train in the same pass.
- **Encoding** is a vectorized Arrow kernel (numpy argmin per
  subspace, first-occurrence tiebreak) — the codes table is the only
  thing the search shuffles.
- **ADC scoring** stays in the JVM: per query a lookup table of
  m·ksub inner products ⟨q_sub, centroid⟩ is computed driver-side
  (the query batch is small by the same broadcast contract as
  brute_force_top_k) and shipped as a literal array column; the score
  is `aggregate(transform(...), sum)` over code-indexed lookups —
  whole-stage codegen, no Python per row.
- **Refine**: ADC top (k·refine) shortlist joins back to the full
  vectors for an exact cosine re-rank — the standard PQ recipe that
  recovers near-exact recall while only ever reading full vectors for
  the shortlist.

Like LSH/IVF, not oracle-expressible (float argmin across engines);
gated by recall ≥ 0.8 vs the exact baseline and determinism tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from knowledge_model_spark.functions.vectors import dot, l2_normalize


def _pq_codes_udf(codebooks: np.ndarray):
    """vector column → array<int> of m codes (argmin L2 per subspace)."""
    M = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _, dsub = M.shape

    @pandas_udf(ArrayType(IntegerType()))
    def enc(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for mi in range(m):
            sub = X[:, mi * dsub : (mi + 1) * dsub]
            # ||x - c||² argmin ≡ argmax(2⟨x,c⟩ - ||c||²); keep the
            # literal distance form — numpy argmin takes the FIRST
            # minimum, the deterministic tiebreak
            d2 = ((sub[:, None, :] - M[mi][None, :, :]) ** 2).sum(-1)
            codes[:, mi] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return enc


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
) -> list:
    """Train m per-subspace codebooks of ksub centroids; returns a
    nested list (m × ksub × d/m) — plain data, broadcastable anywhere.

    Seeds are the ksub vectors with smallest md5(id) (content-addressed,
    rescale-stable); each Lloyd iteration is one corpus scan + an
    (m·ksub·dsub)-key partial-sum shuffle + a bounded driver fetch.
    Cells that lose all members keep their previous centroid.
    """
    from pyspark import StorageLevel

    # persist the normalized vectors: the seed scan and every Lloyd
    # round read this table — unpersisted, each pass re-reads parquet
    # and re-normalizes (same fix as semantic_dedup_pairs; embeddings
    # are the small table, caching them is the at-scale shape too)
    base = df.select(
        F.col(id_col).alias("id"), l2_normalize(F.col(vec_col)).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    seeds = (
        base.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h", "id")
        .limit(ksub)
    )
    seed_vecs = np.asarray([r["v"] for r in seeds.collect()], dtype=np.float64)
    dim = seed_vecs.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # codebooks[mi] = the seed vectors' mi-th subvectors
    M = np.stack([seed_vecs[:, mi * dsub : (mi + 1) * dsub] for mi in range(m)])

    for _ in range(max(0, n_iter)):
        enc = _pq_codes_udf(M)
        stats = (
            base.withColumn("codes", enc(F.col("v")))
            .select("codes", F.posexplode("v").alias("i", "x"))
            .withColumn("mi", (F.col("i") / dsub).cast("int"))
            .withColumn("code", F.element_at("codes", F.col("mi") + 1))
            .groupBy("mi", "code", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )  # ≤ m·ksub·dsub rows — bounded driver fetch
        for r in stats:
            M[r["mi"], r["code"], r["i"] - r["mi"] * dsub] = r["s"] / r["n"]
    base.unpersist()
    return M.tolist()


def pq_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    m: int = 8,
    ksub: int = 32,
    refine: int = 24,
    codebooks: list | None = None,
    n_iter: int = 2,
) -> DataFrame:
    """PQ/ADC approximate cosine top-k per query with exact re-rank.

    ADC shortlist of k·refine by code-table lookups (JVM aggregate over
    a literal per-query LUT), then exact cosine on the shortlist only.
    The query batch is collected driver-side to build the LUTs — same
    small-batch contract as the broadcast in brute_force_top_k.
    """
    from knowledge_model_spark.session import ensure_min_partitions

    if codebooks is None:
        codebooks = pq_train(corpus, corpus_id, corpus_vec, m, ksub, n_iter)
    M = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = M.shape

    base = ensure_min_partitions(corpus).select(
        F.col(corpus_id), l2_normalize(F.col(corpus_vec)).alias("__cv")
    )
    codes = base.withColumn("__codes", _pq_codes_udf(M)(F.col("__cv")))

    q_rows = queries.select(
        F.col(query_id), l2_normalize(F.col(query_vec)).alias("__qv")
    ).collect()  # small query batch by contract
    lut_rows = []
    for r in q_rows:
        qv = np.asarray(r["__qv"], dtype=np.float64)
        lut = np.concatenate(
            [M[mi] @ qv[mi * dsub : (mi + 1) * dsub] for mi in range(m)]
        )
        lut_rows.append((r[query_id], [float(x) for x in lut]))
    spark = corpus.sparkSession
    luts = spark.createDataFrame(lut_rows, [query_id, "__lut"])

    adc = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.element_at(
                "__lut", mi * ksub + F.element_at("__codes", mi + 1) + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = codes.crossJoin(broadcast(luts)).select(
        F.col(query_id), F.col(corpus_id), F.col("__cv"), adc.alias("__adc")
    )
    w_short = Window.partitionBy(query_id).orderBy(
        F.col("__adc").desc(), F.col(corpus_id).asc()
    )
    shortlist = scored.withColumn("__r", F.row_number().over(w_short)).filter(
        F.col("__r") <= k * refine
    )

    qdf = broadcast(
        spark.createDataFrame(
            [(r[query_id], [float(x) for x in r["__qv"]]) for r in q_rows],
            [query_id, "__qv"],
        )
    )
    rescored = shortlist.join(qdf, query_id).select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(dot(F.col("__cv"), F.col("__qv")), 6).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
