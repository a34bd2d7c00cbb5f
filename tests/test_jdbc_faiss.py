"""JDBC option construction + FAISS export seam (no external endpoints:
jdbc_options is pure; the faiss path falls back to numpy in this
container and the round-trip is asserted on the fallback)."""

from __future__ import annotations

import numpy as np
import pytest

from knowledge_model_spark.sources.faiss_export import (
    build_faiss_index,
    export_embeddings,
    load_export,
)
from knowledge_model_spark.sources.jdbc import jdbc_options

URL = "jdbc:postgresql://db:5432/km"


def test_jdbc_options_partitioned():
    opts = jdbc_options(
        URL,
        "articles",
        partition_column="article_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
        properties={"user": "ro"},
    )
    assert opts["dbtable"] == "articles"
    assert opts["partitionColumn"] == "article_id"
    assert opts["numPartitions"] == "64"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["user"] == "ro"


def test_jdbc_options_rejects_partial_partition_spec():
    with pytest.raises(ValueError, match="ALL of"):
        jdbc_options(URL, "articles", partition_column="id", num_partitions=8)


def test_jdbc_options_table_xor_query():
    with pytest.raises(ValueError):
        jdbc_options(URL)
    with pytest.raises(ValueError):
        jdbc_options(URL, "t", query="SELECT 1")
    # pushdown subquery becomes a dbtable subselect when partitioned
    opts = jdbc_options(
        URL,
        query="SELECT id, title FROM articles WHERE year = 2024",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert opts["dbtable"].startswith("(SELECT id, title")
    assert "query" not in opts


def test_faiss_export_roundtrip(spark, tables, tmp_path):
    emb = tables["embeddings"]
    path = str(tmp_path / "faiss_export")
    manifest = export_embeddings(emb, path)
    assert manifest["dim"] == 64 and manifest["count"] == emb.count()

    artifact = build_faiss_index(path)
    assert artifact.endswith(("vectors.npy", "faiss.index"))

    ids, vecs = load_export(path)
    assert len(ids) == manifest["count"] and vecs.shape == (manifest["count"], 64)
    # row alignment: the exported vector for a sampled id matches the table
    probe = emb.filter(emb.vec_id == int(ids[0])).first()["embedding"]
    np.testing.assert_allclose(vecs[0], np.asarray(probe, np.float32), rtol=1e-6)


def test_faiss_importable_branch_parity(spark, tables, tmp_path, monkeypatch):
    """When faiss IS importable (not in this container — importorskip,
    the test_real_model.py pattern for environment seams), the
    faiss.index branch must agree with the numpy fallback exactly:
    same ids.npy ordering, and IndexFlatIP top-k == brute-force inner
    product over the fallback arrays (IndexFlatIP is exact)."""
    import pytest

    faiss = pytest.importorskip("faiss")
    import shutil

    from knowledge_model_spark.sources import faiss_export as fx

    emb = tables["embeddings"].limit(200)
    path_f = str(tmp_path / "with_faiss")
    fx.export_embeddings(emb, path_f)
    path_np = str(tmp_path / "numpy_fallback")
    shutil.copytree(path_f, path_np)

    # real faiss branch
    artifact = fx.build_faiss_index(path_f)
    assert artifact.endswith("faiss.index")
    index = faiss.read_index(artifact)
    ids_f = np.load(f"{path_f}/ids.npy")

    # numpy fallback branch, forced by masking the import seam
    monkeypatch.setattr(fx, "faiss", None)
    assert fx.build_faiss_index(path_np).endswith("vectors.npy")
    ids_n, vecs_n = fx.load_export(path_np)

    np.testing.assert_array_equal(ids_f, ids_n)  # same ordering contract
    q = vecs_n[:5]
    scores_f, idx_f = index.search(q, 10)
    brute = q @ vecs_n.T
    for r in range(len(q)):
        order = np.argsort(-brute[r], kind="stable")[:10]
        np.testing.assert_allclose(
            np.sort(scores_f[r]), np.sort(brute[r][order]), rtol=1e-5
        )
        # id sets agree (ties may permute within equal scores)
        assert set(ids_f[idx_f[r]]) == set(ids_n[order]) or np.allclose(
            np.sort(scores_f[r]), np.sort(brute[r][order]), rtol=1e-5
        )
