"""Gates for rows-only quality signals (non-SQL-expressible kernels)."""

from __future__ import annotations


def test_compression_ratio_matches_python_and_determinism(spark):
    """quality_compression_ratio: the Spark mapInPandas output must
    equal an independent pure-python zlib recompute exactly (byte
    counts are longs, the ratio one shared division), be identical
    under a different shuffle parallelism, and actually separate
    repetitive from natural text on the corpus."""
    import zlib

    from knowledge_model_spark.plans import load_registry
    from knowledge_model_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.001"
    R = load_registry()
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["compression_ratio"])
        for r in R["quality_compression_ratio"].fn(spark, sf_dir).collect()
    }
    t = load_tables(spark, sf_dir)
    want = {}
    for row in t["documents_spread"].select("doc_id", "text").collect():
        raw = str(row["text"]).encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        want[row["doc_id"]] = (
            len(raw), comp, comp / len(raw) if raw else 0.0
        )
    assert got == want
    assert all(0 < v[2] < 1.5 for v in got.values())

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        again = {
            r["doc_id"]: (r["n_bytes"], r["n_compressed"],
                          r["compression_ratio"])
            for r in R["quality_compression_ratio"].fn(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert again == got

    # the signal separates: a synthetic repeated string compresses far
    # below the corpus median ratio
    rep = ("spark " * 500).encode()
    assert len(zlib.compress(rep, 6)) / len(rep) < 0.05
