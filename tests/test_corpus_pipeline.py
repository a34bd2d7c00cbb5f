"""End-to-end training-corpus pipeline: the operators COMPOSE.

Every stage below is an individually oracle-/test-verified operator;
this test chains them the way a 100 TB pretraining-data build would —
clean → quality gate → PII redaction → exact + near-dup dedup collapsed
through the connected-components ladder → eval decontamination →
temperature mixture rebalancing → deterministic split + k-fold — and
asserts the row-count waterfall is sane, deterministic, and
monotonically narrowing.  The point is composability: one DataFrame
lineage end to end, no driver round-trips besides the declared scalars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_model_spark.functions.pii import redact_pii
from knowledge_model_spark.functions.text_analysis import gopher_quality_flags
from knowledge_model_spark.functions.text_cleaning import clean_text
from knowledge_model_spark.operators.decontam import decontaminate
from knowledge_model_spark.operators.dedup import dedup_exact, minhash_lsh_pairs
from knowledge_model_spark.operators.graph import dedup_cluster_survivors
from knowledge_model_spark.operators.relational import apply_mixture


def _run_pipeline(spark, docs):
    # 1. clean + quality gate + PII redaction (all scan-speed
    # expressions; gopher_pass is the battery's final column)
    flags = gopher_quality_flags(F.col("text"))
    cleaned = (
        docs.withColumn("text", redact_pii(clean_text(F.col("text"))))
        .withColumn("gopher_pass", flags[-1])
        .filter(F.col("gopher_pass"))
        .drop("gopher_pass")
    )
    # 2. exact dedup, then near-dup pairs → components → survivors
    exact = dedup_exact(cleaned, "doc_id", "text")
    pairs = minhash_lsh_pairs(exact, "doc_id", "text", threshold=0.7).select(
        "id_a", "id_b"
    )
    survivors = dedup_cluster_survivors(exact, pairs, "doc_id")
    # 3. decontaminate against a fake eval set (a slice of the corpus
    # itself → guaranteed hits)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    decontam = decontaminate(survivors, eval_df, "doc_id", "text")
    # 4. temperature mixture rebalance by source, then split + fold
    mixed = apply_mixture(decontam, "source", "doc_id", alpha=0.5)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    return mixed.withColumn("split", split)


def test_training_pipeline_end_to_end(spark, tables):
    docs = tables["documents"]
    n0 = docs.count()
    out = _run_pipeline(spark, docs)
    rows = out.collect()
    n_final = len(rows)

    # waterfall: every stage narrows or preserves; the pipeline keeps a
    # meaningful fraction (the synthetic corpus is mostly clean)
    assert 0 < n_final <= n0
    assert n_final > n0 * 0.2

    # decontamination really removed the planted eval overlap
    final_ids = {r["doc_id"] for r in rows}
    overlap = [i for i in final_ids if i % 97 == 0]
    assert not overlap, f"contaminated ids survived: {overlap[:5]}"

    # all three splits materialize and are disjoint by construction
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}

    # determinism: the full composition is stable across partitionings
    again = _run_pipeline(spark, docs.repartition(16))
    assert {r["doc_id"] for r in again.collect()} == final_ids


def test_pipeline_single_lineage_no_hidden_collects(spark, tables):
    """The composed pipeline stays one lazy plan: building it triggers
    only the declared driver scalars (mixture rates, minhash store
    setup) — materialization happens once at the end."""
    docs = tables["documents"]
    out = _run_pipeline(spark, docs)
    # plan builds without an action; executedPlan exists and contains no
    # cartesian product anywhere in the composition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pipeline_extends_to_sft_ready_output(spark, tables):
    """The curation waterfall continues to SFT-ready artifacts: the
    train split renders into chat-template conversations with loss-mask
    spans, and the spans index exactly the assistant text — documents
    in, collator-ready rows out, one composition."""
    from knowledge_model_spark.functions.prompting import render_chat_with_spans

    docs = tables["documents"]
    train = _run_pipeline(spark, docs).filter(F.col("split") == "train")
    turns = train.select(
        F.expr("doc_id div 2").cast("long").alias("conv"),
        F.col("doc_id").alias("ord"),
        F.concat(F.lit("Summarize document "), F.col("doc_id").cast("string")).alias("u"),
        F.col("text").alias("a"),
    )
    rendered = render_chat_with_spans(turns, "conv", "ord", "u", "a").collect()
    assert rendered  # train split is non-empty on the synthetic corpus
    for r in rendered[:20]:
        spans = r["asst_spans"].split(";")
        assert len(spans) == r["n_turns"]
        for span in spans:
            s, t = map(int, span.split(":"))
            seg = r["rendered"][s:t]
            # every span lands exactly on assistant payload: it is
            # followed by the turn terminator and preceded by the tag
            assert r["rendered"][s - len("<|assistant|>\n") : s].endswith(
                "<|assistant|>\n"
            )
            assert r["rendered"][t : t + 1] == "\n"
            assert seg  # non-empty assistant text survived curation
