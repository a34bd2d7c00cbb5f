"""Continuous ingest flow: month gap detection, pruned processing,
idempotent partition write, recall gate (reference: continuous.py:8-38)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.pipelines import (
    RecallGateError,
    continuous_update,
    first_missing_month,
)


@pytest.fixture(scope="module")
def monthly_source(spark, tables):
    # spread the documents table over three synthetic months
    return (
        tables["documents"]
        .withColumn("year", F.lit(2024))
        .withColumn("month", (F.col("doc_id") % 3 + 1).cast("int"))
    )


def test_continuous_update_processes_months_in_order(spark, monthly_source, tmp_path):
    sink = str(tmp_path / "clean")
    seen = []
    while True:
        rep = continuous_update(spark, monthly_source, sink)
        if rep is None:
            break
        seen.append((rep.year, rep.month))
        assert rep.n_docs > 0 and rep.n_passages >= rep.n_docs
    assert seen == [(2024, 1), (2024, 2), (2024, 3)]
    # caught up: another tick is a no-op
    assert continuous_update(spark, monthly_source, sink) is None
    assert first_missing_month(spark, monthly_source, sink) is None
    # all three partitions landed, once each
    back = spark.read.parquet(sink)
    assert back.select("month").distinct().count() == 3
    assert back.count() == back.dropDuplicates(["doc_id", "chunk_index"]).count()


def test_continuous_update_is_idempotent_per_partition(spark, monthly_source, tmp_path):
    sink = str(tmp_path / "clean2")
    continuous_update(spark, monthly_source, sink)
    first = spark.read.parquet(sink).count()
    # re-processing the same month (sink wiped of its marker via direct
    # call) dynamically overwrites instead of duplicating
    from knowledge_model_spark.pipelines import process_month

    (
        process_month(monthly_source, 2024, 1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("year", "month")
        .parquet(sink)
    )
    assert spark.read.parquet(sink).count() == first


def test_recall_gate_fires(spark, monthly_source, tmp_path):
    sink = str(tmp_path / "clean3")
    # impossible golden labels -> recall 0 -> the gate must raise
    bad_eval = spark.createDataFrame(
        [(str(i), "no such words exist qzx", -999) for i in range(5)],
        ["query_id", "query_text", "expected_doc_id"],
    )
    with pytest.raises(RecallGateError):
        continuous_update(spark, monthly_source, sink, eval_queries=bad_eval)


def test_recall_gate_passes_on_self_queries(spark, monthly_source, tmp_path):
    sink = str(tmp_path / "clean4")
    # queries built FROM month-1 documents retrieve their own doc
    docs = monthly_source.filter((F.col("month") == 1) & (F.col("doc_id") < 40))
    good_eval = docs.select(
        F.col("doc_id").cast("string").alias("query_id"),
        F.substring("text", 1, 250).alias("query_text"),
        F.col("doc_id").alias("expected_doc_id"),
    )
    rep = continuous_update(spark, monthly_source, sink, eval_queries=good_eval)
    assert rep is not None and rep.recall >= 0.8


def test_audited_metrics_single_scan(spark, tables):
    """Observation metrics match independently-computed values and come
    from the same job as the action (no second scan needed)."""
    import pyspark.sql.functions as F

    from knowledge_model_spark.pipelines import audited

    docs = tables["documents"].select("doc_id", "text", "lang")
    staged, obs_in = audited(
        docs,
        "ingest",
        rows=F.count(F.lit(1)),
        null_texts=F.count_if(F.col("text").isNull()),
        langs=F.approx_count_distinct("lang"),
    )
    kept = staged.filter(F.length("text") >= 50)
    kept, obs_out = audited(kept, "after_length_gate", rows=F.count(F.lit(1)))
    n_out = kept.count()  # ONE action materializes both observations

    m_in, m_out = obs_in.get, obs_out.get
    assert m_in["rows"] == docs.count()
    assert m_in["null_texts"] == 0
    assert m_out["rows"] == n_out
    assert 0 < n_out <= m_in["rows"]


# ------------------------------------------------------- OHLC bars


def test_ohlc_bars_tiebreak_deterministic(spark):
    import datetime as dt

    from knowledge_model_spark.operators.relational import ohlc_bars

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # two events at the IDENTICAL timestamp: event_id must break the tie
        (1, base, "a", 5.0),
        (2, base, "a", 9.0),
        (3, base + dt.timedelta(minutes=30), "a", 7.0),
        (4, base + dt.timedelta(minutes=59), "a", 2.0),
        (5, base + dt.timedelta(minutes=59), "a", 11.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    for n_parts in (1, 7):
        out = ohlc_bars(
            df.repartition(n_parts), "ts", "value", ["event_type"],
            window="1 hour", tiebreak_col="event_id",
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.open, r.high, r.low, r.close, r.n) == (5.0, 11.0, 2.0, 11.0, 5)


def test_key_skew_audit_flags_hot_key(spark):
    from knowledge_model_spark.operators.relational import key_skew_audit

    rows = [(0, i) for i in range(900)] + [(k, 0) for k in range(1, 101)]
    df = spark.createDataFrame(rows, ["key", "payload"])
    r = key_skew_audit(df, "key", "fixture").collect()[0]
    assert r.keyset == "fixture"
    assert r.n_keys == 101 and r.n_rows == 1000 and r.max_cnt == 900
    assert r.top_share_ppm == 900000
    assert r.p50_cnt == 1.0


def test_expectations_route_and_annotate(spark):
    """expect(): failing rows carry EVERY violated rule name; keep-mode
    annotates without dropping; the split is exhaustive and disjoint."""
    from pyspark.sql import functions as F

    from knowledge_model_spark.pipelines import expect

    df = spark.createDataFrame(
        [
            (1, "good text here", "en"),
            (2, "", "en"),            # empty text
            (3, "fine", None),        # null lang
            (4, "", None),            # both violations
            (5, None, "en"),          # NULL text: rule evaluates NULL -> violation
        ],
        ["doc_id", "text", "lang"],
    )
    rules = {
        "nonempty_text": F.length("text") > 0,
        "lang_present": F.col("lang").isNotNull(),
    }
    good, bad = expect(df, rules)
    assert {r.doc_id for r in good.collect()} == {1}
    viol = {r.doc_id: sorted(r.violated_rules) for r in bad.collect()}
    assert viol == {
        2: ["nonempty_text"],
        3: ["lang_present"],
        4: ["lang_present", "nonempty_text"],
        5: ["nonempty_text"],
    }
    assert "violated_rules" not in good.columns

    tagged, bad2 = expect(df, rules, on_violation="keep")
    assert tagged.count() == 5 and bad2.count() == 4
    assert good.count() + bad.count() == df.count()
