"""Quality-stage operators: PII redaction, Gopher rules, decontamination,
stratified sampling — constructed-fixture ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.functions.pii import pii_counts, redact_pii
from knowledge_model_spark.functions.text_analysis import gopher_quality_flags
from knowledge_model_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
)
from knowledge_model_spark.operators.relational import stratified_sample


def test_pii_redaction_all_categories(spark):
    raw = (
        "mail a.b+1@host2.com or visit 192.168.1.7, call +1 555-123-4567, "
        "card 4111111111111111, ssn 123-45-6789, keep year 2024 and id 42"
    )
    df = spark.createDataFrame([(1, raw)], ["id", "t"])
    out = df.select(
        redact_pii(F.col("t")).alias("r"), pii_counts(F.col("t")).alias("c")
    ).collect()[0]
    assert "[EMAIL]" in out["r"] and "a.b+1@host2.com" not in out["r"]
    assert "[IP]" in out["r"] and "192.168.1.7" not in out["r"]
    assert "[PHONE]" in out["r"] and "555-123-4567" not in out["r"]
    assert "[NUMBER]" in out["r"] and "4111111111111111" not in out["r"]
    assert "[SSN]" in out["r"] and "123-45-6789" not in out["r"]
    # non-PII digits survive
    assert "2024" in out["r"] and "id 42" in out["r"]
    assert out["c"]["emails"] == 1 and out["c"]["ips"] == 1
    assert out["c"]["ssns"] == 1 and out["c"]["cards"] == 1


def test_gopher_rules_fire_per_failure_mode(spark):
    good = " ".join(f"word{i} plain text here" for i in range(20))  # 80 words
    bullets = "\n".join(f"• item {i}" for i in range(10))
    ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
    symbols = " ".join("#" if i % 2 else f"w{i}" for i in range(100))
    short = "only four words here"
    df = spark.createDataFrame(
        [(0, good), (1, bullets), (2, ellipses), (3, symbols), (4, short)],
        ["id", "t"],
    )
    rows = {
        r["id"]: r
        for r in df.select("id", *gopher_quality_flags(F.col("t"))).collect()
    }
    assert rows[0]["gopher_pass"] is True
    assert rows[1]["bullet_line_ratio"] == 1.0 and not rows[1]["gopher_pass"]
    assert rows[2]["ellipsis_line_ratio"] == 1.0 and not rows[2]["gopher_pass"]
    assert rows[3]["symbol_word_ratio"] > 0.1 and not rows[3]["gopher_pass"]
    assert rows[4]["n_words"] == 4 and not rows[4]["gopher_pass"]


@pytest.fixture()
def contam_fixture(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [
            (1, shared + " with a train-only tail of words"),
            (2, "entirely unrelated training document about columnar engines "
                "and vectorized execution with no overlap at all"),
            (3, shared),  # verbatim eval leak
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, shared + " plus an eval suffix")], ["doc_id", "text"]
    )
    return train, eval_df


def test_contamination_pairs_and_decontaminate(spark, contam_fixture):
    train, eval_df = contam_fixture
    pairs = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(train, eval_df, "doc_id", "text", k=8).collect()
    }
    assert set(pairs) == {(1, 100), (3, 100)}
    assert all(n >= 1 for n in pairs.values())

    survivors = {
        r["doc_id"]
        for r in decontaminate(train, eval_df, "doc_id", "text", k=8).collect()
    }
    assert survivors == {2}

    # min_shared above the overlap count keeps everything
    lax = decontaminate(train, eval_df, "doc_id", "text", k=8, min_shared=10**6)
    assert {r["doc_id"] for r in lax.collect()} == {1, 2, 3}


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    kept = stratified_sample(df, "stratum", {"a": 0.25}, key_col="id")
    got = kept.groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in got}
    assert counts["b"] == 1000  # default rate 1.0 keeps everything
    assert 175 <= counts["a"] <= 325  # ~25% of 1000, hash-uniform

    # content-addressed: identical membership on every run and partitioning
    ids1 = sorted(r["id"] for r in kept.collect())
    ids2 = sorted(
        r["id"]
        for r in stratified_sample(
            df.repartition(13), "stratum", {"a": 0.25}, key_col="id"
        ).collect()
    )
    assert ids1 == ids2


def test_winnow_fingerprints_detect_substring_overlap(spark):
    """Winnowing guarantee: docs sharing a substring of length >= k+w-1
    (= 10 here) share at least one fingerprint; disjoint docs share none.
    Whole-document md5 can detect neither."""
    from knowledge_model_spark.functions.text_analysis import (
        normalize_for_dedup,
        rolling_gram_hashes,
        window_minima,
    )

    shared = "unique overlapping passage of text zq7 " * 2
    rows = [
        (0, "prefix words here " + shared + " suffix alpha"),
        (1, "totally different opening " + shared + " and closing beta"),
        (2, "no common content in this document about engines gamma"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    normed = df.select(
        "doc_id", normalize_for_dedup(F.col("text")).alias("t")
    ).localCheckpoint(eager=True)
    codes = normed.select(
        "doc_id",
        F.transform(F.split("t", ""), lambda c: F.ascii(c).cast("long")).alias("c"),
    ).localCheckpoint(eager=True)
    hashes = codes.select(
        "doc_id", rolling_gram_hashes(F.col("c"), 7).alias("h")
    ).localCheckpoint(eager=True)
    fps = {
        r["doc_id"]: set(r["f"])
        for r in hashes.select(
            "doc_id", F.array_distinct(window_minima(F.col("h"), 4)).alias("f")
        ).collect()
    }
    assert fps[0] & fps[1], "docs sharing a long substring must share a fingerprint"
    assert len(fps[0] & fps[1]) >= 3  # the shared region yields several
    assert len(fps[0] & fps[2]) <= 1  # disjoint text: at most chance overlap


def test_mixture_rates_temperature_math(spark):
    from knowledge_model_spark.operators.relational import mixture_rates

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id int, src string")
    r = {x["src"]: x for x in mixture_rates(d, "src", alpha=0.5).collect()}
    assert r["small"]["rate"] == 1.0 and r["small"]["bound"] == "zzzz"
    # (n_min/n)^(1-alpha) = sqrt(100/400) = 0.5
    assert abs(r["big"]["rate"] - 0.5) < 1e-12
    assert r["big"]["bound"] == format(int(0.5 * 65536), "04x")


def test_apply_mixture_downsamples_majority_only(spark):
    from knowledge_model_spark.operators.relational import apply_mixture

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id int, src string")
    out = apply_mixture(d, "src", key_col="doc_id", alpha=0.5)
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100           # smallest stratum keeps everything
    assert 150 <= counts["big"] <= 250      # ~200 expected at rate 0.5
    # deterministic: same membership on a second run
    again = apply_mixture(d, "src", key_col="doc_id", alpha=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_fixed_sample_per_group_deterministic_and_capped(spark, tables):
    from knowledge_model_spark.operators.relational import fixed_sample_per_group

    docs = tables["documents"].select("doc_id", "lang")
    a = sorted(map(tuple, fixed_sample_per_group(docs, "lang", 3, "doc_id").collect()))
    b = sorted(map(tuple,
        fixed_sample_per_group(docs.repartition(13), "lang", 3, "doc_id").collect()))
    assert a == b  # partitioning-independent membership
    import collections

    per = collections.Counter(lang for _, lang in a)
    sizes = dict(docs.groupBy("lang").count().collect())
    for lang, c in per.items():
        assert c == min(3, sizes[lang])


def test_luhn_known_numbers(spark):
    from knowledge_model_spark.functions.pii import luhn_valid
    from pyspark.sql import functions as F

    rows = [
        ("4111111111111111", True),   # canonical valid test PAN
        ("4111111111111112", False),  # checksum off by one
        ("5500005555555559", True),   # valid 16-digit
        ("1234567890123456", False),
        ("79927398713", False),       # Luhn-valid digits but < 13 chars
        ("0000000000000", True),      # 13 zeros: sum 0 -> valid
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "cand string")
    got = {
        r["cand"]: r["ok"]
        for r in df.select("cand", luhn_valid(F.col("cand")).alias("ok")).collect()
    }
    assert got == dict(rows)


def test_luhn_oracle_twin_agrees(spark):
    import duckdb

    from knowledge_model_spark.functions.pii import luhn_valid, oracle_sql_luhn
    from pyspark.sql import functions as F

    cands = [
        "4111111111111111", "4111111111111112", "5500005555555559",
        "1234567890123456", "79927398713", "0000000000000",
        "9999999999999999", "1000000000000009",
        # r3 ADVICE: non-digit candidates of qualifying length must be
        # FALSE (not NULL here / cast-error there) in BOTH engines
        "4111-1111-1111-1111", "abcdefghijklmnop", "411111111111111x",
    ]
    df = spark.createDataFrame([(s,) for s in cands], "cand string")
    spark_out = {
        r["cand"]: r["ok"]
        for r in df.select("cand", luhn_valid(F.col("cand")).alias("ok")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c (cand VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?)", [(s,) for s in cands])
    duck_out = dict(
        con.sql(f"SELECT cand, {oracle_sql_luhn('cand')} FROM c").fetchall()
    )
    assert spark_out == duck_out
    assert spark_out["4111-1111-1111-1111"] is False  # not None


def test_light_stemmer_fixtures(spark):
    from pyspark.sql import functions as F

    from knowledge_model_spark.functions.stemmer import light_stem

    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "values": "value",
        "hashing": "hash",
        "merged": "merg",
        "sing": "sing",       # no vowel-bearing 3+ stem before ing
        "ring": "ring",
        "speed": "speed",     # no vowel-stem before ed
        "class": "class",     # ss ending preserved
        "virus": "virus",     # us ending preserved
        "tables": "table",
    }
    df = spark.createDataFrame([(w,) for w in cases], "tok string")
    got = {
        r["tok"]: r["stem"]
        for r in df.select("tok", light_stem(F.col("tok")).alias("stem")).collect()
    }
    assert got == cases


def test_light_stemmer_oracle_twin_agrees(spark):
    import duckdb

    from pyspark.sql import functions as F

    from knowledge_model_spark.functions.stemmer import light_stem, oracle_sql_stem

    words = [
        "caresses", "ponies", "values", "hashing", "merged", "sing",
        "speed", "class", "virus", "tables", "kisses", "flies", "tuning",
        "sorted", "bus", "miss", "agreed", "using",
    ]
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    got = {
        r["tok"]: r["stem"]
        for r in df.select("tok", light_stem(F.col("tok")).alias("stem")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE w (tok VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    duck = dict(con.sql(f"SELECT tok, {oracle_sql_stem('tok')} FROM w").fetchall())
    assert got == duck
