"""Ingest/training-pipeline queries: corpus normalization, weighted merge,
word-budget chunk grouping, percentile stats, unpivot, scalar subqueries,
map functions, and the multimodal mapInPandas plumbing.

These cover the reference's data-preparation surface:
- dual-variant training records (reference: training/train_lora.py:87-92 —
  {"text"} OR {"instruction","output"} in one JSONL)
- ~80/20 weighted corpus merge (pipeline_runner.py:49-57; the merge
  script itself is absent from the snapshot)
- word-budget chunk grouping (processing/text_cleaner.py:147-160 —
  running word count → chunk key)
plus operator categories the reference lacks (SURVEY §2: percentile
aggregates, unpivot, scalar subqueries, map functions) and the
multimodal north-star columns (binary payload → mapInPandas features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledge_model_spark.plans import register
from knowledge_model_spark.session import load_tables

CHUNK_WORDS = 12  # word budget per chunk (reference uses 1000; docs here are ~50 words)
MERGE_INSTR_HEX = "34"  # md5-prefix sampling: 0x34/0x100 ≈ 20% instruction share


@register(
    "corpus_dual_variant",
    """
    WITH variants AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  WHEN doc_id % 2 = 0 THEN text END AS text,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  WHEN doc_id % 2 = 1 THEN 'summarize: ' || substr(text, 1, 40) END AS instruction,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  WHEN doc_id % 2 = 1 THEN substr(text, 41, 80) END AS output
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN text IS NOT NULL THEN 'raw' ELSE 'instruction' END AS variant,
           coalesce(text, instruction || ' ' || output) AS train_text
    FROM variants
    WHERE coalesce(text, instruction || ' ' || output) IS NOT NULL
    """,
    doc="dual-variant training-record normalization (reference: "
    "train_lora.py:87-92): coalesce {text} / {instruction,output} record "
    "shapes into one train_text column, dropping records that are neither",
)
def corpus_dual_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    variants = t["documents"].select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .when(F.col("doc_id") % 2 == 0, F.col("text"))
        .alias("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .when(
            F.col("doc_id") % 2 == 1,
            F.concat(F.lit("summarize: "), F.substring("text", 1, 40)),
        )
        .alias("instruction"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .when(F.col("doc_id") % 2 == 1, F.substring("text", 41, 80))
        .alias("output"),
    )
    # concat_ws never yields NULL — mirror SQL `instruction || ' ' || output`
    # null-propagation with an explicit both-present guard.
    train = F.coalesce(
        F.col("text"),
        F.when(
            F.col("instruction").isNotNull() & F.col("output").isNotNull(),
            F.concat(F.col("instruction"), F.lit(" "), F.col("output")),
        ),
    )
    return (
        variants.withColumn("train_text", train)
        .filter(F.col("train_text").isNotNull())
        .select(
            "doc_id",
            F.when(F.col("text").isNotNull(), F.lit("raw"))
            .otherwise(F.lit("instruction"))
            .alias("variant"),
            "train_text",
        )
    )


@register(
    "corpus_weighted_merge",
    f"""
    SELECT doc_id, corpus, md5(text) AS text_md5 FROM (
      SELECT doc_id, 'raw' AS corpus, text FROM documents
      UNION ALL
      SELECT doc_id, 'instruction' AS corpus, 'summarize: ' || text AS text
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{MERGE_INSTR_HEX}'
    )
    """,
    doc="~80/20 weighted corpus merge (reference: pipeline_runner.py:49-57): "
    "unionByName of the raw corpus with a deterministic md5-prefix sample "
    "of instruction records — sampling is content-addressed, so it is "
    "stable across runs and cluster sizes",
)
def corpus_weighted_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    raw = t["documents"].select("doc_id", F.lit("raw").alias("corpus"), "text")
    instr = (
        t["documents"]
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            < MERGE_INSTR_HEX
        )
        .select(
            "doc_id",
            F.lit("instruction").alias("corpus"),
            F.concat(F.lit("summarize: "), F.col("text")).alias("text"),
        )
    )
    return raw.unionByName(instr).select(
        "doc_id", "corpus", F.md5("text").alias("text_md5")
    )


@register(
    "chunk_word_budget",
    f"""
    WITH words AS (
      SELECT doc_id, generate_subscripts(w, 1) - 1 AS idx, unnest(w) AS word
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> len(x) > 0) AS w
            FROM documents)
    )
    SELECT doc_id,
           CAST(idx // {CHUNK_WORDS} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_words,
           md5(string_agg(word, ' ' ORDER BY idx)) AS chunk_md5
    FROM words GROUP BY doc_id, idx // {CHUNK_WORDS}
    """,
    doc="word-budget chunk grouping (reference: text_cleaner.py:147-160): "
    "running word count → floor(cum/budget) chunk key → reassemble; "
    "posexplode keeps order without a per-document sort at scale",
)
def chunk_word_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    words = t["documents_spread"].select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda w: F.length(w) > 0)
        ).alias("idx", "word"),
    )
    return (
        words.groupBy(
            "doc_id", (F.col("idx") / CHUNK_WORDS).cast("long").alias("chunk_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "word"))),
                        lambda s: s["word"],
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


SENT_BUDGET = 25  # words; small enough that real documents split


@register(
    "chunk_sentence_budget",
    f"""
    WITH RECURSIVE punct AS (
      -- the synthetic corpus has no sentence terminators; plant them
      -- deterministically (after table/row/value/key) so the greedy
      -- chunker actually flushes — mirrored exactly in the Spark plan
      SELECT doc_id,
             regexp_replace(text, ' (table|row|value|key) ', ' \\1. ', 'g') AS text
      FROM documents
    ),
    raw AS (
      SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*') AS sents
      FROM punct
    ),
    sent0 AS (
      SELECT doc_id, generate_subscripts(sents, 1) AS i0, unnest(sents) AS s
      FROM raw
    ),
    sents AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i0) AS i,
             array_to_string(w, ' ') AS sw,
             len(w) AS nw
      FROM (SELECT doc_id, i0,
                   list_filter(regexp_split_to_array(trim(s), '\\s+'),
                               x -> len(x) > 0) AS w
            FROM sent0)
      WHERE len(w) > 0
    ),
    walk AS (
      SELECT doc_id, i, 1 AS chunk_id, nw AS cnt FROM sents WHERE i = 1
      UNION ALL
      SELECT s.doc_id, s.i,
             CASE WHEN w.cnt + s.nw > {SENT_BUDGET} THEN w.chunk_id + 1
                  ELSE w.chunk_id END,
             CASE WHEN w.cnt + s.nw > {SENT_BUDGET} THEN s.nw
                  ELSE w.cnt + s.nw END
      FROM walk w JOIN sents s ON s.doc_id = w.doc_id AND s.i = w.i + 1
    )
    SELECT w.doc_id,
           CAST(w.chunk_id - 1 AS INT) AS chunk_index,
           string_agg(s.sw, ' ' ORDER BY s.i) AS chunk_text,
           CAST(len(string_split(string_agg(s.sw, ' ' ORDER BY s.i), ' '))
                AS INT) AS n_words
    FROM walk w JOIN sents s ON s.doc_id = w.doc_id AND s.i = w.i
    GROUP BY w.doc_id, w.chunk_id
    """,
    doc="sentence-aware word-budget chunking (reference: "
    "text_cleaner.py:136-160): greedy reset — flush when the next sentence "
    "would exceed the budget — via a pandas UDF (the one chunker needing "
    "sequential state; punkt seam documented); the oracle walks the same "
    "greedy recurrence with a recursive CTE",
)
def chunk_sentence_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.functions.chunking import explode_sentence_chunks

    t = load_tables(spark, sf_dir)
    punct = t["documents_spread"].select(
        "doc_id",
        F.regexp_replace("text", " (table|row|value|key) ", " $1. ").alias("text"),
    )
    return explode_sentence_chunks(punct, "text", ["doc_id"], chunk_size=SENT_BUDGET)


@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact percentile/median aggregation (linear interpolation — "
    "Spark `percentile` ≡ DuckDB quantile_cont); a category the "
    "reference lacks entirely (SURVEY §2.4)",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # both price percentiles from ONE percentile(col, array(...)) agg:
    # two scalar calls each build an independent value->count buffer of
    # the near-distinct price column per partition (and shuffle both);
    # the array form shares one buffer, same interpolation arithmetic
    # (measured ~2x faster at sf0.1, results exactly equal)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
            F.expr("percentile(l_extendedprice, array(0.25, 0.9))").alias("__pp"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .select(
            "l_returnflag",
            "med_qty",
            F.round(F.element_at("__pp", 1), 4).alias("p25_price"),
            F.round(F.element_at("__pp", 2), 4).alias("p90_price"),
            "avg_disc",
        )
    )


@register(
    "multimodal_pdf_images",
    None,  # PDF bytes built in a pandas kernel — no SQL twin; the
    # in-plan extract_ok column is an exact byte-identity gate and
    # tests pin it all-true plus real pixel statistics
    doc="embedded-figure extraction from PDFs (the image half of the "
    "reference's PyMuPDF surface, parse_pdfs.py — page.get_images is "
    "the library analog): documents become genuine PDFs whose page 1 "
    "embeds 1-2 image XObjects ROTATING the encoding per figure — "
    "/DCTDecode (REAL JPEGs from sources/jpeg.encode_jpeg, recovered "
    "byte-identical), /FlateDecode raw RGB samples, /LZWDecode raw "
    "gray samples, and /CCITTFaxDecode Group 4 1-bit scans (sources/"
    "ccitt.py, r7 — all non-DCT kinds re-emitted as P6 PPM; every "
    "raw-sample and fax branch of decode_pdf_images now exercised "
    "distributed), drawn with cm/Do operators.  sources/pdf."
    "decode_pdf_images recovers each in a second Arrow-batched stage "
    "and decode_image_any computes real pixel statistics — the "
    "figure-mining step of a multimodal training pipeline over paper "
    "corpora.  extract_ok compares against the content-addressed "
    "expected bytes recomputed from media_id, so the gate rides the "
    "plan with zero joins.  Scale shape: two mapInPandas over the "
    "documents scan — no shuffle, payloads never leave the executors",
)
def multimodal_pdf_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.jpeg import encode_jpeg
    from knowledge_model_spark.sources.multimodal import decode_image_any
    from knowledge_model_spark.sources.pdf import (
        decode_pdf_images,
        encode_simple_pdf,
        make_reference_shaped_pages,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text").filter(F.col("doc_id") < 48)

    def _figure(did: int, k: int) -> np.ndarray:
        # content-addressed synthetic figure: both stages regenerate it
        # from (doc_id, k) alone, so the byte-identity gate needs no join
        h = 16 + 8 * ((did + k) % 3)
        w = 24 + 8 * (k % 2)
        yy, xx = np.mgrid[0:h, 0:w]
        a, b, c = 3 + did % 7, 2 + k * 5, (did * 31 + k * 17) % 256
        return np.stack(
            [
                (xx * a + c) % 256,
                (yy * b + c) % 256,
                ((xx + yy) * (a + b)) % 256,
            ],
            axis=2,
        ).astype(np.uint8)

    _KINDS = ("dct", "flate", "lzw-gray", "g4")

    def _entry(did: int, k: int):
        """Figure k of doc did as an encode_simple_pdf image entry,
        rotating the XObject encoding: /DCTDecode JPEG, /FlateDecode
        raw RGB, /LZWDecode raw gray, /CCITTFaxDecode Group 4 1-bit
        (r7) — content-addressed on (did, k)."""
        kind = _KINDS[(did + k) % 4]
        fig = _figure(did, k)
        if kind == "dct":
            return encode_jpeg(fig, 90)
        if kind == "flate":
            return ("flate", fig)
        if kind == "lzw-gray":
            return ("lzw-gray", fig[:, :, 0])
        return ("g4", fig[:, :, 0] >= 128)  # threshold → 1-bit scan

    def _expected(did: int, k: int) -> bytes:
        """The exact payload decode_pdf_images must re-emit for figure
        (did, k): the JPEG bytes for DCT, P6 PPM otherwise."""
        kind = _KINDS[(did + k) % 4]
        fig = _figure(did, k)
        h, w = fig.shape[:2]
        if kind == "dct":
            return encode_jpeg(fig, 90)
        if kind == "flate":
            return b"P6\n%d %d\n255\n" % (w, h) + fig.tobytes()
        if kind == "lzw-gray":
            gray = np.repeat(fig[:, :, :1], 3, axis=2)
            return b"P6\n%d %d\n255\n" % (w, h) + gray.tobytes()
        luma = np.where(fig[:, :, 0] >= 128, 0, 255).astype(np.uint8)
        return b"P6\n%d %d\n255\n" % (w, h) + np.repeat(luma, 3).tobytes()

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_simple_pdf(
                            make_reference_shaped_pages(txt),
                            images=[
                                _entry(int(did), k)
                                for k in range(1 + int(did) % 2)
                            ],
                        )
                        for did, txt in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "image_index": [], "width": [],
                "height": [], "n_bytes": [], "extract_ok": [],
                "mean_luma": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                imgs = decode_pdf_images(bytes(payload)) or []
                expected = [
                    _expected(int(mid), k) for k in range(1 + int(mid) % 2)
                ]
                for k, blob in enumerate(imgs):
                    px = decode_image_any(blob)
                    ok = (
                        k < len(expected)
                        and blob == expected[k]
                        and px is not None
                    )
                    rows["media_id"].append(int(mid))
                    rows["image_index"].append(k)
                    rows["width"].append(0 if px is None else px.shape[1])
                    rows["height"].append(0 if px is None else px.shape[0])
                    rows["n_bytes"].append(len(blob))
                    rows["extract_ok"].append(bool(ok))
                    rows["mean_luma"].append(
                        0.0 if px is None
                        else round(float(px.astype(np.float64).mean()), 4)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "image_index": pd.Series(rows["image_index"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_bytes": pd.Series(rows["n_bytes"], dtype="int64"),
                    "extract_ok": pd.Series(rows["extract_ok"], dtype="bool"),
                    "mean_luma": pd.Series(rows["mean_luma"], dtype="float64"),
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return media.mapInPandas(
        extract,
        "media_id long, image_index int, width int, height int, "
        "n_bytes long, extract_ok boolean, mean_luma double",
    )


@register(
    "agg_percentiles_kll",
    None,  # sketch-approximate by design — every returned quantile's
    # TRUE rank among the exact column values is gated within the
    # published KLL(2048) rank-error bound vs the exact agg_percentiles
    # in tests/test_sketches.py at sf0.01 AND sf0.1
    doc="the 100 TB path for agg_percentiles made driver-visible (r5 "
    "verdict item 3 — the last exact-percentile plan without a sketch "
    "twin): med_qty/p25_price/p90_price come from TWO map-side-"
    "combinable KLL(2048) sketches (one per value column) inside ONE "
    "grouped aggregate (operators/sketches.kll_group_multi_quantiles) "
    "instead of exact percentile() whose ObjectHashAggregate buffers "
    "hold every l_quantity AND l_extendedprice value per returnflag in "
    "executor memory; avg_disc stays EXACT (bounded-state avg riding "
    "the same groupBy — the query remains one scan, one shuffle).  "
    "Returned quantiles are true stream items with rank within "
    "~1.65/√k of the target; same run-determinism boundary as the "
    "other KLL twins (compaction coin-flips beyond ~k buffered items), "
    "so the bound test, not value equality, is the contract",
)
def agg_percentiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.sketches import (
        kll_group_multi_quantiles,
    )

    t = load_tables(spark, sf_dir)
    return kll_group_multi_quantiles(
        t["lineitem"],
        ["l_returnflag"],
        [
            ("l_quantity", 0.5, "med_qty"),
            ("l_extendedprice", 0.25, "p25_price"),
            ("l_extendedprice", 0.9, "p90_price"),
        ],
        extra_aggs=[F.round(F.avg("l_discount"), 6).alias("avg_disc")],
    )


@register(
    "unpivot_flag_metrics",
    """
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(avg(l_discount), 6) AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM agg
    """,
    doc="wide→long unpivot via stack() (melt); no reference analog "
    "(SURVEY §2.7 set-op/reshape gap)",
)
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return agg.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, "
            "'avg_disc', avg_disc) AS (metric, value)"
        ),
    )


@register(
    "subquery_scalar_above_avg",
    """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part)
    """,
    doc="uncorrelated scalar subquery in a predicate — Catalyst plans the "
    "inner agg as a one-row broadcast (SURVEY §4: subquery handling is "
    "free in Spark, absent in the reference)",
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)  # registers temp views
    return spark.sql(
        "SELECT p_partkey, p_retailprice FROM part "
        "WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part)"
    )


@register(
    "map_event_type_shares",
    """
    SELECT user_id,
           CAST(coalesce(n_click, 0) AS BIGINT) AS n_click,
           CAST(coalesce(n_purchase, 0) AS BIGINT) AS n_purchase,
           CAST(total AS BIGINT) AS total
    FROM (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS n_click,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             count(*) AS total
      FROM events GROUP BY user_id
    )
    """,
    doc="map construction + lookup (map_from_entries / element_at — the "
    "reference's idtype→value dict pivot, fetch_pubmed.py:368-377): "
    "per-user event-type map, probed for specific keys",
)
def map_event_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_type = t["events"].groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).cast("long").alias("n_click"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0))
        .cast("long")
        .alias("n_purchase"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x)
        .cast("long")
        .alias("total"),
    )


@register(
    "multimodal_image_features",
    None,  # sha256-derived stub features — no SQL equivalent; rows-only
    doc="multimodal plumbing: binary payload column → Arrow-batched "
    "mapInPandas feature extraction (decode stubbed deterministically; "
    "schema/batching/partitioning are the real 100 TB shape)",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.sources.multimodal import (
        image_features,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, n=256, kind="image")
    feats = image_features(media, decode="DETERMINISTIC")
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


@register(
    "multimodal_image_codec_matrix",
    None,  # binary payloads built in a pandas kernel — no SQL twin;
    # the in-plan lossless_ok/psnr columns are exact gates, all-true /
    # threshold-pinned in tests
    doc="one image, every REAL in-container codec, one distributed "
    "plan: each media row renders a content-addressed synthetic image, "
    "encodes it as P6 PPM, strip TIFF (none / LZW / PackBits — r6 "
    "codec, shared early-change LZW core), Sun Raster (standard + "
    "byte-RLE), SGI (verbatim + RLE — both r6, external-file-"
    "anchored), JPEG(q90), and (r8) the three CCITT fax TIFF "
    "shapes — G4, multi-strip 2-D G3, inverted-photometric MH — over "
    "the thresholded bilevel page, and a second "
    "Arrow-batched stage decodes each payload through the SAME "
    "decode_image_any dispatcher the ingest path uses, comparing "
    "against the expected pixels regenerated from media_id (zero "
    "joins).  lossless_ok must be exact for PPM/TIFF; JPEG is gated by "
    "PSNR.  The cross-codec identity is the property a real mixed-"
    "format corpus scan depends on; scale shape: two mapInPandas over "
    "a range scan, zero shuffle",
)
def multimodal_image_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.jpeg import encode_jpeg
    from knowledge_model_spark.sources.multimodal import (
        decode_image_any,
        encode_bilevel_tiff,
        encode_simple_ras,
        encode_simple_sgi,
        encode_simple_tiff,
    )

    load_tables(spark, sf_dir)

    def _img(mid: int) -> "np.ndarray":
        h = 24 + 8 * (mid % 3)
        w = 32 + 8 * (mid % 2)
        yy, xx = np.mgrid[0:h, 0:w]
        a, c = 2 + mid % 5, (mid * 37) % 256
        return np.stack(
            [(xx * a + c) % 256, (yy * (a + 1) + c) % 256, ((xx + yy) * a) % 256],
            axis=2,
        ).astype(np.uint8)

    def _ppm(img: "np.ndarray") -> bytes:
        h, w = img.shape[:2]
        return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()

    def _bilevel(img: "np.ndarray") -> "np.ndarray":
        # integer threshold on the channel sum: deterministic, content-
        # addressed bilevel twin of the RGB test image (fax codecs are
        # 1-bit; their expected reconstruction is the thresholded page)
        return (img.astype(np.uint32).sum(axis=2) // 3) > 127

    def _bilevel_rgb(img: "np.ndarray") -> "np.ndarray":
        g = np.where(_bilevel(img), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "codec": [], "payload": []}
            for mid in pdf["id"]:
                img = _img(int(mid))
                for codec, payload in (
                    ("ppm", _ppm(img)),
                    ("tiff_none", encode_simple_tiff(img, "none")),
                    ("tiff_lzw", encode_simple_tiff(img, "lzw", 2, 11)),
                    ("tiff_packbits", encode_simple_tiff(img, "packbits")),
                    ("ras", encode_simple_ras(img)),
                    ("ras_rle", encode_simple_ras(img, rle=True)),
                    ("sgi", encode_simple_sgi(img, rle=False)),
                    ("sgi_rle", encode_simple_sgi(img, rle=True)),
                    ("jpeg", encode_jpeg(img, 90)),
                    # r8: CCITT fax TIFFs (r7 verdict item 4) — the
                    # bilevel page thresholded from the same image;
                    # multi-strip 2-D G3 and inverted-sense MH exercise
                    # the strip restart and PhotometricInterpretation
                    # paths
                    ("ccitt_g4", encode_bilevel_tiff(_bilevel(img), "g4")),
                    ("ccitt_g3_2d", encode_bilevel_tiff(
                        _bilevel(img), "g3_2d", rows_per_strip=7)),
                    ("ccitt_mh", encode_bilevel_tiff(
                        _bilevel(img), "mh", photometric=1)),
                ):
                    rows["media_id"].append(int(mid))
                    rows["codec"].append(codec)
                    rows["payload"].append(payload)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "codec": rows["codec"],
                    "payload": rows["payload"],
                }
            )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "codec": [], "width": [], "height": [],
                "lossless_ok": [], "psnr": [],
            }
            for mid, codec, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                want = _img(int(mid))
                if str(codec).startswith("ccitt_"):
                    want = _bilevel_rgb(want)
                got = decode_image_any(bytes(payload))
                ok = got is not None and got.shape == want.shape
                exact = bool(ok and (got == want).all())
                if ok:
                    mse = float(
                        np.mean((got.astype(np.float64) - want) ** 2)
                    )
                    psnr = 99.0 if mse == 0 else min(
                        99.0, 10 * np.log10(255.0**2 / mse)
                    )
                else:
                    psnr = 0.0
                out["media_id"].append(int(mid))
                out["codec"].append(str(codec))
                out["width"].append(0 if got is None else got.shape[1])
                out["height"].append(0 if got is None else got.shape[0])
                out["lossless_ok"].append(exact)
                out["psnr"].append(round(psnr, 2))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "codec": out["codec"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "lossless_ok": pd.Series(out["lossless_ok"], dtype="bool"),
                    "psnr": pd.Series(out["psnr"], dtype="float64"),
                }
            )

    media = spark.range(64).mapInPandas(build, "media_id long, codec string, payload binary")
    return media.mapInPandas(
        check,
        "media_id long, codec string, width int, height int, "
        "lossless_ok boolean, psnr double",
    )


@register(
    "multimodal_audio_codec_matrix",
    None,  # binary payloads built in a pandas kernel — no SQL twin;
    # the in-plan lossless_ok column is an exact gate, all-true-pinned
    doc="one recording, every REAL in-container audio container, one "
    "distributed plan (the audio sibling of multimodal_image_codec_"
    "matrix): each media row synthesizes a content-addressed PCM-16 "
    "waveform, stores it as RIFF WAV (PCM-16 and IEEE float32), AIFF, "
    "AIFF-C 'sowt' (little-endian), Sun .au (16- and 24-bit — r6 "
    "decoders, externally anchored against the stdlib's pluck files), "
    "and — r11 — FLAC (sources/flac.py: real Rice-coded frames, "
    "rotated FIXED/VERBATIM/LPC subframes, STREAMINFO MD5 verified on "
    "decode), "
    "and a second Arrow-batched stage decodes each through the SAME "
    "decode_audio_any dispatcher and demands BIT-IDENTICAL float "
    "output — all seven containers hold the same samples losslessly.  "
    "Scale shape: two mapInPandas over a range scan, zero shuffle",
)
def multimodal_audio_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.flac import encode_flac
    from knowledge_model_spark.sources.multimodal import (
        decode_audio_any,
        encode_simple_aiff,
        encode_simple_au,
    )

    load_tables(spark, sf_dir)

    def _pcm(mid: int) -> tuple["np.ndarray", int]:
        n = 800 + 16 * (mid % 5)
        rate = 8000 + 1000 * (mid % 3)
        f = 100.0 + 13.0 * (mid % 40)
        t = np.arange(n, dtype=np.float64) / rate
        return (np.sin(2 * np.pi * f * t) * 12000).astype(np.int16), rate

    def _wav(pcm: "np.ndarray", rate: int, f32: bool) -> bytes:
        if f32:
            data = (pcm.astype(np.float32) / 32768.0).astype("<f4").tobytes()
            fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
        else:
            data = pcm.astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "codec": [], "payload": []}
            for mid in pdf["id"]:
                pcm, rate = _pcm(int(mid))
                for codec, payload in (
                    ("wav_pcm16", _wav(pcm, rate, False)),
                    ("wav_f32", _wav(pcm, rate, True)),
                    ("aiff", encode_simple_aiff(pcm, rate)),
                    ("aiff_sowt", encode_simple_aiff(pcm, rate, sowt=True)),
                    ("au16", encode_simple_au(pcm, rate, 16)),
                    ("au24", encode_simple_au(pcm.astype(np.int64) << 8, rate, 24)),
                    ("flac", encode_flac(pcm, rate, blocksize=256)),
                ):
                    rows["media_id"].append(int(mid))
                    rows["codec"].append(codec)
                    rows["payload"].append(payload)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "codec": rows["codec"],
                    "payload": rows["payload"],
                }
            )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "codec": [], "n_samples": [], "rate": [],
                "lossless_ok": [],
            }
            for mid, codec, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                pcm, rate = _pcm(int(mid))
                want = pcm.astype(np.float32) / 32768.0
                got = decode_audio_any(bytes(payload))
                ok = (
                    got is not None
                    and got[1] == rate
                    and len(got[0]) == len(want)
                    and bool(np.array_equal(got[0], want))
                )
                out["media_id"].append(int(mid))
                out["codec"].append(str(codec))
                out["n_samples"].append(0 if got is None else len(got[0]))
                out["rate"].append(0 if got is None else int(got[1]))
                out["lossless_ok"].append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "codec": out["codec"],
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "rate": pd.Series(out["rate"], dtype="int32"),
                    "lossless_ok": pd.Series(out["lossless_ok"], dtype="bool"),
                }
            )

    media = spark.range(48).mapInPandas(
        build, "media_id long, codec string, payload binary"
    )
    return media.mapInPandas(
        check,
        "media_id long, codec string, n_samples long, rate int, "
        "lossless_ok boolean",
    )


@register(
    "multimodal_pdf_text",
    None,  # the PDF bytes are built in a pandas kernel — no SQL twin;
    # the in-plan round-trip equality column is the exact gate, and
    # tests pin the extractor on hand-authored fixtures
    doc="REAL distributed PDF→text (reference parse_pdfs.py:57-88 runs "
    "PyMuPDF get_text single-process over rglob('*.pdf')): documents "
    "become genuine PDFs in one pandas kernel (sources/pdf."
    "encode_simple_pdf — real xref/objects; the stream filter rotates "
    "FlateDecode / LZWDecode / uncompressed / PNG-predictor-12 Flate / "
    "TIFF-predictor-2 LZW per doc so every in-container decode path "
    "including /DecodeParms predictor inversion is round-trip-gated), "
    "then "
    "sources/pdf.pdf_text_extract runs genuine content extraction "
    "(stdlib-zlib inflate + BT/ET Tj/TJ text assembly) in a second "
    "Arrow-batched stage; roundtrip_ok proves extracted == source for "
    "every document END TO END on the executors.  This is the codec "
    "seam CLOSED for the dominant real-world PDF encoding; "
    "scanned/DCT PDFs remain the PyMuPDF seam.  Scale shape: both "
    "stages are mapInPandas over the documents scan — no shuffle, no "
    "driver bytes, payloads never leave the executors",
)
def multimodal_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from knowledge_model_spark.sources.pdf import (
        encode_simple_pdf,
        pdf_text_extract,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text").filter(F.col("doc_id") < 200)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                words = (txt or "").split(" ")
                pages = [
                    " ".join(words[i : i + 40]) for i in range(0, len(words), 40)
                ] or [""]
                # rotate the stream filter per doc so the round-trip
                # gate covers every in-container decode path:
                # FlateDecode, /LZWDecode (early-change LZW, r6), raw,
                # and the /DecodeParms predictor forms (r7 — PNG
                # predictor 12 over Flate, TIFF predictor 2 over LZW)
                comp: bool | str = (
                    True, "lzw", False, "flate-pred12", "lzw-pred2"
                )[int(did) % 5]
                payloads.append(encode_simple_pdf(pages, compress=comp))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    out = pdf_text_extract(media, decode="REAL").withColumnRenamed(
        "text", "extracted"
    )
    # out derives FROM docs, so rename both sides before the self-join
    # (Spark's ambiguous-self-join check). Page-joins turn the page
    # breaks we inserted (and any source newlines) into \n; normalizing
    # BOTH sides to spaces makes the equality exact iff extraction was
    # lossless.
    src = docs.select(
        F.col("doc_id").alias("src_id"), F.col("text").alias("src_text")
    )
    return out.join(src, F.col("media_id") == F.col("src_id")).select(
        "media_id",
        "n_pages",
        "n_chars",
        (
            F.translate(F.col("extracted"), "\n", " ")
            == F.translate(F.col("src_text"), "\n", " ")
        ).alias("roundtrip_ok"),
    )


@register(
    "multimodal_audio_features",
    None,  # int8-waveform stub over payload bytes — rows-only
    doc="multimodal audio: 1-to-N windowed waveform features (RMS, "
    "zero-crossings) via mapInPandas; librosa/ffmpeg decode seam stubbed, "
    "window explosion + numeric kernels real",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.sources.multimodal import (
        audio_features,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, n=128, kind="audio")
    wins = audio_features(media, window_ms=500, decode="DETERMINISTIC")
    return wins.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.sum("zero_crossings").cast("long").alias("total_zc"),
    )


@register(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT id AS media_id,
             (id % 7) * 1000 + 3000 AS duration_ms,
             64 AS plen
      FROM range(128) r(id)
    ),
    f AS (
      SELECT media_id, plen,
             greatest(1, duration_ms // 1000) AS n_frames,
             greatest(1, plen // greatest(1, duration_ms // 1000)) AS step
      FROM m
    ),
    fr AS (
      SELECT media_id,
             least(plen, (i + 1) * step) - least(plen, i * step) AS nb
      FROM f, unnest(range(0, n_frames)) t(i)
    )
    SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(nb) AS BIGINT) AS total_bytes
    FROM fr GROUP BY media_id
    """,
    doc="multimodal 1-to-N frame sampling via mapInPandas (ffmpeg seam "
    "stubbed; row explosion + batch shapes are real).  Oracled since "
    "r8: the DETERMINISTIC payload slicing is pure integer arithmetic "
    "over the content-addressed 64-byte payload (duration → frame "
    "count → clamped byte slices), so the kernel's fan-out and slice "
    "geometry are DuckDB-checked end to end from range(128)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.sources.multimodal import (
        make_synthetic_media,
        sample_frames,
    )

    media = make_synthetic_media(spark, n=128, kind="video")
    frames = sample_frames(media, every_ms=1000, decode="DETERMINISTIC")
    return frames.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum(F.length("frame_payload")).cast("long").alias("total_bytes"),
    )


@register(
    "multimodal_pdf_passages",
    None,  # PDF bytes built in a pandas kernel — no SQL twin; the
    # pipeline is deterministic end to end and the extraction stage is
    # round-trip-gated by multimodal_pdf_text
    doc="the reference's ENTIRE parse_pdf dataflow as one distributed "
    "plan (parse_pdfs.py:57-88: PyMuPDF get_text per page → "
    "_strip_page_artifacts → strip_boiler → split_passages(300, 50) → "
    "enumerated passage dicts): documents become genuine FlateDecode "
    "PDFs, sources/pdf.pdf_text_extract runs REAL content extraction, "
    "then the SAME cleaning battery every text source uses "
    "(strip_page_furniture, hyphen rejoin, clean_text — UDF-free "
    "column expressions) and the posexplode char-window splitter "
    "produce (media_id, chunk_index, char offsets, passage).  Scale "
    "shape: two mapInPandas stages + scan-speed column ops + one "
    "posexplode — no shuffle anywhere; a user of the reference "
    "switching to this engine runs their PDF corpus through this "
    "exact query",
)
def multimodal_pdf_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from knowledge_model_spark.functions.chunking import explode_passages
    from knowledge_model_spark.functions.text_cleaning import (
        clean_text,
        rejoin_hyphen_linebreaks,
        strip_page_furniture,
    )
    from knowledge_model_spark.sources.pdf import (
        encode_simple_pdf,
        make_reference_shaped_pages,
        pdf_text_extract,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text").filter(F.col("doc_id") < 100)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                # reference-shaped pages: Page-N-of-M headers, copyright
                # footers, bare page-number lines, hyphen linebreaks —
                # so strip_page_furniture + rejoin_hyphen_linebreaks do
                # real work INSIDE this query (r5 verdict item 8); the
                # noise is invertible, pinned by the noisy-vs-clean
                # equality test in tests/test_sources.py
                encode_simple_pdf(make_reference_shaped_pages(txt))
                for txt in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    extracted = pdf_text_extract(media, decode="REAL")
    body = extracted.select(
        "media_id",
        clean_text(
            rejoin_hyphen_linebreaks(strip_page_furniture(F.col("text")))
        ).alias("body"),
    )
    out = explode_passages(body, "body", ["media_id"], size=300, overlap=50)
    return out.select(
        "media_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("char_start").cast("long").alias("char_start"),
        F.length("chunk_text").cast("long").alias("n_chars"),
        F.crc32(F.col("chunk_text")).alias("chunk_crc"),
    )


@register(
    "multimodal_video_pipeline",
    None,  # binary mux/demux in pandas kernels — no SQL twin; frame
    # counts and feature values are deterministic (content-addressed
    # RNG per media_id), and the pixel gate is asserted in-plan
    doc="REAL video→frames→features composition, all three codec hops "
    "in one distributed plan: deterministic frames are muxed into a "
    "genuine AVI per media row (sources/multimodal.encode_simple_avi "
    "— even media_id uncompressed DIB, odd media_id MOTION JPEG, the "
    "r8 composition of the existing demux with sources/jpeg.py), "
    "demuxed by sample_frames REAL (real RIFF parse; sampled frames "
    "re-emitted as PPM), featurized by image_features REAL (real "
    "pixel statistics), and pixel-GATED in-plan: each sampled frame "
    "is compared against its content-addressed source — DIB must be "
    "bit-exact (psnr 99), MJPEG ≥ 25 dB on the worst-case random-"
    "noise frames (measured 29.7 at q90).  The full video branch of "
    "a multimodal training pipeline, executor-side end to end; at "
    "100 TB only the codec kernels swap for ffmpeg — the plan shape "
    "(chained mapInPandas over a scan, demux checkpointed once, a "
    "32-row broadcast join of the two per-video aggregates) is "
    "already the production shape",
)
def multimodal_video_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from knowledge_model_spark.sources.multimodal import (
        encode_simple_avi,
        image_features,
        sample_avi_frames_real,
    )

    base = spark.range(32).select(F.col("id").alias("media_id"))

    def _frames(mid: int):
        import numpy as np

        rng = np.random.RandomState(int(mid))
        return [rng.randint(0, 256, (8, 8, 3), np.uint8) for _ in range(4)]

    # mux AND demux fused into ONE Python stage (r11): the AVI container
    # bytes — the heavy opaque column — are produced and consumed inside
    # the same task, so they never cross the JVM↔Python boundary or get
    # Arrow-serialized at all; one worker round trip instead of two.
    # The codec hops are unchanged and REAL (encode_simple_avi →
    # decode_avi_frames → PPM via the shared sample_avi_frames_real,
    # the exact kernel sample_frames(decode="REAL") runs).
    def mux_demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_index": [],
                "frame_ts_ms": [],
                "frame_payload": [],
            }
            for mid in pdf["media_id"]:
                codec = "dib" if int(mid) % 2 == 0 else "mjpg"
                payload = encode_simple_avi(
                    _frames(int(mid)), fps=2.0, codec=codec
                )  # 2 s
                for i, ts, ppm in sample_avi_frames_real(payload, every_ms=500):
                    out["media_id"].append(int(mid))
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame_payload"].append(ppm)
            yield pd.DataFrame(out)

    # two consumers (featurize + pixel gate): demux once
    frames = base.mapInPandas(
        mux_demux,
        "media_id long, frame_index int, frame_ts_ms long, frame_payload binary",
    ).localCheckpoint(eager=True)
    per_frame = frames.select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("media_id"),
        F.col("frame_payload").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
    )
    feats = image_features(per_frame, decode="REAL")
    per_video = (
        feats.withColumn("video_id", F.floor(F.col("media_id") / 100))
        .groupBy("video_id")
        .agg(
            F.count("*").cast("long").alias("n_frames"),
            F.round(F.avg(F.element_at("features", 7)), 6).alias("avg_luma"),
        )
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from knowledge_model_spark.sources.multimodal import decode_ppm

        for pdf in batches:
            vids, psnrs = [], []
            for mid, fi, payload in zip(
                pdf["media_id"], pdf["frame_index"], pdf["frame_payload"]
            ):
                got = decode_ppm(bytes(payload))
                want = _frames(int(mid))[min(3, int(fi))]
                if got is None or got.shape != want.shape:
                    psnr = 0.0
                else:
                    mse = float(
                        np.mean((got.astype(np.float64) - want) ** 2)
                    )
                    psnr = 99.0 if mse == 0 else min(
                        99.0, 10 * np.log10(255.0**2 / mse)
                    )
                vids.append(int(mid))
                psnrs.append(round(psnr, 2))
            yield pd.DataFrame(
                {
                    "video_id": pd.Series(vids, dtype="int64"),
                    "psnr": pd.Series(psnrs, dtype="float64"),
                }
            )

    gates = (
        frames.select("media_id", "frame_index", "frame_payload")
        .mapInPandas(gate, "video_id long, psnr double")
        .groupBy("video_id")
        .agg(F.min("psnr").alias("min_psnr"))
    )
    codec = F.when(F.col("video_id") % 2 == 0, F.lit("dib")).otherwise(
        F.lit("mjpg")
    )
    return (
        per_video.join(F.broadcast(gates), "video_id")
        .select(
            "video_id",
            codec.alias("codec"),
            "n_frames",
            "avg_luma",
            "min_psnr",
            (
                ((F.col("video_id") % 2 == 0) & (F.col("min_psnr") == 99.0))
                | ((F.col("video_id") % 2 == 1) & (F.col("min_psnr") >= 25.0))
            ).alias("pixel_gate_ok"),
        )
    )


@register(
    "multimodal_phash_dedup",
    """
    WITH media AS (
      SELECT id AS media_id,
             sha256(CAST(id % 32 AS VARCHAR)) AS payload_hex
      FROM range(64) r(id)
    ),
    sigs AS (
      SELECT media_id AS id,
             CAST(CAST(('0x' || substr(sha256(payload_hex), 1, 16)) AS UBIGINT)
                  & CAST(9223372036854775807 AS UBIGINT) AS BIGINT) AS simhash
      FROM media
    ),
    blocks AS (
      SELECT id, simhash, t AS blk, (simhash >> (16 * t)) & 65535 AS blkval
      FROM sigs, range(4) r(t)
    ),
    bsz AS (SELECT blk, blkval, count(*) AS n FROM blocks GROUP BY 1, 2),
    okb AS (
      SELECT blocks.* FROM blocks JOIN bsz USING (blk, blkval)
      WHERE bsz.n BETWEEN 2 AND 1000
    ),
    cand AS (
      SELECT DISTINCT x.id AS id_a, x.simhash AS sa, y.id AS id_b, y.simhash AS sb
      FROM okb x JOIN okb y USING (blk, blkval) WHERE x.id < y.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS distance
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
    doc="image dedup by perceptual hash: binary payloads → 63-bit "
    "signature (mapInPandas kernel; REAL aHash for numpy-decodable "
    "formats, sha256-derived otherwise) → the SAME 4x16-bit block-banded "
    "Hamming pair machinery as text SimHash; synthetic input plants "
    "payload twins (media_id mod 32) so exact dups surface at distance 0. "
    "Oracled since r8 (r7 verdict item 7): the DETERMINISTIC signature "
    "is pure sha256 arithmetic (Spark sha2 hex → utf8 bytes → sha256 → "
    "top-63-bit mask) and the banding is hash-free bit-slicing, so the "
    "whole sketch→band→bucket→verify pipeline is DuckDB-expressible "
    "from range(64) — no Spark-side change, the kernel was already "
    "content-addressed; the REAL-aHash path stays pytest-gated "
    "(tests/test_multimodal.py)",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.operators.dedup import hash64_hamming_pairs
    from knowledge_model_spark.sources.multimodal import (
        make_synthetic_media,
        perceptual_hash,
    )

    media = make_synthetic_media(spark, n=64).withColumn(
        "payload", F.sha2(F.pmod("media_id", F.lit(32)).cast("string"), 256).cast("binary")
    )
    sigs = perceptual_hash(media, decode="DETERMINISTIC")
    return hash64_hamming_pairs(sigs, max_distance=3).orderBy("id_a", "id_b")


# ------------------------------------------- landing-page PDF link scrape

from knowledge_model_spark.functions.html import (  # noqa: E402
    oracle_sql_anchors,
    oracle_sql_first_pdf_link,
)

_PAGE_SQL = """
    SELECT doc_id,
           '<html><body><p>Article ' || CAST(doc_id AS VARCHAR) || '</p>' ||
           CASE WHEN doc_id % 4 = 0 THEN
                  '<a href="/files/' || CAST(doc_id AS VARCHAR)
                    || '.pdf">download</a>'
                WHEN doc_id % 4 = 1 THEN
                  '<a href="https://pub.example.org/view/'
                    || CAST(doc_id AS VARCHAR) || '">Get PDF here</a>'
                WHEN doc_id % 4 = 2 THEN
                  '<a href="https://pub.example.org/about">About</a>'
                ELSE
                  '<a href="https://pub.example.org/home">home</a>'
                    || '<a href="https://cdn.example.org/'
                    || CAST(doc_id AS VARCHAR) || '.PDF">file</a>'
           END || '</body></html>' AS html
    FROM documents
"""


@register(
    "text_pdf_link_extract",
    f"""
    WITH pages AS ({_PAGE_SQL})
    SELECT doc_id,
           CAST(len({oracle_sql_anchors('html')}) AS BIGINT) AS n_anchors,
           {oracle_sql_first_pdf_link('html')} AS pdf_link
    FROM pages
    """,
    doc="landing-page PDF-link scrape as a scan-speed column op "
    "(reference: knowledge_model/ingestion/download_pdf.py:83-105 — "
    "BeautifulSoup over all anchors, first whose text contains 'pdf' "
    "or href ends '.pdf', https: prefix for root-relative links): "
    "landing pages synthesized deterministically from doc_id cover "
    "href-match / text-match / no-match / second-anchor-uppercase "
    "cases; extraction is regexp_extract_all + array HOFs sharing "
    "patterns with the DuckDB twin (functions/html.py), zero Python, "
    "no shuffle before the final projection",
)
def text_pdf_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.functions.html import anchors, first_pdf_link

    t = load_tables(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    page = F.concat(
        F.lit('<html><body><p>Article '), did, F.lit("</p>"),
        F.when(
            m == 0,
            F.concat(F.lit('<a href="/files/'), did, F.lit('.pdf">download</a>')),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<a href="https://pub.example.org/view/'),
                did,
                F.lit('">Get PDF here</a>'),
            ),
        )
        .when(m == 2, F.lit('<a href="https://pub.example.org/about">About</a>'))
        .otherwise(
            F.concat(
                F.lit('<a href="https://pub.example.org/home">home</a>'),
                F.lit('<a href="https://cdn.example.org/'),
                did,
                F.lit('.PDF">file</a>'),
            )
        ),
        F.lit("</body></html>"),
    )
    return t["documents"].select(
        "doc_id",
        F.size(anchors(page)).cast("long").alias("n_anchors"),
        first_pdf_link(page).alias("pdf_link"),
    )


@register(
    "multimodal_audio_vad",
    None,  # binary-kernel output — rows-only; exact segment-boundary
    # gate on a synthesized REAL WAV in tests/test_sources.py
    doc="energy-based voice-activity segmentation (1-to-segments): "
    "contiguous active-frame runs per audio row with start/end ms and "
    "mean RMS — the speech-extraction step before transcription/"
    "feature caching (silence never reaches the model); mapInPandas "
    "kernel, REAL decode for PCM-16 WAV (exact boundaries pinned in "
    "tests), int8 stub keeps framing + run-length logic fully "
    "exercised in-container; fixed absolute threshold = deterministic "
    "across partitionings",
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from knowledge_model_spark.sources.multimodal import (
        audio_vad_segments,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, n=128, kind="audio")
    return audio_vad_segments(media, decode="DETERMINISTIC")


@register(
    "multimodal_image_resize",
    None,  # binary payloads built in a pandas kernel — no SQL twin;
    # the in-plan resize_ok column is an exact pixel-equality gate and
    # the resize kernels themselves are hand-pinned in tests (NN
    # integer-factor downscale == strided slice, bilinear constancy /
    # ramp preservation / identity)
    doc="the RESIZE stage of a multimodal preprocessing pipeline "
    "(thumbnails / model-input normalization — torchvision Resize is "
    "the library analog): content-addressed synthetic images encode "
    "through a rotating lossless codec (PPM / TIFF-LZW / Sun Raster "
    "RLE), then a second Arrow-batched stage REAL-decodes each payload "
    "(decode_image_any) and resizes to 48×64 with BOTH center-aligned "
    "nearest-neighbor and half-pixel bilinear (sources/multimodal."
    "resize_image, pure numpy).  resize_ok compares each output "
    "against the resize of the figure regenerated from media_id — the "
    "gate rides the plan with zero joins; mean-luma drift between "
    "input and output is bounded in tests (resampling preserves "
    "brightness).  Scale shape: two mapInPandas over a range scan, "
    "zero shuffle, payloads never leave the executors",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.multimodal import (
        decode_image_any,
        encode_simple_ras,
        encode_simple_tiff,
        resize_image,
    )

    load_tables(spark, sf_dir)
    out_h, out_w = 48, 64

    def _img(mid: int) -> "np.ndarray":
        h = 56 + 16 * (mid % 3)
        w = 72 + 24 * (mid % 2)
        yy, xx = np.mgrid[0:h, 0:w]
        a, c = 3 + mid % 4, (mid * 53) % 256
        return np.stack(
            [(xx * a + c) % 256, (yy * (a + 2) + c) % 256, ((xx * yy) // 7 + c) % 256],
            axis=2,
        ).astype(np.uint8)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "payload": []}
            for mid in pdf["id"]:
                img = _img(int(mid))
                h, w = img.shape[:2]
                enc = (
                    b"P6\n%d %d\n255\n" % (w, h) + img.tobytes(),
                    encode_simple_tiff(img, "lzw", 2, 16),
                    encode_simple_ras(img, rle=True),
                )[int(mid) % 3]
                rows["media_id"].append(int(mid))
                rows["payload"].append(enc)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "payload": rows["payload"],
                }
            )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "method": [], "width": [], "height": [],
                "out_bytes": [], "resize_ok": [], "mean_luma_out": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image_any(bytes(payload))
                want_src = _img(int(mid))
                for method in ("nearest", "bilinear"):
                    got = (
                        None if px is None
                        else resize_image(px, out_h, out_w, method)
                    )
                    want = resize_image(want_src, out_h, out_w, method)
                    ok = got is not None and bool((got == want).all())
                    out["media_id"].append(int(mid))
                    out["method"].append(method)
                    out["width"].append(0 if px is None else px.shape[1])
                    out["height"].append(0 if px is None else px.shape[0])
                    out["out_bytes"].append(
                        0 if got is None else int(got.nbytes)
                    )
                    out["resize_ok"].append(ok)
                    out["mean_luma_out"].append(
                        0.0 if got is None
                        else round(float(got.astype(np.float64).mean()), 4)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "method": out["method"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "out_bytes": pd.Series(out["out_bytes"], dtype="int64"),
                    "resize_ok": pd.Series(out["resize_ok"], dtype="bool"),
                    "mean_luma_out": pd.Series(
                        out["mean_luma_out"], dtype="float64"
                    ),
                }
            )

    media = spark.range(64).mapInPandas(build, "media_id long, payload binary")
    return media.mapInPandas(
        check,
        "media_id long, method string, width int, height int, "
        "out_bytes long, resize_ok boolean, mean_luma_out double",
    )


@register(
    "multimodal_exif_extract",
    None,  # binary payloads built in a pandas kernel — no SQL twin;
    # the in-plan exif_ok column is an exact gate, all-true-pinned
    doc="EXIF metadata extraction from JPEG binaries WITHOUT decoding "
    "pixels — the metadata-conditioned filter/sample stage of an image "
    "corpus pipeline (orientation normalization, capture-time splits, "
    "camera-model dedup keys).  Each media row builds a content-"
    "addressed JPEG and injects an APP1 'Exif' TIFF block (IFD0: make/"
    "model/orientation/datetime; Exif sub-IFD via tag 34665: iso/"
    "exposure RATIONAL/pixel dims) with the byte order alternating "
    "II/MM per row plus a no-APP1 control row; a second Arrow-batched "
    "stage re-parses every payload through sources/multimodal.py::"
    "parse_exif and exif_ok compares each extracted field against the "
    "expected values regenerated from media_id (zero joins, zero "
    "shuffle — metadata scan cost is header-bounded, never pixel-"
    "bounded, which is why this stage runs BEFORE any decode at "
    "100 TB).  Round-trip + truncation/bitflip fuzz (never raises) in "
    "tests/test_sources.py",
)
def multimodal_exif_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.jpeg import encode_jpeg
    from knowledge_model_spark.sources.multimodal import (
        build_exif_app1,
        insert_jpeg_app1,
        parse_exif,
    )

    load_tables(spark, sf_dir)

    def _fields(mid: int) -> dict:
        return {
            "make": "CAM%d" % (mid % 3),
            "model": "KM-%03d" % (100 + mid % 7),
            "orientation": 1 + mid % 8,
            "datetime": "2024:%02d:%02d 0%d:00:00"
            % (1 + mid % 12, 1 + mid % 28, mid % 10),
            "iso": 100 * (1 + mid % 4),
            "exposure_num": 1,
            "exposure_den": 1 << (2 + mid % 6),
            "pixel_x": 32,
            "pixel_y": 24,
        }

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "variant": [], "payload": []}
            for mid in pdf["id"]:
                mid = int(mid)
                yy, xx = np.mgrid[0:24, 0:32]
                img = np.stack(
                    [(xx * (2 + mid % 5)) % 256, (yy * 3 + mid) % 256,
                     ((xx + yy) + mid * 37) % 256],
                    axis=2,
                ).astype(np.uint8)
                jpg = encode_jpeg(img, 90)
                endian = "<" if mid % 2 == 0 else ">"
                rows["media_id"].append(mid)
                rows["variant"].append("exif_ii" if endian == "<" else "exif_mm")
                rows["payload"].append(
                    insert_jpeg_app1(jpg, build_exif_app1(_fields(mid), endian))
                )
                if mid % 8 == 0:  # control: no APP1 → parse must say None
                    rows["media_id"].append(mid)
                    rows["variant"].append("plain")
                    rows["payload"].append(jpg)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "variant": rows["variant"],
                    "payload": rows["payload"],
                }
            )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "variant": [], "byte_order": [],
                "make": [], "orientation": [], "iso": [],
                "exposure_den": [], "exif_ok": [],
            }
            for mid, variant, payload in zip(
                pdf["media_id"], pdf["variant"], pdf["payload"]
            ):
                mid = int(mid)
                got = parse_exif(bytes(payload))
                if str(variant) == "plain":
                    ok = got is None
                    got = {}
                else:
                    want = _fields(mid)
                    ok = got is not None and all(
                        got.get(k) == want[k]
                        for k in ("make", "model", "orientation", "datetime",
                                  "iso", "exposure_num", "exposure_den",
                                  "pixel_x", "pixel_y")
                    ) and got["byte_order"] == ("II" if mid % 2 == 0 else "MM")
                    got = got or {}
                out["media_id"].append(mid)
                out["variant"].append(str(variant))
                out["byte_order"].append(got.get("byte_order"))
                out["make"].append(got.get("make"))
                out["orientation"].append(got.get("orientation"))
                out["iso"].append(got.get("iso"))
                out["exposure_den"].append(got.get("exposure_den"))
                out["exif_ok"].append(bool(ok))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "variant": out["variant"],
                    "byte_order": out["byte_order"],
                    "make": out["make"],
                    "orientation": pd.Series(out["orientation"], dtype="Int32"),
                    "iso": pd.Series(out["iso"], dtype="Int32"),
                    "exposure_den": pd.Series(out["exposure_den"], dtype="Int64"),
                    "exif_ok": pd.Series(out["exif_ok"], dtype="bool"),
                }
            )

    media = spark.range(64).mapInPandas(
        build, "media_id long, variant string, payload binary"
    )
    return media.mapInPandas(
        extract,
        "media_id long, variant string, byte_order string, make string, "
        "orientation int, iso int, exposure_den long, exif_ok boolean",
    )


@register(
    "multimodal_pdf_triage",
    None,  # PDF bytes built in a pandas kernel — no SQL twin; the
    # in-plan triage_ok column is an exact class-match gate against
    # the content-addressed expected shape, all-true-pinned in tests
    doc="OCR-free scanned-PDF triage (r10, r9 verdict stretch item 8): "
    "classify every page as text / hybrid / image_only / empty from "
    "the ALREADY-PARSED content streams and XObject dictionaries — "
    "the routing table a 100 TB ingest consults BEFORE paying decode, "
    "so image-only pages (scans) route to an external OCR seam while "
    "text-layer pages go straight to extraction (sources/pdf.py::"
    "triage_pdf_pages; the PDF seam itself keeps REFUSING scanned "
    "docs, this query tells the pipeline WHICH docs those are and "
    "which /Filter their scans carry).  Documents become genuine "
    "PDFs rotating three shapes content-addressed on doc_id: "
    "all-text, image-only first page (empty text layer + one "
    "CCITT/Flate/LZW/DCT XObject), and hybrid first page + empty "
    "trailing page; triage_ok compares each page's class against the "
    "shape implied by doc_id alone — zero joins.  Scale shape: two "
    "mapInPandas over the documents scan, no shuffle, payloads never "
    "leave the executors; triage cost is one content tokenization per "
    "page, no image decode anywhere",
)
def multimodal_pdf_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from knowledge_model_spark.sources.jpeg import encode_jpeg
    from knowledge_model_spark.sources.pdf import (
        encode_simple_pdf,
        make_reference_shaped_pages,
        triage_pdf_pages,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text").filter(F.col("doc_id") < 60)

    _KINDS = ("g4", "flate", "lzw-gray", "dct")

    def _image(did: int):
        h, w = 16 + 8 * (did % 3), 24 + 8 * (did % 2)
        yy, xx = np.mgrid[0:h, 0:w]
        gray = ((xx * (3 + did % 7) + yy * 2 + did * 31) % 256).astype(
            np.uint8
        )
        kind = _KINDS[did % 4]
        if kind == "g4":
            return ("g4", gray >= 128)
        if kind == "flate":
            return ("flate", np.stack([gray] * 3, axis=2))
        if kind == "lzw-gray":
            return ("lzw-gray", gray)
        return encode_jpeg(np.stack([gray] * 3, axis=2), 90)

    def _shape(did: int, text: str):
        """(pages, images) for doc did — shape rotates on doc_id%3.
        make_reference_shaped_pages always yields ≥1 furniture-bearing
        (hence text-layer) page, so shapes 1 and 2 have EXACTLY two
        pages and shape 0 has 1-2, letting _want recompute the
        expected classes from (did, page count) alone."""
        body = make_reference_shaped_pages(text, words_per_page=30)[:2]
        if did % 3 == 0:
            return body, []
        if did % 3 == 1:
            return [""] + body[:1], [_image(did)]
        return body[:1] + [""], [_image(did)]

    def _want(did: int, n: int) -> list[str]:
        """Expected per-page classes, content-addressed on doc_id."""
        if did % 3 == 0:
            return ["text"] * n
        if did % 3 == 1:
            return ["image_only"] + ["text"] * (n - 1)
        return ["hybrid"] + ["empty"] * (n - 1)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                pages, images = _shape(int(did), str(text))
                ids.append(int(did))
                blobs.append(
                    encode_simple_pdf(pages, images=images or None)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pdf": pd.Series(blobs, dtype="object"),
                    "n_bytes": pd.Series(
                        [len(x) for x in blobs], dtype="int64"
                    ),
                }
            )

    def triage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "page": [], "triage": [], "has_text": [],
                "n_images": [], "image_filters": [], "triage_ok": [],
            }
            for did, blob in zip(pdf["doc_id"], pdf["pdf"]):
                rows = triage_pdf_pages(bytes(blob))
                n = len(rows or [])
                want = _want(int(did), n)
                # shapes 1/2 emit exactly two pages by construction;
                # shape 0 emits 1-2 — page-count drift fails the gate
                ok_n = rows is not None and (
                    n == 2 if int(did) % 3 else 1 <= n <= 2
                )
                for j, r in enumerate(rows or []):
                    out["doc_id"].append(int(did))
                    out["page"].append(r["page"])
                    out["triage"].append(r["triage"])
                    out["has_text"].append(r["has_text"])
                    out["n_images"].append(r["n_images"])
                    out["image_filters"].append(",".join(r["image_filters"]))
                    out["triage_ok"].append(
                        ok_n and r["triage"] == want[j]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "page": pd.Series(out["page"], dtype="int64"),
                    "triage": pd.Series(out["triage"], dtype="object"),
                    "has_text": pd.Series(out["has_text"], dtype="bool"),
                    "n_images": pd.Series(out["n_images"], dtype="int64"),
                    "image_filters": pd.Series(
                        out["image_filters"], dtype="object"
                    ),
                    "triage_ok": pd.Series(out["triage_ok"], dtype="bool"),
                }
            )

    built = docs.mapInPandas(build, "doc_id long, pdf binary, n_bytes long")
    return built.mapInPandas(
        triage,
        "doc_id long, page long, triage string, has_text boolean, "
        "n_images long, image_filters string, triage_ok boolean",
    )
