"""Canonical engine schemas.

The reference stores articles/chunks/embeddings in SQLite ORM tables plus
JSONL files plus an out-of-band FAISS index (reference:
knowledge_model/db/sql_models.py:7-39, ingestion/pipeline.py:66-93,
embeddings/vector_store.py:44-47).  The engine unifies those into three
first-class columnar tables; dates are real DateType (the reference keeps
pubdate as String(50), sql_models.py:15), authors a real array, vectors a
real array<float> column rather than a LargeBinary blob.
"""

from __future__ import annotations

from pyspark.sql import types as T

ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("article_id", T.LongType()),
        T.StructField("pmid", T.StringType()),
        T.StructField("pmcid", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("journal", T.StringType()),
        T.StructField("pubdate", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("section", T.StringType()),  # FULL | ABSTRACT | NONE
        T.StructField("abstract", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("pdf_s3_url", T.StringType()),
        T.StructField("pdf_downloaded", T.BooleanType()),
    ]
)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("article_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("char_start", T.IntegerType()),
        T.StructField("char_end", T.IntegerType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("article_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)

EVAL_QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType()),
        T.StructField("expected_pmid", T.StringType()),
    ]
)

# JSONL corpus chunk record as written by the reference ingest
# (pipeline.py:90: {"pmid","title","text"}).
CORPUS_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

# Training records: two variants in one file (train_lora.py:87-92).
TRAINING_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("instruction", T.StringType()),
        T.StructField("output", T.StringType()),
    ]
)

# Multimodal: opaque binary payload + typed metadata (engine extension).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)
