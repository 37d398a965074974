"""Fixed StructType schemas for every table the engine touches.

The reference is dynamically typed (dicts/lists of Python primitives,
/root/reference/bm25_chroma/bm25.py:62-75); here every relation has a
declared schema so Catalyst can prune/push down and Arrow transfers
stay columnar.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Corpus of source-code files — shape fixed by BASELINE.json input_hint.
CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# doc_map: dense integer doc ids (reference chunk_id_map, bm25.py:66-67)
DOC_MAP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("doc_uid", StringType(), False),  # sha2(content, 256)
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Tokenized docs: per-doc term frequencies (reference Counter, bm25.py:163)
TERM_TF_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType(), False),
            StructField("tf", IntegerType(), False),
        ]
    )
)

TOKENIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("terms", TERM_TF_SCHEMA, False),
        StructField("dl", IntegerType(), False),
    ]
)

# Logical (uncompressed) postings — exploded rows.
# pos = 1-based rank within term by (tf desc, doc_id asc); the build
# cap and the query-time cap both cut on pos.
POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),  # denormalized doc length
        StructField("pos", IntegerType(), False),
    ]
)

# Per-term stats; df is the *capped* posting-list length (reference
# IDF quirk, bm25.py:305-310).
TERM_STATS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),
    ]
)

DOC_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

# Physical compressed shard: one row per (term, segment) — delta+varint
# packed doc_ids, varint tfs, block-max score metadata.
SHARD_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("segment", IntegerType(), False),
        StructField("df", LongType(), False),  # postings in this segment
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField(
            "blocks",
            ArrayType(
                StructType(
                    [
                        StructField("first_doc", LongType(), False),
                        StructField("max_tf_norm", FloatType(), False),
                        StructField("offset", IntegerType(), False),
                        StructField("length", IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

QUERIES_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("query_text", StringType(), False),
    ]
)

RESULTS_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
        StructField("rank", IntegerType(), False),
    ]
)
