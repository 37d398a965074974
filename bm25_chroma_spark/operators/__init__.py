from bm25_chroma_spark.operators.index_build import (
    LogicalIndex,
    tokenize_docs,
    build_logical_index,
)
from bm25_chroma_spark.operators.scoring import bm25_score_queries

__all__ = [
    "LogicalIndex",
    "tokenize_docs",
    "build_logical_index",
    "bm25_score_queries",
]
