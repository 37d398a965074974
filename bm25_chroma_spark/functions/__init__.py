from bm25_chroma_spark.functions.tokenizer import (
    tokenize_py,
    tokenize_tf_py,
    tokens_udf,
    tokenized_struct_udf,
    sql_tokens,
)

__all__ = [
    "tokenize_py",
    "tokenize_tf_py",
    "tokens_udf",
    "tokenized_struct_udf",
    "sql_tokens",
]
