"""Tokenizer parity: our tokenizer vs the reference's _tokenize
(/root/reference/bm25_chroma/bm25.py:77-97, non-NLTK path), plus
JVM-expression vs pandas-UDF agreement on ASCII."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.tokenizer import (
    sql_tokens,
    tokenize_py,
    tokenize_tf_py,
    tokens_udf,
)

CASES = [
    "Hello, World! This is a test.",
    "foo_bar should yield no tokens",
    "part numbers P123 SN456 and MODEL-789 survive",
    "a I x yz zzz",  # length-filter edges: 1 dropped, 2 kept
    "x" * 51 + " " + "y" * 50,  # 51 dropped, 50 kept
    "",
    "    \n\t  ",
    "MixedCASE Tokens lower-cased",
    "digits 42 007 12345",
    "tabs\tand\nnewlines\rhandled",
    "trailing_underscore_ word_",
    "_leading",
    "dots.and.commas,split;tokens:here",
    "unicode café naïve résumé",  # non-ASCII: \b differences vs JVM
]


def test_matches_reference(reference_bm25_cls):
    ref = reference_bm25_cls()
    for text in CASES:
        assert tokenize_py(text) == ref._tokenize(text), text


def test_matches_reference_fuzz(reference_bm25_cls):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ref = reference_bm25_cls()

    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def check(text):
        assert tokenize_py(text) == ref._tokenize(text)

    check()


def test_non_string_returns_empty():
    assert tokenize_py(None) == []
    assert tokenize_py(42) == []


def test_tf_pairs():
    pairs = dict(tokenize_tf_py("ab ab cd ab cd"))
    assert pairs == {"ab": 3, "cd": 2}


def test_pandas_udf_matches_python(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(CASES)), "text": CASES})
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", tokens_udf("text").alias("toks")
        ).collect()
    }
    for i, text in enumerate(CASES):
        assert got[i] == tokenize_py(text), text


def test_jvm_expr_matches_python_on_ascii(spark):
    ascii_cases = [c for c in CASES if c.isascii()]
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(ascii_cases)), "text": ascii_cases})
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", sql_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    for i, text in enumerate(ascii_cases):
        assert got[i] == tokenize_py(text), text
