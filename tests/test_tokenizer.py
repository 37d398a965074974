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


class _StubWordnet:
    ADJ, VERB, NOUN, ADV = "a", "v", "n", "r"


class _StubNltk:
    """Deterministic stand-in for nltk.pos_tag: verbs end in 'ing'."""

    @staticmethod
    def pos_tag(tokens):
        return [
            (t, "VBG" if t.endswith("ing") else "NN") for t in tokens
        ]


class _StubLemmatizer:
    def lemmatize(self, token, pos="n"):
        if pos == "v" and token.endswith("ing"):
            return token[:-3]
        return token.rstrip("s") or token


def test_lemmatize_flag_off_is_identity():
    """Default path must stay byte-identical to the reference's
    non-NLTK tokenizer regardless of what is installed."""
    for text in CASES:
        assert tokenize_py(text) == tokenize_py(text, lemmatize=False)


def test_lemmatize_flag_with_stub(monkeypatch):
    """Flag-on path exercises the reference fallback chain
    (bm25.py:101-131) with a stub: POS-aware lemmatize, digit
    passthrough."""
    from bm25_chroma_spark.functions import tokenizer as tok

    monkeypatch.setattr(
        tok, "_NLTK_STATE", (_StubNltk, _StubLemmatizer(), _StubWordnet)
    )
    got = tok.tokenize_py("Running cats P123 spark 42", lemmatize=True)
    # 'running' -> VBG -> 'runn'; 'cats' -> NN -> 'cat';
    # digit-containing tokens pass through unchanged
    assert got == ["runn", "cat", "p123", "spark", "42"]
    assert tok.lemmatization_available()


def test_lemmatize_fallback_chain(monkeypatch):
    """pos_tag raising falls back to plain lemmatize; both raising
    falls back to the original tokens — the 3-level chain."""
    from bm25_chroma_spark.functions import tokenizer as tok

    class _BoomNltk:
        @staticmethod
        def pos_tag(tokens):
            raise RuntimeError("no tagger data")

    monkeypatch.setattr(
        tok, "_NLTK_STATE", (_BoomNltk, _StubLemmatizer(), _StubWordnet)
    )
    assert tok.tokenize_py("cats dogs", lemmatize=True) == ["cat", "dog"]

    class _BoomLemmatizer:
        def lemmatize(self, token, pos="n"):
            raise RuntimeError("no wordnet data")

    monkeypatch.setattr(
        tok, "_NLTK_STATE", (_BoomNltk, _BoomLemmatizer(), _StubWordnet)
    )
    assert tok.tokenize_py("cats dogs", lemmatize=True) == ["cats", "dogs"]


def test_lemmatize_noop_without_nltk(monkeypatch):
    from bm25_chroma_spark.functions import tokenizer as tok

    monkeypatch.setattr(tok, "_NLTK_STATE", False)
    assert not tok.lemmatization_available()
    for text in CASES:
        assert tok.tokenize_py(text, lemmatize=True) == tok.tokenize_py(text)
