"""Reference-parity tokenizer.

Reproduces the non-NLTK path of the reference tokenizer exactly
(/root/reference/bm25_chroma/bm25.py:77-97):

    re.findall(r"\\b[a-zA-Z0-9]+\\b", text.lower())
    keep tokens with 2 <= len <= 50

The ``\\b`` semantics matter: ``_`` is a word character, so
``foo_bar`` yields NO tokens (no boundary at the underscore), unlike a
naive ``[a-z0-9]+`` scan. Lemmatization (reference bm25.py:96-131) is
environment-dependent and defaults OFF — matching the graceful-
fallback path that runs when NLTK is absent — but is available via
``lemmatize=True`` (same POS-aware 3-level fallback chain as the
reference) for users who install NLTK and expect reference tokens.

Two execution strategies, proven equivalent by tests on ASCII input:

* ``tokens_udf`` / ``tokenized_struct_udf`` — Arrow-vectorized pandas
  UDFs running the exact Python regex (canonical; byte-identical to
  the reference for any input).
* ``sql_tokens`` — a pure JVM column expression
  (regexp_extract_all + filter) that stays inside whole-stage codegen.
  Java and Python ``\\b`` agree on ASCII; use this fast path when the
  corpus is known-ASCII.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import List, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from bm25_chroma_spark.schemas import TERM_TF_SCHEMA

_TOKEN_RE = re.compile(r"\b[a-zA-Z0-9]+\b")
MIN_LEN = 2
MAX_LEN = 50

# Lazy NLTK probe result: None = not probed, False = unavailable,
# else (nltk_module, lemmatizer, wordnet_module). Tests monkeypatch
# _nltk_state to exercise the lemmatize path with a stub.
_NLTK_STATE = None


def _nltk_state():
    """Probe for NLTK exactly like the reference's graceful import
    (bm25.py:7-40): downloads wordnet + tagger data if missing,
    returns False on any failure."""
    global _NLTK_STATE
    if _NLTK_STATE is not None:
        return _NLTK_STATE
    try:
        import nltk
        from nltk.corpus import wordnet
        from nltk.stem import WordNetLemmatizer

        try:
            nltk.data.find("corpora/wordnet")
            nltk.data.find("taggers/averaged_perceptron_tagger")
        except LookupError:
            nltk.download("wordnet", quiet=True)
            nltk.download("averaged_perceptron_tagger", quiet=True)
        _NLTK_STATE = (nltk, WordNetLemmatizer(), wordnet)
    except Exception:
        _NLTK_STATE = False
    return _NLTK_STATE


def lemmatization_available() -> bool:
    return bool(_nltk_state())


def _wordnet_pos(treebank_tag: str, wordnet):
    """Treebank -> WordNet POS (reference bm25.py:24-35)."""
    if treebank_tag.startswith("J"):
        return wordnet.ADJ
    if treebank_tag.startswith("V"):
        return wordnet.VERB
    if treebank_tag.startswith("N"):
        return wordnet.NOUN
    if treebank_tag.startswith("R"):
        return wordnet.ADV
    return wordnet.NOUN


def lemmatize_tokens(tokens: List[str]) -> List[str]:
    """The reference's 3-level lemmatization fallback chain
    (bm25.py:101-131): POS-aware lemmatize -> plain lemmatize ->
    original tokens; tokens containing digits always pass through
    unchanged (part numbers / identifiers). No-op when NLTK is
    absent — the deterministic path this engine pins as default."""
    state = _nltk_state()
    if not state:
        return tokens
    nltk, lemmatizer, wordnet = state
    try:
        out = []
        for token, tag in nltk.pos_tag(tokens):
            if token.isdigit() or any(c.isdigit() for c in token):
                out.append(token)
            else:
                out.append(
                    lemmatizer.lemmatize(
                        token, pos=_wordnet_pos(tag, wordnet)
                    )
                )
        return out
    except Exception:
        try:
            return [
                t if any(c.isdigit() for c in t)
                else lemmatizer.lemmatize(t)
                for t in tokens
            ]
        except Exception:
            return tokens


def tokenize_py(text, lemmatize: bool = False) -> List[str]:
    """Pure-Python tokenizer, rank-identical to reference _tokenize.

    ``lemmatize=False`` (default) is the deterministic non-NLTK path;
    ``lemmatize=True`` mirrors the reference's default-on-when-NLTK-
    present behavior (bm25.py:96-131) for users who install NLTK and
    expect reference tokens."""
    if not isinstance(text, str):
        return []
    raw = _TOKEN_RE.findall(text.lower())
    toks = [t for t in raw if MIN_LEN <= len(t) <= MAX_LEN]
    if lemmatize:
        toks = lemmatize_tokens(toks)
    return toks


def tokenize_tf_py(text, lemmatize: bool = False) -> List[Tuple[str, int]]:
    """(term, tf) pairs for one document (reference Counter, bm25.py:163)."""
    toks = tokenize_py(text, lemmatize=lemmatize)
    return list(Counter(toks).items())


@pandas_udf(ArrayType(StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: content -> array<string> of tokens."""
    return texts.map(tokenize_py)


def make_tokens_udf(lemmatize: bool = False):
    """Tokenizer UDF factory with the lemmatize flag. The default
    (False) is tokens_udf; True runs the reference's NLTK fallback
    chain per Arrow batch (nondeterministic across NLTK versions —
    opt-in only, never used by the index build)."""
    if not lemmatize:
        return tokens_udf

    @pandas_udf(ArrayType(StringType()))
    def tokens_lemma_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tokenize_py(t, lemmatize=True))

    return tokens_lemma_udf


def _tokenize_tf_series(texts: pd.Series) -> pd.DataFrame:
    terms = []
    dls = []
    for t in texts:
        toks = tokenize_py(t)
        dls.append(len(toks))
        terms.append(
            [{"term": k, "tf": v} for k, v in Counter(toks).items()]
        )
    return pd.DataFrame({"terms": terms, "dl": dls})


from pyspark.sql.types import IntegerType, StructField, StructType

_TOKENIZED_STRUCT = StructType(
    [
        StructField("terms", TERM_TF_SCHEMA, False),
        StructField("dl", IntegerType(), False),
    ]
)


@pandas_udf(_TOKENIZED_STRUCT)
def tokenized_struct_udf(texts: pd.Series) -> pd.DataFrame:
    """content -> {terms: [(term, tf)...], dl}.

    Computing tf inside the UDF is the map-side combine: the shuffle
    after explode carries one row per *distinct* (doc, term) instead of
    one per token occurrence.
    """
    return _tokenize_tf_series(texts)


def sql_tokens(col: Column) -> Column:
    """JVM-side tokenizer expression (codegen fast path, ASCII corpora).

    Java regex ``\\b`` boundaries agree with Python's on ASCII (both
    treat [A-Za-z0-9_] as word chars); they diverge only around
    non-ASCII letters, where the pandas-UDF path must be used.
    """
    return F.filter(
        F.regexp_extract_all(
            F.lower(col), F.lit(r"\b[a-zA-Z0-9]+\b"), F.lit(0)
        ),
        lambda t: (F.length(t) >= MIN_LEN) & (F.length(t) <= MAX_LEN),
    )
