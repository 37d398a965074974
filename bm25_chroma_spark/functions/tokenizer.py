"""Reference-parity tokenizer.

Reproduces the non-NLTK path of the reference tokenizer exactly
(/root/reference/bm25_chroma/bm25.py:77-97):

    re.findall(r"\\b[a-zA-Z0-9]+\\b", text.lower())
    keep tokens with 2 <= len <= 50

The ``\\b`` semantics matter: ``_`` is a word character, so
``foo_bar`` yields NO tokens (no boundary at the underscore), unlike a
naive ``[a-z0-9]+`` scan. Lemmatization (reference bm25.py:96-131) is
environment-dependent and pinned OFF — matches the graceful-fallback
path that runs when NLTK is absent.

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


def tokenize_py(text) -> List[str]:
    """Pure-Python tokenizer, rank-identical to reference _tokenize."""
    if not isinstance(text, str):
        return []
    raw = _TOKEN_RE.findall(text.lower())
    return [t for t in raw if MIN_LEN <= len(t) <= MAX_LEN]


def tokenize_tf_py(text) -> List[Tuple[str, int]]:
    """(term, tf) pairs for one document (reference Counter, bm25.py:163)."""
    toks = tokenize_py(text)
    return list(Counter(toks).items())


@pandas_udf(ArrayType(StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: content -> array<string> of tokens."""
    return texts.map(tokenize_py)


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
