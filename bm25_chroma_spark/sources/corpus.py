"""Deterministic synthetic source-code corpus generator.

Shape fixed by BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.
No external data; everything derives from a seed. Token frequencies
are Zipfian (hot keywords like ``def``/``import``/``return`` appear in
nearly every file) so the skewed-groupBy salting path is genuinely
exercised, mirroring real source-code term distributions.

Generation is pure per-index: row i is a function of (seed, i) only,
so the same corpus can be produced distributed (mapInPandas over an
id range) or driver-side (small fixtures), byte-identical.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25_chroma_spark.schemas import CORPUS_SCHEMA

LANGS = ["python", "java", "c", "go", "js", "md"]

# Zipf head: stopword-like code tokens present in nearly every file.
_HOT = [
    "def", "import", "return", "if", "else", "for", "while", "class",
    "self", "int", "str", "none", "true", "false", "print", "len",
]
# Long tail of identifiers; tail size scales the vocabulary.
_TAIL_STEMS = [
    "parser", "buffer", "index", "shard", "merge", "token", "score",
    "query", "batch", "cache", "stream", "vector", "matrix", "handler",
    "worker", "config", "writer", "reader", "engine", "client",
]


def _content_for(i: int, rng: random.Random) -> str:
    """One templated source file; Zipfian token mix."""
    n_lines = rng.randint(5, 40)
    lines: List[str] = []
    fn = f"{rng.choice(_TAIL_STEMS)}{rng.randint(0, 999)}"
    lines.append(f"def {fn}(arg0, arg1):")
    for _ in range(n_lines):
        r = rng.random()
        if r < 0.55:
            # hot-path line: mostly head tokens
            toks = rng.choices(_HOT, k=rng.randint(3, 8))
        elif r < 0.9:
            toks = [
                f"{rng.choice(_TAIL_STEMS)}{rng.randint(0, 99)}"
                for _ in range(rng.randint(2, 6))
            ] + rng.choices(_HOT, k=2)
        else:
            # rare identifiers (deep tail) + alphanumeric ids like P123
            toks = [
                f"{rng.choice(_TAIL_STEMS)}{rng.randint(1000, 99999)}",
                f"p{rng.randint(100, 999)}",
            ]
        lines.append("    " + " ".join(toks))
    lines.append(f"    return {rng.choice(_HOT)}")
    return "\n".join(lines)


def _row_for(i: int, seed: int) -> Tuple[str, str, str, str, str]:
    rng = random.Random((seed << 32) ^ i)
    # Zipf-ish repo sizes: low repo ids own many files.
    repo_id = min(int(rng.paretovariate(1.2)), 200)
    repo = f"org{repo_id % 20}/repo{repo_id}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/module_{i % 97}/file_{i}.{lang[:2]}"
    content = _content_for(i, rng)
    commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()
    return (repo, path, commit, lang, content)


def synth_corpus_rows(n_files: int, seed: int = 42) -> List[Tuple[str, str, str, str, str]]:
    """Driver-side generation for small fixtures/golden tests."""
    return [_row_for(i, seed) for i in range(n_files)]


def synth_corpus(spark: SparkSession, n_files: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Distributed generation: mapInPandas over an id range.

    Scales to any n_files without driver memory pressure — each task
    generates its own slice deterministically.
    """
    parts = partitions or max(1, min(n_files // 2000, 256))
    ids = spark.range(0, n_files, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row_for(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return ids.mapInPandas(gen, schema=CORPUS_SCHEMA)


def reference_query_set() -> List[Tuple[int, str]]:
    """The fixed query set used for rank-identity checks vs the
    reference engine. Mix per FIXTURES.md §4: single terms, multi-term,
    duplicate tokens (scored per occurrence, reference bm25.py:276),
    alphanumeric ids, underscore tokens (\\b semantics), unknown terms.
    """
    return [
        (1, "import"),
        (2, "parser buffer merge"),
        (3, "return return def"),          # duplicate query tokens
        (4, "p123 index"),                 # alphanumeric identifier
        (5, "foo_bar token"),              # underscore: foo_bar -> no token
        (6, "zzznotaterm query"),          # unknown + known
        (7, "shard merge score query batch"),
        (8, "the a I"),                    # all filtered (len < 2) / unknown
        (9, "class self none"),
        (10, "vector MATRIX Stream"),      # case folding
    ]
