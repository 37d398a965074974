"""Stupid-Backoff bigram LM (CCNet-style perplexity filter):
Python-model parity, pruning invariants, OOV floor arithmetic,
bucket semantics, and the broadcast plan shape."""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.operators.lm import (
    DEFAULT_ALPHA,
    WordLM,
    lm_buckets,
    score_lm,
    train_word_lm,
)


def _words(text: str) -> list[str]:
    return re.split(r"\s+", re.sub(r"^\s+|\s+$", "", text.lower()))


def _py_model(texts: list[str], min_count: int = 1,
              max_vocab: int | None = None):
    """Exact Python mirror of train_word_lm's counting + pruning."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    n_tokens = 0
    for t in texts:
        if t is None or re.fullmatch(r"\s*", t):
            continue
        w = _words(t)
        n_tokens += len(w)
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    uni = {k: v for k, v in uni.items() if v >= min_count}
    big = {k: v for k, v in big.items() if v >= min_count}
    if max_vocab is not None:
        kept = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
        uni = dict(kept[:max_vocab])
        big = {k: v for k, v in big.items()
               if k[0] in uni and k[1] in uni}
    return uni, big, n_tokens


def _py_score(text: str, uni, big, n_tokens, alpha=DEFAULT_ALPHA):
    if text is None or re.fullmatch(r"\s*", text):
        return 0, None
    w = _words(text)
    logs = []
    for i, x in enumerate(w):
        s1 = uni.get(x, None)
        s1 = (s1 / n_tokens) if s1 is not None else alpha / n_tokens
        if i == 0:
            s = s1
        else:
            b = big.get((w[i - 1], x))
            c = uni.get(w[i - 1])
            s = (b / c) if (b is not None and c is not None) else alpha * s1
        logs.append(math.log(s))
    return len(w), sum(logs) / len(logs)


_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "a slow green turtle walks past the lazy dog",
    "the lazy dog barks at the quick brown fox",
    "\tthe   quick\nfox ",
    "",
    "   \n\t ",
    "zebra quark flux",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_score_matches_python_model(spark):
    docs = _docs(spark, _CORPUS)
    lm = train_word_lm(docs, min_count=1)
    uni, big, n = _py_model(_CORPUS)
    assert lm.n_tokens == n
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in score_lm(docs, lm).collect()}
    assert len(got) == len(_CORPUS)
    for i, t in enumerate(_CORPUS):
        nt, sc = _py_score(t, uni, big, n)
        assert got[i][0] == nt, i
        if sc is None:
            assert got[i][1] is None, i
        else:
            assert got[i][1] == pytest.approx(sc, abs=1e-9), i


def test_score_fuzz_with_pruning(spark):
    rng = random.Random(77)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "Zeta", "X1"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for _ in range(60)
    ] + ["", "  ", "\t\n", "unseen words only here"]
    docs = _docs(spark, texts)
    lm = train_word_lm(docs, min_count=3, max_vocab=5)
    uni, big, n = _py_model(texts, min_count=3, max_vocab=5)
    assert lm.n_tokens == n
    assert {r["term"]: r["count"] for r in lm.unigrams.collect()} == uni
    assert {(r["w1"], r["w2"]): r["count"]
            for r in lm.bigrams.collect()} == big
    got = {r["doc_id"]: r["avg_logprob"]
           for r in score_lm(docs, lm).collect()}
    for i, t in enumerate(texts):
        _, sc = _py_score(t, uni, big, n)
        if sc is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(sc, abs=1e-9), (i, t)


def test_pruned_model_is_consistent(spark):
    docs = _docs(spark, _CORPUS)
    lm = train_word_lm(docs, min_count=2, max_vocab=6)
    vocab = {r["term"] for r in lm.unigrams.collect()}
    assert len(vocab) <= 6
    for r in lm.bigrams.collect():
        # bigram present => both words present (the backoff branch is
        # the only OOV path; score_lm relies on this)
        assert r["w1"] in vocab and r["w2"] in vocab


def test_oov_floor_and_ordering(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 5)
    lm = train_word_lm(train)
    n = lm.n_tokens
    probe = _docs(spark, [
        "the cat sat on the mat",   # in-distribution
        "qq ww ee rr tt yy",        # all OOV
    ])
    got = {r["doc_id"]: r["avg_logprob"]
           for r in score_lm(probe, lm).collect()}
    assert got[0] > got[1]  # fluent text scores higher
    # all-OOV doc: first token alpha/N, later tokens alpha*alpha/N
    a = DEFAULT_ALPHA
    expect = (math.log(a / n) + 5 * math.log(a * a / n)) / 6
    assert got[1] == pytest.approx(expect, abs=1e-9)


def test_score_validation_and_blanks(spark):
    docs = _docs(spark, _CORPUS)
    lm = train_word_lm(docs)
    with pytest.raises(ValueError):
        score_lm(docs, lm, alpha=0.0)
    with pytest.raises(ValueError):
        train_word_lm(docs, min_count=0)
    with pytest.raises(ValueError):
        score_lm(docs, WordLM(lm.unigrams, lm.bigrams, 0))
    rows = {r["doc_id"]: r for r in score_lm(docs, lm).collect()}
    assert rows[5]["n_tokens"] == 0 and rows[5]["avg_logprob"] is None
    assert rows[6]["n_tokens"] == 0 and rows[6]["avg_logprob"] is None


def test_null_text_counts_as_blank(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, None)], "doc_id long, text string"
    )
    lm = train_word_lm(docs)
    rows = {r["doc_id"]: r for r in score_lm(docs, lm).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["avg_logprob"] is None


def test_lm_buckets(spark):
    rng = random.Random(5)
    rows = [(i, float(-i) / 100.0) for i in range(300)] + [(999, None)]
    rng.shuffle(rows)
    scored = spark.createDataFrame(rows, "doc_id long, avg_logprob double")
    out = lm_buckets(scored, n_buckets=3).collect()
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["lm_bucket"], []).append(r["avg_logprob"])
    assert set(by_bucket) == {0, 1, 2, None}
    assert by_bucket[None] == [None]
    # bucket 0 = head (highest scores), monotone across buckets
    assert min(by_bucket[0]) >= max(by_bucket[1]) - 1e-9
    assert min(by_bucket[1]) >= max(by_bucket[2]) - 1e-9
    for b in (0, 1, 2):
        assert len(by_bucket[b]) == pytest.approx(100, abs=15)
    with pytest.raises(ValueError):
        lm_buckets(scored, n_buckets=1)


def test_score_plan_shape(spark):
    """Model joins broadcast; the only shuffle is the per-doc agg.
    r9: the pruned-model path precomputes bigram ratios driver-side,
    so scoring is TWO broadcast joins (bigram ratio + word unigram),
    not three — the context-count join is gone."""
    docs = _docs(spark, _CORPUS)
    lm = train_word_lm(docs, min_count=1)
    uni = spark.createDataFrame(lm.unigrams.collect(), lm.unigrams.schema)
    big = spark.createDataFrame(lm.bigrams.collect(), lm.bigrams.schema)
    frozen = WordLM(uni, big, lm.n_tokens)
    plan = (score_lm(docs, frozen)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 1
