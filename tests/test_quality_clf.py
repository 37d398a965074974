"""Curated-vs-crawl Naive Bayes quality classifier: Python-model
parity, Laplace/OOV arithmetic, pruning invariants, discriminative
sanity, and the broadcast plan shape."""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.operators.quality_clf import (
    NBQualityModel,
    score_nb_quality,
    train_nb_quality,
)


def _words(text: str) -> list[str]:
    return re.split(r"\s+", re.sub(r"^\s+|\s+$", "", text.lower()))


def _py_model(pos: list[str], neg: list[str], min_count: int = 1,
              max_vocab: int | None = None):
    """Exact Python mirror of train_nb_quality's counting + pruning."""
    cnt: dict[str, list[int]] = {}
    pt = nt = 0
    for y, texts in ((1, pos), (0, neg)):
        for t in texts:
            if t is None or re.fullmatch(r"\s*", t):
                continue
            for w in _words(t):
                c = cnt.setdefault(w, [0, 0])
                c[y] += 1
                if y:
                    pt += 1
                else:
                    nt += 1
    v = len(cnt)
    kept = {k: c for k, c in cnt.items() if c[0] + c[1] >= min_count}
    if max_vocab is not None:
        order = sorted(kept.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0]))
        kept = dict(order[:max_vocab])
    return kept, pt, nt, v


def _py_score(text: str, kept, pt, nt, v):
    if text is None or re.fullmatch(r"\s*", text):
        return 0, None
    w = _words(text)
    llrs = []
    for x in w:
        nc, pc = 0, 0
        if x in kept:
            nc, pc = kept[x][0], kept[x][1]
        llrs.append(
            math.log((pc + 1.0) / (pt + v)) - math.log((nc + 1.0) / (nt + v))
        )
    return len(w), sum(llrs) / len(llrs)


_POS = [
    "the encyclopedia article explains the theorem with citations",
    "a well sourced article describes the theorem and its proof",
    "the article cites the original proof of the theorem",
    "\tthe  theorem\narticle ",
]
_NEG = [
    "click here buy cheap pills click here now",
    "win win win free prize click the link buy now",
    "cheap cheap pills free shipping buy buy buy",
    "",
    "   \n ",
]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_score_matches_python_model(spark):
    pos, neg = _docs(spark, _POS), _docs(spark, _NEG, start=100)
    model = train_nb_quality(pos, neg)
    kept, pt, nt, v = _py_model(_POS, _NEG)
    assert (model.pos_tokens, model.neg_tokens, model.vocab_size) == (pt, nt, v)
    assert {
        r["term"]: (r["neg_count"], r["pos_count"])
        for r in model.terms.collect()
    } == {k: tuple(c) for k, c in kept.items()}
    probe_texts = _POS + _NEG + ["theorem pills unseenword", "zzz qqq"]
    probe = _docs(spark, probe_texts)
    got = {r["doc_id"]: (r["n_tokens"], r["quality_logodds"])
           for r in score_nb_quality(probe, model).collect()}
    assert len(got) == len(probe_texts)
    for i, t in enumerate(probe_texts):
        n, sc = _py_score(t, kept, pt, nt, v)
        assert got[i][0] == n, i
        if sc is None:
            assert got[i][1] is None, i
        else:
            assert got[i][1] == pytest.approx(sc, abs=1e-9), (i, t)


def test_score_fuzz_with_pruning(spark):
    rng = random.Random(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "Zeta", "X1", "k9"]
    mk = lambda: " ".join(
        rng.choice(vocab) for _ in range(rng.randint(1, 25))
    )
    pos_t = [mk() for _ in range(40)] + ["", None]
    neg_t = [mk() for _ in range(40)] + ["\t "]
    pos, neg = _docs(spark, pos_t), _docs(spark, neg_t, start=500)
    model = train_nb_quality(pos, neg, min_count=4, max_vocab=5)
    kept, pt, nt, v = _py_model(pos_t, neg_t, min_count=4, max_vocab=5)
    assert (model.pos_tokens, model.neg_tokens, model.vocab_size) == (pt, nt, v)
    assert model.terms.count() == len(kept) <= 5
    probe_t = [mk() for _ in range(30)] + ["totally unseen tokens", ""]
    probe = _docs(spark, probe_t)
    got = {r["doc_id"]: r["quality_logodds"]
           for r in score_nb_quality(probe, model).collect()}
    for i, t in enumerate(probe_t):
        _, sc = _py_score(t, kept, pt, nt, v)
        if sc is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(sc, abs=1e-9), (i, t)


def test_discriminative_direction_and_oov(spark):
    pos, neg = _docs(spark, _POS), _docs(spark, _NEG, start=100)
    model = train_nb_quality(pos, neg)
    probe = _docs(spark, [
        "the theorem article cites the proof",   # curated-like
        "buy cheap pills click here",            # crawl-like
        "zzz qqq www",                            # all OOV
    ])
    got = {r["doc_id"]: r["quality_logodds"]
           for r in score_nb_quality(probe, model).collect()}
    assert got[0] > 0 > got[1]
    # all-OOV doc: every token takes the constant smoothed floor
    pt, nt, v = model.pos_tokens, model.neg_tokens, model.vocab_size
    floor = math.log(1.0 / (pt + v)) - math.log(1.0 / (nt + v))
    assert got[2] == pytest.approx(floor, abs=1e-9)


def test_validation_and_blanks(spark):
    pos, neg = _docs(spark, _POS), _docs(spark, _NEG, start=100)
    with pytest.raises(ValueError):
        train_nb_quality(pos, neg, min_count=0)
    with pytest.raises(ValueError):
        train_nb_quality(pos, _docs(spark, ["", "  "], start=100))
    model = train_nb_quality(pos, neg)
    with pytest.raises(ValueError):
        score_nb_quality(
            pos,
            NBQualityModel(model.terms, 0, model.neg_tokens, model.vocab_size),
        )
    probe = spark.createDataFrame(
        [(0, "theorem"), (1, None), (2, " \t\n")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in score_nb_quality(probe, model).collect()}
    for i in (1, 2):
        assert rows[i]["n_tokens"] == 0
        assert rows[i]["quality_logodds"] is None


def test_round_to_and_bucket_compat(spark):
    """round_to applies to the avg; lm_buckets cuts on the score col."""
    from bm25_chroma_spark.operators.lm import lm_buckets

    pos, neg = _docs(spark, _POS), _docs(spark, _NEG, start=100)
    model = train_nb_quality(pos, neg)
    probe = _docs(spark, _POS + _NEG)
    scored = score_nb_quality(probe, model, round_to=6)
    for r in scored.collect():
        if r["quality_logodds"] is not None:
            assert r["quality_logodds"] == round(r["quality_logodds"], 6)
    out = lm_buckets(
        scored, n_buckets=2, score_col="quality_logodds",
        bucket_col="q_bucket",
    ).collect()
    assert {r["q_bucket"] for r in out} == {0, 1, None}


def test_score_plan_shape(spark):
    """ONE broadcast model join; the only shuffle is the per-doc agg."""
    pos, neg = _docs(spark, _POS), _docs(spark, _NEG, start=100)
    model = train_nb_quality(pos, neg)
    frozen = NBQualityModel(
        spark.createDataFrame(model.terms.collect(), model.terms.schema),
        model.pos_tokens, model.neg_tokens, model.vocab_size,
    )
    plan = (score_nb_quality(_docs(spark, _POS), frozen)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
