"""Randomized pruning-equivalence: Block-Max WAND == exhaustive
scoring on arbitrary posting lists (no Spark; exercises the cursor
machinery, block skipping, tie handling, threshold updates)."""

from __future__ import annotations

import collections
import math
from types import SimpleNamespace

import numpy as np

from bm25_chroma_spark.index.encode import encode_postings
from bm25_chroma_spark.index.wand import _bmw_topk, _Cursor

K1, B = 1.5, 0.75


def _make_row(doc_ids, tfs, dls, bs):
    enc = encode_postings(
        np.array(doc_ids), np.array(tfs), np.array(dls), block_size=bs
    )
    return SimpleNamespace(
        doc_bytes=enc.doc_bytes,
        tf_bytes=enc.tf_bytes,
        dl_bytes=enc.dl_bytes,
        blocks=enc.blocks,
    )


def _exhaustive(lists, k, avgdl):
    acc = collections.defaultdict(float)
    for docs, tfs, dls, w in lists:
        for d, tf, dl in zip(docs, tfs, dls):
            denom = tf + K1 * (1 - B + B * dl / avgdl)
            acc[d] += w * (tf * (K1 + 1)) / denom / math.sqrt(dl)
    return sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_bmw_equals_exhaustive_randomized():
    rng = np.random.RandomState(12345)
    avgdl = 50.0
    for trial in range(400):
        nlists = rng.randint(1, 7)
        lists, cursors = [], []
        for _ in range(nlists):
            n = rng.randint(1, 80)
            docs = np.cumsum(rng.randint(1, 20, n)).astype(np.int64)
            tfs = rng.randint(1, 9, n).astype(np.int64)
            dls = rng.randint(10, 100, n).astype(np.int64)
            w = float(rng.uniform(0.1, 3.0))
            row = _make_row(docs, tfs, dls, bs=int(rng.randint(1, 9)))
            cursors.append(_Cursor(row, w, K1, B, avgdl))
            lists.append((docs, tfs, dls, w))
        k = int(rng.randint(1, 15))
        got = _bmw_topk(cursors, k)
        want = _exhaustive(lists, k, avgdl)
        assert len(got) == len(want), trial
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gd == wd, (trial, got, want)
            assert math.isclose(gs, ws, rel_tol=1e-9), (trial, gd, gs, ws)


def test_round_half_up_matches_spark_f_round(spark):
    """round_half_up (used inside the WAND heap) must agree with
    Spark's F.round on doubles BIT-FOR-BIT — Python's builtin round()
    does NOT (half-even on binary: round(2.675, 2)=2.67 while F.round
    gives 2.68), which would silently break WAND == exhaustive under
    score_round at decimal midpoints."""
    import numpy as _np
    from pyspark.sql import functions as F

    from bm25_chroma_spark.index.wand import round_half_up

    rng = _np.random.RandomState(4242)
    vals = [
        2.675, 0.125, -2.675, -0.125, 0.5, -0.5, 1.0049999,
        123456.789125, 1e-7, 0.0, -0.0, 7.2, 3.0000005,
    ] + [float(x) for x in rng.uniform(-100, 100, 200)] + [
        float(x) for x in rng.uniform(-1e-3, 1e-3, 50)
    ]
    for r in (2, 6):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        want = [
            row["y"] for row in
            df.select(F.round("x", r).alias("y")).collect()
        ]
        got = [round_half_up(v, r) for v in vals]
        for v, g, w in zip(vals, got, want):
            assert g == w, (v, r, g, w)


def test_bmw_round_before_rank_ties():
    """score_round applies INSIDE the heap (cross-engine contract:
    round before ranking) with a half-ulp pruning slack — coarse
    rounding creates many exact rounded-score ties whose doc_id-asc
    order must match an exhaustive round-then-rank oracle, and
    pruning must never drop a tied doc whose raw score is below the
    raw threshold but whose rounded score ties it."""
    rng = np.random.RandomState(777)
    avgdl = 50.0
    for trial in range(200):
        nlists = rng.randint(1, 5)
        lists, rows = [], []
        for _ in range(nlists):
            n = rng.randint(1, 60)
            docs = np.cumsum(rng.randint(1, 9, n)).astype(np.int64)
            tfs = rng.randint(1, 4, n).astype(np.int64)
            dls = rng.randint(10, 30, n).astype(np.int64)
            w = float(rng.choice([0.5, 1.0, 1.5]))
            rows.append((_make_row(docs, tfs, dls,
                                   bs=int(rng.randint(1, 6))), w))
            lists.append((docs, tfs, dls, w))
        k = int(rng.randint(1, 10))
        cursors = [_Cursor(row, w, K1, B, avgdl) for row, w in rows]
        got = _bmw_topk(cursors, k, score_round=2)
        acc = collections.defaultdict(float)
        for docs, tfs, dls, w in lists:
            for d, tf, dl in zip(docs, tfs, dls):
                denom = tf + K1 * (1 - B + B * dl / avgdl)
                acc[d] += w * (tf * (K1 + 1)) / denom / math.sqrt(dl)
        from bm25_chroma_spark.index.wand import round_half_up

        want = sorted(
            ((d, round_half_up(s, 2)) for d, s in acc.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        assert [d for d, _ in got] == [d for d, _ in want], (
            trial, got, want,
        )
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, abs_tol=1e-9), (trial, got, want)


def test_bmw_tie_scores():
    """Identical postings in two lists -> exact score ties; ranking
    must prefer smaller doc_id and never drop a tied doc."""
    docs = np.array([10, 20, 30, 40], dtype=np.int64)
    tfs = np.array([2, 2, 2, 2], dtype=np.int64)
    dls = np.array([50, 50, 50, 50], dtype=np.int64)
    row = _make_row(docs, tfs, dls, bs=2)
    cursors = [_Cursor(row, 1.0, K1, B, 50.0)]
    got = _bmw_topk(cursors, 2)
    assert [d for d, _ in got] == [10, 20]
