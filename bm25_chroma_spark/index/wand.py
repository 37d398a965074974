"""Query execution over the physical sharded index.

Two strategies, property-tested to produce identical top-k:

* ``exhaustive`` — decode every matching shard (mapInPandas), score
  with the same JVM column expressions as the logical path, rank.
  Simple, fully distributed, the correctness baseline.

* ``wand`` — Block-Max WAND (Ding & Suel, SIGIR'11) document-at-a-time
  pruning inside a grouped pandas UDF, parallelized per
  (query, segment): segments partition the doc space, so per-segment
  top-k provably covers the global top-k and S small DAAT loops run
  as S parallel tasks. Cursors skip whole blocks whose upper bound
  cannot beat the running threshold.

Strategy guidance: ``exhaustive`` (default) is vectorized end-to-end
and wins whenever block skipping cannot engage — which, measured
honestly, is EVERY regime reachable at sandbox corpus sizes (BENCH
'wand_regime' case publishes the numbers): an anchor selective
enough to fill the top-k still lands in every 128-posting hot block
at 100k docs, so WAND decodes what exhaustive decodes plus DAAT
overhead. ``wand`` is the 10^9-doc-regime path, where a top-k-filling
anchor IS sparser than one-per-hot-block (df_anchor x block_size <<
df_hot) and skipping prunes most of the hot lists; it also bounds
worst-case work when a per-term query cap is unacceptable. Both are
exact (property-tested identical). ``auto`` applies that
skip-engagement rule per call from driver-side df stats
(_auto_strategy).

Pruning uses a conservative epsilon (skip only when the bound is
below threshold - 1e-12) so float drift can never drop a true top-k
member; final ranking is exact on the surviving candidates.

Posting-cap semantics: the BUILD cap (reference bm25.py:190-191) is
honored physically by the sharded build — per-term global top-cap in
(tf desc, doc_id asc) order via threshold filtering at encode time
(shards.py _cap_thresholds), re-applied on every DML merge — so
capped indexes score rank-identically to the reference. The QUERY
cap (bm25.py:283 — score only the first N postings of the tf-ordered
list) is a traversal-order semantic the doc-ordered segments cannot
reproduce; that one is ENFORCED, not assumed: ``search_sharded``
raises when a configured query cap would actually bind for a queried
term, so it can never silently diverge — disable it (the at-scale
lossless mode) or use the logical path when query-cap semantics
matter.
"""

from __future__ import annotations

import heapq
import math
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25_chroma_spark.index.encode import varint_decode
from bm25_chroma_spark.index.shards import (
    ShardedIndex,
    decode_shards_to_postings,
)
from bm25_chroma_spark.operators.scoring import bm25_score_expr

_EPS = 1e-12


class _Cursor:
    """One (term, segment) posting list with block-skip support."""

    __slots__ = (
        "doc_b", "tf_b", "dl_b", "first", "n", "max_tf", "min_dl",
        "d_off", "t_off", "l_off", "weight", "k1", "b", "avgdl",
        "bi", "pos", "docs", "tfs", "dls", "cur", "global_ub", "ubs",
        "nblocks",
    )

    def __init__(self, row, idf_w: float, k1: float, b: float, avgdl: float):
        self.doc_b = bytes(row.doc_bytes)
        self.tf_b = bytes(row.tf_bytes)
        self.dl_b = bytes(row.dl_bytes)
        blocks = [dict(x) for x in row.blocks]
        self.first = np.array([x["first_doc"] for x in blocks], dtype=np.int64)
        self.n = np.array([x["n"] for x in blocks], dtype=np.int64)
        self.max_tf = np.array([x["max_tf"] for x in blocks], dtype=np.float64)
        self.min_dl = np.array([x["min_dl"] for x in blocks], dtype=np.float64)
        self.d_off = np.array(
            [x["doc_off"] for x in blocks] + [len(self.doc_b)], dtype=np.int64
        )
        self.t_off = np.array(
            [x["tf_off"] for x in blocks] + [len(self.tf_b)], dtype=np.int64
        )
        self.l_off = np.array(
            [x["dl_off"] for x in blocks] + [len(self.dl_b)], dtype=np.int64
        )
        self.nblocks = len(blocks)
        self.weight = idf_w  # idf * qtf
        self.k1, self.b, self.avgdl = k1, b, avgdl
        denom = self.max_tf + k1 * (1.0 - b + b * self.min_dl / avgdl)
        self.ubs = (
            idf_w * (self.max_tf * (k1 + 1.0)) / denom / np.sqrt(self.min_dl)
        )
        self.global_ub = float(self.ubs.max()) if self.nblocks else 0.0
        self.bi = -1
        self._load_block(0)

    def _load_block(self, bi: int):
        if bi >= self.nblocks:
            self.cur = math.inf
            return
        self.bi = bi
        deltas = varint_decode(
            self.doc_b[self.d_off[bi]:self.d_off[bi + 1]]
        )
        from bm25_chroma_spark.index.encode import _docs_from_deltas

        self.docs = _docs_from_deltas(int(self.first[bi]), deltas)
        self.tfs = varint_decode(
            self.tf_b[self.t_off[bi]:self.t_off[bi + 1]]
        ).astype(np.float64)
        self.dls = varint_decode(
            self.dl_b[self.l_off[bi]:self.l_off[bi + 1]]
        ).astype(np.float64)
        self.pos = 0
        self.cur = int(self.docs[0])

    def block_ub(self) -> float:
        return float(self.ubs[self.bi]) if self.cur != math.inf else 0.0

    def block_boundary(self) -> int:
        """Largest doc id that could live in the current block (doc
        ids span the full signed-64 range, e.g. xxhash64 ids)."""
        if self.cur == math.inf:
            return (1 << 63) - 1
        if self.bi + 1 < self.nblocks:
            return int(self.first[self.bi + 1]) - 1
        return (1 << 63) - 1

    def next_geq(self, target: int):
        if self.cur == math.inf or self.cur >= target:
            return
        if target > (1 << 63) - 1:  # beyond any representable doc id
            self.cur = math.inf
            return
        # block containing target: last block with first_doc <= target
        bi = int(np.searchsorted(self.first, target, side="right")) - 1
        bi = max(bi, self.bi)
        if bi != self.bi:
            self._load_block(bi)
            if self.cur == math.inf:
                return
        pos = int(np.searchsorted(self.docs, target, side="left"))
        while pos >= len(self.docs):
            if self.bi + 1 >= self.nblocks:
                self.cur = math.inf
                return
            self._load_block(self.bi + 1)
            pos = int(np.searchsorted(self.docs, target, side="left"))
        self.pos = pos
        self.cur = int(self.docs[pos])

    def advance(self):
        self.next_geq(self.cur + 1)

    def score_current(self) -> float:
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        return (
            self.weight * (tf * (self.k1 + 1.0)) / denom / math.sqrt(dl)
        )


def _bmw_topk(cursors: List[_Cursor], top_k: int) -> List[tuple]:
    """Block-Max WAND over independent posting-list cursors.

    Returns [(doc_id, score)] — exact top-k by (score desc, doc_id asc)
    thanks to conservative epsilon pruning.
    """
    heap: List[tuple] = []  # (score, -doc_id) min-heap of current top-k

    def theta() -> float:
        return heap[0][0] if len(heap) >= top_k else -math.inf

    live = [c for c in cursors if c.cur != math.inf]
    while live:
        live.sort(key=lambda c: c.cur)
        # pivot: smallest p with cumulative global ub above threshold
        acc = 0.0
        p = -1
        t = theta()
        for i, c in enumerate(live):
            acc += c.global_ub
            if acc >= t - _EPS:  # conservative: never skip a tie
                p = i
                break
        if p == -1:
            break  # no document can beat theta
        pivot_doc = live[p].cur
        if pivot_doc == math.inf:
            break
        if live[0].cur == pivot_doc:
            for c in live[: p + 1]:
                c.next_geq(pivot_doc)
            blk_ub = sum(
                c.block_ub() for c in live[: p + 1] if c.cur != math.inf
            )
            # include lists beyond p already sitting on pivot_doc
            for c in live[p + 1:]:
                if c.cur == pivot_doc:
                    blk_ub += c.block_ub()
            if blk_ub >= theta() - _EPS:
                score = 0.0
                matched = [c for c in live if c.cur == pivot_doc]
                for c in matched:
                    score += c.score_current()
                item = (score, -pivot_doc)
                if len(heap) < top_k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for c in matched:
                    c.advance()
            else:
                # shallow advance past the cheapest block boundary —
                # capped at the next list's current doc: beyond it,
                # lists > p contribute and the block bound no longer
                # covers the total score (Ding & Suel's d' rule)
                d2 = min(c.block_boundary() for c in live[: p + 1]) + 1
                if p + 1 < len(live):
                    d2 = min(d2, int(live[p + 1].cur))
                d2 = max(d2, pivot_doc + 1)
                for c in live[: p + 1]:
                    if c.cur < d2:
                        c.next_geq(d2)
        else:
            # advance the highest-impact list strictly below the pivot
            # (one at the pivot already would make next_geq a no-op
            # and stall the loop)
            behind = [c for c in live[:p] if c.cur < pivot_doc]
            cand = max(behind, key=lambda c: c.global_ub)
            cand.next_geq(pivot_doc)
        live = [c for c in live if c.cur != math.inf]

    out = [(-nd, s) for s, nd in heap]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def _auto_strategy(
    qt_data: List[tuple],
    df_by_term: dict,
    n: float,
    top_k: int,
    block_size: int,
) -> str:
    """Pick wand vs exhaustive from driver-side stats only (per-term
    df; no data touched).

    WAND beats the vectorized exhaustive scan only when block
    skipping mathematically ENGAGES: a high-idf ANCHOR term must
    (a) dominate the score (bounds discriminate), (b) have enough
    postings to fill the top-k by itself, and (c) be sparser than one
    posting per hot-term block — ``df_anchor * block_size <
    df_hot`` — otherwise every hot block contains an anchor doc and
    WAND decodes everything exhaustive does, plus DAAT overhead.

    Measured on this sandbox (100k-doc synthetic corpus, BENCH
    'wand_regime' case): condition (c) is unsatisfiable there
    (df_anchor>=3k needed to fill top-k x block 128 > df_hot~96k), and
    indeed exhaustive wins or ties every regime tried (hot-only 1.7s
    vs 2.4s; unique-rare 1.9s vs 3.2s; selective anchors ~2.2s vs
    ~2.4s, all overhead-dominated). At the 10^9-doc scale WAND exists
    for, (c) holds easily (df_anchor 10^4 x 128 << df_hot 10^8) and
    the rule routes there. Exhaustive stays the default for small
    total work, where fixed job overhead dominates either way."""

    def idf(df_t: float) -> float:
        return math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)

    votes = 0
    queries = {}
    for qid, term, _ in qt_data:
        queries.setdefault(qid, []).append(term)
    for terms in queries.values():
        dfs = [df_by_term.get(t, 0) for t in terms]
        total = sum(dfs)
        if total < 50_000:
            continue  # overhead-dominated: vectorized exhaustive wins
        pairs = [(idf(d), d) for d in dfs if d > 0]
        if not pairs:
            continue
        best_idf, best_df = max(pairs)
        worst_idf = min(i for i, _ in pairs)
        hot_df = max(d for _, d in pairs)
        anchor_strong = best_idf >= 1.0  # hot-only queries stay flat
        anchor_fills_topk = best_df >= 3 * top_k
        bounds_discriminate = worst_idf <= best_idf / 10.0
        skipping_engages = best_df * block_size < hot_df
        if (
            anchor_strong
            and anchor_fills_topk
            and bounds_discriminate
            and skipping_engages
        ):
            votes += 1
    return "wand" if votes * 2 >= len(queries) and votes else "exhaustive"


def search_sharded(
    index: ShardedIndex,
    queries: DataFrame,
    top_k: int = 50,
    strategy: str = "exhaustive",
    score_round: Optional[int] = None,
) -> DataFrame:
    """-> (query_id, doc_id, score, rank). Query terms drive bucket
    pruning; unknown terms drop out via the inner join (reference
    'continue', bm25.py:277-278). strategy: 'exhaustive' | 'wand' |
    'auto' (df/idf-based rule, see _auto_strategy).

    ``queries`` is a DataFrame (query_id, query_text) or a plain list
    of (query_id, query_text) pairs — the list form skips a
    collect() roundtrip for interactive callers."""
    cfg = index.config
    # queries are tiny by contract: get the raw texts driver-side and
    # tokenize with the same reference-parity function — avoids a
    # dedicated pandas-UDF Spark job per search call
    from collections import Counter

    from bm25_chroma_spark.functions.tokenizer import tokenize_py

    if isinstance(queries, DataFrame):
        spark = queries.sparkSession
        qpairs = [
            (int(r["query_id"]), r["query_text"])
            for r in queries.select(
                F.col(queries.columns[0]).alias("query_id"),
                F.col(queries.columns[1]).alias("query_text"),
            ).collect()
        ]
    else:
        spark = index.spark
        qpairs = [(int(a), b) for a, b in queries]
    qt_data = [
        (qid, term, int(qtf))
        for qid, qtext in qpairs
        for term, qtf in sorted(Counter(tokenize_py(qtext)).items())
    ]
    terms = sorted({t for _, t, _ in qt_data})
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank int"
        )
    qt = spark.createDataFrame(
        qt_data, "query_id long, term string, qtf int"
    )
    shards = index.shards_for_terms(terms)
    n, avgdl = float(index.n_docs), float(index.avgdl)

    # Per-term global df (sum over segments). Two execution shapes:
    # * query cap configured or strategy='auto' → collect driver-side
    #   (bounded by the query's term count) to ENFORCE the query-cap
    #   contract — the sharded path stores doc-ordered segments and
    #   cannot reproduce the reference's tf-ordered QUERY cap
    #   (bm25.py:283), so it refuses instead of silently diverging —
    #   and/or to feed the auto-strategy rule. (The BUILD cap needs no
    #   guard: the sharded build honors it physically, so stored dfs
    #   are already the capped dfs the reference feeds into IDF.)
    # * otherwise, with an explicit strategy → keep the df agg as a
    #   plan subtree under the broadcast join (no driver roundtrip).
    qcap = cfg.query_postings_cap
    dfs_subtree = shards.groupBy("term").agg(F.sum("df").alias("df"))
    if qcap is not None or strategy == "auto":
        df_rows = dfs_subtree.collect()
        if qcap is not None:
            hot = sorted(
                (r["term"], int(r["df"]))
                for r in df_rows
                if r["df"] > qcap
            )
            if hot:
                raise NotImplementedError(
                    "sharded search cannot reproduce the reference's "
                    "tf-ordered query-time posting cap and these "
                    f"query terms exceed it ({qcap}): {hot[:5]}. "
                    "Query with query_postings_cap=None (the at-scale "
                    "lossless mode) or use the logical path "
                    "(bm25_score_queries) for reference query-cap "
                    "semantics. (The build cap is fine: the sharded "
                    "build honors it physically.)"
                )
        dfs = spark.createDataFrame(
            [(r["term"], int(r["df"])) for r in df_rows],
            "term string, df long",
        )
        if strategy == "auto":
            strategy = _auto_strategy(
                qt_data,
                {r["term"]: int(r["df"]) for r in df_rows},
                n,
                top_k,
                cfg.block_size,
            )
    else:
        dfs = dfs_subtree

    if strategy == "exhaustive":
        decoded = decode_shards_to_postings(shards)
        joined = decoded.join(F.broadcast(dfs), "term").join(
            F.broadcast(qt), "term"
        )
        contrib = bm25_score_expr(
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.col("df").cast("double"),
            index.n_docs,
            avgdl,
            cfg.k1,
            cfg.b,
        ) * F.col("qtf").cast("double")
        scores = (
            joined.select("query_id", "doc_id", contrib.alias("c"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("c").alias("score"))
        )
        if score_round is not None:
            scores = scores.withColumn(
                "score", F.round("score", score_round)
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "doc_id", "score", "rank")
        )

    if strategy != "wand":
        raise ValueError(f"unknown strategy {strategy!r}")

    # --- Block-Max WAND, parallel per (query, segment) ---
    # Segments partition the DOC space (segment = f(doc_id)), so every
    # document's full score lives inside one segment: running an
    # independent WAND per (query, segment) and keeping each segment's
    # top-k provably covers the global top-k, while turning one big
    # DAAT loop over terms x segments cursors into S small parallel
    # loops over ~|query terms| cursors each.
    dfs_g = dfs.withColumnRenamed("df", "df_global")
    qshards = shards.join(F.broadcast(dfs_g), "term").join(
        F.broadcast(qt), "term"
    )
    k1, b = cfg.k1, cfg.b

    def run_query_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        cursors = []
        for r in pdf.itertuples(index=False):
            df_t = float(r.df_global)
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            w = idf * float(r.qtf)
            if len(r.blocks) == 0:
                continue
            cursors.append(_Cursor(r, w, k1, b, avgdl))
        top = _bmw_topk(cursors, top_k)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
            }
        )

    candidates = qshards.groupBy("query_id", "segment").applyInPandas(
        run_query_segment,
        schema="query_id long, doc_id long, score double",
    )
    if score_round is not None:
        candidates = candidates.withColumn(
            "score", F.round("score", score_round)
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "score", "rank")
    )
