"""Reciprocal Rank Fusion.

Semantics of the reference ``reciprocal_rank_fusion``
(/root/reference/bm25_chroma/hybrid_retriever.py:11-26):

  rrf(doc) = sum_i weight_i / (k + rank_i(doc)),  k = 60
  weights = [bm25_ratio, 1 - bm25_ratio]
  ranks are 1-based positions in each input list
  output sorted by rrf desc, truncated to top_k

The defaultdict accumulation over both lists is a full outer join on
doc key, expressed here as union + groupBy-sum (no outer-join shuffle
of two sorted lists; the union aggregates in one pass). Ties pinned to
key asc.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    weights: Sequence[float],
    k: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    key_col: str = "doc_id",
    rank_col: str = "rank",
    score_round: Optional[int] = None,
) -> DataFrame:
    """Fuse N ranked lists -> (query_id, <key>, rrf_score, rank).

    Each input needs (query_col, key_col, rank_col). Empty inputs are
    legal: the reference falls back to whichever leg is non-empty
    (hybrid_retriever.py:291-298) — union semantics give that for
    free, per query.
    """
    if len(ranked_lists) != len(weights):
        raise ValueError("one weight per ranked list")
    parts: List[DataFrame] = []
    for df, w in zip(ranked_lists, weights):
        parts.append(
            df.select(
                F.col(query_col).alias("query_id"),
                F.col(key_col).alias("key"),
                (
                    F.lit(float(w))
                    / (F.lit(float(k)) + F.col(rank_col).cast("double"))
                ).alias("part"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "key").agg(
        F.sum("part").alias("rrf_score")
    )
    if score_round is not None:
        fused = fused.withColumn(
            "rrf_score", F.round("rrf_score", score_round)
        )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("key")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("key").alias(key_col),
            "rrf_score",
            "rank",
        )
    )


def rrf_fuse_py(
    results_list: Sequence[Sequence[tuple]],
    bm25_ratio: float = 0.5,
    k: int = 60,
    top_k: int = 10,
) -> List[tuple]:
    """Driver-side reference-shaped RRF over [(key, score)] lists —
    used by the facade for already-collected small lists and as the
    oracle in tests. Mirrors hybrid_retriever.py:11-26 semantics with
    ties pinned to key asc."""
    weights = [bm25_ratio, 1.0 - bm25_ratio]
    acc: dict = {}
    for i, ranked in enumerate(results_list):
        w = weights[i] if i < len(weights) else 1.0
        for rank, (key, _score) in enumerate(ranked, start=1):
            acc[key] = acc.get(key, 0.0) + w / (k + rank)
    out = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return out[:top_k]
