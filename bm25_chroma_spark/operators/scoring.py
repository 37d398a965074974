"""BM25 query scoring as a declarative DataFrame plan.

Formula parity with the reference scorer
(/root/reference/bm25_chroma/bm25.py:268-310):

  idf(t)     = ln((N - n_t + 0.5) / (n_t + 0.5) + 1)   [bm25.py:310]
               where n_t is the *capped* posting-list length
  bm25(t, d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                                                        [bm25.py:290-292]
  score     *= 1/sqrt(dl)   (unconditional Solr norm)   [bm25.py:294-296]
  doc score  = sum over query-token OCCURRENCES (duplicate query
               tokens count per occurrence, bm25.py:276) — expressed
               here as sum(score * qtf)

Physical plan: the query side is tiny, so it is **broadcast** into the
postings join; the only wide shuffles are the per-doc score sum and
the per-query top-k (which Spark executes as TakeOrderedAndProject
when collected). All expressions are JVM built-ins — the sole Python
is the Arrow-vectorized query tokenizer.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config, DEFAULT_CONFIG
from bm25_chroma_spark.functions.tokenizer import tokens_udf
from bm25_chroma_spark.operators.index_build import LogicalIndex


def query_terms(queries: DataFrame, id_col: str = "query_id",
                text_col: str = "query_text") -> DataFrame:
    """(query_id, term, qtf) — qtf = occurrences of term in the query."""
    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(tokens_udf(F.col(text_col))).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("int").alias("qtf"))
    )


def bm25_score_expr(tf, dl, df, n_docs: int, avgdl: float,
                    k1: float, b: float):
    """Per-posting BM25 x Solr-norm contribution (column expression)."""
    idf = F.log(
        (F.lit(float(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl)
    )
    return idf * (tf * F.lit(k1 + 1.0)) / denom / F.sqrt(dl)


def bm25_score_queries(
    queries: DataFrame,
    index: LogicalIndex,
    top_k: int = 50,
    config: Optional[BM25Config] = None,
    score_round: Optional[int] = None,
) -> DataFrame:
    """-> (query_id, doc_id, score, rank), rank 1..top_k per query.

    Ties broken by doc_id asc (pinned total order; the reference's tie
    order is Python-dict insertion order — SURVEY.md §7 risk 1).
    ``score_round`` rounds before ranking for cross-engine float
    stability (used by the DuckDB-oracle-facing queries).
    """
    cfg = config or index.config
    qt = query_terms(queries)

    # join BEFORE exploding: only the query's terms ever decompress
    # their posting arrays (the explode of non-matching terms would
    # dominate at scale — Catalyst cannot push a join below Generate)
    arr = F.col("postings")
    if cfg.query_postings_cap:
        arr = F.slice(arr, 1, cfg.query_postings_cap)
    matched = index.postings.join(F.broadcast(qt), "term", "inner")
    joined = matched.select(
        "query_id",
        "qtf",
        "df",
        F.explode(arr).alias("p"),
    ).select(
        "query_id",
        "qtf",
        "df",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.dl").alias("dl"),
    )

    contrib = bm25_score_expr(
        F.col("tf").cast("double"),
        F.col("dl").cast("double"),
        F.col("df").cast("double"),
        index.n_docs,
        index.avgdl,
        cfg.k1,
        cfg.b,
    ) * F.col("qtf").cast("double")

    scores = (
        joined.select("query_id", "doc_id", contrib.alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    if score_round is not None:
        scores = scores.withColumn("score", F.round("score", score_round))

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "score", "rank")
    )
