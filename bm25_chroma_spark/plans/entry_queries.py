"""Driver-contract query catalog.

Each entry pairs a Spark implementation (running the engine's real
operator paths) with an ANSI-SQL oracle DuckDB can evaluate over the
same parquet tables. Column names and rounding are pinned on both
sides because the driver hashes values after sorting columns by name.

Tokenization in SQL uses DuckDB's RE2 '\\b[a-zA-Z0-9]+\\b', which
agrees with the Python/Java regex on ASCII input (the fixtures are
ASCII); query strings are tokenized at SQL-generation time with the
engine tokenizer so both sides see identical (term, qtf) sets.

Scores are rounded to 6 decimals BEFORE ranking on both sides so
float-association drift between engines can't flip a rank.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config
from bm25_chroma_spark.functions.tokenizer import tokenize_py
from bm25_chroma_spark.operators.index_build import build_logical_index
from bm25_chroma_spark.operators.scoring import bm25_score_queries

K1 = 1.5
B = 0.75
ROUND = 6
TOP_K = 10

# Fixed flagship query set over the driver `documents` fixture
# (30-term vocabulary; includes duplicate tokens, unknown terms,
# mixed case — the semantics the reference pins down).
FLAGSHIP_QUERIES: List[Tuple[int, str]] = [
    (1, "spark join hash"),
    (2, "window agg group sort"),
    (3, "merge merge batch"),
    (4, "customer order line"),
    (5, "slow query scan filter"),
    (6, "vector stream data"),
    (7, "zzzunknown spark"),
    (8, "the table DUP"),
]

# SQL fragment: tokenized docs with per-doc length, empty docs dropped.
_SQL_DOCS = r"""
docs AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\b[a-zA-Z0-9]+\b'),
                     t -> length(t) BETWEEN 2 AND 50) AS toks
  FROM documents
),
ne AS (
  SELECT doc_id, toks, len(toks)::INT AS dl FROM docs WHERE len(toks) > 0
)
"""

_SQL_TF = """
flat AS (SELECT doc_id, dl, unnest(toks) AS term FROM ne),
tf AS (
  SELECT doc_id, term, count(*)::INT AS tf, any_value(dl) AS dl
  FROM flat GROUP BY doc_id, term
)
"""


def _query_values_sql() -> str:
    rows = []
    for qid, text in FLAGSHIP_QUERIES:
        for term, qtf in sorted(Counter(tokenize_py(text)).items()):
            rows.append(f"({qid}, '{term}', {qtf})")
    return ",\n        ".join(rows)


def _load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str):
    return build_logical_index(
        _load_docs(spark, sf_dir), id_col="doc_id", text_col="text",
        config=BM25Config(),
    )


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        FLAGSHIP_QUERIES, "query_id long, query_text string"
    )


# ----------------------------------------------------------------- #
# Spark-side implementations                                        #
# ----------------------------------------------------------------- #

def q_doc_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row ingest invariant: doc_uid = sha2(content, 256)."""
    return _load_docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("doc_uid")
    )


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.doc_stats.select("doc_id", F.col("dl").cast("int").alias("dl"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return spark.createDataFrame(
        [(idx.n_docs, round(idx.avgdl, ROUND))], "n_docs long, avgdl double"
    )


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.postings.select("term", F.col("df").cast("long").alias("df"))


def q_term_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    n = float(idx.n_docs)
    idf = F.log(
        (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    return idx.postings.select(
        "term", F.round(idf, ROUND).alias("idf")
    )


def q_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    return idx.exploded().select(
        "term", "doc_id", F.col("tf").cast("int").alias("tf")
    )


def q_postings_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists with their pinned in-list rank (tf desc, doc_id asc)."""
    idx = _index(spark, sf_dir)
    return idx.exploded().select(
        "term",
        "doc_id",
        F.col("tf").cast("int").alias("tf"),
        F.col("pos").cast("int").alias("pos"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index(spark, sf_dir)
    res = bm25_score_queries(
        _queries_df(spark), idx, top_k=TOP_K, score_round=ROUND
    )
    return res.select(
        "query_id", "doc_id", "score", F.col("rank").cast("int").alias("rank")
    )


# ----------------------------------------------------------------- #
# DuckDB oracles                                                    #
# ----------------------------------------------------------------- #

_ORACLES: Dict[str, str] = {}

_ORACLES["doc_uid"] = (
    "SELECT doc_id, sha256(text) AS doc_uid FROM documents"
)

_ORACLES["doc_lengths"] = f"WITH {_SQL_DOCS} SELECT doc_id, dl FROM ne"

_ORACLES["corpus_stats"] = (
    f"WITH {_SQL_DOCS} SELECT count(*)::BIGINT AS n_docs, "
    f"round(avg(dl), {ROUND}) AS avgdl FROM ne"
)

_ORACLES["term_df"] = (
    f"WITH {_SQL_DOCS}, {_SQL_TF} "
    "SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term"
)

_ORACLES["term_idf"] = f"""
WITH {_SQL_DOCS}, {_SQL_TF},
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
stats AS (SELECT count(*)::DOUBLE AS n FROM ne)
SELECT term,
       round(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0), {ROUND}) AS idf
FROM df, stats s
"""

_ORACLES["term_tf"] = (
    f"WITH {_SQL_DOCS}, {_SQL_TF} SELECT term, doc_id, tf FROM tf"
)

_ORACLES["postings_rank"] = f"""
WITH {_SQL_DOCS}, {_SQL_TF}
SELECT term, doc_id, tf,
       row_number() OVER (
         PARTITION BY term ORDER BY tf DESC, doc_id ASC
       )::INT AS pos
FROM tf
"""


def _bm25_oracle() -> str:
    return f"""
WITH {_SQL_DOCS}, {_SQL_TF},
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM ne),
q(query_id, term, qtf) AS (VALUES
        {_query_values_sql()}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * {K1 + 1.0}) /
             (tf.tf + {K1} * ({1.0 - B} + {B} * tf.dl / s.avgdl))
           / sqrt(tf.dl) * q.qtf
         ) AS raw
  FROM q
  JOIN df USING (term)
  JOIN tf USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(raw, {ROUND}) AS score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(raw, {ROUND}) DESC, doc_id ASC
         )::INT AS rank
  FROM scored
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""


_ORACLES["bm25_topk"] = _bm25_oracle()


def spark_queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_uid": q_doc_uid,
        "doc_lengths": q_doc_lengths,
        "corpus_stats": q_corpus_stats,
        "term_df": q_term_df,
        "term_idf": q_term_idf,
        "term_tf": q_term_tf,
        "postings_rank": q_postings_rank,
        "bm25_topk": q_bm25_topk,
    }


def oracle_queries() -> Dict[str, str]:
    return dict(_ORACLES)
