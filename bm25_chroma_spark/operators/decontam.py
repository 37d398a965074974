"""Benchmark decontamination: flag training documents that share a
word n-gram with a (small) benchmark/eval set — the standard
published recipe for preventing test-set leakage in LLM training
corpora (GPT-3 appendix C / Llama-style 13-gram overlap matching;
public knowledge, no reference-repo counterpart).

Design for 100 TB:

* The benchmark side is tiny by construction (eval sets are MBs), so
  its distinct grams are **broadcast** — the corpus-sized side never
  shuffles to meet it.
* The corpus side's n-gram generation is a narrow map (`word_ngrams`
  JVM expression + explode) pipelined straight into the broadcast
  hash join; rows that match no benchmark gram die in the join, so
  the only shuffle is the final per-doc count over the (rare)
  matching rows.
* With ``hash_grams=True`` (default) both sides join on
  ``xxhash64(gram)`` instead of the gram string: fixed 8-byte keys
  instead of ~100-byte strings in the hash table and on the wire.
  A 64-bit collision could at worst over-flag one document
  (conservative direction for decontamination); pass
  ``hash_grams=False`` for exact string matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.text_analysis import word_ngrams


def doc_ngrams_df(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into its word n-grams ->
    (id_col, gram). Narrow map-side transform, no shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_grams: bool = True,
) -> DataFrame:
    """Documents sharing at least one word n-gram with the benchmark
    set -> (id_col, n_hit_grams) where n_hit_grams counts the
    DISTINCT benchmark grams the document contains.

    The benchmark grams are deduplicated and broadcast; the corpus
    side streams through the broadcast hash join without shuffling.
    """
    bcol = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(bcol), n)).alias("gram")
    )
    grams = doc_ngrams_df(docs, n, text_col=text_col, id_col=id_col)
    if hash_grams:
        # hash BEFORE the dedup: equal strings hash equal, so one
        # distinct on the 8-byte keys replaces a string-level distinct
        # followed by a second aggregation
        bench_grams = bench_grams.select(
            F.xxhash64("gram").alias("gram_key")
        )
        grams = grams.select(
            id_col, F.xxhash64("gram").alias("gram_key")
        )
        key = "gram_key"
    else:
        key = "gram"
    bench_grams = bench_grams.distinct()
    hits = grams.join(F.broadcast(bench_grams), key)
    return hits.groupBy(id_col).agg(
        F.count_distinct(key).cast("int").alias("n_hit_grams")
    )


def purge_contaminated(
    docs: DataFrame,
    contaminated: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop flagged documents (broadcast anti-join: the contaminated
    id set is small relative to the corpus)."""
    return docs.join(
        F.broadcast(contaminated.select(id_col)), id_col, "left_anti"
    )
