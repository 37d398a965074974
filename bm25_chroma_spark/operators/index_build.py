"""Inverted-index construction as DataFrame transformations.

Logical model mirrors the reference's in-memory structures
(/root/reference/bm25_chroma/bm25.py:62-75): term -> posting list
sorted by tf desc (ties pinned to doc_id asc — the reference's tie
order is only partially determined, SURVEY.md §7 risk 1), capped at
``max_postings_per_term`` (bm25.py:56,190-191), doc lengths, and
corpus stats N/avgdl over *non-empty* docs (bm25.py:155-156,260-266).

Physical shape: the big ``groupBy(term)`` is the scaling bottleneck —
source-code term frequencies are Zipfian, so a vanilla groupBy is
hot-key bound. We run a **salted two-stage aggregation**:

  stage 1: groupBy(term, salt = pmod(xxhash64(doc_id), S))
           -> per-salt partial posting arrays, sorted + capped
  stage 2: groupBy(term) -> merge the <=S partial arrays, re-sort, cap

The cap makes stage 2 skew-free by construction: no term row ever
exceeds S * cap entries before the final truncation, and top-cap of a
union equals top-cap of per-part top-caps (order by (tf desc, doc_id
asc) is total). With the cap disabled the physical sharded path
(bm25_chroma_spark.index) keeps hot terms segmented instead.

Sorting trick: postings are carried as struct(neg_tf, doc_id, tf, dl)
so plain ``sort_array`` (lexicographic, whole-stage codegen) yields
(tf desc, doc_id asc) without a comparator lambda.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config, DEFAULT_CONFIG
from bm25_chroma_spark.functions.tokenizer import (
    sql_tokens,
    tokenized_struct_udf,
)


def tokenize_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_jvm: bool = False,
) -> DataFrame:
    """-> (doc_id, terms array<struct<term,tf>>, dl int), empty docs dropped.

    Dropping zero-token docs before stats replicates the reference's
    empty-doc skip (bm25.py:155-156): they contribute to neither N nor
    avgdl.
    """
    if use_jvm:
        # Pure-JVM fast path (ASCII corpora): tokens -> explode -> agg
        # happens downstream; here we still produce the struct shape.
        toks = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            sql_tokens(F.col(text_col)).alias("_toks"),
        ).withColumn("dl", F.size("_toks"))
        exploded = (
            toks.filter(F.col("dl") > 0)
            .select("doc_id", "dl", F.explode("_toks").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").cast("int").alias("tf"))
        )
        return (
            exploded.groupBy("doc_id", "dl")
            .agg(
                F.collect_list(F.struct("term", "tf")).alias("terms")
            )
            .select("doc_id", "terms", "dl")
        )
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokenized_struct_udf(F.col(text_col)).alias("_t"),
    )
    return tok.select(
        "doc_id", F.col("_t.terms").alias("terms"), F.col("_t.dl").alias("dl")
    ).filter(F.col("dl") > 0)


@dataclass
class LogicalIndex:
    """Uncompressed golden index: arrays per term + doc stats."""

    postings: DataFrame  # (term, df, postings array<struct<doc_id,tf,dl>>)
    doc_stats: DataFrame  # (doc_id, dl)
    n_docs: int
    avgdl: float
    config: BM25Config = DEFAULT_CONFIG

    def exploded(self, query_cap: Optional[int] = None) -> DataFrame:
        """(term, df, doc_id, tf, dl, pos) rows; pos is the 1-based rank
        within the term's list. ``query_cap`` pre-slices each list
        (reference's postings[:1000], bm25.py:283)."""
        arr = F.col("postings")
        if query_cap:
            arr = F.slice(arr, 1, query_cap)
        e = self.postings.select(
            "term", "df", F.posexplode(arr).alias("pos0", "p")
        )
        return e.select(
            "term",
            "df",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.tf").alias("tf"),
            F.col("p.dl").alias("dl"),
            (F.col("pos0") + 1).alias("pos"),
        )


def _sorted_capped(col, cap: Optional[int]):
    out = F.sort_array(col)
    if cap:
        out = F.slice(out, 1, cap)
    return out


def build_logical_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: BM25Config = DEFAULT_CONFIG,
    use_jvm_tokenizer: bool = False,
) -> LogicalIndex:
    """Full index build: tokenize -> salted two-stage groupBy(term)."""
    tokenized = tokenize_docs(docs, id_col, text_col, use_jvm_tokenizer)
    tokenized = tokenized.persist()

    doc_stats = tokenized.select("doc_id", "dl")
    row = tokenized.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs = int(row["n"] or 0)
    avgdl = float(row["avgdl"] or 0.0)

    flat = tokenized.select(
        "doc_id", "dl", F.explode("terms").alias("t")
    ).select(
        F.col("t.term").alias("term"),
        (-F.col("t.tf")).alias("neg_tf"),
        "doc_id",
        F.col("t.tf").alias("tf"),
        "dl",
    )

    cap = config.max_postings_per_term
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(config.salt_factor))
    partials = (
        flat.withColumn("salt", salt)
        .groupBy("term", "salt")
        .agg(
            _sorted_capped(
                F.collect_list(F.struct("neg_tf", "doc_id", "tf", "dl")), cap
            ).alias("plist")
        )
    )
    merged = partials.groupBy("term").agg(
        _sorted_capped(F.flatten(F.collect_list("plist")), cap).alias(
            "plist"
        )
    )
    postings = merged.select(
        "term",
        F.size("plist").cast("long").alias("df"),
        F.transform(
            "plist",
            lambda p: F.struct(
                p["doc_id"].alias("doc_id"),
                p["tf"].alias("tf"),
                p["dl"].alias("dl"),
            ),
        ).alias("postings"),
    )
    return LogicalIndex(
        postings=postings,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        config=config,
    )
