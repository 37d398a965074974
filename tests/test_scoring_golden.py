"""Reference-as-oracle golden test: our Spark BM25 pipeline must be
rank-identical (and score-equal to ~1e-9 rel) to the reference
BM25.search (/root/reference/bm25_chroma/bm25.py:268-303) on the
deterministic synthetic source-code corpus + reference query set.

This is the exit criterion of SURVEY.md §7 step 3.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config
from bm25_chroma_spark.operators.index_build import build_logical_index
from bm25_chroma_spark.operators.scoring import bm25_score_queries
from bm25_chroma_spark.sources.corpus import (
    reference_query_set,
    synth_corpus_rows,
)

N_FILES = 300
TOP_K = 50


@pytest.fixture(scope="module")
def corpus_rows():
    return synth_corpus_rows(N_FILES, seed=42)


@pytest.fixture(scope="module")
def reference_results(reference_bm25_cls, corpus_rows):
    """Golden top-k per query from the reference engine, keyed by our
    dense doc_id (= row index; ids passed as stringified ints so the
    mapping is trivial and content-independent)."""
    ref = reference_bm25_cls()
    ref.add_chunks_batch(
        [(str(i), row[4]) for i, row in enumerate(corpus_rows)]
    )
    out = {}
    for qid, qtext in reference_query_set():
        out[qid] = [
            (int(cid), score) for cid, score in ref.search(qtext, TOP_K)
        ]
    return out


@pytest.fixture(scope="module")
def spark_results(spark, corpus_rows):
    docs = spark.createDataFrame(
        [(i, row[4]) for i, row in enumerate(corpus_rows)],
        "doc_id long, text string",
    )
    index = build_logical_index(docs, config=BM25Config())
    queries = spark.createDataFrame(
        reference_query_set(), "query_id long, query_text string"
    )
    res = bm25_score_queries(queries, index, top_k=TOP_K)
    rows = res.orderBy("query_id", "rank").collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"])
        )
    return out


def _tie_groups(ranked):
    """Group consecutive equal scores: rank order within a tie group is
    implementation-defined in the reference (dict insertion order)."""
    groups = []
    for doc, score in ranked:
        if groups and math.isclose(
            groups[-1][0], score, rel_tol=1e-9, abs_tol=1e-12
        ):
            groups[-1][1].add(doc)
        else:
            groups.append((score, {doc}))
    return groups


def test_rank_identical_to_reference(reference_results, spark_results):
    for qid, _ in reference_query_set():
        ref = reference_results.get(qid, [])
        got = spark_results.get(qid, [])
        assert len(ref) == len(got), f"query {qid}: result count"
        ref_groups = _tie_groups(ref)
        got_groups = _tie_groups(got)
        assert len(ref_groups) == len(got_groups), f"query {qid}"
        for (rs, rdocs), (gs, gdocs) in zip(ref_groups, got_groups):
            assert math.isclose(rs, gs, rel_tol=1e-9), (
                f"query {qid}: score {rs} vs {gs}"
            )
            assert rdocs == gdocs, f"query {qid}: tie group docs"


def test_empty_and_unknown_queries(spark, corpus_rows):
    docs = spark.createDataFrame(
        [(i, row[4]) for i, row in enumerate(corpus_rows[:20])],
        "doc_id long, text string",
    )
    index = build_logical_index(docs)
    queries = spark.createDataFrame(
        [(1, "zzzzz qqqqq"), (2, "a I"), (3, "")],
        "query_id long, query_text string",
    )
    assert bm25_score_queries(queries, index, top_k=10).count() == 0


def test_index_stats_match_reference(
    reference_bm25_cls, spark, corpus_rows
):
    ref = reference_bm25_cls()
    ref.add_chunks_batch(
        [(str(i), row[4]) for i, row in enumerate(corpus_rows[:100])]
    )
    docs = spark.createDataFrame(
        [(i, row[4]) for i, row in enumerate(corpus_rows[:100])],
        "doc_id long, text string",
    )
    index = build_logical_index(docs)
    assert index.n_docs == ref.chunk_count
    assert math.isclose(index.avgdl, ref.avg_chunk_length, rel_tol=1e-12)
    # vocabulary = distinct live terms
    vocab = {
        r["term"] for r in index.postings.select("term").collect()
    }
    assert vocab == ref.vocab
    # per-term df matches the reference's (capped) list lengths
    dfs = {
        r["term"]: r["df"]
        for r in index.postings.select("term", "df").collect()
    }
    for term, plist in ref.inverted_index.items():
        assert dfs[term] == len(plist), term
    # posting lists: same (doc, tf) multiset, our order pinned
    got = {
        r["term"]: [(p["doc_id"], p["tf"]) for p in r["postings"]]
        for r in index.postings.collect()
    }
    for term, plist in ref.inverted_index.items():
        ref_set = {(int(cid), tf) for tf, cid in plist}
        assert set(got[term]) == ref_set, term
        tfs = [tf for _, tf in got[term]]
        assert tfs == sorted(tfs, reverse=True), term
