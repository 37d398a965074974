"""Physical sharded index: build, prune, decode, resume, WAND parity.

The pruning-equivalence property (SURVEY.md §5.4): block-max WAND
top-k must equal the exhaustive scorer's top-k, which in turn must
equal the logical (array) path — which the golden suite already ties
to the reference engine.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

from bm25_chroma_spark.config import BM25Config
from bm25_chroma_spark.index.shards import (
    ShardedIndex,
    build_sharded_index,
    bucket_of,
    decode_shards_to_postings,
)
from bm25_chroma_spark.index.wand import search_sharded
from bm25_chroma_spark.operators.index_build import build_logical_index
from bm25_chroma_spark.operators.scoring import bm25_score_queries
from bm25_chroma_spark.sources.corpus import (
    reference_query_set,
    synth_corpus_rows,
)

N_FILES = 250
CFG = BM25Config(num_term_buckets=8, salt_factor=4, block_size=16)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = synth_corpus_rows(N_FILES, seed=7)
    return spark.createDataFrame(
        [(i, r[4]) for i, r in enumerate(rows)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def shard_dir(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "shards_v1")
    metrics = build_sharded_index(
        docs_df, out, config=CFG, bucket_groups=3
    )
    assert metrics["postings"] > 0
    return out


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(
        reference_query_set(), "query_id long, query_text string"
    )


def test_manifests_and_stats(shard_dir):
    base = Path(shard_dir)
    stats = json.loads((base / "stats.json").read_text())
    assert stats["n_docs"] == N_FILES
    mans = sorted((base / "manifests").glob("group_*.json"))
    assert len(mans) == 3
    for m in mans:
        man = json.loads(m.read_text())
        assert man["status"] == "complete"
        assert man["metrics"]["postings"] > 0
        assert man["metrics"]["bytes"] > 0
        assert man["metrics"]["skew_ratio"] >= 1.0
        assert man["lineage"]["input_docs"] == N_FILES


def test_decode_matches_logical(spark, docs_df, shard_dir):
    """Shard decode reproduces the logical index's postings exactly."""
    idx = ShardedIndex(spark, shard_dir)
    all_terms = [
        r["term"]
        for r in spark.read.option(
            "basePath", str(Path(shard_dir) / "shards")
        ).parquet(
            *[str(Path(shard_dir) / "shards" / f"group={g}") for g in range(3)]
        ).select("term").distinct().collect()
    ]
    decoded = decode_shards_to_postings(idx.shards_for_terms(all_terms))
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in decoded.collect()
    }
    logical = build_logical_index(docs_df, config=CFG)
    want = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in logical.exploded().collect()
    }
    assert got == want


def test_bucket_pruning_is_exact(spark, shard_dir):
    """Every shard row for a term lives in the bucket the driver-side
    hash predicts."""
    idx = ShardedIndex(spark, shard_dir)
    rows = idx.shards_for_terms(["import", "def", "return"]).collect()
    assert rows
    for r in rows:
        assert r["bucket"] == bucket_of(r["term"], CFG.num_term_buckets)


def test_exhaustive_matches_logical_scorer(
    spark, docs_df, shard_dir, queries_df
):
    logical = build_logical_index(docs_df, config=CFG)
    want = bm25_score_queries(queries_df, logical, top_k=30).collect()
    idx = ShardedIndex(spark, shard_dir)
    got = search_sharded(idx, queries_df, top_k=30, strategy="exhaustive")
    got = got.collect()
    w = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in want}
    g = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in got}
    assert set(w) == set(g)
    for k in w:
        assert w[k][0] == g[k][0], k
        assert math.isclose(w[k][1], g[k][1], rel_tol=1e-9), k


def test_wand_matches_exhaustive(spark, shard_dir, queries_df):
    idx = ShardedIndex(spark, shard_dir)
    ex = search_sharded(idx, queries_df, top_k=20, strategy="exhaustive")
    wd = search_sharded(idx, queries_df, top_k=20, strategy="wand")
    e = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in ex.collect()}
    w = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in wd.collect()}
    assert set(e) == set(w)
    for k in e:
        assert e[k][0] == w[k][0], (k, e[k], w[k])
        assert math.isclose(e[k][1], w[k][1], rel_tol=1e-9), k


def test_resume_after_crash(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "resume_v1")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_sharded_index(
            docs_df, out, config=CFG, bucket_groups=3,
            _fail_after_groups=1,
        )
    mans = list((Path(out) / "manifests").glob("group_*.json"))
    assert len(mans) == 1  # one group checkpointed before the crash

    metrics = build_sharded_index(
        docs_df, out, config=CFG, bucket_groups=3, resume=True
    )
    assert len(list((Path(out) / "manifests").glob("group_*.json"))) == 3

    # resumed index identical content to a clean build
    clean = str(tmp_path_factory.mktemp("index") / "clean_v1")
    build_sharded_index(docs_df, clean, config=CFG, bucket_groups=3)

    def snapshot(d):
        df = spark.read.option(
            "basePath", str(Path(d) / "shards")
        ).parquet(
            *[str(Path(d) / "shards" / f"group={g}") for g in range(3)]
        )
        return {
            (r["term"], r["segment"]): (
                r["df"],
                bytes(r["doc_bytes"]),
                bytes(r["tf_bytes"]),
                bytes(r["dl_bytes"]),
            )
            for r in df.collect()
        }

    assert snapshot(out) == snapshot(clean)
    assert metrics["postings"] > 0


def test_resume_rejects_config_change(spark, docs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "cfg_v1")
    build_sharded_index(docs_df, out, config=CFG, bucket_groups=2)
    with pytest.raises(ValueError, match="different config"):
        build_sharded_index(
            docs_df, out, config=BM25Config(num_term_buckets=4),
            bucket_groups=2,
        )
