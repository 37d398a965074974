"""Vector leg + RRF fusion: exact KNN vs numpy oracle, LSH recall,
fusion vs the reference RRF semantics."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bm25_chroma_spark.operators.fusion import rrf_fuse, rrf_fuse_py
from bm25_chroma_spark.operators.knn import (
    knn_bruteforce,
    knn_lsh,
    lsh_recall_vs_exact,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb_df):
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, qv, k):
    qv = np.asarray(qv, dtype=np.float64)
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    dist = 1.0 - cos
    order = np.lexsort((ids, dist))[:k]
    return [(int(ids[i]), float(dist[i])) for i in order]


def test_knn_exact_matches_numpy(spark, emb_df, emb_np):
    ids, mat = emb_np
    queries = [mat[3].tolist(), mat[77].tolist(), (mat[5] + 0.1).tolist()]
    res = knn_bruteforce(emb_df, queries, k=7)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["dist"], r["sim"])
        )
    for qid, qv in enumerate(queries):
        want = _numpy_topk(ids, mat, qv, 7)
        rows = sorted(got[qid])
        assert [v for _, v, _, _ in rows] == [d for d, _ in want]
        for (_, _, dist, sim), (_, wd) in zip(rows, want):
            assert math.isclose(dist, wd, rel_tol=1e-9, abs_tol=1e-12)
            assert math.isclose(sim, 1.0 / (1.0 + dist), rel_tol=1e-12)


def test_knn_self_is_nearest(spark, emb_df, emb_np):
    ids, mat = emb_np
    res = knn_bruteforce(emb_df, [mat[42].tolist()], k=1).collect()
    assert res[0]["vec_id"] == int(ids[42])
    assert res[0]["dist"] < 1e-9


def test_knn_l2(spark, emb_df, emb_np):
    ids, mat = emb_np
    qv = mat[10]
    res = knn_bruteforce(emb_df, [qv.tolist()], k=5, metric="l2").collect()
    d = np.linalg.norm(mat - qv, axis=1)
    order = np.lexsort((ids, d))[:5]
    assert [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"])] == [
        int(ids[i]) for i in order
    ]


def test_knn_lsh_plan_scans_vectors_twice(spark, emb_df, emb_np):
    """Plan-shape regression guard for the id-only candidate design:
    the embeddings table appears in the physical plan exactly TWICE
    (one posexplode'd signature pass + one rerank vector join), not
    once per hash table, and the candidate-dedup exchange carries only
    (query_id, vec_id) — no vector columns ride the shuffle."""
    import io
    import re
    from contextlib import redirect_stdout

    _, mat = emb_np
    df = knn_lsh(emb_df, [mat[0].tolist()], k=5, n_tables=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scans = [
        ln for ln in plan.splitlines() if "Location: InMemoryFileIndex" in ln
    ]
    assert len(scans) == 2, plan[:1500]
    # the distinct's exchange partitions on the bare id pair
    ex = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(query_id" in ln and "vec_id" in ln
    ]
    assert ex, plan[:1500]
    assert not any("vec#" in ln or "qvec#" in ln for ln in ex), ex


def test_lsh_recall(spark, emb_df, emb_np):
    ids, mat = emb_np
    queries = [mat[i].tolist() for i in (1, 50, 200)]
    recall = lsh_recall_vs_exact(
        emb_df, queries, k=10, n_planes=6, n_tables=8, multiprobe=1
    )
    # fixture embeddings are weakly clustered (true neighbors at
    # cosine dist ~0.6+), a hard case for hyperplane LSH
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_lsh_shape(spark, emb_df, emb_np):
    _, mat = emb_np
    res = knn_lsh(emb_df, [mat[0].tolist()], k=5, n_planes=8, n_tables=4)
    rows = res.collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["vec_id"] is not None


def test_ivf_recall_and_candidate_restriction(spark, emb_df, emb_np):
    """IVF probes only nprobe cells: every result must come from the
    query's probed cells (structural check), recall vs exact top-k
    must be reasonable at nprobe=3/8, and nprobe=n_cells must equal
    exact KNN exactly (probing everything degenerates to brute
    force)."""
    from bm25_chroma_spark.operators.knn import (
        ivf_assign_cells,
        ivf_seed_centroids,
        knn_ivf,
    )
    from pyspark.sql import functions as F

    ids, mat = emb_np
    qvecs = [list(map(float, mat[3])), list(map(float, mat[77]))]
    k = 10

    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_bruteforce(emb_df, qvecs, k=k).collect()
    }
    approx_rows = knn_ivf(
        emb_df, qvecs, k=k, n_cells=8, nprobe=3
    ).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    assert len(approx & exact) / len(exact) >= 0.5

    # structural: results live in the probed cells only
    cents = ivf_seed_centroids(emb_df, 8)
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_cells(
            emb_df.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("vec"),
            ),
            cents,
        ).collect()
    }
    for qid, qv in enumerate(qvecs):
        probe_rows = knn_ivf(
            emb_df, [qv], k=10**6, n_cells=8, nprobe=3
        ).collect()
        got_cells = {cells[r["vec_id"]] for r in probe_rows}
        assert len(got_cells) <= 3

    # nprobe = n_cells -> exact
    full = {
        (r["query_id"], r["vec_id"], round(r["dist"], 9))
        for r in knn_ivf(emb_df, qvecs, k=k, n_cells=8, nprobe=8).collect()
    }
    want = {
        (r["query_id"], r["vec_id"], round(r["dist"], 9))
        for r in knn_bruteforce(emb_df, qvecs, k=k).collect()
    }
    assert full == want


def test_ivf_trained_centroids_beat_seeds(spark):
    """Lloyd-trained centroids must dominate the deterministic medoid
    seeds on clustered data at equal nprobe: the fixture assigns
    cluster membership in ID BLOCKS, so the medoid seeds (vectors of
    the n_cells smallest ids) all land inside ONE cluster — the
    worst-case init — while a few distributed k-means iterations
    recover the true cluster structure."""
    from bm25_chroma_spark.operators.knn import (
        ivf_seed_centroids,
        ivf_train_centroids,
        knn_ivf,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 8) * 4.0
    rows = []
    for i in range(400):
        c = centers[i // 100]  # block assignment: ids 0-99 cluster 0...
        rows.append((i, (c + rng.randn(8) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvecs = [rows[i][1] for i in (10, 150, 250, 350)]
    k = 10

    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_bruteforce(df, qvecs, k=k).collect()
    }
    seeds = ivf_seed_centroids(df, 8)
    trained = ivf_train_centroids(df, 8, n_iters=5)
    assert len(trained) == 8 and len(trained[0]) == 8

    def recall(cents, nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in knn_ivf(
                df, qvecs, k=k, n_cells=8, nprobe=nprobe,
                centroids=cents,
            ).collect()
        }
        return len(got & exact) / len(exact)

    # single-probe regime (where the quantizer quality is the whole
    # game): measured on this fixture, seeds 0.925 / trained 0.975
    r_seed = recall(seeds, 1)
    r_trained = recall(trained, 1)
    assert r_trained >= r_seed, (r_trained, r_seed)
    assert r_trained >= 0.9, r_trained

    # trained cells are also BETTER BALANCED (the at-scale win: probe
    # cost ~ max cell size; degenerate seeds leave >25% of the corpus
    # in one cell)
    def max_cell(cents):
        from bm25_chroma_spark.operators.knn import ivf_assign_cells
        from pyspark.sql import functions as F

        e = df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("vec")
        )
        return max(
            r["n"]
            for r in ivf_assign_cells(e, cents)
            .groupBy("cell").agg(F.count("*").alias("n")).collect()
        )

    assert max_cell(trained) <= max_cell(seeds)

    # determinism: same input -> identical centroids
    again = ivf_train_centroids(df, 8, n_iters=5)
    assert trained == again


def test_ivf_partitioned_store_prunes_and_matches(
    spark, emb_df, emb_np, tmp_path
):
    """The materialized inverted file (partitionBy cell) returns the
    same top-k as the in-memory IVF, and the scan plan carries the
    probed cells as PartitionFilters — directory-level pruning, the
    at-scale claim made in the docstrings."""
    import io
    from contextlib import redirect_stdout
    from pathlib import Path

    from bm25_chroma_spark.operators.knn import (
        ivf_seed_centroids,
        ivf_write_partitioned,
        knn_ivf,
        knn_ivf_partitioned,
    )

    ids, mat = emb_np
    cents = ivf_seed_centroids(emb_df, 8)
    path = str(tmp_path / "ivf_store")
    ivf_write_partitioned(emb_df, path, cents)
    cells_on_disk = {
        p.name for p in Path(path).iterdir() if p.name.startswith("cell=")
    }
    assert cells_on_disk  # hive-style cell directories

    qvecs = [list(map(float, mat[3])), list(map(float, mat[77]))]
    part_df = knn_ivf_partitioned(
        spark, path, qvecs, cents, k=10, nprobe=3
    )
    part = part_df.collect()
    mem = knn_ivf(
        emb_df, qvecs, k=10, n_cells=8, nprobe=3, centroids=cents,
        method="pandas",
    ).collect()
    assert sorted(map(tuple, part)) == sorted(map(tuple, mem))

    # both probe-selection regimes (tiny expr job vs driver numpy
    # matmul) pick the same cells on the ulp-tie-free fixture
    part_pd = knn_ivf_partitioned(
        spark, path, qvecs, cents, k=10, nprobe=3,
        probe_method="pandas",
    ).collect()
    assert sorted(map(tuple, part_pd)) == sorted(map(tuple, part))

    buf = io.StringIO()
    with redirect_stdout(buf):
        part_df.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan[:2000]


def test_ivf_pandas_quantizer_matches_expr(spark, emb_df, emb_np):
    """The Arrow-vectorized quantizer (the large-n_cells form that
    avoids a 64k-literal Catalyst expression) must assign the same
    cells and return the same top-k as the expression form on the
    fixture (ulp-tie-free), and the auto switch must route a
    sqrt(N)-sized quantizer to it without blowing up the plan."""
    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.knn import (
        _use_expr_quantizer,
        ivf_assign_cells,
        ivf_seed_centroids,
        knn_ivf,
    )

    ids, mat = emb_np
    cents = ivf_seed_centroids(emb_df, 8)
    e = emb_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    a = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_cells(e, cents, method="expr").collect()
    }
    b = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_cells(e, cents, method="pandas").collect()
    }
    assert a == b

    qvecs = [list(map(float, mat[3])), list(map(float, mat[77]))]
    ex = knn_ivf(emb_df, qvecs, k=10, n_cells=8, nprobe=3,
                 method="expr").collect()
    pa = knn_ivf(emb_df, qvecs, k=10, n_cells=8, nprobe=3,
                 method="pandas").collect()
    assert sorted(map(tuple, ex)) == sorted(map(tuple, pa))

    # auto: a 100-cell x 64-dim quantizer (6400 literals) routes to
    # pandas and still runs end-to-end
    big = [list(map(float, mat[i])) for i in range(100)]
    assert not _use_expr_quantizer(big, "auto")
    rows = knn_ivf(
        emb_df, qvecs, k=5, n_cells=100, nprobe=10, centroids=big
    ).collect()
    assert len(rows) == 10


def test_facade_ann_leg(spark, tmp_path):
    """With ann_threshold forced to 1 doc, the retriever's vector leg
    routes through IVF (trained, cached quantizer) instead of exact
    KNN; overlap with the exact leg must meet the documented bound
    (0.8 at default nprobe, 0.9 at nprobe=n_cells/2 — this fixture's
    near-tie hashed-BoW vectors are the adversarial case) and the
    centroid cache must invalidate on DML."""
    from bm25_chroma_spark.plans.retriever import SparkHybridRetriever

    rng = np.random.RandomState(11)
    texts, uids = [], []
    vocab = ["spark", "join", "shuffle", "index", "garden", "tulip",
             "varint", "posting", "wand", "block"]
    for i in range(60):
        words = rng.choice(vocab, size=6)
        texts.append(" ".join(words))
        uids.append(f"d{i:03d}")

    exact_r = SparkHybridRetriever(
        spark, str(tmp_path / "exact"), ann_threshold=None
    )
    exact_r.add_documents_batch(texts, list(uids))
    ann_r = SparkHybridRetriever(
        spark, str(tmp_path / "ann"), ann_threshold=1
    )
    ann_r.add_documents_batch(texts, list(uids))

    q = "spark shuffle join"
    exact_top = [u for u, _ in exact_r.search_vector(q, top_k=10)]
    ann_top = [u for u, _ in ann_r.search_vector(q, top_k=10)]
    assert ann_r._ann_state is not None  # the IVF path actually ran
    # routing is never silent: callers can always tell which engine
    # served the vector leg (ADVICE r4)
    assert exact_r.last_vector_route == "exact"
    assert ann_r.last_vector_route == "ivf"
    overlap = len(set(exact_top) & set(ann_top)) / len(exact_top)
    assert overlap >= 0.8, (overlap, exact_top, ann_top)

    # widening the probes recovers recall (documented knob)
    ann_r.ann_nprobe = len(ann_r._ann_state[1]) // 2
    wide_top = [u for u, _ in ann_r.search_vector(q, top_k=10)]
    wide = len(set(exact_top) & set(wide_top)) / len(exact_top)
    assert wide >= 0.9, (wide, exact_top, wide_top)
    ann_r.ann_nprobe = None

    # sims on the shared results are identical (rerank is exact)
    e = dict(exact_r.search_vector(q, top_k=10))
    a = dict(ann_r.search_vector(q, top_k=10))
    for u in set(e) & set(a):
        assert math.isclose(e[u], a[u], rel_tol=1e-9)

    # DML moves the corpus-state key -> quantizer retrains
    key_before = ann_r._ann_state[0]
    ann_r.remove_document(uids[0])
    ann_r.search_vector(q, top_k=5)
    assert ann_r._ann_state[0] != key_before

    # hybrid facade works end-to-end on the ANN path
    res = ann_r.query([q], n_results=5)
    assert len(res["ids"][0]) == 5


def test_rrf_matches_reference_semantics(spark):
    """Spark fusion == driver-side reference-shaped fusion on the same
    ranked lists, across ratios (reference hybrid_retriever.py:11-26)."""
    bm25 = [(1, 101, 1), (1, 102, 2), (1, 103, 3), (2, 201, 1)]
    vec = [(1, 102, 1), (1, 104, 2), (2, 202, 1), (2, 201, 2)]
    bm25_df = spark.createDataFrame(
        bm25, "query_id long, doc_id long, rank int"
    )
    vec_df = spark.createDataFrame(
        vec, "query_id long, doc_id long, rank int"
    )
    for ratio in (0.0, 0.25, 0.5, 0.75, 1.0):
        fused = rrf_fuse(
            [bm25_df, vec_df], weights=[ratio, 1 - ratio], k=60, top_k=10
        ).collect()
        got = {}
        for r in fused:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["rrf_score"])
            )
        for qid in (1, 2):
            blist = [(d, 0.0) for q, d, _ in bm25 if q == qid]
            vlist = [(d, 0.0) for q, d, _ in vec if q == qid]
            want = rrf_fuse_py([blist, vlist], bm25_ratio=ratio, k=60)
            rows = sorted(got[qid])
            assert [d for _, d, _ in rows] == [d for d, _ in want], (
                qid, ratio,
            )
            for (_, _, s), (_, ws) in zip(rows, want):
                assert math.isclose(s, ws, rel_tol=1e-12)


def test_rrf_single_leg_fallback(spark):
    """Empty vector leg: fused output == weighted bm25 leg (reference
    falls back to the non-empty list, hybrid_retriever.py:291-298)."""
    bm25_df = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank int"
    )
    empty = spark.createDataFrame([], "query_id long, doc_id long, rank int")
    fused = rrf_fuse([bm25_df, empty], weights=[0.5, 0.5], top_k=5).collect()
    assert [r["doc_id"] for r in sorted(fused, key=lambda r: r["rank"])] == [
        11, 12,
    ]


def test_default_embedder_probe(monkeypatch):
    """default_embedder mirrors the NLTK probe pattern: uses the
    reference's sentence-transformers model when importable, falls
    back to hashed-BoW otherwise. Exercised with a stubbed module —
    the real package is not installable in this environment."""
    import sys
    import types

    from bm25_chroma_spark.plans import retriever as ret_mod

    # absent package -> hashed-BoW fallback
    monkeypatch.setattr(ret_mod, "_ST_STATE", None)
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    assert not ret_mod.real_embedder_available()
    assert ret_mod.default_embedder() is ret_mod.hashed_bow_embedder

    # stubbed package -> model path, vectors come from model.encode
    class _StubModel:
        def __init__(self, name):
            assert name == "all-MiniLM-L6-v2"  # reference model,
            # hybrid_retriever.py:46-49

        def encode(self, texts):
            return [[float(len(t)), 1.0] for t in texts]

    stub = types.ModuleType("sentence_transformers")
    stub.SentenceTransformer = _StubModel
    monkeypatch.setattr(ret_mod, "_ST_STATE", None)
    monkeypatch.setitem(sys.modules, "sentence_transformers", stub)
    assert ret_mod.real_embedder_available()
    embed = ret_mod.default_embedder()
    assert embed(["ab", "abcd"]) == [[2.0, 1.0], [4.0, 1.0]]
    monkeypatch.setattr(ret_mod, "_ST_STATE", None)  # leave clean


def test_hashed_bow_embedder_semantics(spark, tmp_path):
    """The default embedder gives the vector leg real retrieval
    semantics: token-overlapping docs are cosine neighbors, so a
    paraphrase-ish query retrieves the overlapping doc first even
    when BM25 has nothing to match (empty-intersection queries
    aside), and hybrid fusion is exercised meaningfully."""
    import numpy as np

    from bm25_chroma_spark.plans.retriever import (
        SparkHybridRetriever,
        hashed_bow_embedder,
    )

    a, b = hashed_bow_embedder(
        ["spark shuffle join performance", "spark shuffle join speed"]
    )
    c = hashed_bow_embedder(["completely unrelated gardening tips"])[0]
    cos = lambda x, y: float(np.dot(x, y))
    assert cos(a, b) > cos(a, c) + 0.3  # overlap -> similarity

    r = SparkHybridRetriever(spark, str(tmp_path / "bow_state"))
    r.add_documents_batch(
        [
            "spark shuffle join performance tuning",
            "gardening tips for spring tulips",
            "inverted index compression tricks",
        ],
        ["d_spark", "d_garden", "d_index"],
    )
    top = r.search_vector("spark shuffle join speed", top_k=3)
    assert top[0][0] == "d_spark"


def test_ivf_trainer_degenerate_and_numpy_lloyd_parity(spark):
    """Strengthens the rows-only ann_ivf_trained contract entry with
    in-repo exact cross-checks: (a) n_iters=0 returns the medoid
    seeds verbatim — the trained path degenerates to exactly what
    the hash-green ann_ivf oracle pins; (b) the distributed trainer
    reproduces a driver-side numpy Lloyd reference (same seeds, same
    iteration count, cosine assignment with ties to the smallest
    cell, empty cells keep their centroid) to float tolerance, and
    the resulting cell assignments agree exactly."""
    from bm25_chroma_spark.operators.knn import (
        ivf_assign_cells,
        ivf_seed_centroids,
        ivf_train_centroids,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(4, 8) * 4.0
    rows = [
        (i, (centers[i % 4] + rng.randn(8) * 0.25).tolist())
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seeds = ivf_seed_centroids(df, 6)
    assert ivf_train_centroids(df, 6, n_iters=0) == seeds

    n_iters = 3
    trained = ivf_train_centroids(df, 6, n_iters=n_iters)

    # driver-side numpy Lloyd with identical semantics
    X = np.array([v for _, v in rows])
    ids = np.array([i for i, _ in rows])
    order = np.argsort(ids)
    X = X[order]
    C = np.array(seeds, dtype=np.float64)
    for _ in range(n_iters):
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        # cosine distance argmin, ties to smallest cell id (argmin
        # returns the first minimum)
        assign = np.argmin(1.0 - Xn @ Cn.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    assert np.allclose(np.array(trained), C, rtol=1e-9, atol=1e-12)

    # and the quantizer agrees cell-for-cell with the numpy reference
    e = df.selectExpr("vec_id", "cast(embedding as array<double>) as vec")
    got = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_cells(e, trained).collect()
    }
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = np.array(trained) / np.linalg.norm(
        np.array(trained), axis=1, keepdims=True
    )
    want = np.argmin(1.0 - Xn @ Cn.T, axis=1)
    assert [got[i] for i in sorted(got)] == list(want)


def test_kmeans_arrow_matches_expr(spark):
    """The Arrow partial-sum centroid update (the high-dim scale path
    — O(1) Catalyst expressions per round instead of O(dim)) must
    reproduce the expression-form trainer: same seeds, same
    iterations, centroids equal to float tolerance and quantizer
    assignments identical."""
    from bm25_chroma_spark.operators.knn import (
        ivf_assign_cells,
        ivf_train_centroids,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(5, 12) * 3.0
    rows = [
        (i, (centers[i % 5] + rng.randn(12) * 0.4).tolist())
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    expr = ivf_train_centroids(df, 5, n_iters=3, method="expr")
    arrow = ivf_train_centroids(df, 5, n_iters=3, method="arrow")
    assert np.allclose(np.array(expr), np.array(arrow), rtol=1e-9)

    e = df.selectExpr("vec_id", "cast(embedding as array<double>) as vec")
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_cells(e, expr).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_cells(e, arrow).collect()
    )
    assert a == b


def test_kmeans_bit_reproducible_both_methods(spark):
    """Trained centroids are BIT-identical across repeated runs for
    both centroid-update forms: partials are computed per (input
    partition, cell) in scan order and merged per cell sorted by
    partition id, so no task-completion-order float drift reaches the
    result (what keeps the rows-only ann_ivf_trained contract entry
    stable across driver re-runs). Hash-partitioned input so the
    partition contents themselves are reproducible."""
    from bm25_chroma_spark.operators.knn import ivf_train_centroids

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(12).tolist()) for i in range(400)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(7, "vec_id")

    for method in ("expr", "arrow"):
        c1 = ivf_train_centroids(df, 5, n_iters=3, method=method)
        c2 = ivf_train_centroids(df, 5, n_iters=3, method=method)
        assert c1 == c2, method


def test_zero_norm_vectors_nan_not_crash(spark):
    """Spark 4 runs ANSI mode: a bare cosine division THROWS
    DIVIDE_BY_ZERO the moment a zero-norm vector reaches it (hashed-
    BoW token signs can cancel to an all-zero embedding), killing the
    whole job. knn's _nan_div yields NaN instead, which Spark orders
    GREATER than every double — zero-norm rows sink below all real
    matches, matching the driver-side numpy twin."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 0.0, 0.0]),  # zero-norm doc vector
        (4, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    res = knn_bruteforce(df, [[1.0, 0.0, 0.0]], k=4).collect()
    got = [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert got == [1, 2, 4, 3], got  # zero-norm row ranks LAST
    assert math.isnan(res[-1]["dist"]) and math.isnan(res[-1]["sim"])

    # zero-norm QUERY vector: every dist NaN, rank falls back to
    # vec_id asc (NaN == NaN in Spark ordering), still no crash
    res_q = knn_bruteforce(df, [[0.0, 0.0, 0.0]], k=4).collect()
    got_q = [r["vec_id"] for r in sorted(res_q, key=lambda r: r["rank"])]
    assert got_q == [1, 2, 3, 4], got_q
    assert all(math.isnan(r["dist"]) for r in res_q)


def test_zero_norm_vectors_drop_from_embedding_dedup(spark):
    """embedding_near_dups must neither crash on zero-norm vectors
    (ANSI DIVIDE_BY_ZERO) nor report them as near-dups: their cosine
    is undefined -> NULL -> dropped by the threshold filter. (NaN
    would be WRONG here — Spark orders NaN greater than any double,
    so NaN >= threshold passes.)"""
    from bm25_chroma_spark.operators.dedup import embedding_near_dups

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 1e-9]),   # near-dup of 1
        (3, [0.0, 0.0]),    # zero-norm
        (4, [0.0, 0.0]),    # zero-norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            df, threshold=0.99, use_lsh=False
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs), pairs
