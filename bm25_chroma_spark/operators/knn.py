"""Vector-search leg: exact brute-force KNN (deterministic, replacing
the reference's ChromaDB/HNSW ANN — hybrid_retriever.py:251-273, whose
results are build-order dependent) plus an LSH-bucketed approximate
variant as the at-scale path.

Distance/score transforms mirror the reference:
  similarity = 1 / (1 + distance)      (hybrid_retriever.py:266)

All distance math is JVM-side higher-order array functions
(zip_with + aggregate) — no Python in the scoring loop. Query vectors
are broadcast as literal arrays (queries are tiny by contract).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _nan_div(num, den):
    """Division that yields NaN on a zero denominator. Spark 4 runs
    ANSI mode by default, so a bare `/` THROWS DIVIDE_BY_ZERO when a
    zero-norm vector reaches a cosine (hashed-BoW signs can cancel to
    an all-zero embedding) — one such row would kill the whole job.
    NaN, not try_divide's NULL, is the right substitute: NaN orders
    GREATER than every double, so zero-norm rows sink below all real
    matches in the (dist asc) rank, exactly like the driver-side
    numpy twin (plans/retriever.py::_VecCache.topk, errstate->NaN);
    NULL would sort FIRST ascending and surface garbage hits."""
    return F.when(den != F.lit(0.0), num / den).otherwise(
        F.lit(float("nan"))
    )


def _queries_df(spark, query_vecs) -> DataFrame:
    """Query-vector side as a DataFrame. Accepts either a plain
    sequence of vectors (query_id = position, the interactive form)
    or an existing DataFrame with (query_id, <vec>) columns — the
    batch/offline form (query_df), where caller-assigned ids must
    survive."""
    if isinstance(query_vecs, DataFrame):
        # bind by NAME, never position: a caller frame with extra
        # columns or a renamed id column must fail loudly, not
        # silently pick the wrong vector column (ADVICE r6)
        cols = query_vecs.columns
        if "query_id" in cols:
            id_col, others = "query_id", [c for c in cols if c != "query_id"]
        elif len(cols) == 2:
            id_col, others = cols[0], [cols[1]]
        else:
            raise ValueError(
                "query-vector DataFrame must be (query_id, <vec>) or "
                f"exactly two (id, vec) columns; got {cols}"
            )
        if len(others) != 1:
            raise ValueError(
                "query-vector DataFrame must have exactly one vector "
                f"column besides 'query_id'; got {cols}"
            )
        return query_vecs.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(others[0]).cast("array<double>").alias("qvec"),
        )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(query_vecs)]
    return spark.createDataFrame(rows, "query_id long, qvec array<double>")


def knn_bruteforce(
    embeddings: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_round: Optional[int] = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    -> (query_id, vec_id, dist, sim, rank); sim = 1/(1+dist).
    dist = 1 - cosine for metric='cosine', L2 for 'l2'.
    Plan shape: broadcast(queries) x embeddings -> per-partition
    top-k via window group limit; no full sort of the corpus.
    """
    spark = embeddings.sparkSession
    q = _queries_df(spark, query_vecs)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if metric == "cosine":
        # norms are per-SIDE quantities: compute them below the join
        # (once per doc / once per query) instead of per PAIR — the
        # aggregate() fold is an interpreted higher-order expression,
        # so hoisting it out of the |docs| x |queries| cross product
        # removes 2/3 of the interpreted work (r9, guide §2.3
        # "project before the exchange"; bit-identical: the same
        # expression over the same array, multiplied as before).
        e = e.withColumn("vnorm", _norm(F.col("vec")))
        q = q.withColumn("qnorm", _norm(F.col("qvec")))
    joined = e.crossJoin(F.broadcast(q))
    if metric == "cosine":
        cos = _nan_div(
            _dot(F.col("vec"), F.col("qvec")),
            F.col("vnorm") * F.col("qnorm"),
        )
        dist = F.lit(1.0) - cos
    elif metric == "l2":
        dist = F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("vec"), F.col("qvec"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = joined.select(
        "query_id", "vec_id", dist.alias("dist")
    )
    if score_round is not None:
        scored = scored.withColumn("dist", F.round("dist", score_round))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("vec_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("sim", F.lit(1.0) / (F.lit(1.0) + F.col("dist")))
    )
    if score_round is not None:
        out = out.withColumn("sim", F.round("sim", score_round))
    return out.select("query_id", "vec_id", "dist", "sim", "rank")


# ------------------------------------------------------------------ #
# LSH (random hyperplane / signed random projection) — the scale path #
# ------------------------------------------------------------------ #

def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _signature(vec_col, planes: List[List[float]]):
    """Bit-signature: sign of the projection onto each plane, packed
    into a long (n_planes <= 62). Pure column expressions."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        sig = sig + F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def knn_lsh(
    embeddings: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
    score_round: Optional[int] = None,
) -> DataFrame:
    """Approximate KNN: signed-random-projection buckets, multi-table,
    query-side multi-probe.

    Candidates = corpus rows sharing a bucket with the query in ANY of
    the ``n_tables`` independent tables, where the query probes its own
    bucket plus every bucket within Hamming distance ``multiprobe`` (the
    probe fan-out lives on the tiny broadcast side). Exact cosine
    re-rank on the candidate set. At 100 TB the bucket join replaces
    the full cross join: cost ~ corpus_size * tables *
    (1 + planes*probe) / 2^planes per query.

    Shuffle discipline (mirrors ``embedding_near_dups``): the corpus is
    scanned for vectors exactly TWICE — once to emit all ``n_tables``
    signatures in a single posexplode'd pass, once to join vectors back
    for the final rerank. Candidate generation itself is ID-ONLY: the
    per-table bucket joins and the cross-table distinct shuffle bare
    (query_id, vec_id) pairs, never the (possibly 1k-dim) vectors.
    """
    spark = embeddings.sparkSession
    dim = len(query_vecs[0])
    q = _queries_df(spark, query_vecs)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    # probe masks: 0 (own bucket) + single-bit flips (+ 2-bit flips...)
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << i for i in range(n_planes)]
    if multiprobe >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    masks_col = F.array(*[F.lit(m).cast("long") for m in masks])

    all_planes = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        for t in range(n_tables)
    ]

    # ONE corpus pass: every table's signature as an array element, then
    # posexplode to (vec_id, tbl, sig). Narrow, map-side, codegen'd.
    e_sig = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[_signature(F.col("vec"), p) for p in all_planes]
            )
        ).alias("tbl", "sig"),
    )

    # Query side (tiny, broadcast): per-table signature computed once,
    # XOR'd against the probe-mask array for the multiprobe fan-out.
    q_sig = None
    for t, planes in enumerate(all_planes):
        part = q.select(
            "query_id",
            F.lit(t).alias("tbl"),
            F.explode(
                F.transform(
                    masks_col,
                    lambda m: _signature(F.col("qvec"), planes)
                    .bitwiseXOR(m),
                )
            ).alias("sig"),
        )
        q_sig = part if q_sig is None else q_sig.unionByName(part)

    pairs = (
        e_sig.join(F.broadcast(q_sig), ["tbl", "sig"])
        .select("query_id", "vec_id")
        .distinct()
    )
    # vectors rejoin exactly once, post-dedup, for the exact rerank;
    # norms hoisted below the join (once per side, not per pair —
    # same rationale as knn_bruteforce, bit-identical)
    cand = pairs.join(
        e.withColumn("vnorm", _norm(F.col("vec"))), "vec_id"
    ).join(
        F.broadcast(q.withColumn("qnorm", _norm(F.col("qvec")))),
        "query_id",
    )
    cos = _nan_div(
        _dot(F.col("vec"), F.col("qvec")),
        F.col("vnorm") * F.col("qnorm"),
    )
    scored = cand.select(
        "query_id", "vec_id", (F.lit(1.0) - cos).alias("dist")
    )
    if score_round is not None:
        # round BEFORE ranking: cross-engine float-association drift
        # must not flip a rank (same contract as knn_bruteforce)
        scored = scored.withColumn("dist", F.round("dist", score_round))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("sim", F.lit(1.0) / (F.lit(1.0) + F.col("dist")))
        .select("query_id", "vec_id", "dist", "sim", "rank")
    )
    if score_round is not None:
        out = out.withColumn("sim", F.round("sim", score_round))
    return out


def lsh_recall_vs_exact(
    embeddings: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    **lsh_kwargs,
) -> float:
    """Fraction of exact top-k recovered by the LSH path (diagnostic)."""
    exact = knn_bruteforce(embeddings, query_vecs, k=k)
    approx = knn_lsh(embeddings, query_vecs, k=k, **lsh_kwargs)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    return len(ex & ap) / max(len(ex), 1)


# ------------------------------------------------------------------ #
# IVF (inverted-file index) — the other ANN scale path                #
# ------------------------------------------------------------------ #

def _lit_vec(v: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in v])


def _cos_dist(a, b):
    return F.lit(1.0) - _nan_div(_dot(a, b), _norm(a) * _norm(b))


def ivf_seed_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Deterministic coarse quantizer: the vectors of the ``n_cells``
    smallest ids serve as cell centroids (medoid seeds). Production
    swaps in k-means-trained centroids (pass ``centroids=`` to
    knn_ivf — the IVF structure is identical); seeds keep the
    quantizer bit-reproducible across engines so the correctness
    oracle can mirror the cell assignment exactly in SQL."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("id")
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


# Above this dimensionality the per-dimension F.sum(vec[i]) update
# (O(dim) Catalyst expressions per Lloyd round) is swapped for the
# Arrow partial-sum path: planning cost grows with the expression
# count, not the data, and a 1024-dim quantizer would carry 1024
# aggregate expressions through every round.
_KMEANS_EXPR_MAX_DIM = 256


def _partial_merge_schema():
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("pid", IntegerType()),
            StructField("cell", IntegerType()),
            StructField("n", LongType()),
            StructField("sums", ArrayType(DoubleType())),
        ]
    )


def _merge_partials_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-cell merge of (pid, cell, n, sums) partials in SORTED
    partition order: the shuffle delivers partials in task-completion
    order, which varies run to run, and float addition is not
    associative — sorting by pid before summing pins the summation
    order so trained centroids are bit-reproducible across runs."""
    pdf = pdf.sort_values("pid")
    S = np.stack(pdf["sums"].to_numpy()).sum(axis=0)
    return pd.DataFrame(
        {
            "pid": [0],
            "cell": [int(pdf["cell"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "sums": [S.tolist()],
        }
    )


def _centroid_sums_arrow(assigned: DataFrame, dim: int) -> list:
    """(cell, n, sums[dim]) via Arrow: one mapInPandas pass emits at
    most one partial row per (partition, cell) — the map-side combine
    — then a grouped applyInPandas merge (sorted by partition id for
    run-to-run determinism) leaves exactly one row per cell. The
    shuffle moves n_partitions x n_cells packed rows, never the
    vectors, and the driver receives only n_cells rows."""
    schema = _partial_merge_schema()

    def partials(batches):
        pid = -1
        acc: dict = {}
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: np.stack would raise
                continue
            pid = int(pdf["pid"].iloc[0])
            cells = pdf["cell"].to_numpy()
            M = np.stack(pdf["vec"].to_numpy())
            for c in np.unique(cells):
                m = cells == c
                got = acc.get(int(c))
                if got is None:
                    acc[int(c)] = [int(m.sum()), M[m].sum(axis=0)]
                else:
                    got[0] += int(m.sum())
                    got[1] += M[m].sum(axis=0)
        if acc:
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "cell": list(acc.keys()),
                    "n": [v[0] for v in acc.values()],
                    "sums": [v[1].tolist() for v in acc.values()],
                }
            )

    return (
        assigned.select(
            F.spark_partition_id().alias("pid"), "cell", "vec"
        )
        .mapInPandas(partials, schema=schema)
        .groupBy("cell")
        .applyInPandas(_merge_partials_sorted, schema=schema)
        .collect()
    )


def _centroid_sums_expr(assigned: DataFrame, dim: int) -> list:
    """(cell, n, sums[dim]) via per-dimension sum expressions, made
    run-to-run deterministic the same way as the Arrow path: stage 1
    aggregates per (input partition, cell) — every such group lives
    inside ONE partition, so its whole sum is computed map-side in
    scan order and the shuffle carries exactly one partial per group
    (same volume as a plain groupBy(cell)'s partial-agg exchange) —
    and stage 2 merges per cell in sorted partition order. A plain
    groupBy(cell) final agg would instead fold partials in
    task-completion order, which varies between runs."""
    part = assigned.groupBy(
        F.spark_partition_id().alias("pid"), "cell"
    ).agg(
        F.count("*").alias("n"),
        F.array(
            *[F.sum(F.col("vec")[i]) for i in range(dim)]
        ).alias("sums"),
    )
    return (
        part.groupBy("cell")
        .applyInPandas(_merge_partials_sorted, schema=_partial_merge_schema())
        .collect()
    )


def ivf_train_centroids(
    embeddings: DataFrame,
    n_cells: int,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_centroids: Optional[List[List[float]]] = None,
    method: str = "auto",
) -> List[List[float]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer.

    Each iteration is ONE Spark aggregation job: assignment reuses the
    ``ivf_assign_cells`` pass, and the centroid update has two
    physical forms with identical semantics —

    * ``expr`` — per-dimension ``sum(vec[i])`` expressions aggregated
      per (input partition, cell): whole-stage-codegen'd, no
      posexplode (which would multiply the shuffle by ``dim``), no
      vectors collected to the driver; only the (n_cells x dim) sums
      come back. The right form while ``dim`` is modest.
    * ``arrow`` — mapInPandas partial sums per (partition, cell) +
      grouped merge (see _centroid_sums_arrow): O(1) Catalyst
      expressions regardless of ``dim``, numpy-vectorized adds. The
      at-scale form for 1024-dim embeddings, where the expr form
      would drag dim aggregate expressions through every round's
      plan.
    * ``auto`` — expr up to dim ``_KMEANS_EXPR_MAX_DIM``, else arrow.
      Parity is test-pinned (test_kmeans_arrow_matches_expr).

    Empty cells keep their previous centroid. Deterministic given the
    seeds (medoid seeds by default) INCLUDING float summation order:
    both forms compute per-(partition, cell) partials in scan order
    and merge them per cell sorted by partition id
    (_merge_partials_sorted), so repeated runs over the same
    partitioning produce bit-identical centroids — which keeps the
    rows-only ann_ivf_trained contract entry stable across the
    driver's re-runs.

    FAISS-style trained cells give materially better recall-per-nprobe
    than raw medoid seeds on clustered data (see
    test_ivf_trained_centroids_beat_seeds); the seeds remain the
    default in ``knn_ivf`` only because the correctness oracle mirrors
    their bit-exact assignment in SQL.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if seed_centroids is None:
        seed_centroids = ivf_seed_centroids(
            embeddings, n_cells, id_col, vec_col
        )
    centroids = [list(map(float, c)) for c in seed_centroids]
    dim = len(centroids[0])
    if method == "auto":
        method = "expr" if dim <= _KMEANS_EXPR_MAX_DIM else "arrow"
    if method not in ("expr", "arrow"):
        raise ValueError(f"unknown k-means method {method!r}")
    sums_of = _centroid_sums_expr if method == "expr" else _centroid_sums_arrow
    for _ in range(n_iters):
        assigned = ivf_assign_cells(e, centroids)
        sums = {
            int(r["cell"]): (float(r["n"]), list(r["sums"]))
            for r in sums_of(assigned, dim)
        }
        new_centroids = [list(c) for c in centroids]  # empty cells keep
        for cell, (n, s) in sums.items():
            if n > 0:
                new_centroids[cell] = [x / n for x in s]
        centroids = new_centroids
    return centroids


# Above this many (n_cells * dim) literals the expression-tree
# quantizer is swapped for the Arrow-vectorized one: a sqrt(N)-sized
# quantizer (e.g. 1000 cells x 64 dims at 1M vectors) would otherwise
# inline 64k literals into a single Catalyst expression — planning
# blows up long before the data does.
_IVF_EXPR_MAX_LITERALS = 4096


def _use_expr_quantizer(centroids: List[List[float]], method: str) -> bool:
    if method == "expr":
        return True
    if method == "pandas":
        return False
    if method != "auto":
        raise ValueError(f"unknown quantizer method {method!r}")
    return len(centroids) * len(centroids[0]) <= _IVF_EXPR_MAX_LITERALS


def ivf_assign_cells(
    e: DataFrame,
    centroids: List[List[float]],
    vec_col: str = "vec",
    method: str = "auto",
) -> DataFrame:
    """Add a ``cell`` column: argmin over centroids of cosine distance,
    ties to the smallest cell id. At 100 TB you run this once at
    ingest and ``partitionBy("cell")`` the table: query-time probing
    then becomes partition PRUNING, not even a filter scan.

    Two physical forms, same semantics:

    * ``expr`` — pure column expressions: the (dist, cid) struct
      array's array_min is the lexicographic minimum, i.e. (dist asc,
      cid asc), narrow, map-side, whole-stage-codegen'd. Bit-exact
      left-fold arithmetic — this is the form the SQL oracle mirrors.
    * ``pandas`` — Arrow-vectorized: one matmul per batch against the
      broadcast (normalized) centroid matrix, np.argmax ties to the
      smallest cid. The ONLY divergence from expr is last-ulp float
      association (BLAS vs left-fold) — irrelevant for ANN recall,
      which is why the oracle entry pins the expr form at small
      n_cells and the at-scale path uses this one.
    * ``auto`` — expr while n_cells*dim <= 4096 literals, else pandas.
    """
    if _use_expr_quantizer(centroids, method):
        cells = F.array(
            *[
                F.struct(
                    _cos_dist(F.col(vec_col), _lit_vec(c)).alias("dist"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return e.withColumn("cell", F.array_min(cells).getField("cid"))

    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(
        np.linalg.norm(C, axis=1, keepdims=True), 1e-300
    )

    @F.pandas_udf(IntegerType())
    def assign(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy())
        Mn = M / np.maximum(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-300
        )
        return pd.Series(np.argmax(Mn @ Cn.T, axis=1).astype("int32"))

    return e.withColumn("cell", assign(F.col(vec_col)))


def ivf_write_partitioned(
    embeddings: DataFrame,
    path: str,
    centroids: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> None:
    """Materialize the inverted file: assign every vector to its cell
    (one narrow pass, see ivf_assign_cells) and write the table
    partitioned by cell — ``path/cell=K/``. This is the ingest-time
    half of IVF at 100 TB: after it, probing is directory-level
    partition PRUNING (the scan never lists, opens, or reads a
    non-probed cell), not even a filter over a full scan."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    ivf_assign_cells(e, centroids, method=method).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def _expr_probes(
    q: DataFrame, centroids: List[List[float]], nprobe: int
) -> DataFrame:
    """Query-side probe selection as pure column expressions —
    (query_id, qvec, cell), the ``nprobe`` nearest centroids per query
    by (cosine dist asc, cid asc). The SAME left-fold arithmetic as
    the corpus-side ``ivf_assign_cells`` expr form, so every tie and
    last-ulp boundary matches the cell assignment — and the SQL
    oracle — bit for bit. Small-quantizer path only (the caller gates
    on ``_use_expr_quantizer``)."""
    qd = q.select(
        "query_id",
        "qvec",
        F.posexplode(
            F.array(
                *[_cos_dist(F.col("qvec"), _lit_vec(c)) for c in centroids]
            )
        ).alias("cid", "cdist"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cid"))
    return (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qvec", F.col("cid").alias("cell"))
    )


def knn_ivf_partitioned(
    spark,
    path: str,
    query_vecs: Sequence[Sequence[float]],
    centroids: List[List[float]],
    k: int = 10,
    nprobe: int = 3,
    score_round: Optional[int] = None,
    probe_method: str = "auto",
) -> DataFrame:
    """Query the materialized inverted file written by
    ivf_write_partitioned. Probe cells are chosen driver-side — the
    probe set is tiny (|queries| x nprobe) by contract — then the scan
    filters ``cell IN (union of probed cells)``, which Spark turns
    into partition pruning over the ``cell=K`` directories
    (PartitionFilters in the plan; non-probed cells are never
    touched), and the per-query cell restriction + exact cosine
    rerank run on the pruned scan. Same output contract as knn_ivf.

    ``probe_method`` picks how the probe cells are computed (same
    regimes as ivf_assign_cells): on the small-quantizer ``expr``
    path one tiny Spark job runs the probe selection through the SAME
    column expressions as the store's ingest-time cell assignment —
    bit-exact left-fold arithmetic, which is what lets the
    ann_ivf_partitioned contract entry hash-match its SQL oracle; on
    the large-quantizer ``pandas`` path probes come from one numpy
    matmul on the driver (query vectors are already local, and a
    sqrt(N)-cell quantizer must not be inlined as literals).
    """
    q = _queries_df(spark, query_vecs)
    if _use_expr_quantizer(centroids, probe_method):
        probe_rows = [
            (int(r["query_id"]), int(r["cell"]))
            for r in _expr_probes(q, centroids, nprobe)
            .select("query_id", "cell")
            .collect()
        ]
    else:
        C = np.asarray(centroids, dtype=np.float64)
        Cn = C / np.maximum(
            np.linalg.norm(C, axis=1, keepdims=True), 1e-300
        )
        qrows = q.select("query_id", "qvec").collect()
        qids = [int(r["query_id"]) for r in qrows]
        Q = np.asarray(
            [[float(x) for x in r["qvec"]] for r in qrows],
            dtype=np.float64,
        )
        Qn = Q / np.maximum(
            np.linalg.norm(Q, axis=1, keepdims=True), 1e-300
        )
        order = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")
        probe_rows = [
            (qid, int(cell))
            for pos, qid in enumerate(qids)
            for cell in order[pos, :nprobe]
        ]
    all_cells = sorted({c for _, c in probe_rows})
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int"
    ).join(q, "query_id")
    scan = spark.read.parquet(path)
    if len(all_cells) <= _IVF_EXPR_MAX_LITERALS:
        # static partition pruning: the literal in-list lets Catalyst
        # drop non-probed cell=K directories at planning time
        scan = scan.filter(F.col("cell").isin(all_cells))
    # else: a large probe set would re-create the literal-list plan
    # blowup the quantizer caps at _IVF_EXPR_MAX_LITERALS — skip the
    # static filter and let the broadcast probes join below prune at
    # runtime (dynamic partition pruning on the cell= partition)
    cand = scan.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "vec", "qvec"
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        _cos_dist(F.col("vec"), F.col("qvec")).alias("dist"),
    )
    if score_round is not None:
        scored = scored.withColumn("dist", F.round("dist", score_round))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("sim", F.lit(1.0) / (F.lit(1.0) + F.col("dist")))
        .select("query_id", "vec_id", "dist", "sim", "rank")
    )
    if score_round is not None:
        out = out.withColumn("sim", F.round("sim", score_round))
    return out


def knn_ivf(
    embeddings: DataFrame,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 3,
    centroids: Optional[List[List[float]]] = None,
    score_round: Optional[int] = None,
    method: str = "auto",
) -> DataFrame:
    """Approximate KNN, IVF style (the classic inverted-file ANN):
    a coarse quantizer assigns every corpus vector to its nearest
    centroid's cell — the inverted file — and each query probes only
    its ``nprobe`` nearest cells, reranking exactly within them.
    Cost per query ~ nprobe/n_cells of the corpus instead of a full
    scan; recall is controlled by nprobe.

    -> (query_id, vec_id, dist, sim, rank), same contract as
    knn_bruteforce/knn_lsh (round-before-rank under ``score_round``).

    ``method`` picks the quantizer form (see ivf_assign_cells). On
    the ``expr`` path, query-side probe selection runs through the
    SAME column expressions as the corpus assignment (one tiny Spark
    job over the query vectors) so the left-fold float arithmetic —
    and therefore every tie — matches the corpus side and the SQL
    oracle bit-for-bit. On the ``pandas`` (large-quantizer) path the
    probes are computed DRIVER-SIDE in numpy — query vectors are
    already driver-side lists, so a sqrt(N)-cell quantizer costs no
    Spark job and no 64k-literal plan at all.
    """
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, n_cells, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    e_cell = ivf_assign_cells(e, centroids, method=method)

    q = _queries_df(spark, query_vecs)
    if _use_expr_quantizer(centroids, method):
        probes = _expr_probes(q, centroids, nprobe)
    else:
        C = np.asarray(centroids, dtype=np.float64)
        Cn = C / np.maximum(
            np.linalg.norm(C, axis=1, keepdims=True), 1e-300
        )
        if isinstance(query_vecs, DataFrame):
            # batch/offline form: query vectors arrive as a DataFrame;
            # probe selection is driver-side numpy on this path, and
            # query sets are small relative to the corpus by contract
            qrows = q.collect()
            qids = [int(r["query_id"]) for r in qrows]
            Q = np.asarray(
                [[float(x) for x in r["qvec"]] for r in qrows],
                dtype=np.float64,
            )
        else:
            qids = list(range(len(query_vecs)))
            Q = np.asarray(
                [[float(x) for x in v] for v in query_vecs],
                dtype=np.float64,
            )
        Qn = Q / np.maximum(
            np.linalg.norm(Q, axis=1, keepdims=True), 1e-300
        )
        order = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")
        probe_rows = [
            (qid, int(cell))
            for pos, qid in enumerate(qids)
            for cell in order[pos, :nprobe]
        ]
        probes = spark.createDataFrame(
            probe_rows, "query_id long, cell int"
        ).join(q, "query_id")
    cand = e_cell.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "vec", "qvec"
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        _cos_dist(F.col("vec"), F.col("qvec")).alias("dist"),
    )
    if score_round is not None:
        scored = scored.withColumn("dist", F.round("dist", score_round))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("sim", F.lit(1.0) / (F.lit(1.0) + F.col("dist")))
        .select("query_id", "vec_id", "dist", "sim", "rank")
    )
    if score_round is not None:
        out = out.withColumn("sim", F.round("sim", score_round))
    return out
