#!/usr/bin/env python
"""spark-submit entry point: build and query the IVF ANN store.

The vector-side counterpart of build_index.py / query_index.py:
``build`` trains a k-means coarse quantizer (distributed Lloyd, one
aggregation job per iteration), materializes the inverted file
partitioned by cell (probing then becomes directory-level partition
pruning), and persists the centroids next to it; ``query`` reads the
store and runs nprobe-probed exact-rerank top-k for ad-hoc query
vectors (here: the embeddings of existing ids, or a JSON vector).

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip scripts/ann_index.py \
      build --embeddings s3://corpus/embeddings --out s3://corpus/ivf \
      --cells 1024 --train-iters 5
  spark-submit --py-files bm25_chroma_spark.zip scripts/ann_index.py \
      query --store s3://corpus/ivf --vec-id 42 --k 10 --nprobe 32

Local smoke:
  python scripts/ann_index.py build \
      --embeddings /root/testdata/sf0.001/embeddings.parquet \
      --out /tmp/ivf --cells 16
  python scripts/ann_index.py query --store /tmp/ivf --vec-id 0 --k 5
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CENTROIDS_FILE = "centroids.json"


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--embeddings", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--cells", type=int, default=64)
    b.add_argument("--train-iters", type=int, default=3,
                   help="0 = medoid seeds only (no k-means)")
    b.add_argument("--cores", type=int, default=4)
    b.add_argument("--shuffle-partitions", type=int, default=8)

    q = sub.add_parser("query")
    q.add_argument("--store", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=8)
    q.add_argument("--vec-id", type=int, action="append",
                   help="query with the stored vector of this id "
                        "(repeatable)")
    q.add_argument("--vec-json",
                   help="JSON array (or array of arrays) of raw "
                        "query vectors")
    q.add_argument("--cores", type=int, default=4)
    q.add_argument("--shuffle-partitions", type=int, default=8)
    return ap


def run_build(args) -> dict:
    from bm25_chroma_spark.operators.knn import (
        ivf_seed_centroids,
        ivf_train_centroids,
        ivf_write_partitioned,
    )
    from bm25_chroma_spark.session import get_spark

    spark = get_spark("ann-build", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    emb = spark.read.parquet(args.embeddings)
    if args.train_iters > 0:
        centroids = ivf_train_centroids(
            emb, args.cells, n_iters=args.train_iters,
            id_col=args.id_col, vec_col=args.vec_col,
        )
    else:
        centroids = ivf_seed_centroids(
            emb, args.cells, id_col=args.id_col, vec_col=args.vec_col
        )
    ivf_write_partitioned(
        emb, args.out, centroids,
        id_col=args.id_col, vec_col=args.vec_col,
    )
    Path(args.out, CENTROIDS_FILE).write_text(json.dumps(centroids))
    n = spark.read.parquet(args.out).count()
    return {
        "store": args.out,
        "vectors": n,
        "cells": len(centroids),
        "dim": len(centroids[0]),
        "trained": args.train_iters > 0,
    }


def run_query(args) -> dict:
    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.knn import knn_ivf_partitioned
    from bm25_chroma_spark.session import get_spark

    spark = get_spark("ann-query", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    centroids = json.loads(Path(args.store, CENTROIDS_FILE).read_text())
    qvecs = []
    if args.vec_id:
        store = spark.read.parquet(args.store)
        got = {
            r["vec_id"]: [float(x) for x in r["vec"]]
            for r in store.filter(
                F.col("vec_id").isin(args.vec_id)
            ).collect()
        }
        missing = [i for i in args.vec_id if i not in got]
        if missing:
            raise SystemExit(f"ids not in store: {missing}")
        qvecs += [got[i] for i in args.vec_id]
    if args.vec_json:
        v = json.loads(args.vec_json)
        qvecs += v if isinstance(v[0], list) else [v]
    if not qvecs:
        raise SystemExit("pass --vec-id and/or --vec-json")

    rows = knn_ivf_partitioned(
        spark, args.store, qvecs, centroids,
        k=args.k, nprobe=args.nprobe,
    ).collect()
    out: dict = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(str(r["query_id"]), []).append(
            {"vec_id": r["vec_id"], "dist": r["dist"], "sim": r["sim"]}
        )
    return {"k": args.k, "nprobe": args.nprobe, "results": out}


def main() -> None:
    args = build_parser().parse_args()
    report = run_build(args) if args.cmd == "build" else run_query(args)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
