#!/usr/bin/env python
"""spark-submit entry point: bulk-embed a corpus, DataFrame to
DataFrame — no driver residency.

Reads a documents table, appends an embedding column with
``embed_corpus`` (the embedding function runs inside mapInPandas on
the executors; the reference's driver-side batch embed cannot ingest
a 100 TB corpus), and writes either a flat embeddings parquet or —
with ``--ivf-cells`` — goes straight into the materialized IVF store
(k-means-trained quantizer + cell-partitioned layout, so the output
is immediately servable by knn_ivf_partitioned / ann_index.py query).

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip scripts/embed_corpus.py \
      --input s3://corpus/documents --output s3://corpus/embeddings \
      --ivf-cells 1024

Local smoke:
  python scripts/embed_corpus.py \
      --input /root/testdata/sf0.001/documents.parquet \
      --output /tmp/embeddings
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--ivf-cells",
        type=int,
        default=0,
        help="when > 0, write a cell-partitioned IVF store (trained "
        "quantizer, centroids.json alongside) instead of a flat table",
    )
    ap.add_argument("--train-iters", type=int, default=3)
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args(argv)

    from bm25_chroma_spark import get_spark
    from bm25_chroma_spark.operators.embed import embed_corpus

    spark = get_spark("embed-corpus", cores=args.cores)
    docs = spark.read.parquet(args.input).select(
        args.id_col, args.text_col
    )
    emb = embed_corpus(docs, text_col=args.text_col).select(
        args.id_col, "embedding"
    )

    if args.ivf_cells > 0:
        from bm25_chroma_spark.operators.knn import (
            ivf_train_centroids,
            ivf_write_partitioned,
        )

        # one materialized pass: embedding is a narrow map, but the
        # trainer and the partitioned write both consume it — land it
        # once so the model never runs twice over the corpus
        flat = args.output.rstrip("/") + "_flat"
        emb.write.mode("overwrite").parquet(flat)
        emb = spark.read.parquet(flat)
        centroids = ivf_train_centroids(
            emb,
            args.ivf_cells,
            n_iters=args.train_iters,
            id_col=args.id_col,
            vec_col="embedding",
        )
        ivf_write_partitioned(
            emb, args.output, centroids, id_col=args.id_col,
            vec_col="embedding",
        )
        Path(args.output, "centroids.json").write_text(
            json.dumps(centroids)
        )
        n = spark.read.parquet(args.output).count()
        report = {
            "rows": n,
            "store": "ivf_partitioned",
            "cells": args.ivf_cells,
        }
    else:
        emb.write.mode("overwrite").parquet(args.output)
        report = {
            "rows": spark.read.parquet(args.output).count(),
            "store": "flat",
        }
    # no spark.stop(): spark-submit owns session shutdown, and the
    # in-process smoke test reuses its session fixture
    print(json.dumps(report))


if __name__ == "__main__":
    main()
