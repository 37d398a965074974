#!/usr/bin/env python
"""spark-submit entry point: build (or resume) the sharded BM25 index.

Cluster usage (the north-rule launch shape):

  zip -r bm25_chroma_spark.zip bm25_chroma_spark
  spark-submit --py-files bm25_chroma_spark.zip \
      scripts/build_index.py \
      --corpus <iceberg-table-or-parquet-path> \
      --out hdfs://.../index \
      --id-expr "xxhash64(repo, path, commit)" --text-col content \
      --buckets 512 --segments 64 --groups 16

Local smoke:

  spark-submit scripts/build_index.py \
      --corpus /root/testdata/sf0.001/documents.parquet \
      --out /tmp/idx --id-expr doc_id --text-col text
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-expr", default="xxhash64(repo, path, commit)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--groups", type=int, default=4)
    # default 0 = lossless (no build cap): the out-of-the-box sharded
    # index must never refuse hot-term queries; pass a positive cap
    # for reference-parity runs (build-cap semantics are honored on
    # the sharded path; the query-time cap stays logical-path only)
    ap.add_argument("--max-postings", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bm25_chroma_spark.config import BM25Config
    from bm25_chroma_spark.index.shards import build_sharded_index
    from bm25_chroma_spark.sources.catalog import read_corpus

    spark = SparkSession.builder.appName("bm25-index-build").getOrCreate()
    corpus = read_corpus(spark, args.corpus)
    docs = corpus.selectExpr(
        f"({args.id_expr}) as doc_id", f"{args.text_col} as text"
    )
    cfg = BM25Config(
        num_term_buckets=args.buckets,
        salt_factor=args.segments,
        max_postings_per_term=args.max_postings or None,
        # the query-time cap stays off: it is a tf-ordered traversal
        # semantic the sharded query path refuses when binding
        query_postings_cap=None,
    )
    metrics = build_sharded_index(
        docs,
        args.out,
        config=cfg,
        bucket_groups=args.groups,
        resume=not args.no_resume,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
