#!/usr/bin/env python
"""spark-submit entry point: run BM25 queries against a built index.

  spark-submit --py-files bm25_chroma_spark.zip scripts/query_index.py \
      --index hdfs://.../index --top-k 10 --strategy wand \
      "block max wand" "posting list merge"
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument(
        "--strategy",
        choices=["exhaustive", "wand", "auto"],
        default="auto",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bm25_chroma_spark.index.shards import ShardedIndex
    from bm25_chroma_spark.index.wand import search_sharded

    spark = SparkSession.builder.appName("bm25-query").getOrCreate()
    index = ShardedIndex(spark, args.index)
    queries = spark.createDataFrame(
        list(enumerate(args.queries)), "query_id long, query_text string"
    )
    res = search_sharded(
        index, queries, top_k=args.top_k, strategy=args.strategy
    )
    res.orderBy("query_id", "rank").show(
        args.top_k * len(args.queries), truncate=False
    )


if __name__ == "__main__":
    main()
