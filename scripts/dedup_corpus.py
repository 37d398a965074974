#!/usr/bin/env python
"""spark-submit entry point: deduplicate a documents table end-to-end.

The full training-data dedup pipeline as one job, composed from the
operators in bm25_chroma_spark.operators.dedup:

  1. EXACT pass — byte-identical texts collapse to the smallest id
     (one groupBy on sha2-256; also removes the degenerate empty-doc
     mass before any near-dup blocking sees it).
  2. NEAR-DUP candidates — blocking chosen by --method:
       minhash   MinHash-LSH banding -> exact shingle-Jaccard >=
                 --threshold on candidates only (default)
       simhash   64-bit SimHash, pigeonhole chunk blocking, Hamming
                 <= --max-hamming, degenerate buckets capped
       embedding hyperplane-LSH blocked cosine >= --threshold over
                 --embeddings (vec_id must match the id column)
       none      exact pass only
  3. CLUSTER — connected components over the pairs (min-label
     propagation with pointer jumping; raises rather than returning
     unconverged labels).
  4. PURGE — keep each cluster's smallest id, write survivors.

Every stage is blocked/bucketed — no all-pairs joins — so the same
job shape runs at 10^12 files: the shuffles are (hash), (band_hash),
(chunk) and (id, id) pair keys, never full texts against full texts.

Usage (local smoke):
  python scripts/dedup_corpus.py \
      --input /root/testdata/sf0.01/documents.parquet \
      --output /tmp/deduped.parquet --report /tmp/dedup_report.json

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip scripts/dedup_corpus.py \
      --input s3://corpus/documents --output s3://corpus/deduped \
      --method minhash --threshold 0.8
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True, help="survivor parquet")
    p.add_argument("--report", help="write a JSON metrics report here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument(
        "--method",
        choices=["minhash", "simhash", "embedding", "none"],
        default="minhash",
    )
    p.add_argument("--threshold", type=float, default=0.8,
                   help="jaccard (minhash) / cosine (embedding) floor")
    p.add_argument("--max-hamming", type=int, default=3,
                   help="simhash bit distance")
    p.add_argument("--max-bucket", type=int, default=100_000,
                   help="simhash degenerate-bucket cap")
    p.add_argument("--embeddings",
                   help="embeddings parquet (vec_id, embedding) for "
                        "--method embedding")
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=8)
    return p


def run(args) -> dict:
    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.dedup import (
        dedup_exact,
        dup_clusters,
        embedding_near_dups,
        keep_canonical,
        ngram_jaccard_pairs,
        simhash_near_dups,
    )
    from bm25_chroma_spark.session import get_spark

    spark = get_spark(
        "dedup-corpus",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # 1. exact pass
    exact = dedup_exact(docs, text_col=args.text_col, id_col=args.id_col)
    n_exact = exact.count()

    # 2. near-dup pairs on the exact survivors
    if args.method == "minhash":
        pairs = ngram_jaccard_pairs(
            exact,
            text_col=args.text_col,
            id_col=args.id_col,
            threshold=args.threshold,
        ).select("id_a", "id_b")
    elif args.method == "simhash":
        pairs = simhash_near_dups(
            exact,
            text_col=args.text_col,
            id_col=args.id_col,
            max_hamming=args.max_hamming,
            max_bucket=args.max_bucket,
        ).select("id_a", "id_b")
    elif args.method == "embedding":
        if not args.embeddings:
            raise SystemExit("--method embedding requires --embeddings")
        emb = spark.read.parquet(args.embeddings).join(
            exact.select(F.col(args.id_col).alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        pairs = embedding_near_dups(
            emb, threshold=args.threshold
        ).select("id_a", "id_b")
    else:
        pairs = None

    # 3 + 4. cluster and purge
    if pairs is not None:
        n_pairs = pairs.count()
        clusters = dup_clusters(
            pairs, ids=exact.select(args.id_col), id_col=args.id_col
        )
        survivors = keep_canonical(exact, clusters, id_col=args.id_col)
    else:
        n_pairs = 0
        survivors = exact

    survivors.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()

    report = {
        "input_docs": n_input,
        "after_exact": n_exact,
        "near_dup_pairs": n_pairs,
        "survivors": n_out,
        "removed_exact": n_input - n_exact,
        "removed_near": n_exact - n_out,
        "method": args.method,
        "threshold": args.threshold,
    }
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=2))
    return report


def main() -> None:
    report = run(build_parser().parse_args())
    print(json.dumps(report))


if __name__ == "__main__":
    main()
