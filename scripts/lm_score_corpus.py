#!/usr/bin/env python
"""spark-submit entry point: score a corpus with a Stupid-Backoff
bigram LM trained on a reference corpus — the CCNet quality-filter
stage (Wenzek et al. 2019), structured the way CCNet runs it: the
scores land as a SIDECAR parquet (id, n_tokens, avg_logprob
[, lm_bucket]) keyed by document id, so downstream mixing/filtering
joins or prunes on it without rewriting the corpus.

Train on --ref (wiki-like curated text; defaults to the corpus
itself for self-scoring). --min-count / --max-vocab prune the model
broadcastable — the scoring pass is then explode + broadcast joins +
one partial-aggregable per-doc average. --buckets N adds the CCNet
head/middle/tail label from one approxQuantile pass (no global sort).

Usage (local smoke):
  python scripts/lm_score_corpus.py \
      --input /root/testdata/sf0.01/documents.parquet \
      --output /tmp/lm_scores --buckets 3 --report /tmp/lm_report.json

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip \
      scripts/lm_score_corpus.py --input s3://corpus/documents \
      --ref s3://corpus/wiki --output s3://corpus/lm_scores \
      --min-count 100 --buckets 3
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
    p.add_argument("--input", required=True, help="corpus parquet")
    p.add_argument("--ref",
                   help="reference parquet the LM trains on "
                        "(default: the corpus itself)")
    p.add_argument("--output", required=True,
                   help="scores parquet (id, n_tokens, avg_logprob)")
    p.add_argument("--report", help="write a JSON metrics report here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-count", type=int, default=2,
                   help="drop unigrams/bigrams rarer than this "
                        "(keeps the model broadcastable; raise with "
                        "corpus size)")
    p.add_argument("--max-vocab", type=int, default=0,
                   help="hard vocabulary cap (0 = none; prefer "
                        "--min-count at scale — the cap sorts)")
    p.add_argument("--alpha", type=float, default=0.4,
                   help="Stupid Backoff discount (Brants et al. 2007)")
    p.add_argument("--buckets", type=int, default=0,
                   help="add a head..tail lm_bucket label with this "
                        "many quantile buckets (0 = off)")
    p.add_argument("--round", type=int, default=6)
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=8)
    return p


def run(args) -> dict:
    from bm25_chroma_spark.operators.lm import (
        lm_buckets,
        score_lm,
        train_word_lm,
    )
    from bm25_chroma_spark.session import get_spark

    spark = get_spark(
        "lm-score",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.input)
    ref = spark.read.parquet(args.ref) if args.ref else docs
    lm = train_word_lm(
        ref,
        text_col=args.text_col,
        min_count=args.min_count,
        max_vocab=args.max_vocab or None,
    )
    scored = score_lm(
        docs,
        lm,
        id_col=args.id_col,
        text_col=args.text_col,
        alpha=args.alpha,
        round_to=args.round,
    )
    if args.buckets:
        scored = lm_buckets(scored, n_buckets=args.buckets)
    scored.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    report = {
        "train_tokens": lm.n_tokens,
        "vocab_size": lm.unigrams.count(),
        "bigrams": lm.bigrams.count(),
        "scored_docs": out.count(),
    }
    if args.buckets:
        from pyspark.sql import functions as F

        report["bucket_docs"] = {
            str(r["lm_bucket"]): int(r["n"])
            for r in out.groupBy("lm_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    return report


def main() -> None:
    args = build_parser().parse_args()
    report = run(args)
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
