#!/usr/bin/env python
"""spark-submit entry point: score a corpus with a curated-vs-crawl
Naive Bayes quality classifier — the GPT-3-recipe discriminative
filter stage (Brown et al. 2020 Appendix A), structured like
lm_score_corpus.py: the scores land as a SIDECAR parquet
(id, n_tokens, quality_logodds [, q_bucket]) keyed by document id,
so downstream mixing/filtering joins or prunes on it without
rewriting the corpus.

Train on --pos (a curated seed: wiki/books-like text) vs --neg (a
crawl sample; defaults to the corpus itself — the standard recipe
when the crawl IS the corpus being scored). --min-count /
--max-vocab prune the model broadcastable; scoring is then explode +
ONE broadcast join + one partial-aggregable per-doc average.
--buckets N adds a head..tail label from one approxQuantile pass.

Usage (local smoke):
  python scripts/quality_clf_corpus.py \
      --input /root/testdata/sf0.01/documents.parquet \
      --pos /path/to/curated.parquet \
      --output /tmp/q_scores --buckets 3 --report /tmp/q_report.json

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip \
      scripts/quality_clf_corpus.py --input s3://corpus/documents \
      --pos s3://corpus/wiki --output s3://corpus/quality_scores \
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
    p.add_argument("--pos", required=True,
                   help="curated seed parquet (the positive class)")
    p.add_argument("--neg",
                   help="crawl sample parquet (the negative class; "
                        "default: the corpus itself)")
    p.add_argument("--output", required=True,
                   help="scores parquet (id, n_tokens, quality_logodds)")
    p.add_argument("--report", help="write a JSON metrics report here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-count", type=int, default=2,
                   help="drop terms with total count below this "
                        "(keeps the model broadcastable; raise with "
                        "corpus size)")
    p.add_argument("--max-vocab", type=int, default=0,
                   help="hard vocabulary cap (0 = none; prefer "
                        "--min-count at scale — the cap sorts)")
    p.add_argument("--buckets", type=int, default=0,
                   help="add a head..tail q_bucket label with this "
                        "many quantile buckets (0 = off)")
    p.add_argument("--round", type=int, default=6)
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=8)
    return p


def run(args) -> dict:
    from bm25_chroma_spark.operators.lm import lm_buckets
    from bm25_chroma_spark.operators.quality_clf import (
        score_nb_quality,
        train_nb_quality,
    )
    from bm25_chroma_spark.session import get_spark

    spark = get_spark(
        "quality-clf",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.input)
    pos = spark.read.parquet(args.pos)
    neg = spark.read.parquet(args.neg) if args.neg else docs
    model = train_nb_quality(
        pos,
        neg,
        text_col=args.text_col,
        min_count=args.min_count,
        max_vocab=args.max_vocab or None,
    )
    scored = score_nb_quality(
        docs,
        model,
        id_col=args.id_col,
        text_col=args.text_col,
        round_to=args.round,
    )
    if args.buckets:
        scored = lm_buckets(
            scored, n_buckets=args.buckets,
            score_col="quality_logodds", bucket_col="q_bucket",
        )
    scored.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    report = {
        "pos_tokens": model.pos_tokens,
        "neg_tokens": model.neg_tokens,
        "vocab_size": model.vocab_size,
        "model_terms": model.terms.count(),
        "scored_docs": out.count(),
    }
    if args.buckets:
        from pyspark.sql import functions as F

        report["bucket_docs"] = {
            str(r["q_bucket"]): int(r["n"])
            for r in out.groupBy("q_bucket")
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
