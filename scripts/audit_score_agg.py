#!/usr/bin/env python3
"""VERDICT r5 #6 audit: the exhaustive score-agg under hot-term skew.

``wand_1m_exhaustive`` pushes |queries| x |hot postings| contribution
rows through ``groupBy(query_id, doc_id).sum`` (the one big agg
without explicit salting; index/wand.py _run_exhaustive). This script
measures whether that agg is actually SKEWED — i.e. whether salting
could help — or whether its cost is irreducible shuffle volume:

* builds the same 1M-doc hot+anchor corpus as bench wand_1m,
* runs the scored-contributions plan (mirrors _run_exhaustive up to
  the agg; docstring-cited, not duplicated logic: decode -> broadcast
  joins -> contrib -> groupBy sum),
* reports per-shuffle-partition row counts of the agg output
  (max/mean = skew factor; hash(query_id, doc_id) over ~32M
  near-unique keys should be ~1.0 — salting only helps when FEW keys
  carry many rows, and here every key carries at most |query terms|
  rows by construction),
* reports whether the physical plan contains a partial aggregation
  (map-side combine) before the exchange,
* times the full exhaustive search twice for the round's record.

Run ALONE: taskset -c 0-31 python scripts/audit_score_agg.py
[--docs 1000000] [--cpus 32]. One JSON line; results belong in
BENCH/r6_notes.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bm25_chroma_spark.config import LOSSLESS_CONFIG
    from bm25_chroma_spark.index.shards import (
        ShardedIndex,
        build_sharded_index,
        decode_shards_to_postings,
    )
    from bm25_chroma_spark.index.wand import search_sharded
    from bm25_chroma_spark.operators.scoring import bm25_score_expr
    from bm25_chroma_spark.session import get_spark

    spark = get_spark(
        "audit-scoreagg", cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
    )
    docs = spark.range(args.docs).selectExpr(
        "id as doc_id",
        "concat('hota hotb hotc anchor', id % 2000, ' filler',"
        " id % 65536, repeat(' pad', cast(id % 4 as int))) as text",
    ).repartition(args.cpus * 4)
    out = tempfile.mkdtemp(prefix="audit_agg_")
    t0 = time.time()
    build_sharded_index(docs, out, config=LOSSLESS_CONFIG, bucket_groups=1)
    build_sec = round(time.time() - t0, 2)
    idx = ShardedIndex(spark, out)

    qpairs = [
        (i, f"hota hotb hotc anchor{7 * i + 3}")
        for i in range(args.queries)
    ]
    terms = sorted({t for _, q in qpairs for t in q.split()})

    # mirror of _run_exhaustive's plan UP TO the agg (wand.py:530-560)
    from collections import Counter

    qt = spark.createDataFrame(
        [
            (qid, term, int(c))
            for qid, q in qpairs
            for term, c in sorted(Counter(q.split()).items())
        ],
        "query_id long, term string, qtf int",
    )
    shards = idx.shards_for_terms(terms)
    dfs = shards.groupBy("term").agg(F.sum("df").alias("df"))
    decoded = decode_shards_to_postings(shards)
    joined = decoded.join(F.broadcast(dfs), "term").join(
        F.broadcast(qt), "term"
    )
    contrib = bm25_score_expr(
        F.col("tf").cast("double"),
        F.col("dl").cast("double"),
        F.col("df").cast("double"),
        idx.n_docs,
        idx.avgdl,
        idx.config.k1,
        idx.config.b,
    ) * F.col("qtf").cast("double")
    scores = (
        joined.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )

    plan = scores._jdf.queryExecution().executedPlan().toString()
    has_partial = "partial_sum" in plan or "HashAggregate(keys" in plan

    t0 = time.time()
    pp = (
        scores.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    agg_pass_sec = round(time.time() - t0, 2)
    counts = sorted(int(r["count"]) for r in pp)
    skew = (
        round(counts[-1] / (sum(counts) / len(counts)), 3)
        if counts else None
    )

    exh = []
    for _ in range(2):
        t0 = time.time()
        search_sharded(idx, qpairs, top_k=10, strategy="exhaustive").collect()
        exh.append(round(time.time() - t0, 2))

    print(json.dumps({
        "docs": args.docs,
        "cpus": args.cpus,
        "queries": args.queries,
        "build_sec": build_sec,
        "agg_rows_total": sum(counts),
        "agg_partitions": len(counts),
        "agg_partition_rows_min_max": [counts[0], counts[-1]],
        "agg_skew_max_over_mean": skew,
        "partial_agg_in_plan": has_partial,
        "agg_pass_sec": agg_pass_sec,
        "exhaustive_full_sec": exh,
    }))


if __name__ == "__main__":
    main()
