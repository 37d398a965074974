#!/usr/bin/env python3
"""VERDICT r5 #7 prototype: can the build's tokenize pass move JVM-side?

Compares, on the same synthetic corpus and host:

* ``python_partials`` — the production pass: ONE mapInPandas stage
  (tokenize_py + np.unique tf + per-(term, segment) partial packing,
  index/shards.py::_map_docs_to_partials) written to the noop sink.
* ``jvm_explode_agg`` — the JVM candidate: ``sql_tokens`` (codegen
  regexp_extract_all, functions/tokenizer.py) -> posexplode ->
  groupBy(doc_id, term).count() to the noop sink. Tokenize+tf run
  fully JVM-side, but the (doc_id, term, tf) rows must then be
  shuffled and REPACKED into partial arrays by a Python stage anyway
  (the codec input is array-packed), so this measures the best case
  for the JVM route: its floor, before re-adding the packing cost.
* ``jvm_tokenize_only`` — sql_tokens -> size() -> sum, no shuffle:
  the pure tokenize floor with zero agg cost, to separate regex cost
  from shuffle cost.

Also cross-checks correctness on a 2k-doc sample: the JVM (doc, term,
tf) multiset must equal the Python tokenizer's (ASCII corpus — Java
and Python \\b agree; see sql_tokens docstring).

Run ALONE (CPU-quota host): taskset -c 0-7 python
scripts/proto_tokenize_jvm.py [--files 100000] [--cpus 8]
Prints one JSON line; results belong in BENCH/r6_notes.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bm25_chroma_spark.config import LOSSLESS_CONFIG
    from bm25_chroma_spark.functions.tokenizer import sql_tokens
    from bm25_chroma_spark.index.shards import (
        _PARTIAL_DDL,
        _map_docs_to_partials,
    )
    from bm25_chroma_spark.session import get_spark
    from bm25_chroma_spark.sources.corpus import synth_corpus

    spark = get_spark(
        "proto-tokenize", cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
    )
    import tempfile

    src = tempfile.mkdtemp(prefix="proto_tok_") + "/docs"
    synth_corpus(
        spark, args.files, seed=42, partitions=args.cpus * 4
    ).selectExpr(
        "xxhash64(repo, path, commit) as doc_id", "content as text"
    ).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    cfg = LOSSLESS_CONFIG

    def timed(make):
        make()  # warm (workers, codegen)
        out = []
        for _ in range(3):
            t0 = time.time()
            make()
            out.append(round(time.time() - t0, 3))
        return out

    def python_partials():
        docs.mapInPandas(
            _map_docs_to_partials(cfg.num_term_buckets, cfg.salt_factor),
            schema=_PARTIAL_DDL,
        ).write.mode("overwrite").format("noop").save()

    def jvm_explode_agg():
        (
            docs.select(
                "doc_id", F.explode(sql_tokens(F.col("text"))).alias("term")
            )
            .groupBy("doc_id", "term")
            .count()
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def jvm_tokenize_only():
        docs.select(
            F.size(sql_tokens(F.col("text"))).alias("n")
        ).agg(F.sum("n")).collect()

    def jvm_hybrid_pack():
        # the explode-free candidate: JVM tokenize feeds the SAME
        # Python packing stage (pretokenized=True) — no extra shuffle,
        # token arrays ride the task-local Arrow transfer
        (
            docs.select(
                "doc_id", sql_tokens(F.col("text")).alias("text")
            )
            .mapInPandas(
                _map_docs_to_partials(
                    cfg.num_term_buckets, cfg.salt_factor,
                    pretokenized=True,
                ),
                schema=_PARTIAL_DDL,
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # correctness cross-check on a sample (ASCII corpus)
    from collections import Counter

    from bm25_chroma_spark.functions.tokenizer import tokenize_py

    sample = docs.limit(2000).collect()
    py_tf = Counter()
    for r in sample:
        for t, c in Counter(tokenize_py(r["text"])).items():
            py_tf[(r["doc_id"], t)] = c
    sdf = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in sample],
        "doc_id long, text string",
    )
    jvm_tf = {
        (r["doc_id"], r["term"]): r["count"]
        for r in sdf.select(
            "doc_id", F.explode(sql_tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .count()
        .collect()
    }
    parity = dict(py_tf) == jvm_tf

    res = {
        "files": args.files,
        "cpus": args.cpus,
        "tf_parity_2k_sample": parity,
        "python_partials_sec": timed(python_partials),
        "jvm_explode_agg_sec": timed(jvm_explode_agg),
        "jvm_tokenize_only_sec": timed(jvm_tokenize_only),
        "jvm_hybrid_pack_sec": timed(jvm_hybrid_pack),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
