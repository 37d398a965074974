#!/usr/bin/env python
"""Measured comparison for VERDICT-r7 #4: does staging the
posexploded (id, pos, gram_key) frame ONCE (one tokenize+shingle
scan, discovery derived from the staged frame) beat the shipped
two-scan shape of remove_repeated_spans?

Replicates bench.py's span_dedup_100k protocol exactly (same 100k
seed-42 corpus, same planted 12-token boilerplate in 25% of docs,
span_tokens=10/min_docs=2, warm pass + min of 2 timed), alone on the
box, with the raw-CPU probe logged.

Shapes:
  A (shipped): scan+shingle twice; discovery = map-side
     array_distinct explode -> partial-agg count; positions never
     shuffle (BHJ against the small key set).
  B (one-scan): posexplode ALL positions to parquet once; discovery =
     dropDuplicates(id, key) -> count (two shuffles of the distinct
     pairs); positions re-read from the staged copy for the join.

Run alone:  python scripts/solo_span_onescan.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SPAN, MIN_DOCS = 10, 2


def main() -> None:
    import bench

    cpus = bench.CPUS
    probe = bench._cpu_probe([cpus])

    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.span_dedup import (
        _gram_keys,
        remove_repeated_spans,
    )
    from bm25_chroma_spark.session import get_spark
    from bm25_chroma_spark.sources.corpus import synth_corpus

    spark = get_spark(app_name="solo_span_onescan", cores=cpus)
    sim_src = tempfile.mkdtemp(prefix="solo_span_src_")
    staged = tempfile.mkdtemp(prefix="solo_span_pos_")
    try:
        synth_corpus(spark, 100_000, seed=42, partitions=cpus * 4).selectExpr(
            "xxhash64(repo, path, commit) as doc_id", "content as text"
        ).write.mode("overwrite").parquet(sim_src)

        def docs():
            return spark.read.parquet(sim_src).select(
                "doc_id",
                F.when(
                    F.pmod(F.col("doc_id"), F.lit(4)) == 0,
                    F.concat(
                        F.col("text"),
                        F.lit(
                            " all rights reserved unsubscribe from this"
                            " newsletter by clicking the link below"
                        ),
                    ),
                ).otherwise(F.col("text")).alias("text"),
            )

        def shipped():
            out = remove_repeated_spans(
                docs(), span_tokens=SPAN, min_docs=MIN_DOCS
            )
            return out.agg(
                F.sum("n_removed").alias("nr"), F.count("*").alias("n")
            )

        def one_scan():
            d = docs()
            pos = d.select(
                "doc_id",
                F.posexplode(
                    _gram_keys(F.col("text"), SPAN)
                ).alias("pos", "gram_key"),
            )
            pos.write.mode("overwrite").parquet(staged)
            posr = spark.read.parquet(staged)
            keys = (
                posr.select("doc_id", "gram_key")
                .dropDuplicates()
                .groupBy("gram_key")
                .agg(F.count("*").alias("n_docs"))
                .filter(F.col("n_docs") >= MIN_DOCS)
            )
            hits = (
                posr.join(keys.select("gram_key"), "gram_key")
                .groupBy("doc_id")
                .agg(F.sort_array(F.collect_list("pos")).alias("_hits"))
            )
            base = d.select(
                "doc_id",
                "text",
                F.split(
                    F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""),
                    r"\s+",
                ).alias("_toks"),
            )
            joined = base.join(hits, "doc_id", "left")
            covered = F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("_hits"),
                        lambda p: F.sequence(p, p + F.lit(SPAN - 1)),
                    )
                )
            )
            n_removed = (
                F.when(F.col("_hits").isNull(), F.lit(0))
                .otherwise(F.size(covered))
                .cast("int")
            )
            return joined.select(n_removed.alias("n_removed")).agg(
                F.sum("n_removed").alias("nr"), F.count("*").alias("n")
            )

        results = {}
        checks = {}
        for name, fn in (("shipped_two_scan", shipped),
                         ("one_scan_staged", one_scan)):
            checks[name] = tuple(fn().collect()[0])  # warm + checksum
            trials = []
            for _ in range(2):
                t0 = time.time()
                fn().collect()
                trials.append(round(time.time() - t0, 3))
            results[name] = {"min": min(trials), "trials": trials}
        print(json.dumps({
            "metric": "solo_span_onescan_100k",
            "results": results,
            "checksums": {k: list(map(int, v)) for k, v in checks.items()},
            "checksums_equal": checks["shipped_two_scan"]
            == checks["one_scan_staged"],
            "cpus": cpus,
            "host_cpu_probe_units_per_sec": probe,
        }))
    finally:
        shutil.rmtree(sim_src, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
