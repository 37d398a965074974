#!/usr/bin/env python
"""Solo measurement for the Stupid-Backoff LM stage at 100k docs
(r8): train_word_lm (two exploded counts) + score_lm (explode + 3
broadcast joins + per-doc avg) over the same materialized synthetic
corpus bench.py uses, with nothing else in the JVM.

Protocol mirrors bench.py: seed-42 synth corpus materialized to
parquet, warm pass, fresh plan per timed pass, median of N. Also
reports the model size (vocab/bigrams after min_count pruning) —
the number that decides broadcastability at scale — and the raw-CPU
host probe so deltas are attributable.

Run alone:  python scripts/solo_lm.py [--trials N] [--min-count K]
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


def main() -> None:
    trials = 3
    min_count = 5
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    if "--min-count" in sys.argv:
        min_count = int(sys.argv[sys.argv.index("--min-count") + 1])

    import bench

    cpus = bench.CPUS
    probe = bench._cpu_probe([cpus])

    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.lm import score_lm, train_word_lm
    from bm25_chroma_spark.session import get_spark
    from bm25_chroma_spark.sources.corpus import synth_corpus

    spark = get_spark(app_name="solo_lm", cores=cpus)
    src = tempfile.mkdtemp(prefix="solo_lm_")
    try:
        corpus = synth_corpus(spark, 100_000, seed=42, partitions=cpus * 4)
        corpus.selectExpr(
            "xxhash64(repo, path, commit) as doc_id", "content as text"
        ).write.mode("overwrite").parquet(src)

        def lm_probe():
            docs = spark.read.parquet(src)
            lm = train_word_lm(docs, min_count=min_count)
            return lm, score_lm(docs, lm, round_to=6).agg(
                F.sum("n_tokens").alias("nt"),
                F.sum("avg_logprob").alias("s"),
            )

        lm, agg = lm_probe()  # warm: Python workers + codegen JIT
        agg.collect()
        vocab = lm.unigrams.count()
        bigrams = lm.bigrams.count()

        times = []
        for _ in range(trials):
            t0 = time.time()
            _, agg = lm_probe()
            checksum = agg.collect()[0]
            times.append(time.time() - t0)
        times.sort()
        print(json.dumps({
            "metric": "lm_score_100k_solo",
            "median_sec": round(times[len(times) // 2], 3),
            "trials": [round(t, 3) for t in times],
            "min_count": min_count,
            "vocab": vocab,
            "bigrams": bigrams,
            "train_tokens": lm.n_tokens,
            "checksum": [int(checksum["nt"]), float(checksum["s"])],
            "cpu_probe": probe,
        }))
    finally:
        shutil.rmtree(src, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
