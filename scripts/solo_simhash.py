#!/usr/bin/env python
"""Solo confirmation run for the simhash_100k bench key (VERDICT-r7 #1).

Replicates bench.py's measurement protocol exactly — same 100k-doc
synthetic corpus (seed 42), same materialize-to-parquet step, same
fresh-plan-per-pass probe, warm + median-of-3 — but with NOTHING else
in the job (no index builds, no WAND passes sharing the JVM), so the
number isolates the pandas-UDF simhash path from host contention.

Also logs the raw-CPU host probe (bench._cpu_probe) at the same core
count so a degraded-host run is distinguishable from a code
regression (CLAUDE.md: burstable host, probe before trusting deltas).

Run alone:  python scripts/solo_simhash.py [--trials N]
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
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])

    import bench

    cpus = bench.CPUS
    probe = bench._cpu_probe([cpus])

    from pyspark.sql import functions as F

    from bm25_chroma_spark.operators.dedup import make_simhash64_udf
    from bm25_chroma_spark.session import get_spark
    from bm25_chroma_spark.sources.corpus import synth_corpus

    spark = get_spark(app_name="solo_simhash", cores=cpus)
    sim_src = tempfile.mkdtemp(prefix="solo_sim_")
    try:
        wcorpus = synth_corpus(
            spark, 100_000, seed=42, partitions=cpus * 4
        )
        wcorpus.selectExpr(
            "xxhash64(repo, path, commit) as doc_id", "content as text"
        ).write.mode("overwrite").parquet(sim_src)

        def sim_probe():
            # fresh plan per pass (see bench.py: re-collecting the same
            # DataFrame skips the materialized shuffle map stage).
            return (
                spark.read.parquet(sim_src)
                .select(
                    F.bit_count(
                        make_simhash64_udf("blake2b")(F.col("text"))
                    ).alias("b")
                )
                .agg(F.sum("b"))
            )

        checksum = sim_probe().collect()[0][0]  # warm + checksum
        times = []
        for _ in range(trials):
            t0 = time.time()
            sim_probe().collect()
            times.append(time.time() - t0)
        print(json.dumps({
            "metric": "solo_simhash_100k",
            "median": sorted(times)[len(times) // 2],
            "trials": [round(t, 3) for t in times],
            "checksum": int(checksum),
            "cpus": cpus,
            "host_cpu_probe_units_per_sec": probe,
        }))
    finally:
        shutil.rmtree(sim_src, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
