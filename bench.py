#!/usr/bin/env python
"""Benchmark harness.

Default mode (used by the driver each round): runs the headline
workload at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload:
  * logical index build over the documents table (docs/sec)
  * physical sharded index build (varint+block-max shards)
  * flagship BM25 query set, per-query latency via the sharded
    exhaustive path, plus a WAND pass
  * synthetic source-code corpus build at ~20k files (the
    input_hint-shaped table), exercising the salted skewed groupBy

--scaling mode: re-runs the same job at two parallelism levels
(local[8] vs local[32] by default) in fresh subprocesses and writes
BENCH/BASELINE.md with both throughputs and the scaling efficiency —
the sandbox proxy for the north rule's N -> 4N executor criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_FILES = int(os.environ.get("SPARK_GRAFT_SYNTH_FILES", "20000"))


def run_workload(cpus: int, sf_dir: str, synth_files: int) -> dict:
    from bm25_chroma_spark.config import BM25Config
    from bm25_chroma_spark.index.shards import (
        ShardedIndex,
        build_sharded_index,
    )
    from bm25_chroma_spark.index.wand import search_sharded
    from bm25_chroma_spark.operators.index_build import build_logical_index
    from bm25_chroma_spark.operators.scoring import bm25_score_queries
    from bm25_chroma_spark.plans.entry_queries import FLAGSHIP_QUERIES
    from bm25_chroma_spark.session import get_spark
    from bm25_chroma_spark.sources.corpus import synth_corpus

    spark = get_spark(
        f"bench-{cpus}", cores=cpus, shuffle_partitions=max(cpus, 8)
    )
    timings: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # 1. logical index build
    t0 = time.time()
    idx = build_logical_index(docs, id_col="doc_id", text_col="text")
    idx.postings.write.mode("overwrite").format("noop").save()
    timings["index_build_logical"] = time.time() - t0

    # 2. physical sharded build
    out = tempfile.mkdtemp(prefix=f"bench_shards_{cpus}_")
    t0 = time.time()
    build_sharded_index(docs, out, config=BM25Config(), bucket_groups=2)
    timings["index_build_sharded"] = time.time() - t0

    # 3. per-query latency (sharded exhaustive), one query at a time
    sharded = ShardedIndex(spark, out)
    for qid, qtext in FLAGSHIP_QUERIES:
        q = spark.createDataFrame(
            [(qid, qtext)], "query_id long, query_text string"
        )
        t0 = time.time()
        search_sharded(sharded, q, top_k=10, strategy="exhaustive").collect()
        timings[f"q{qid}"] = time.time() - t0

    # 4. batched passes: all queries in one job, both strategies
    allq = spark.createDataFrame(
        FLAGSHIP_QUERIES, "query_id long, query_text string"
    )
    t0 = time.time()
    search_sharded(sharded, allq, top_k=10, strategy="exhaustive").collect()
    timings["bm25_batch_exhaustive"] = time.time() - t0
    t0 = time.time()
    search_sharded(sharded, allq, top_k=10, strategy="wand").collect()
    timings["bm25_batch_wand"] = time.time() - t0
    t0 = time.time()
    bm25_score_queries(allq, idx, top_k=10).collect()
    timings["bm25_batch_logical"] = time.time() - t0

    # 5. synthetic corpus: generate + sharded build (the at-scale shape)
    t0 = time.time()
    corpus = synth_corpus(spark, synth_files, seed=42)
    corpus_docs = corpus.selectExpr(
        "xxhash64(repo, path, commit) as doc_id", "content as text"
    )
    out2 = tempfile.mkdtemp(prefix=f"bench_synth_{cpus}_")
    build_sharded_index(
        corpus_docs, out2, config=BM25Config(), bucket_groups=1
    )
    timings["synth_build_20k"] = time.time() - t0
    synth_throughput = synth_files / timings["synth_build_20k"]

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out2, ignore_errors=True)
    spark.stop()
    return {
        "timings": timings,
        "n_docs": n_docs,
        "synth_files_per_sec": synth_throughput,
    }


def main() -> None:
    if "--scaling" in sys.argv:
        return scaling_main()
    if "--child" in sys.argv:
        # subprocess entry for --scaling: emit raw result JSON
        cpus = int(sys.argv[sys.argv.index("--child") + 1])
        res = run_workload(cpus, SF_DIR, SYNTH_FILES)
        print("CHILD_RESULT " + json.dumps(res))
        return

    res = run_workload(CPUS, SF_DIR, SYNTH_FILES)
    t = res["timings"]
    total = sum(v for k, v in t.items() if k.startswith("q"))
    out = {
        "metric": "bm25_flagship_query_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in t.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs": res["n_docs"],
        "synth_files_per_sec": round(res["synth_files_per_sec"], 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))


def scaling_main() -> None:
    """Sandbox proxy for N -> 4N executor scaling (north rule)."""
    levels = [8, 32]
    results = {}
    for cpus in levels:
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [
            ln for ln in proc.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")
        ]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise RuntimeError(f"child at {cpus} cores failed")
        results[cpus] = json.loads(line[-1].removeprefix("CHILD_RESULT "))

    lo, hi = levels
    tp_lo = results[lo]["synth_files_per_sec"]
    tp_hi = results[hi]["synth_files_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    report = {
        "levels": levels,
        "throughput_files_per_sec": {str(k): round(v["synth_files_per_sec"], 1)
                                     for k, v in results.items()},
        "speedup": round(tp_hi / tp_lo, 3),
        "ideal_speedup": hi / lo,
        "scaling_efficiency": round(eff, 3),
        "timings": {str(k): {kk: round(vv, 3) for kk, vv in v["timings"].items()}
                    for k, v in results.items()},
    }
    print(json.dumps(report, indent=2))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = [
        "# BENCH/BASELINE — scaling evidence (sandbox proxy)",
        "",
        "The north rule requires >=0.8 throughput scaling efficiency",
        "between N and 4N executors. No real cluster exists in this",
        "sandbox, so per the driver instruction the same job (synthetic",
        f"{SYNTH_FILES}-file corpus generation + sharded index build)",
        f"runs at local[{lo}] and local[{hi}] on identical input.",
        "",
        "| parallelism | build throughput (files/sec) |",
        "|---|---|",
    ]
    for k in levels:
        md.append(f"| local[{k}] | {report['throughput_files_per_sec'][str(k)]} |")
    md += [
        "",
        f"speedup {lo}->{hi} cores: **{report['speedup']}x** "
        f"(ideal {report['ideal_speedup']}x)",
        "",
        f"**scaling efficiency: {report['scaling_efficiency']}** "
        "(target >= 0.8)",
        "",
        "Raw timings (sec):",
        "```json",
        json.dumps(report["timings"], indent=2),
        "```",
    ]
    (bench_dir / "BASELINE.md").write_text("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
