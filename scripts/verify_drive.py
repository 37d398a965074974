"""Build-and-drive verification (the /verify recipe, scripted).

Drives the public library surface end-to-end on real testdata plus
the driver contract (entry + spot oracle cross-checks via DuckDB).
Run: python scripts/verify_drive.py   (exit 0 = green)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import importlib.util
import pandas as pd

from bm25_chroma_spark import get_spark
from bm25_chroma_spark.operators import (
    bm25_score_queries,
    build_logical_index,
)


def main() -> None:
    spark = get_spark("verify-drive", cores=4, shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_logical_index(docs, id_col="doc_id", text_col="text")
    queries = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, ""), (3, "JOIN join Join")],
        "query_id long, query_text string",
    )
    rows = bm25_score_queries(queries, idx, top_k=5).collect()
    assert rows, "no BM25 results"
    assert not [r for r in rows if r["query_id"] == 2], "empty query leaked"

    spec = importlib.util.spec_from_file_location(
        "entry", str(Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    n = df.count()
    assert n >= 0 and df.schema, "entry contract broken"
    print("entry rows:", n)

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    q, osql = mod.queries(), mod.oracle_sql()
    spot = sys.argv[1:] or ["bm25_topk", "term_idf", "rrf_hybrid"]
    for name in spot:
        sdf = q[name](spark, sf).toPandas()
        if name not in osql:
            # rows-only contract entry (deliberately no oracle, e.g.
            # the iterative ann_ivf_trained): drive rows + schema only
            assert len(sdf) >= 0 and list(sdf.columns), name
            print(name, "rows-only OK", len(sdf), "rows")
            continue
        odf = con.execute(osql[name]).df()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        assert scols == ocols, (name, scols, ocols)
        a = sdf[scols].sort_values(scols).reset_index(drop=True)
        b = odf[ocols].sort_values(ocols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a, b, check_dtype=False, check_exact=False, rtol=1e-9
        )
        print(name, "oracle MATCH", len(a), "rows")

    # facade warm-path drive (r6): a repeat interactive query must
    # launch ZERO Spark jobs and return identical values (the warm
    # caches are an execution-strategy change only)
    import tempfile

    from bm25_chroma_spark.plans.retriever import SparkHybridRetriever

    sample = docs.limit(300).collect()
    retr = SparkHybridRetriever(spark, tempfile.mkdtemp() + "/vstate")
    retr.add_documents_batch(
        [r["text"] for r in sample],
        [f"d{r['doc_id']}" for r in sample],
    )
    fq = ["spark shuffle join", "partition pruning parquet"]
    cold = retr.query(fq, n_results=5)
    assert cold["ids"][0], "facade produced no hits"
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    warm = retr.query(fq, n_results=5)
    j1 = len(tracker.getJobIdsForGroup(None))
    assert warm == cold, "warm facade result diverged"
    assert j1 == j0, f"warm facade launched {j1 - j0} Spark job(s)"
    print("facade warm drive OK: 0 jobs, identical results")

    spark.stop()
    print("VERIFY-DRIVE OK")


if __name__ == "__main__":
    main()
