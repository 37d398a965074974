"""Out-of-the-box smoke for the spark-submit entry points: the
DEFAULT config of scripts/build_index.py must produce an index whose
query path accepts hot terms (VERDICT r2 #3: the old default shipped
max_postings=5000, which the pre-r3 guard refused the moment a
queried term's df exceeded the cap). Runs both mains in-process
against a synthetic corpus with a genuinely hot term."""

from __future__ import annotations

import sys


def _run_main(mod_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    mod_main()


def test_build_then_query_defaults_hot_term(spark, tmp_path, monkeypatch):
    import scripts.build_index as build_mod
    import scripts.query_index as query_mod

    # 1500 docs all containing 'hot' (df 1500 — binds both reference
    # caps), ids via the production default xxhash64 id-expr
    src = str(tmp_path / "corpus.parquet")
    spark.range(1500).selectExpr(
        "concat('r', id) as repo",
        "concat('p', id, '.py') as path",
        "'c0' as commit",
        "'py' as lang",
        "concat('hot common def parser', id % 7, ' return') as content",
    ).write.parquet(src)

    out = str(tmp_path / "idx")
    _run_main(
        build_mod.main,
        [
            "build_index.py", "--corpus", src, "--out", out,
            "--buckets", "4", "--segments", "2", "--groups", "2",
        ],
        monkeypatch,
    )

    # default-config query path accepts the hot term (no cap refusal)
    for strategy in ("auto", "exhaustive", "wand"):
        _run_main(
            query_mod.main,
            [
                "query_index.py", "--index", out, "--top-k", "5",
                "--strategy", strategy, "hot parser3",
            ],
            monkeypatch,
        )

    # and the index really is lossless: stored df == true df
    import json
    from pathlib import Path

    stats = json.loads((Path(out) / "stats.json").read_text())
    assert stats["config"]["max_postings_per_term"] is None
    assert stats["config"]["query_postings_cap"] is None
    from pyspark.sql import functions as F

    from bm25_chroma_spark.index.shards import ShardedIndex

    idx = ShardedIndex(spark, out)
    df_hot = (
        idx.shards_for_terms(["hot"])
        .agg(F.sum("df").alias("df"))
        .collect()[0]["df"]
    )
    assert df_hot == 1500
