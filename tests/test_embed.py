"""embed_corpus — the distributed (mapInPandas) corpus-embedding
ingest step. Pins: value parity with the facade's driver-side
embedder, null handling, narrow-plan shape (no shuffle), and the
bulk-ingest script end-to-end (flat + IVF-store modes)."""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest

from bm25_chroma_spark.operators.embed import embed_corpus
from bm25_chroma_spark.plans.retriever import hashed_bow_embedder


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "spark shuffle join broadcast"),
        (2, "spark join join filter"),
        (3, None),
        (4, ""),
        (5, "varint posting list compression"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embed_matches_driver_side_embedder(docs):
    out = {
        r["doc_id"]: r["embedding"]
        for r in embed_corpus(docs, embed_fn=hashed_bow_embedder).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in texts.items():
        want = hashed_bow_embedder([text if text is not None else ""])[0]
        assert out[did] == pytest.approx(want), did
    # nulls/empties embed to the zero vector, not a crash
    assert not any(out[3]) and not any(out[4])
    # vectors are L2-normalized
    assert np.linalg.norm(out[1]) == pytest.approx(1.0)


def test_embed_plan_is_narrow(docs):
    """The whole point of the operator: a single map pass. No shuffle
    (Exchange) may appear in the physical plan."""
    plan = (
        embed_corpus(docs, embed_fn=hashed_bow_embedder)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_embed_refuses_column_collision(docs):
    with pytest.raises(ValueError):
        embed_corpus(docs.withColumn("embedding", docs.doc_id))


def test_embed_corpus_script_flat_and_ivf(spark, tmp_path, monkeypatch, capsys):
    import scripts.embed_corpus as mod

    src = str(tmp_path / "docs.parquet")
    spark.range(60).selectExpr(
        "id as doc_id",
        "concat('token', id % 9, ' shared corpus text ', id % 4) as text",
    ).write.parquet(src)

    def run(argv):
        monkeypatch.setattr(sys, "argv", argv)
        mod.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    flat = str(tmp_path / "emb")
    rep = run(["embed_corpus.py", "--input", src, "--output", flat])
    assert rep == {"rows": 60, "store": "flat"}
    got = spark.read.parquet(flat)
    assert got.columns == ["doc_id", "embedding"]
    assert got.count() == 60

    store = str(tmp_path / "ivf")
    rep = run(
        [
            "embed_corpus.py", "--input", src, "--output", store,
            "--ivf-cells", "4", "--train-iters", "1",
        ]
    )
    assert rep["rows"] == 60 and rep["store"] == "ivf_partitioned"
    # servable by the partitioned-IVF query path
    from bm25_chroma_spark.operators.knn import knn_ivf_partitioned

    centroids = json.loads((tmp_path / "ivf" / "centroids.json").read_text())
    qvec = hashed_bow_embedder(["token1 shared corpus text 1"])[0]
    res = knn_ivf_partitioned(
        spark, store, [qvec], centroids, k=3, nprobe=4
    ).collect()
    assert len(res) == 3 and res[0]["dist"] < 0.35
