"""Deterministic training-shard assignment + sorted shard writer:
Python-md5 parity, balance, write round-trip, in-file sort order,
manifest audit, and the one-shuffle plan shape."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.operators.sharding import (
    assign_shards,
    read_shard_manifest,
    shard_sql_expr,
    validate_shards,
    write_training_shards,
)


def _py_shard(doc_id: int, n: int, salt: str = "") -> int:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    return int(h[:8], 16) % n


def test_assign_matches_python_md5(spark):
    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["shard_id"]
           for r in assign_shards(df, 7, salt="sh").collect()}
    for i in range(400):
        assert got[i] == _py_shard(i, 7, "sh"), i


def test_assign_matches_duckdb_polynomial(spark):
    import duckdb

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    got = sorted(
        (r["doc_id"], r["shard_id"])
        for r in assign_shards(df, 5, salt="x").collect()
    )
    want = sorted(
        duckdb.sql(
            "SELECT i AS doc_id, "
            + shard_sql_expr("i", 5, "x")
            + " AS shard_id FROM range(0, 300) t(i)"
        ).fetchall()
    )
    assert got == want


def test_assign_balance_and_determinism(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    counts = {
        r["shard_id"]: r["count"]
        for r in assign_shards(df, 8).groupBy("shard_id").count().collect()
    }
    assert set(counts) == set(range(8))
    for c in counts.values():
        assert c == pytest.approx(500, rel=0.2)
    # partitioning-independent
    a = assign_shards(df, 8).collect()
    b = assign_shards(df.repartition(13), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # map-side only: no Exchange in the assignment plan
    plan = assign_shards(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        assign_shards(df, 0)


def test_write_shards_roundtrip_and_manifest(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i} text", (i % 9) + 1) for i in range(500)],
        "doc_id long, text string, n_tok long",
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, 4, salt="w", sum_cols=("n_tok",)
    )
    assert manifest["total_rows"] == 500
    assert set(manifest["shards"]) == {"0", "1", "2", "3"}
    assert sum(s["sum_n_tok"] for s in manifest["shards"].values()) \
        == sum((i % 9) + 1 for i in range(500))
    # manifest on disk, underscore-prefixed so parquet readers skip it
    assert read_shard_manifest(path) == json.loads(
        json.dumps(manifest, default=str)
    )
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))
    # exactly one data file per shard, rows sorted by doc_id inside
    for s in range(4):
        files = [
            f for f in glob.glob(os.path.join(path, f"shard_id={s}", "*"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, files
        ids = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
        assert ids == sorted(ids)
        assert all(_py_shard(i, 4, "w") == s for i in ids)
        meta = manifest["shards"][str(s)]
        assert meta["n_rows"] == len(ids)
        assert meta["min_id"] == ids[0] and meta["max_id"] == ids[-1]
    audit = validate_shards(spark, path)
    assert audit["ok"], audit


def test_validate_shards_detects_tamper(spark, tmp_path):
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards2")
    write_training_shards(docs, path, 3)
    m = read_shard_manifest(path)
    m["shards"]["0"]["n_rows"] += 1
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(m, f, default=str)
    audit = validate_shards(spark, path)
    assert not audit["ok"]
    assert audit["mismatches"][0]["shard"] == 0


def test_write_shards_shuffled_order(spark, tmp_path):
    """order='shuffled': in-file order = the seeded md5 order (the
    T5/C4 global example shuffle), decorrelated from id order, and
    byte-identical across reruns and input partitionings."""
    import hashlib as hl

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(docs, p1, 3, salt="o", order="shuffled")
    write_training_shards(
        docs.repartition(11), p2, 3, salt="o", order="shuffled"
    )
    assert m1["order"] == "shuffled"

    def okey(i: int) -> str:
        return hl.md5(f"{i}o#order".encode()).hexdigest()

    for s in range(3):
        f1 = [f for f in glob.glob(os.path.join(p1, f"shard_id={s}", "*"))
              if f.endswith(".parquet")]
        f2 = [f for f in glob.glob(os.path.join(p2, f"shard_id={s}", "*"))
              if f.endswith(".parquet")]
        assert len(f1) == 1 and len(f2) == 1
        ids = [r["doc_id"] for r in spark.read.parquet(f1[0]).collect()]
        assert ids == sorted(ids, key=lambda i: (okey(i), i))
        assert ids != sorted(ids)  # genuinely decorrelated from id order
        with open(f1[0], "rb") as a, open(f2[0], "rb") as b:
            assert a.read() == b.read()
    # default stays id-ordered and stamps the manifest
    p3 = str(tmp_path / "s3")
    assert write_training_shards(docs, p3, 2)["order"] == "id"
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "s4"), 2, order="bogus")
