"""Physical sharded index: term-bucketed, segment-partitioned,
varint-compressed posting shards with per-group checkpoint manifests.

Layout on disk (parquet + JSON bookkeeping):

  <dir>/stats.json                 N, avgdl, config, lineage
  <dir>/doc_stats.parquet          (doc_id, dl)
  <dir>/shards/group=G/...         SHARD rows, partitioned by bucket
  <dir>/manifests/group_G.json     per-group checkpoint: status,
                                   metrics (postings, bytes, skew),
                                   lineage (input rows, config hash)

Shard row = one (term, segment): segment = pmod(xxhash64(doc_id), S)
splits every hot term's postings across S groups, so no single
aggregation group ever exceeds ~1/S of the hottest term — the
explicit skew handling the vanilla groupBy(term) lacks. Segments are
disjoint doc sets, so BM25 additivity makes query-time merging free
(treat each (term, segment) as an independent posting list).

Builds are resumable: each bucket-group is an independent job whose
manifest marks completion; re-running skips complete groups (the
driver-visible crash-recovery path). Buckets give query-time
partition pruning: a query touches only the buckets its terms hash
to.
"""

from __future__ import annotations

import hashlib
import json
import math
import time
from dataclasses import asdict
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config, DEFAULT_CONFIG
from bm25_chroma_spark.index.encode import encode_postings

SHARD_DDL = (
    "bucket int, term string, segment int, df long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, "
    "blocks array<struct<first_doc: long, n: int, max_tf: int, "
    "min_dl: int, doc_off: int, tf_off: int, dl_off: int>>"
)


def _config_hash(config: BM25Config) -> str:
    return hashlib.sha256(
        json.dumps(asdict(config), sort_keys=True).encode()
    ).hexdigest()[:16]


def _encode_bucket_segment(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """One (bucket, segment) slice -> one shard row per term.

    Vectorized: numpy sort once, then per-term slices feed the codec.
    """
    out = []
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    bucket = int(pdf["bucket"].iloc[0])
    segment = int(pdf["segment"].iloc[0])
    for term, grp in pdf.groupby("term", sort=False):
        enc = encode_postings(
            grp["doc_id"].to_numpy(np.int64),
            grp["tf"].to_numpy(np.int64),
            grp["dl"].to_numpy(np.int64),
            block_size=block_size,
        )
        out.append(
            {
                "bucket": bucket,
                "term": term,
                "segment": segment,
                "df": enc.count,
                "doc_bytes": enc.doc_bytes,
                "tf_bytes": enc.tf_bytes,
                "dl_bytes": enc.dl_bytes,
                "blocks": enc.blocks,
            }
        )
    return pd.DataFrame(out)


# map-side partial postings: one row per (input-partition, term,
# segment) carrying packed arrays — the "per-partition segment
# indexes" whose distributed merge is the final shuffle. Compared to
# exploding one row per token occurrence, this shuffles ~2 orders of
# magnitude fewer rows and each term string once per partition.
_PARTIAL_DDL = (
    "bucket int, term string, segment int, "
    "doc_ids array<long>, tfs array<int>, dls array<int>"
)


def _map_docs_to_partials(n_buckets: int, salt_factor: int):
    """ONE mapInPandas pass: raw (doc_id, text) -> per-(term, segment)
    partial posting arrays PLUS doc-stat sentinel rows.

    Collapsing tokenize + tf + segment-grouping into a single Python
    stage matters: chained Arrow/python stages in one task pipeline
    (UDF -> JVM -> UDF) measurably anti-scale under high parallelism,
    while a single python stage scales with cores.

    Sentinel rows (bucket = -1, term = '') carry each batch's
    (doc_ids, dls) arrays so doc stats come out of the same pass —
    empty docs are skipped entirely (reference bm25.py:155-156).
    """
    import zlib

    from bm25_chroma_spark.functions.tokenizer import tokenize_tf_py

    def gen(batches):
        for pdf in batches:
            acc: dict = {}
            stat_ids: list = []
            stat_dls: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pairs = tokenize_tf_py(text)
                if not pairs:
                    continue
                did = int(doc_id)
                dl = 0
                for _, tf in pairs:
                    dl += tf
                seg = hash_segment(did, salt_factor)
                for term, tf in pairs:
                    key = (term, seg)
                    ent = acc.get(key)
                    if ent is None:
                        acc[key] = ent = ([], [], [])
                    ent[0].append(did)
                    ent[1].append(tf)
                    ent[2].append(dl)
                stat_ids.append(did)
                stat_dls.append(dl)
            if not stat_ids:
                continue
            rows = [
                {
                    "bucket": zlib.crc32(term.encode("utf-8")) % n_buckets,
                    "term": term,
                    "segment": seg,
                    "doc_ids": dids,
                    "tfs": tfs,
                    "dls": dls,
                }
                for (term, seg), (dids, tfs, dls) in acc.items()
            ]
            rows.append(
                {
                    "bucket": -1,
                    "term": "",
                    "segment": 0,
                    "doc_ids": stat_ids,
                    "tfs": [],
                    "dls": stat_dls,
                }
            )
            yield pd.DataFrame(rows)

    return gen


def hash_segment(doc_id: int, salt_factor: int) -> int:
    """Python mirror of pmod(xxhash64(doc_id), salt_factor) is not
    needed — segments only need to be deterministic and well-spread,
    so the map-side build uses a splitmix-style mix of doc_id."""
    x = (doc_id ^ (doc_id >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (2**64 - 1)
    return (x ^ (x >> 31)) % salt_factor


def _merge_encode_bucket_segment(
    pdf: pd.DataFrame, block_size: int
) -> pd.DataFrame:
    """Final merge of map-side partials for one (bucket, segment):
    concatenate each term's arrays, sort by doc_id, encode."""
    out = []
    bucket = int(pdf["bucket"].iloc[0])
    segment = int(pdf["segment"].iloc[0])
    for term, grp in pdf.groupby("term", sort=False):
        doc_ids = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in grp["doc_ids"]]
        )
        tfs = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in grp["tfs"]]
        )
        dls = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in grp["dls"]]
        )
        order = np.argsort(doc_ids, kind="mergesort")
        enc = encode_postings(
            doc_ids[order], tfs[order], dls[order], block_size=block_size
        )
        out.append(
            {
                "bucket": bucket,
                "term": term,
                "segment": segment,
                "df": enc.count,
                "doc_bytes": enc.doc_bytes,
                "tf_bytes": enc.tf_bytes,
                "dl_bytes": enc.dl_bytes,
                "blocks": enc.blocks,
            }
        )
    return pd.DataFrame(out)


def build_sharded_index(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: BM25Config = DEFAULT_CONFIG,
    bucket_groups: int = 4,
    resume: bool = True,
    use_jvm_tokenizer: bool = False,
    _fail_after_groups: Optional[int] = None,
) -> dict:
    """Build (or resume) the physical index. Returns build metrics.

    ``_fail_after_groups`` is a test hook that aborts mid-build to
    exercise the resume path.
    """
    base = Path(out_dir)
    (base / "manifests").mkdir(parents=True, exist_ok=True)
    spark = docs.sparkSession
    cfg_hash = _config_hash(config)

    # ONE python pass over the corpus: tokenize + tf + map-side
    # partial postings per (term, segment), with doc-stat sentinel
    # rows in the same output. The wide shuffle then moves ~1 row per
    # (partition, term, segment) carrying packed arrays — two orders
    # of magnitude fewer rows than exploding per token occurrence,
    # each term string once per partition. Bucket uses crc32 (Python
    # zlib.crc32 matches, so the driver can prune buckets for query
    # terms without a JVM round-trip).
    raw = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).mapInPandas(
        _map_docs_to_partials(config.num_term_buckets, config.salt_factor),
        schema=_PARTIAL_DDL,
    ).persist()

    stats_path = base / "stats.json"
    if not (resume and stats_path.exists()):
        doc_stats = raw.filter(F.col("bucket") == -1).select(
            F.explode(F.arrays_zip("doc_ids", "dls")).alias("z")
        ).select(
            F.col("z.doc_ids").alias("doc_id"),
            F.col("z.dls").cast("int").alias("dl"),
        )
        doc_stats.write.mode("overwrite").parquet(
            str(base / "doc_stats.parquet")
        )
        row = docs.sparkSession.read.parquet(
            str(base / "doc_stats.parquet")
        ).agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        stats = {
            "n_docs": int(row["n"] or 0),
            "avgdl": float(row["avgdl"] or 0.0),
            "config": asdict(config),
            "config_hash": cfg_hash,
            "built_at": time.time(),
        }
        stats_path.write_text(json.dumps(stats, indent=2))
    else:
        stats = json.loads(stats_path.read_text())
        if stats["config_hash"] != cfg_hash:
            raise ValueError("resume with different config")

    partials = raw.filter(F.col("bucket") >= 0)

    block_size = config.block_size
    done_groups = 0
    totals = {"postings": 0, "terms": 0, "bytes": 0, "wall_sec": 0.0}
    for g in range(bucket_groups):
        man_path = base / "manifests" / f"group_{g}.json"
        if resume and man_path.exists():
            man = json.loads(man_path.read_text())
            if man.get("status") == "complete" and man.get(
                "config_hash"
            ) == cfg_hash:
                for k in ("postings", "terms", "bytes"):
                    totals[k] += man["metrics"][k]
                continue
        if _fail_after_groups is not None and done_groups >= _fail_after_groups:
            raise RuntimeError(f"injected failure before group {g}")

        t0 = time.time()
        part = partials.filter(
            F.pmod(F.col("bucket"), F.lit(bucket_groups)) == g
        )
        shards = part.groupBy("bucket", "segment").applyInPandas(
            lambda pdf: _merge_encode_bucket_segment(pdf, block_size),
            schema=SHARD_DDL,
        )
        gdir = base / "shards" / f"group={g}"
        shards.write.mode("overwrite").partitionBy("bucket").parquet(
            str(gdir)
        )

        written = spark.read.parquet(str(gdir))
        m = written.agg(
            F.sum("df").alias("postings"),
            F.countDistinct("term").alias("terms"),
            (
                F.sum(F.length("doc_bytes"))
                + F.sum(F.length("tf_bytes"))
                + F.sum(F.length("dl_bytes"))
            ).alias("bytes"),
            F.max("df").alias("max_seg_df"),
            F.avg("df").alias("avg_seg_df"),
        ).collect()[0]
        wall = time.time() - t0
        manifest = {
            "group": g,
            "status": "complete",
            "config_hash": cfg_hash,
            "lineage": {
                "input_docs": stats["n_docs"],
                "tokenizer": "jvm" if use_jvm_tokenizer else "pandas",
            },
            "metrics": {
                "postings": int(m["postings"] or 0),
                "terms": int(m["terms"] or 0),
                "bytes": int(m["bytes"] or 0),
                "skew_ratio": (
                    float(m["max_seg_df"] / m["avg_seg_df"])
                    if m["avg_seg_df"]
                    else 0.0
                ),
                "wall_sec": wall,
            },
        }
        man_path.write_text(json.dumps(manifest, indent=2))
        done_groups += 1
        for k in ("postings", "terms", "bytes"):
            totals[k] += manifest["metrics"][k]
        totals["wall_sec"] += wall

    raw.unpersist()
    return {"groups": bucket_groups, **totals, "n_docs": stats["n_docs"],
            "avgdl": stats["avgdl"]}


class ShardedIndex:
    """Query handle over a built shard directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        self.refresh()

    def refresh(self) -> "ShardedIndex":
        """Re-read stats.json (N/avgdl/generation move under DML)."""
        stats = json.loads((self.path / "stats.json").read_text())
        self.n_docs: int = stats["n_docs"]
        self.avgdl: float = stats["avgdl"]
        self.generation: int = int(stats.get("generation", 0))
        self.config = BM25Config(**stats["config"])
        return self

    def shards_for_terms(self, terms: List[str]) -> DataFrame:
        """Scan only the buckets/groups the query terms hash to —
        directory-level pruning (group dirs + bucket partition) plus
        parquet row-group pushdown on term. DML generations overlay
        the base build: newest (term, segment) row wins, df=0
        tombstones drop out."""
        cfg = self.config
        n_groups = _groups(self.path)
        buckets = sorted({bucket_of(t, cfg.num_term_buckets) for t in terms})
        groups = sorted({b % n_groups for b in buckets})
        paths = [str(self.path / "shards" / f"group={g}") for g in groups]
        df = self.spark.read.option(
            "basePath", str(self.path / "shards")
        ).parquet(*paths)
        base = df.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        ).select(
            "bucket", "term", "segment", "df", "doc_bytes", "tf_bytes",
            "dl_bytes", "blocks", F.lit(0).alias("gen"),
        )
        gen_root = self.path / "gen"
        parts = [base]
        if gen_root.exists():
            for d in sorted(gen_root.glob("gen_*")):
                if not (d / "shards").exists():
                    continue
                g = int(d.name.split("_")[1])
                parts.append(
                    self.spark.read.parquet(str(d / "shards"))
                    .filter(
                        F.col("bucket").isin(buckets)
                        & F.col("term").isin(terms)
                    )
                    .select(
                        "bucket", "term", "segment", "df", "doc_bytes",
                        "tf_bytes", "dl_bytes", "blocks",
                        F.lit(g).alias("gen"),
                    )
                )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        if len(parts) > 1:
            from pyspark.sql import Window

            w = Window.partitionBy("term", "segment").orderBy(F.desc("gen"))
            u = (
                u.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        return u.filter(F.col("df") > 0).drop("gen")

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(str(self.path / "doc_stats.parquet"))

    def term_dfs(self, terms: List[str]) -> DataFrame:
        """Global df per term = sum over segments (capped like the
        reference if a cap is configured)."""
        agg = (
            self.shards_for_terms(terms)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        cap = self.config.max_postings_per_term
        if cap:
            agg = agg.withColumn("df", F.least(F.col("df"), F.lit(cap)))
        return agg


def _groups(base: Path) -> int:
    return len(list((base / "manifests").glob("group_*.json")))


def bucket_of(term: str, n_buckets: int) -> int:
    """Driver-side mirror of the build's bucket assignment
    (pmod(crc32(utf8(term)), n_buckets))."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def decode_shards_to_postings(shards: DataFrame) -> DataFrame:
    """mapInPandas decode: shard rows -> (term, segment, doc_id, tf, dl).

    The exhaustive query path; also the golden check for the codec at
    scale.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bm25_chroma_spark.index.encode import decode_all

        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                blocks = [dict(b) for b in r.blocks]
                d, t, l = decode_all(
                    bytes(r.doc_bytes), bytes(r.tf_bytes), bytes(r.dl_bytes),
                    blocks,
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "term": r.term,
                            "segment": r.segment,
                            "doc_id": d,
                            "tf": t,
                            "dl": l,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return shards.mapInPandas(
        gen, schema="term string, segment int, doc_id long, tf long, dl long"
    )
