"""Document-management DML over the sharded index: add / upsert /
remove / reset, matching the reference lifecycle semantics
(/root/reference/bm25_chroma/bm25.py:145-258):

* re-added id -> remove-then-add (fresh postings)        [bm25.py:151-152]
* remove re-tokenizes the stored text to find affected
  terms and hard-deletes the postings                     [bm25.py:238-249]
* terms whose lists empty out vanish from the vocabulary  [bm25.py:248-250]
* doc length zeroed, N decremented, avgdl recomputed      [bm25.py:253-258]
* removing an unknown id is a no-op                       [bm25.py:229-230]

Physical design: the base build is generation 0; every DML batch
writes generation k containing ONLY re-encoded shard rows for the
affected (term, segment) pairs (terms appearing in removed or added
texts — all other shards are untouched, so DML cost scales with the
batch's vocabulary, not the corpus). A (term, segment) whose postings
empty out gets a df=0 tombstone row. Readers overlay generations and
keep the newest row per (term, segment).

This is hard-delete semantics (IDF reflects removals immediately,
matching the reference's _compute_idf over the post-delete list), not
query-time tombstone filtering.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config
from bm25_chroma_spark.index.shards import (
    SHARD_DDL,
    _encode_bucket_segment,
    decode_shards_to_postings,
)
from bm25_chroma_spark.operators.index_build import tokenize_docs


def _read_stats(base: Path) -> dict:
    return json.loads((base / "stats.json").read_text())


def _atomic_write_text(path: Path, text: str) -> None:
    """Crash-safe small-file write: stage to .tmp, fsync, os.replace.
    A torn stats.json (or compaction marker) would otherwise brick the
    index — _read_stats raises JSONDecodeError on every open and
    recover_index reads stats before it can heal anything."""
    import os

    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _write_stats(base: Path, stats: dict) -> None:
    _atomic_write_text(base / "stats.json", json.dumps(stats, indent=2))


def apply_dml(
    spark: SparkSession,
    index_dir: str,
    upserts: Optional[DataFrame] = None,
    delete_docs: Optional[DataFrame] = None,
) -> dict:
    """One DML batch against a built index.

    upserts:     (doc_id long, text string) — added; an existing
                 doc_id is replaced (remove-then-add). NOTE: complete
                 replacement requires the OLD text of every existing
                 id to also arrive via ``delete_docs`` (the caller
                 owns the corpus and passes prior versions back, as
                 SparkHybridRetriever and stream_index_ingest do) —
                 otherwise terms that only existed in the previous
                 version keep stale postings. This mirrors the
                 reference, which re-tokenizes its stored chunk_texts
                 on removal (bm25.py:238-249).
    delete_docs: (doc_id long, text string) — removed; text is the
                 stored content. Unknown ids no-op.

    Victim ids and affected terms stay DataFrames end-to-end
    (broadcast semi/anti joins); only the bounded bucket list reaches
    the driver, so bulk deletes of millions of docs never build a
    driver-side id list.

    Returns {generation, affected_terms, live_docs, avgdl}.
    """
    from pyspark.sql.types import IntegerType

    from bm25_chroma_spark.index.shards import ShardedIndex, hash_segment_np

    import shutil

    base = Path(index_dir)
    # ShardedIndex.refresh() runs crash recovery (finish a committed
    # compaction, reconcile stats with rename-committed generations)
    # before we read stats
    index = ShardedIndex(spark, index_dir)
    stats = _read_stats(base)
    cfg = BM25Config(**stats["config"])
    gen_root = base / "gen"
    gen_root.mkdir(parents=True, exist_ok=True)
    # next generation = 1 + max(stats, dirs on disk): recover_index
    # already reconciled these, but stay defensive — colliding with an
    # existing dir would fail the commit rename
    disk_gens = [
        int(d.name.split("_")[1]) for d in gen_root.glob("gen_*")
    ]
    gen = max([int(stats.get("generation", 0))] + disk_gens) + 1
    # leftover staging dirs from a crashed DML are invisible to
    # readers (dot-prefixed, outside the gen_* glob) — clear them
    for d in gen_root.glob(".tmp_gen_*"):
        shutil.rmtree(d, ignore_errors=True)
    tmp_dir = gen_root / f".tmp_gen_{gen:05d}"
    gen_dir = gen_root / f"gen_{gen:05d}"

    empty = spark.createDataFrame([], "doc_id long, text string")
    upserts = (upserts or empty).select(
        F.col("doc_id").cast("long"), "text"
    )
    delete_docs = (delete_docs or empty).select(
        F.col("doc_id").cast("long"), "text"
    )

    # victims = explicit deletes + upserts of existing ids
    victims = delete_docs.unionByName(upserts).select("doc_id", "text")
    victim_ids = victims.select("doc_id").distinct()

    # affected terms: everything in victim or new texts — a DataFrame
    # (vocabulary of a bulk batch can be large)
    vic_tok = tokenize_docs(victims, "doc_id", "text")
    new_tok = tokenize_docs(upserts, "doc_id", "text").persist()
    affected_terms_df = (
        vic_tok.select(F.explode("terms.term").alias("term"))
        .unionByName(new_tok.select(F.explode("terms.term").alias("term")))
        .distinct()
        .persist()
    )
    n_affected = affected_terms_df.count()

    # segment assignment MUST match the base build's hash_segment —
    # one segment function across the index's life, or per-segment
    # WAND sees the same doc in two segments with split scores
    salt = cfg.salt_factor

    @F.pandas_udf(IntegerType())
    def seg_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(hash_segment_np(doc_id.to_numpy(), salt))

    if n_affected:
        aff_shards = index.shards_for_terms_df(affected_terms_df).persist()
        old = decode_shards_to_postings(aff_shards).join(
            F.broadcast(victim_ids), "doc_id", "left_anti"
        )

        new_flat = new_tok.select(
            "doc_id", "dl", F.explode("terms").alias("t")
        ).select(
            F.col("t.term").alias("term"),
            "doc_id",
            F.col("t.tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
        )
        merged = old.select("term", "doc_id", "tf", "dl").unionByName(
            new_flat
        )
        if cfg.max_postings_per_term and index.build_cap_physical:
            # (legacy indexes without the build_cap_enforced marker
            # store postings uncapped — re-capping only the affected
            # terms would mix semantics; their query guard refuses a
            # binding build cap instead.)
            # reference flush semantics (bm25.py:176-195): merge the
            # surviving stored postings (already capped — evicted ones
            # never come back) with the batch's new postings, then
            # re-truncate to the cap in (tf desc, doc_id asc) order.
            # Affected-term postings are bounded (<= cap + batch), so
            # a per-term rank window is safe here.
            from pyspark.sql import Window

            w_cap = Window.partitionBy("term").orderBy(
                F.desc("tf"), F.asc("doc_id")
            )
            merged = (
                merged.withColumn("rn", F.row_number().over(w_cap))
                .filter(F.col("rn") <= cfg.max_postings_per_term)
                .drop("rn")
            )
        keyed = merged.select(
            "term",
            "doc_id",
            F.col("tf").cast("int").alias("tf"),
            F.col("dl").cast("int").alias("dl"),
            F.pmod(
                F.crc32(F.encode(F.col("term"), "utf-8")),
                F.lit(cfg.num_term_buckets),
            ).cast("int").alias("bucket"),
            seg_udf(F.col("doc_id")).alias("segment"),
        )
        block_size = cfg.block_size
        # persisted: both the generation write and the tombstone
        # anti-join consume it — without the pin the encode UDF would
        # run twice
        encoded = keyed.groupBy("bucket", "segment").applyInPandas(
            lambda pdf: _encode_bucket_segment(pdf, block_size),
            schema=SHARD_DDL,
        ).persist()

        # tombstones: (term, segment) that existed but emptied out
        old_keys = aff_shards.select("bucket", "term", "segment").distinct()
        gone = old_keys.join(
            encoded.select("term", "segment").distinct(),
            ["term", "segment"],
            "left_anti",
        ).select(
            "bucket",
            "term",
            "segment",
            F.lit(0).cast("long").alias("df"),
            F.lit(b"").alias("doc_bytes"),
            F.lit(b"").alias("tf_bytes"),
            F.lit(b"").alias("dl_bytes"),
            F.array().cast(
                "array<struct<first_doc: long, n: int, max_tf: int, "
                "min_dl: int, doc_off: int, tf_off: int, dl_off: int>>"
            ).alias("blocks"),
        )
        encoded.unionByName(gone).write.mode("overwrite").parquet(
            str(tmp_dir / "shards")
        )
        encoded.unpersist()
        aff_shards.unpersist()

    # doc_stats delta: every victim not re-added with >=1 token goes
    # to dl=0 (covers plain deletes AND upserts-to-empty-text — the
    # reference removes first, then bails on empty tokens,
    # bm25.py:151-156); re-added docs get their fresh dl
    ds_delta = victims.select("doc_id").distinct().join(
        new_tok.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.lit(0).alias("dl")).unionByName(
        new_tok.select("doc_id", "dl")
    )
    ds_delta.write.mode("overwrite").parquet(str(tmp_dir / "doc_stats"))
    new_tok.unpersist()
    affected_terms_df.unpersist()

    # COMMIT POINT: one atomic rename publishes the complete
    # generation (shards + doc_stats together) to readers. A crash
    # before this leaves only the invisible .tmp_ staging dir (readers
    # glob gen_*); a crash after — before the stats write below — is
    # healed by recover_index() on next open, which reconciles
    # stats.json with the generations that landed on disk. This closes
    # the torn-generation window where gen_K/shards was visible to the
    # overlay before gen_K/doc_stats and stats.json existed.
    tmp_dir.rename(gen_dir)

    # recompute corpus stats over live docs (cheap narrow agg)
    live = _live_doc_stats(spark, base, upto_gen=gen)
    row = live.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    stats["n_docs"] = int(row["n"] or 0)
    stats["avgdl"] = float(row["avgdl"] or 0.0)
    stats["generation"] = gen
    _write_stats(base, stats)
    return {
        "generation": gen,
        "affected_terms": n_affected,
        "live_docs": stats["n_docs"],
        "avgdl": stats["avgdl"],
    }


_COMPACT_MARKER = "compaction_commit.json"


def _finish_compaction(base: Path) -> bool:
    """Idempotently replay the destructive promote steps of a
    committed compaction. Called by compact_index itself and by
    recover_index() on every index open, so a crash anywhere after
    the commit marker lands loses nothing: the compacted data in
    ``*_compacting`` is authoritative the moment the marker exists,
    and every step below is guarded by existence checks so replay
    from any intermediate crash point converges to the same state.
    Concurrency: the promote sequence is destructive (rmtree + rename
    + unlink), and refresh() runs it on EVERY open — two concurrent
    opens racing through the existence checks could each pass
    ``tmp.exists()`` and then destroy the other's freshly promoted
    dirs. An exclusive flock on a sidecar lock file serializes the
    whole sequence, and the marker is re-checked under the lock, so
    the loser of the race observes the finished state and no-ops.

    Returns True when a marker was found and finished."""
    import fcntl
    import shutil

    marker = base / _COMPACT_MARKER
    if not marker.exists():
        return False
    lock_path = base / ".recovery.lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
        try:
            if not marker.exists():
                # another process finished the promote while we waited
                return False
            tmp = base / "shards_compacting"
            if tmp.exists():
                shutil.rmtree(base / "shards", ignore_errors=True)
                tmp.rename(base / "shards")
            ds_tmp = base / "doc_stats_compacting"
            if ds_tmp.exists():
                shutil.rmtree(base / "doc_stats.parquet", ignore_errors=True)
                ds_tmp.rename(base / "doc_stats.parquet")
            shutil.rmtree(base / "gen", ignore_errors=True)
            stats = _read_stats(base)
            if int(stats.get("generation", 0)) != 0:
                stats["generation"] = 0
                _write_stats(base, stats)
            marker.unlink()
            return True
        finally:
            fcntl.flock(lock.fileno(), fcntl.LOCK_UN)


def recover_index(spark: SparkSession, base: Path) -> dict:
    """Crash recovery on index open (ShardedIndex.refresh calls this):

    1. finish a committed-but-unpromoted compaction (marker protocol,
       see _finish_compaction);
    2. reconcile stats.json with DML generations that rename-committed
       but whose stats write was lost (apply_dml publishes the gen dir
       atomically BEFORE updating stats.json) — recompute N/avgdl over
       the live overlay and bump the recorded generation.

    Idempotent; on a clean index this is a marker check + a glob.
    Returns the (possibly updated) stats dict."""
    _finish_compaction(base)
    stats = _read_stats(base)
    gen_root = base / "gen"
    disk = (
        [int(d.name.split("_")[1]) for d in gen_root.glob("gen_*")]
        if gen_root.exists()
        else []
    )
    disk_gen = max(disk) if disk else 0
    if disk_gen > int(stats.get("generation", 0)):
        row = _live_doc_stats(spark, base).agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        stats["n_docs"] = int(row["n"] or 0)
        stats["avgdl"] = float(row["avgdl"] or 0.0)
        stats["generation"] = disk_gen
        _write_stats(base, stats)
    return stats


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all DML generations back into a clean base: newest live
    (term, segment) rows become generation-0 shards, doc_stats
    collapses to live rows, gen dirs are dropped. Readers see
    identical content before and after; read amplification returns
    to one layer. (The LSM maintenance step — run when the
    generation count grows.)

    Crash-atomic: the compacted shards and doc_stats are fully
    written to ``*_compacting`` staging dirs first, then a commit
    marker lands, and only then are the old dirs destroyed/replaced
    (rename promote). A crash before the marker leaves the live index
    untouched (stale staging dirs are overwritten next run); a crash
    after the marker is finished idempotently by _finish_compaction
    on the next open."""
    import shutil

    from pyspark.sql import Window

    base = Path(index_dir)
    _finish_compaction(base)  # heal a previously crashed compaction
    stats = _read_stats(base)
    cfg = BM25Config(**stats["config"])
    gen_root = base / "gen"
    if not gen_root.exists() or not list(gen_root.glob("gen_*")):
        return {"compacted": False, "generation": stats.get("generation", 0)}

    groups = len(list((base / "manifests").glob("group_*.json")))

    from bm25_chroma_spark.index.shards import SHARD_SCAN_DDL

    parts = [
        spark.read.option("basePath", str(base / "shards"))
        .schema(SHARD_SCAN_DDL)
        .parquet(str(base / "shards"))
        .select(
            "bucket", "term", "segment", "df", "doc_bytes", "tf_bytes",
            "dl_bytes", "blocks", F.lit(0).alias("gen"),
        )
    ]
    for g, p in _gen_dirs(base, "shards"):
        parts.append(
            spark.read.parquet(p).select(
                "bucket", "term", "segment", "df", "doc_bytes",
                "tf_bytes", "dl_bytes", "blocks", F.lit(g).alias("gen"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("term", "segment").orderBy(F.desc("gen"))
    live = (
        u.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("df") > 0))
        .drop("rn", "gen")
        .withColumn(
            "group", F.pmod(F.col("bucket"), F.lit(groups)).cast("int")
        )
    )
    tmp = base / "shards_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    # ONE job writes every group: partitionBy(group, bucket) produces
    # the exact reader layout (shards/group=G/bucket=B/) without
    # re-executing the overlay plan once per group — the old per-group
    # filter loop re-read and re-windowed the whole index G times.
    live.write.mode("overwrite").partitionBy("group", "bucket").parquet(
        str(tmp)
    )
    # partitionBy creates no dir for a group with zero live rows, but
    # readers address shards/group=G explicitly (shards.py
    # _pruned_overlay) — every group the manifests promise must exist
    # after the promote. Backfill missing groups with a schema'd empty
    # parquet file (not a bare mkdir: a data file keeps the partition
    # depth uniform and the dir non-degenerate), BEFORE the commit
    # marker lands so a crash mid-backfill stays on the old base.
    from bm25_chroma_spark.index.shards import SHARD_FILE_DDL

    written = {d.name for d in tmp.glob("group=*")}
    for g in range(groups):
        if f"group={g}" not in written:
            spark.createDataFrame([], SHARD_FILE_DDL).coalesce(
                1
            ).write.mode("overwrite").parquet(
                str(tmp / f"group={g}" / "bucket=0")
            )

    ds = _live_doc_stats(spark, base)
    ds_tmp = base / "doc_stats_compacting"
    shutil.rmtree(ds_tmp, ignore_errors=True)
    ds.write.mode("overwrite").parquet(str(ds_tmp))

    prev_gen = stats.get("generation", 0)
    # COMMIT POINT: both staging dirs are complete; after the marker
    # lands the promote is replayable from any crash. Atomic write: a
    # torn marker must never be mistaken for a commit.
    _atomic_write_text(
        base / _COMPACT_MARKER,
        json.dumps({"folded_generations": prev_gen}),
    )
    _finish_compaction(base)
    return {"compacted": True, "folded_generations": prev_gen}


def _gen_dirs(base: Path, kind: str, upto_gen: Optional[int] = None):
    root = base / "gen"
    if not root.exists():
        return []
    out = []
    for d in sorted(root.glob("gen_*")):
        g = int(d.name.split("_")[1])
        if upto_gen is not None and g > upto_gen:
            continue
        if (d / kind).exists():
            out.append((g, str(d / kind)))
    return out


def _live_doc_stats(
    spark: SparkSession, base: Path, upto_gen: Optional[int] = None
) -> DataFrame:
    """Latest (doc_id, dl) per doc across generations, dl>0 only."""
    from pyspark.sql import Window

    parts = [
        spark.read.parquet(str(base / "doc_stats.parquet")).select(
            "doc_id", "dl", F.lit(0).alias("gen")
        )
    ]
    for g, p in _gen_dirs(base, "doc_stats", upto_gen):
        parts.append(
            spark.read.parquet(p).select(
                "doc_id", "dl", F.lit(g).alias("gen")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("doc_id").orderBy(F.desc("gen"))
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("dl") > 0))
        .select("doc_id", "dl")
    )
