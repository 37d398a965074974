"""Structured Streaming surfaces.

The reference's incremental-add buffer
(/root/reference/bm25_chroma/bm25.py:72,176-195 — buffer per-doc
Counters, flush in batch) is a micro-batch pattern; its Spark-native
form is a file-source stream whose every micro-batch runs one index
DML (build on the first batch, LSM generation merges after), giving
exactly the reference's "amortized flush" semantics with durable
checkpointing/exactly-once from the streaming engine.

Also provided: a watermarked windowed aggregation over an event
stream (late-data tolerant), the standard streaming-analytics shape
the engine supports beyond the reference.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _stream_docs_key(p) -> tuple:
    """Sort key of a stream_docs file: (batch_id, rev). Per-batch
    snapshots are ``batch_{id:09d}.parquet`` (rev 0); compacted
    snapshots are ``batch_{id:09d}_{rev}.parquet`` — same id slot,
    higher rev, so they rank newer than every file they folded while
    staying older than any later batch."""
    parts = p.stem.split("_")
    return (int(parts[1]), int(parts[2]) if len(parts) > 2 else 0)


def _newest_wins_docs(spark, files) -> "DataFrame":
    """Union the given stream_docs files, newest (batch_id, rev) wins
    per doc_id -> (doc_id, text)."""
    from pyspark.sql import Window

    parts = []
    for p in files:
        bid, rev = _stream_docs_key(p)
        parts.append(
            spark.read.parquet(str(p)).withColumn(
                "b", F.lit(bid * 1_000_000 + rev)
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("doc_id").orderBy(F.desc("b"))
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )


def _compact_stream_docs(spark, docs_root, batch_id: int) -> None:
    """Fold every snapshot STRICTLY BEFORE ``batch_id`` into one
    newest-wins file so per-batch cost stays O(1) in stream history
    (without this, every batch unions all prior files — quadratic
    cumulative work). Safe against crashes at any step: the scratch
    dir is invisible to the batch_* glob, the rename lands the
    compacted file at (batch_id-1, rev+1) — newer than all its
    sources, older than the current batch — so undeleted sources are
    shadowed, never required. Safe against replay: micro-batches are
    sequential, so every id < batch_id is already committed in the
    streaming checkpoint and can never be re-delivered."""
    import shutil

    files = sorted(
        (p for p in docs_root.glob("batch_*.parquet")
         if _stream_docs_key(p) < (batch_id, 0)),
        key=_stream_docs_key,
    )
    if len(files) <= 1:
        return
    top_id, top_rev = _stream_docs_key(files[-1])
    target = docs_root / f"batch_{batch_id - 1:09d}_{top_rev + 1}.parquet"
    tmp = docs_root / ".compacting.parquet"
    shutil.rmtree(tmp, ignore_errors=True)
    _newest_wins_docs(spark, files).write.mode("overwrite").parquet(
        str(tmp)
    )
    tmp.rename(target)  # commit point
    for p in files:
        shutil.rmtree(p, ignore_errors=True)


def stream_index_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = "doc_id long, text string",
    config=None,
    bucket_groups: int = 1,
    compact_docs_every: int = 8,
) -> StreamingQuery:
    """File-source streaming ingest: every new parquet file under
    ``source_dir`` becomes a micro-batch that upserts into the sharded
    index. Restart-safe via the streaming checkpoint (batch replay is
    idempotent: each batch's docs snapshot is keyed by batch_id and
    the DML converges to the same index content).

    Upserts are COMPLETE remove-then-add: the handler keeps a docs
    store under ``<index_dir>/stream_docs`` (one parquet per batch,
    newest batch wins per doc_id) and passes each re-ingested id's
    PRIOR text to apply_dml as delete_docs — so terms that existed
    only in the previous version are purged too (the reference
    re-tokenizes stored chunk_texts on removal, bm25.py:238-249).
    Once ``compact_docs_every`` snapshots accumulate they fold into a
    single newest-wins snapshot (crash-safe rename protocol, see
    _compact_stream_docs), so per-batch cost and file count stay O(1)
    in stream history.

    Returns the StreamingQuery (caller awaits/stops; tests use
    trigger(availableNow=True)).
    """
    from pathlib import Path

    from bm25_chroma_spark.config import BM25Config
    from bm25_chroma_spark.index.dml import apply_dml
    from bm25_chroma_spark.index.shards import build_sharded_index

    cfg = config or BM25Config(num_term_buckets=8, salt_factor=4)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
    )

    docs_root = Path(index_dir) / "stream_docs"

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs_root.mkdir(parents=True, exist_ok=True)
        # snapshot the batch (idempotent on replay: keyed by batch_id)
        snap = docs_root / f"batch_{batch_id:09d}.parquet"
        batch_df.write.mode("overwrite").parquet(str(snap))
        pinned = spark.read.parquet(str(snap))

        if not (Path(index_dir) / "stats.json").exists():
            build_sharded_index(
                pinned, index_dir, config=cfg,
                bucket_groups=bucket_groups,
            )
            return

        # prior versions of re-ingested ids (newest earlier file wins)
        prior_files = sorted(
            (p for p in docs_root.glob("batch_*.parquet")
             if _stream_docs_key(p) < (batch_id, 0)),
            key=_stream_docs_key,
        )
        old_versions = None
        if prior_files:
            old_versions = _newest_wins_docs(spark, prior_files).join(
                F.broadcast(pinned.select("doc_id")), "doc_id",
                "left_semi",
            )
            if old_versions.isEmpty():
                old_versions = None
        apply_dml(
            spark, index_dir, upserts=pinned, delete_docs=old_versions
        )
        if compact_docs_every and len(prior_files) + 1 >= compact_docs_every:
            _compact_stream_docs(spark, docs_root, batch_id)

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_first_seen(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = "doc_id long, text string",
    state_ttl: Optional[str] = None,
    ts_col: str = "ts",
    use_rocksdb: bool = False,
) -> StreamingQuery:
    """Streaming exact dedup — the streaming form of
    operators/dedup.py::dedup_exact, built on the custom-stateful-
    operator surface (applyInPandasWithState): per content sha256 the
    state is one boolean; the FIRST document seen for a hash (ties
    within a micro-batch broken by smallest doc_id) is emitted to the
    parquet sink, every later duplicate is dropped.

    State is O(distinct hashes) booleans — the minimal dedup state.
    On an UNBOUNDED stream that is still unbounded growth, so the two
    at-scale knobs are first-class here:

    * ``state_ttl`` (e.g. "7 days"; requires an event-time ``ts_col``
      in the schema): the state carries an EventTimeTimeout set to the
      first-seen document's event time, and the stream is watermarked
      by the TTL — once the watermark passes that point the hash's
      state is REMOVED and a later duplicate re-admits (dedup window
      semantics, the standard bounded-state contract). State is then
      O(distinct hashes within one TTL window).
    * ``use_rocksdb``: swaps the in-memory HDFS state store for the
      RocksDB provider (spills to local disk, incremental
      checkpointing) — the store you'd run at 100 TB where even the
      windowed hash set exceeds executor heap.

    Exactly-once via the streaming checkpoint + append sink."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if use_rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    cols = [
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ]
    if state_ttl is not None:
        cols.append(F.col(ts_col).cast("timestamp").alias("ts"))
    hashed = stream.select(*cols)
    if state_ttl is not None:
        # a null event time can neither be watermarked nor drive a
        # state timeout — drop such rows up front instead of crashing
        # the query inside the stateful UDF
        hashed = hashed.filter(F.col("ts").isNotNull()).withWatermark(
            "ts", state_ttl
        )

    out_schema = StructType(
        [
            StructField("content_hash", StringType()),
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    state_schema = StructType([StructField("seen", BooleanType())])
    with_ttl = state_ttl is not None

    def first_seen(key, pdfs, state):
        if with_ttl and state.hasTimedOut:
            # watermark passed the first-seen event time + TTL: drop
            # the hash from state — a later duplicate re-admits
            state.remove()
            return
        if state.exists:
            return  # hash already emitted within the dedup window
        best_id, best_text, best_ts = None, None, None
        for pdf in pdfs:
            i = pdf["doc_id"].idxmin()
            if best_id is None or int(pdf["doc_id"][i]) < best_id:
                best_id = int(pdf["doc_id"][i])
                best_text = pdf["text"][i]
                if with_ttl:
                    best_ts = pd.Timestamp(pdf["ts"][i])
        state.update((True,))
        if with_ttl:
            # expires when the watermark (event-time high mark minus
            # the TTL delay) passes the first-seen event time. Spark
            # rejects a timeout at/below the CURRENT watermark
            # (boundary-late data would fail the whole query), so
            # clamp to watermark + 1ms; a NaT ts (possible only if
            # the upstream null filter is bypassed) degrades to the
            # soonest legal expiry instead of crashing.
            wm = state.getCurrentWatermarkMs()
            ts_ms = (
                int(best_ts.value // 10**6)
                if best_ts is not None and not pd.isna(best_ts)
                else wm + 1
            )
            state.setTimeoutTimestamp(max(ts_ms, wm + 1))
        yield pd.DataFrame(
            [
                {
                    "content_hash": key[0],
                    "doc_id": best_id,
                    "text": best_text,
                }
            ]
        )

    deduped = hashed.groupBy("content_hash").applyInPandasWithState(
        first_seen,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout
        if with_ttl
        else GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation: late events within the
    watermark still update their window; older ones are dropped and
    state is reclaimed (bounded memory on unbounded streams).

    Works identically on a batch DataFrame (for oracle checks) and a
    streaming one.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "key",
            "n",
            F.round("total_value", 6).alias("total_value"),
        )
    )


def stream_events_to_memory(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    table_name: str = "windowed_counts",
    schema: str = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ),
) -> StreamingQuery:
    """readStream(files) -> watermarked windowed agg -> memory sink
    (complete mode), for tests and demos."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
