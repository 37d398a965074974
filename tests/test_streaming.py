"""Structured Streaming: incremental index ingest equals the batch
build on the same data; watermarked windowed aggs match a batch
oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.config import BM25Config
from bm25_chroma_spark.index.shards import ShardedIndex, build_sharded_index
from bm25_chroma_spark.index.wand import search_sharded
from bm25_chroma_spark.sources.corpus import synth_corpus_rows
from bm25_chroma_spark.streaming.ingest import (
    stream_events_to_memory,
    stream_index_ingest,
    windowed_event_counts,
)

CFG = BM25Config(num_term_buckets=8, salt_factor=4)


def test_stream_ingest_equals_batch_build(spark, tmp_path):
    rows = synth_corpus_rows(60, seed=21)
    docs = [(i, r[4]) for i, r in enumerate(rows)]

    src = tmp_path / "incoming"
    src.mkdir()
    # three "arriving" files
    for part in range(3):
        chunk = docs[part * 20:(part + 1) * 20]
        spark.createDataFrame(
            chunk, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"chunk_{part}")
        )
    # flatten: streaming file source wants files under one dir
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for p in sorted(src.rglob("*.parquet")):
        shutil.copy(p, flat / f"f{n}.parquet")
        n += 1

    idx_dir = str(tmp_path / "stream_index")
    q = stream_index_ingest(
        spark, str(flat), idx_dir, str(tmp_path / "ckpt"), config=CFG
    )
    q.awaitTermination(120)

    batch_dir = str(tmp_path / "batch_index")
    build_sharded_index(
        spark.createDataFrame(docs, "doc_id long, text string"),
        batch_dir, config=CFG, bucket_groups=1,
    )

    si = ShardedIndex(spark, idx_dir)
    bi = ShardedIndex(spark, batch_dir)
    assert si.n_docs == bi.n_docs == 60
    assert math.isclose(si.avgdl, bi.avgdl, rel_tol=1e-12)

    queries = spark.createDataFrame(
        [(1, "import parser"), (2, "merge shard batch")],
        "query_id long, query_text string",
    )
    a = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
         for r in search_sharded(si, queries, top_k=10).collect()}
    b = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
         for r in search_sharded(bi, queries, top_k=10).collect()}
    assert a == b


def test_stream_upsert_purges_old_only_terms(spark, tmp_path):
    """Regression (round-1 advisor): a streamed upsert that REPLACES a
    doc's text must purge postings of terms that existed only in the
    old version — the handler passes prior versions as delete_docs."""
    flat = tmp_path / "flat"
    flat.mkdir()
    v1 = [(1, "zebra quagga okapi unique"), (2, "common shared words here")]
    spark.createDataFrame(v1, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "s0"))
    import shutil

    for n, p in enumerate(sorted((tmp_path / "s0").rglob("*.parquet"))):
        shutil.copy(p, flat / f"f0_{n}.parquet")

    idx_dir = str(tmp_path / "upsert_index")
    q = stream_index_ingest(
        spark, str(flat), idx_dir, str(tmp_path / "ck1"), config=CFG
    )
    q.awaitTermination(120)

    # doc 1 re-ingested with fully DISJOINT vocabulary
    v2 = [(1, "totally different replacement text")]
    spark.createDataFrame(v2, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "s1"))
    for n, p in enumerate(sorted((tmp_path / "s1").rglob("*.parquet"))):
        shutil.copy(p, flat / f"f1_{n}.parquet")
    q = stream_index_ingest(
        spark, str(flat), idx_dir, str(tmp_path / "ck1"), config=CFG
    )
    q.awaitTermination(120)

    idx = ShardedIndex(spark, idx_dir)
    assert idx.n_docs == 2  # still two live docs

    def hits(text):
        qdf = spark.createDataFrame(
            [(1, text)], "query_id long, query_text string"
        )
        return {r["doc_id"] for r in search_sharded(idx, qdf, top_k=5).collect()}

    assert hits("zebra quagga") == set()        # old-only terms gone
    assert hits("replacement text") == {1}      # new terms live
    assert hits("common shared") == {2}         # untouched doc intact


def test_stream_docs_compaction_bounds_history(spark, tmp_path):
    """ADVICE r2: stream_docs must not keep one snapshot per batch
    forever. With compact_docs_every=3, six single-file batches
    (including two upserts) end with a bounded file count AND an
    index rank-identical to a batch build over the final versions —
    compaction must not lose any prior-version text the upsert purge
    depends on."""
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    batches = [
        [(1, "alpha bravo charlie"), (2, "delta echo foxtrot")],
        [(3, "golf hotel india")],
        [(1, "alpha NEW juliet kilo")],          # upsert doc 1
        [(4, "lima mike november")],
        [(5, "oscar papa quebec")],
        [(2, "romeo NEW sierra tango")],         # upsert doc 2
    ]
    for i, chunk in enumerate(batches):
        d = tmp_path / f"stage_{i}"
        spark.createDataFrame(
            chunk, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d))
        for n, p in enumerate(sorted(d.rglob("*.parquet"))):
            shutil.copy(p, flat / f"f{i}_{n}.parquet")

    idx_dir = str(tmp_path / "compact_stream_index")
    q = stream_index_ingest(
        spark, str(flat), idx_dir, str(tmp_path / "ckc"), config=CFG,
        compact_docs_every=3,
    )
    q.awaitTermination(180)

    from pathlib import Path

    files = sorted(
        (Path(idx_dir) / "stream_docs").glob("batch_*.parquet")
    )
    assert len(files) < len(batches), [f.name for f in files]

    final = [
        (1, "alpha NEW juliet kilo"),
        (2, "romeo NEW sierra tango"),
        (3, "golf hotel india"),
        (4, "lima mike november"),
        (5, "oscar papa quebec"),
    ]
    batch_dir = str(tmp_path / "compact_batch_index")
    build_sharded_index(
        spark.createDataFrame(final, "doc_id long, text string"),
        batch_dir, config=CFG, bucket_groups=1,
    )
    si, bi = ShardedIndex(spark, idx_dir), ShardedIndex(spark, batch_dir)
    assert si.n_docs == bi.n_docs == 5
    queries = spark.createDataFrame(
        [(1, "alpha bravo"), (2, "NEW"), (3, "delta echo foxtrot")],
        "query_id long, query_text string",
    )
    a = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
         for r in search_sharded(si, queries, top_k=10).collect()}
    b = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
         for r in search_sharded(bi, queries, top_k=10).collect()}
    assert a == b
    # the purge really happened: old-only terms find nothing
    gone = search_sharded(
        si,
        spark.createDataFrame(
            [(1, "bravo charlie"), (2, "echo foxtrot")],
            "query_id long, query_text string",
        ),
        top_k=5,
    ).collect()
    assert gone == []


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = {
        (r["window_start"], r["key"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(events).collect()
    }

    import shutil

    evdir = tmp_path / "events_src"
    evdir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", evdir / "events.parquet"
    )
    q = stream_events_to_memory(
        spark,
        str(evdir),
        str(tmp_path / "ckpt2"),
        table_name="wc_test",
        schema=(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["key"]): (r["n"], r["total_value"])
        for r in spark.table("wc_test").collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_dedup_first_seen_matches_batch(spark, tmp_path):
    """Stateful streaming dedup (applyInPandasWithState) emits exactly
    the batch dedup_exact survivor set, across micro-batch boundaries
    (a duplicate arriving in a LATER file must be dropped)."""
    from bm25_chroma_spark.operators.dedup import exact_dup_groups
    from bm25_chroma_spark.streaming.ingest import stream_dedup_first_seen

    batches = [
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        [(4, "alpha beta"), (5, "epsilon zeta")],
        [(6, "gamma delta"), (7, "eta theta"), (8, "eta theta")],
    ]
    flat = tmp_path / "dd_src"
    flat.mkdir()
    import shutil

    for bi, rows in enumerate(batches):
        tmp = tmp_path / f"dd_stage{bi}"
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp))
        for n, p in enumerate(sorted(tmp.rglob("*.parquet"))):
            shutil.copy(p, flat / f"b{bi}_{n}.parquet")

    out = tmp_path / "dd_out"
    # three runs so files land in separate micro-batches
    for _ in range(3):
        q = stream_dedup_first_seen(
            spark, str(flat), str(tmp_path / "dd_ck"), str(out)
        )
        q.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(str(out)).collect()
    }
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    want_ids = {
        r["keep_id"]: r["content_hash"]
        for r in exact_dup_groups(all_docs).collect()
    }
    assert {d for d, _ in got} == set(want_ids)  # {1, 2, 5, 7}
    assert {d for d, _ in got} == {1, 2, 5, 7}


def test_stream_dedup_ttl_bounds_state_and_readmits(spark, tmp_path):
    """state_ttl turns unbounded dedup state into a window: once the
    watermark passes a hash's first-seen event time + TTL, its state
    is removed — a duplicate arriving AFTER the window re-admits,
    while duplicates INSIDE the window still drop. This is the
    bounded-state contract for unbounded streams (the NoTimeout
    variant above would keep every hash forever)."""
    from bm25_chroma_spark.streaming.ingest import stream_dedup_first_seen

    T0 = "2026-01-01 00:00:00"
    batches = [
        # (doc_id, text, event ts)
        [(1, "dup text", T0)],
        [(2, "dup text", "2026-01-01 00:01:00"),   # inside TTL: drop
         (3, "other a", "2026-01-01 00:10:00")],   # advances watermark
        [(4, "other b", "2026-01-01 00:20:00")],   # hash(1) times out
        [(5, "dup text", "2026-01-01 00:30:00")],  # after TTL: readmit
    ]
    flat = tmp_path / "ttl_src"
    flat.mkdir()
    import shutil

    out = tmp_path / "ttl_out"
    for bi, rows in enumerate(batches):
        tmp = tmp_path / f"ttl_stage{bi}"
        spark.createDataFrame(
            rows, "doc_id long, text string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp))
        for n, p in enumerate(sorted(tmp.rglob("*.parquet"))):
            shutil.copy(p, flat / f"b{bi}_{n}.parquet")
        # run after EVERY file so the watermark advances between
        # micro-batches (it persists in the checkpoint across runs)
        q = stream_dedup_first_seen(
            spark,
            str(flat),
            str(tmp_path / "ttl_ck"),
            str(out),
            schema="doc_id long, text string, ts timestamp",
            state_ttl="5 minutes",
        )
        q.awaitTermination(120)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    )
    # 2 dropped (same hash as 1, inside the 5-minute window);
    # 5 re-admitted (hash expired when the watermark passed 00:05)
    assert got == [1, 3, 4, 5], got


def test_stream_dedup_ttl_boundary_late_and_null_ts(spark, tmp_path):
    """TTL edge cases that must not kill the streaming query: a
    first-seen row whose event time sits just above the current
    watermark (the closest a row can get — Spark's late-row filter
    drops ts <= watermark before the stateful operator; the
    setTimeoutTimestamp clamp to watermark+1ms covers any residual
    boundary) and a null event time, which can neither be
    watermarked nor drive a timeout — filtered upstream instead of
    crashing best_ts.value inside the UDF."""
    import shutil

    from bm25_chroma_spark.streaming.ingest import stream_dedup_first_seen

    batches = [
        # watermark after this batch: 00:10 - 5min = 00:05
        [(1, "seed text", "2026-01-01 00:10:00")],
        # ts one second above the watermark (new hash) + null ts
        [(2, "boundary text", "2026-01-01 00:05:01"),
         (3, "null ts text", None)],
    ]
    flat = tmp_path / "edge_src"
    flat.mkdir()
    out = tmp_path / "edge_out"
    for bi, rows in enumerate(batches):
        tmp = tmp_path / f"edge_stage{bi}"
        spark.createDataFrame(
            rows, "doc_id long, text string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp))
        for n, p in enumerate(sorted(tmp.rglob("*.parquet"))):
            shutil.copy(p, flat / f"b{bi}_{n}.parquet")
        q = stream_dedup_first_seen(
            spark,
            str(flat),
            str(tmp_path / "edge_ck"),
            str(out),
            schema="doc_id long, text string, ts timestamp",
            state_ttl="5 minutes",
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    )
    # 1 and 2 emitted; 3 (null ts) dropped before the stateful op
    assert got == [1, 2], got


def test_pipeline_expressions_compose_with_streams(spark, tmp_path):
    """The r6/r7 text-pipeline operators are pure stateless column
    expressions, so they must run unchanged inside a Structured
    Streaming query (readStream -> select -> memory sink) and match
    the batch result row-for-row — the property that lets prep-style
    annotation run over a live ingest feed."""
    import shutil

    from bm25_chroma_spark.functions import text_analysis as ta
    from bm25_chroma_spark.functions.splits import hash_split
    from bm25_chroma_spark.functions.web_clean import c4_signals

    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        src / "documents.parquet",
    )

    def annotate(df):
        t = F.col("text")
        sig = c4_signals(t)
        out = df.select(
            "doc_id",
            ta.lang_hint(t).alias("lang"),
            ta.token_count_ws(t).cast("int").alias("n_tok"),
            F.round(ta.duplicate_line_fraction(t), 6).alias("dlf"),
            F.md5(ta.redact_pii(t)).alias("red"),
            sig["n_kept"].alias("c4_kept"),
        )
        return hash_split(out, {"train": 0.9, "val": 0.1}, salt="s")

    batch = {
        tuple(r)
        for r in annotate(
            spark.read.parquet(str(src / "documents.parquet"))
        ).collect()
    }

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).parquet(str(src))
    q = (
        annotate(stream)
        .writeStream.format("memory")
        .queryName("pipe_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pipe"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("pipe_stream").collect()}
    assert got == batch
    assert len(got) == 500


def test_stream_prep_matches_batch(spark, tmp_path):
    """VERDICT-r7 #7: the foreachBatch prep pipeline (annotate ->
    counted rule-filter -> split, per micro-batch) produces exactly
    the batch prep_corpus result over the same documents — rows AND
    accumulated drop counts — across two micro-batches, including the
    blocklist and strip-html stages."""
    import shutil

    from bm25_chroma_spark.plans.prep import PrepOptions
    from bm25_chroma_spark.streaming.prep import stream_prep_corpus

    good = "\n".join(
        f"A perfectly fine sentence number {i} here." for i in range(4)
    )
    batch_rows = [
        # batch 1: clean, lorem-dropped, blocked-domain
        [
            (1, good),
            (2, good + "\nsome lorem ipsum filler text."),
            (3, good + '\n<a href="https://Bad.Example.net/x">x</a>.'),
        ],
        # batch 2: markup-wrapped clean doc, thin doc
        [
            (4, "<p>" + good.replace("\n", "</p><p>") + "</p>"),
            (5, "Just one good sentence."),
            (6, good + "\nclosing } bracket kills this one."),
        ],
    ]
    src = tmp_path / "prep_feed"
    src.mkdir()
    all_rows = []
    for i, rows in enumerate(batch_rows):
        all_rows += rows
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
        for f in (tmp_path / f"b{i}").glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}.parquet")

    bl = spark.createDataFrame([("bad.example.net",)], "domain string")
    opts = PrepOptions(c4_min_lines=3, strip_html=True,
                       blocklist_rule=True)
    weights = {"train": 0.8, "val": 0.2}

    # streaming: one file per trigger -> two real micro-batches
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_s = str(tmp_path / "prep_stream_out")
    q, report = stream_prep_corpus(
        stream,
        out_s,
        checkpoint=str(tmp_path / "prep_ckpt"),
        opts=opts,
        weights=weights,
        salt="s",
        blocklist=bl,
    )
    q.awaitTermination(180)

    # batch twin over the union, same shared stages
    from bm25_chroma_spark.functions.splits import hash_split
    from bm25_chroma_spark.functions.web_clean import (
        filter_blocked_domains,
        strip_html,
    )
    from bm25_chroma_spark.plans.prep import (
        annotate_docs,
        flag_docs,
        kept_docs,
        prep_rules,
    )

    docs = spark.createDataFrame(all_rows, "doc_id long, text string")
    d = filter_blocked_domains(docs, bl).drop("blocked_domain")
    d = d.withColumn("text", strip_html(F.col("text")))
    rules = prep_rules(opts)
    flagged = flag_docs(annotate_docs(d, opts), rules)
    batch_out = hash_split(
        kept_docs(flagged, rules, opts), weights, salt="s"
    )

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_s)
        .select(*sorted(batch_out.columns))
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in batch_out.select(*sorted(batch_out.columns)).collect()
    )
    assert got == want and len(got) > 0
    # accumulated drop counts across the two micro-batches
    assert report["input_docs"] == 6
    assert report["dropped_blocked_domain"] == 1
    assert report["dropped_c4"] == 3  # lorem + thin + closing-brace
    assert report["kept"] == len(want)


def test_stream_prep_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a full replay (same
    feed + output, FRESH checkpoint so every batch re-fires with the
    same batch ids) — the dynamic per-batch partition overwrite must
    leave the output row-identical and the per-batch report
    accounting must not double-add (review r8)."""
    import shutil

    from bm25_chroma_spark.plans.prep import PrepOptions
    from bm25_chroma_spark.streaming.prep import stream_prep_corpus

    good = "\n".join(
        f"A perfectly fine sentence number {i} here." for i in range(4)
    )
    src = tmp_path / "replay_feed"
    src.mkdir()
    for i, rows in enumerate(
        [[(1, good), (2, "thin.")], [(3, good + " extra tail.")]]
    ):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(tmp_path / f"rb{i}"))
        for f in (tmp_path / f"rb{i}").glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}.parquet")

    out = str(tmp_path / "replay_out")
    opts = PrepOptions(c4_min_lines=3)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q, report = stream_prep_corpus(
            stream, out, checkpoint=str(tmp_path / ckpt),
            opts=opts, weights={"train": 1.0}, salt="s",
        )
        q.awaitTermination(180)
        return report

    r1 = run("ck1")
    rows1 = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    r2 = run("ck2")  # fresh checkpoint -> every batch replays
    rows2 = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    assert rows2 == rows1 and len(rows1) > 0
    for k in ("input_docs", "kept", "dropped_c4"):
        assert r2[k] == r1[k], k
    assert r1["input_docs"] == 3 and r1["dropped_c4"] == 1
