"""Incremental corpus prep: the prep_corpus annotate -> rule-filter
-> split semantics applied per micro-batch through foreachBatch, so a
live document feed lands already-annotated, filtered, and
split-partitioned — with the same counted drop reasons the batch CLI
reports, accumulated across batches.

The per-document stages (blocklist flag, HTML strip, redact,
annotate, rules, split) are the SHARED definitions in plans/prep.py —
the batch CLI runs the identical expressions, which is what makes
streaming==batch parity structural (pinned in
tests/test_streaming.py::test_stream_prep_matches_batch). The
cross-document batch stages (span dedup, benchmark decontamination)
need corpus-global state and stay batch-only; run them as a
downstream compaction pass over the streamed output if needed.

100 TB shape: each micro-batch is one narrow expression pass + a
hash_split projection + a partitioned write — no shuffle, no state
store; the only non-map work is the optional blocklist broadcast
join.

Effective exactly-once: foreachBatch is an AT-LEAST-ONCE contract
(a crash between the sink commit and the checkpoint advance replays
the batch), so the handler is made IDEMPOTENT instead of relying on
the native file-sink log: every batch overwrites its own
``batch_id=<id>`` partition (dynamic partition overwrite — a replay
rewrites the same directory rather than appending duplicates), and
the report tracks per-batch metric rows keyed by batch_id, so a
replayed batch overwrites its own counts rather than double-adding.
Readers take ``spark.read.parquet(output_path)`` as usual; batch_id
is just one more partition column to prune or ignore.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from bm25_chroma_spark.plans.prep import (
    PrepOptions,
    annotate_docs,
    drop_metric_cols,
    flag_docs,
    kept_docs,
    prep_rules,
)


def stream_prep_corpus(
    stream_docs: DataFrame,
    output_path: str,
    checkpoint: str,
    opts: Optional[PrepOptions] = None,
    weights: Optional[Dict[str, float]] = None,
    salt: str = "",
    blocklist: Optional[DataFrame] = None,
    available_now: bool = True,
) -> Tuple[StreamingQuery, Dict[str, int]]:
    """Start a foreachBatch prep pipeline over a streaming documents
    frame -> (query, report). ``report`` is a plain dict the batch
    handler maintains: totals (input_docs, kept, dropped_<rule>,
    pii_*) recomputed from a per-batch ``_batches`` map keyed by
    batch_id, so a foreachBatch REPLAY overwrites its own batch's
    counts instead of double-adding (see the module idempotency
    note); read it after ``query.awaitTermination()`` — with
    ``available_now`` (default) the query drains what exists and
    stops, the right shape for catch-up/backfill runs; pass False for
    a continuous feed.

    ``blocklist`` is a static (broadcastable) domain frame, applied
    to the RAW text of every batch before HTML stripping — exactly
    like the batch CLI's --blocklist stage."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    opts = opts or PrepOptions()
    if blocklist is not None and not opts.blocklist_rule:
        # couple the flag to the frame exactly like the batch CLI
        # (prep_corpus sets blocklist_rule=bool(args.blocklist)):
        # without this, the domain_blocked flag was computed, then
        # annotate_docs dropped it and no rule counted it — blocked
        # docs were silently KEPT (ADVICE r8)
        import dataclasses

        opts = dataclasses.replace(opts, blocklist_rule=True)
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    report: Dict[str, int] = {}

    from bm25_chroma_spark.functions.splits import hash_split

    def _handle(batch: DataFrame, batch_id: int) -> None:
        d = batch
        if blocklist is not None:
            from bm25_chroma_spark.functions.web_clean import (
                filter_blocked_domains,
            )

            d = filter_blocked_domains(
                d,
                blocklist,
                text_col=opts.text_col,
                id_col=opts.id_col,
            ).drop("blocked_domain")
        if opts.strip_html:
            from bm25_chroma_spark.functions.web_clean import (
                strip_html,
            )

            d = d.withColumn(
                opts.text_col, strip_html(F.col(opts.text_col))
            )
        rules = prep_rules(opts)
        flagged = flag_docs(annotate_docs(d, opts), rules)
        obs = Observation()
        flagged = flagged.observe(obs, *drop_metric_cols(rules))
        final = hash_split(
            kept_docs(flagged, rules, opts),
            weights,
            id_col=opts.id_col,
            salt=salt,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        # dynamic partition overwrite: a replayed batch rewrites its
        # own batch_id=<id> directories instead of appending dupes
        final.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id", "split").parquet(output_path)
        batches = report.setdefault("_batches", {})
        batches[int(batch_id)] = {
            k: int(v or 0) for k, v in obs.get.items()
        }
        totals: Dict[str, int] = {}
        for m in batches.values():
            for k, v in m.items():
                totals[k] = totals.get(k, 0) + v
        for k, v in totals.items():
            report[k] = v

    writer = (
        stream_docs.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), report
