#!/usr/bin/env python
"""spark-submit entry point: prepare a raw documents table for LLM
training in one job, composed from the pipeline operators:

 -1. BLOCKLIST (optional, --blocklist PATH) — flag docs linking to a
     blocklisted domain, read from the RAW text (markup hrefs vanish
     once tags are stripped), dropped with a counted reason. Adds one
     extra scan: the (id, domain) explode side of its broadcast join.
  0a. STRIP-HTML (optional, --strip-html) — extract plain text from
     scraped markup (tags/scripts/styles/comments out, entities
     unescaped, block tags -> newlines) BEFORE everything else, so
     span dedup and every annotate signal see prose, not markup.
  0. SPAN-DEDUP (optional, --dedup-spans N) — cut word spans of >= N
     tokens repeated across --span-min-docs documents (Lee et al.
     2021 ExactSubstr shape) BEFORE annotation, so quality signals
     and filters see the deduplicated text. Adds two corpus scans
     (shingle-df discovery + position join) — the inherent cost of
     exact substring dedup.
  1. ANNOTATE — language ID, quality score, token count, Gopher
     repetition signals (duplicate-line / top-2-gram / dup-3-gram
     fractions), PII counts. One narrow JVM-expression pass.
  2. REDACT — emails / IPv4s / phone-shaped runs replaced with typed
     placeholders (--no-redact to keep raw text).
  3. FILTER — drop docs failing --langs / --min-quality /
     --min-tokens / --max-tokens / --max-top2-frac / --max-dup3-frac.
     Every drop reason is counted in the report via observe(), so the
     counters ride the write job instead of costing their own scan.
  4. DECONTAMINATE (optional) — drop docs sharing an n-gram with
     --benchmark (broadcast shared-n-gram flagging).
  5. MIX (optional, --mix-rates) — deterministic per-group keep
     rates on --mix-col (source mixing: down-weight crawl, keep
     curated); the kept/dropped counts ride the write via a second
     observe(), no extra scan.
  6. SPLIT — deterministic md5-threshold train/val/test labels
     (--weights, --salt), written with partitionBy(split) so readers
     prune.
  7. SHARD (optional, --shards N) — attach a deterministic training
     shard id and partition the output by (split, shard_id) so a
     trainer streams shard directories directly.

Without --benchmark the whole job is ONE corpus scan feeding one
partitioned write (report metrics ride it via observe); the optional
decontamination adds exactly one more scan for its broadcast join,
whose (tiny) contaminated-id result is persisted and reused by the
purge during the write.

Usage (local smoke):
  python scripts/prep_corpus.py \
      --input /root/testdata/sf0.01/documents.parquet \
      --output /tmp/prepped --report /tmp/prep_report.json

Cluster:
  spark-submit --py-files bm25_chroma_spark.zip scripts/prep_corpus.py \
      --input s3://corpus/documents --output s3://corpus/prepped \
      --benchmark s3://corpus/eval_sets --min-quality 0.3
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True,
                   help="output parquet root (partitioned by split)")
    p.add_argument("--report", help="write a JSON metrics report here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--langs", default="",
                   help="comma-separated lang codes to keep (empty = all)")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--min-tokens", type=int, default=0)
    p.add_argument("--max-tokens", type=int, default=0,
                   help="0 = unbounded")
    p.add_argument("--max-top2-frac", type=float, default=1.0,
                   help="drop docs whose most frequent 2-gram exceeds "
                        "this share (Gopher rule)")
    p.add_argument("--max-dup3-frac", type=float, default=1.0,
                   help="drop docs whose duplicated-3-gram share "
                        "exceeds this")
    p.add_argument("--c4-min-lines", type=int, default=0,
                   help="apply the C4 document rules (Raffel et al. "
                        "2020): drop docs with 'lorem ipsum', a "
                        "curly brace, or fewer than this many "
                        "C4-clean lines (0 = off). Flags docs only — "
                        "use functions.web_clean.c4_clean for "
                        "line-level rewriting")
    p.add_argument("--strip-html", action="store_true",
                   help="extract plain text from HTML markup before "
                        "any other stage (functions.web_clean."
                        "strip_html)")
    p.add_argument("--blocklist",
                   help="parquet of blocked domains (column "
                        "'domain'); docs whose RAW text links to one "
                        "are dropped with a counted reason")
    p.add_argument("--dedup-spans", type=int, default=0,
                   help="remove word spans of >= N tokens repeated "
                        "across documents (0 = off; Lee et al. 2021 "
                        "ExactSubstr; published default 50)")
    p.add_argument("--span-min-docs", type=int, default=2,
                   help="a span must appear in this many DISTINCT "
                        "docs to be cut")
    p.add_argument("--keep-staged", action="store_true",
                   help="keep the intermediate '<output>_spandedup' "
                        "parquet written by --dedup-spans (default: "
                        "deleted after the final write)")
    p.add_argument("--no-redact", action="store_true",
                   help="keep raw text instead of PII-redacted")
    p.add_argument("--benchmark",
                   help="benchmark/eval parquet (same text column); "
                        "docs sharing an n-gram are dropped")
    p.add_argument("--decon-n", type=int, default=13)
    p.add_argument("--mix-rates", default="",
                   help="comma-separated group=rate keep fractions "
                        "(e.g. 'en=1.0,fr=0.5') applied per --mix-col "
                        "after filtering: deterministic md5-threshold "
                        "source mixing (empty = off)")
    p.add_argument("--mix-col", default="lang_pred",
                   help="column holding the mixing group; must exist "
                        "on the ANNOTATED frame (annotate_docs "
                        "selects a fixed column set — the predicted "
                        "language 'lang_pred' is the default group)")
    p.add_argument("--mix-default", type=float, default=1.0,
                   help="keep rate for groups absent from --mix-rates")
    p.add_argument("--mix-salt", default="")
    p.add_argument("--shards", type=int, default=0,
                   help="assign each kept doc a deterministic training "
                        "shard id and partition the output by "
                        "(split, shard_id) (0 = off)")
    p.add_argument("--shard-salt", default="")
    p.add_argument("--weights", default="train=0.9,val=0.05,test=0.05")
    p.add_argument("--salt", default="")
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=8)
    return p


def _parse_weights(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        out[name.strip()] = float(w)
    return out


def _hdfs_delete(spark, path: str) -> None:
    """Recursive delete through the Hadoop FS API (works for any
    scheme, not just file://)."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def run(args) -> dict:
    from pyspark.sql import functions as F

    from bm25_chroma_spark.functions.splits import hash_split
    from bm25_chroma_spark.operators.decontam import (
        contaminated_docs,
        purge_contaminated,
    )
    from bm25_chroma_spark.session import get_spark

    spark = get_spark(
        "prep-corpus",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.input)
    t = F.col(args.text_col)

    if args.blocklist:
        from bm25_chroma_spark.functions.web_clean import (
            filter_blocked_domains,
        )

        # on RAW text, BEFORE strip_html: href URLs live inside the
        # tags strip_html removes
        docs = filter_blocked_domains(
            docs,
            spark.read.parquet(args.blocklist),
            text_col=args.text_col,
            id_col=args.id_col,
        ).drop("blocked_domain")

    if args.strip_html:
        from bm25_chroma_spark.functions.web_clean import strip_html

        # a plain codegen expression chain (not an interpreted HOF),
        # so the annotate pass's ~8 references are merged by
        # subexpression elimination — no staging needed, unlike the
        # span-dedup rebuild below
        docs = docs.withColumn(args.text_col, strip_html(t))

    if args.dedup_spans:
        from bm25_chroma_spark.operators.span_dedup import (
            remove_repeated_spans,
        )

        # stage the deduped text to parquet and read it back: the
        # annotate pass references the text column ~8 times, and
        # higher-order expressions are excluded from codegen
        # subexpression elimination, so an inlined rebuild expression
        # would be re-evaluated per reference (the interpreted-HOF
        # quadratic class); an attribute read from parquet is
        # evaluated once. This is also the honest 100-TB shape —
        # substring dedup is its own materialized pass in published
        # pipelines (Lee et al. 2021).
        staged = args.output.rstrip("/") + "_spandedup"
        # one-scan shape (r8): the posexploded positions frame is
        # staged once next to the output and both discovery and the
        # position join read it — one tokenize+shingle pass instead
        # of two (measured 14% faster at the bench shape); the
        # scratch copy is deleted as soon as the deduped text lands
        staged_pos = args.output.rstrip("/") + "_spanpos"
        remove_repeated_spans(
            docs,
            span_tokens=args.dedup_spans,
            min_docs=args.span_min_docs,
            text_col=args.text_col,
            id_col=args.id_col,
            positions_path=staged_pos,
        ).write.mode("overwrite").parquet(staged)
        _hdfs_delete(spark, staged_pos)
        docs = spark.read.parquet(staged)
    else:
        staged = None

    # the annotate battery + counted rule set are the SHARED library
    # definitions (plans/prep.py) — the streaming prep path
    # (streaming/prep.py) runs the exact same expressions per
    # micro-batch, which is what makes the streaming==batch parity
    # test structural
    from bm25_chroma_spark.plans.prep import (
        PrepOptions,
        annotate_docs,
        drop_metric_cols,
        flag_docs,
        kept_docs,
        prep_rules,
    )

    opts = PrepOptions(
        text_col=args.text_col,
        id_col=args.id_col,
        langs=[x for x in args.langs.split(",") if x],
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        max_top2_frac=args.max_top2_frac,
        max_dup3_frac=args.max_dup3_frac,
        c4_min_lines=args.c4_min_lines,
        strip_html=args.strip_html,
        redact=not args.no_redact,
        blocklist_rule=bool(args.blocklist),
    )
    annotated = annotate_docs(docs, opts)
    rules = prep_rules(opts)
    flagged = flag_docs(annotated, rules)

    # the whole report rides the write job via observe() — the drop
    # counters see every pre-filter row without a second corpus scan
    from pyspark.sql import Observation

    obs = Observation("prep_stats")
    flagged = flagged.observe(
        obs,
        *drop_metric_cols(rules),
        *(
            [F.sum("n_removed").alias("span_tokens_removed")]
            if args.dedup_spans
            else []
        ),
    )

    kept = kept_docs(flagged, rules, opts)

    report = {}
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        # the contaminated id set is tiny — persist it so the
        # expensive corpus-side join runs exactly once (count here,
        # broadcast anti-join reuse in the purge during the write)
        flaggods = contaminated_docs(
            kept,
            bench,
            n=args.decon_n,
            text_col=args.text_col,
            id_col=args.id_col,
        ).persist()
        n_contaminated = flaggods.count()
        kept = purge_contaminated(kept, flaggods, id_col=args.id_col)
        report["dropped_contaminated"] = int(n_contaminated)

    obs_mix = None
    if args.mix_rates:
        from bm25_chroma_spark.functions.splits import stratified_sample

        mixed = stratified_sample(
            kept,
            _parse_weights(args.mix_rates),
            args.mix_col,
            id_col=args.id_col,
            salt=args.mix_salt,
            default_rate=args.mix_default,
            keep_col="__mix_keep",
        )
        # second Observation on the same write job: counts every
        # post-filter row and the mix decision without another scan
        obs_mix = Observation("mix_stats")
        mixed = mixed.observe(
            obs_mix,
            F.count(F.lit(1)).alias("pre_mix_docs"),
            F.sum(F.col("__mix_keep").cast("long")).alias("mix_kept"),
        )
        kept = mixed.filter(F.col("__mix_keep")).drop("__mix_keep")

    weights = _parse_weights(args.weights)
    final = hash_split(
        kept, weights, id_col=args.id_col, salt=args.salt
    )
    partition_cols = ["split"]
    if args.shards:
        from bm25_chroma_spark.operators.sharding import assign_shards

        final = assign_shards(
            final, args.shards, id_col=args.id_col, salt=args.shard_salt
        )
        partition_cols.append("shard_id")
    final.write.mode("overwrite").partitionBy(*partition_cols).parquet(
        args.output
    )
    report.update(
        {
            k: (int(v) if v is not None else 0)
            for k, v in obs.get.items()
        }
    )
    out = spark.read.parquet(args.output)
    split_counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    report["splits"] = split_counts
    report["output_docs"] = int(sum(split_counts.values()))
    if obs_mix is not None:
        pre = int(obs_mix.get["pre_mix_docs"] or 0)
        mix_kept = int(obs_mix.get["mix_kept"] or 0)
        report["dropped_mix"] = pre - mix_kept
    if args.shards:
        report["shard_docs"] = {
            str(r["shard_id"]): int(r["n"])
            for r in out.groupBy("shard_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    if staged is not None:
        # the staged copy is corpus-sized: delete it through the
        # Hadoop FS API (works for any scheme, not just file://)
        # unless the operator asked to keep it for inspection/reuse
        if args.keep_staged:
            report["span_staged_path"] = staged
        else:
            _hdfs_delete(spark, staged)
    return report


def main() -> None:
    args = build_parser().parse_args()
    report = run(args)
    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
