"""Shared corpus-prep pipeline pieces: the annotate battery and the
counted keep/drop rule set used by BOTH the batch CLI
(scripts/prep_corpus.py) and the incremental path
(streaming/prep.py::stream_prep_corpus). One definition means the
streaming==batch parity the tests pin is structural, not coincidental.

Per-document stages only: span dedup and benchmark decontamination
are cross-document (they need the whole corpus or a broadcast gram
set) and remain batch-stage concerns in prep_corpus; everything here
is a narrow per-row expression battery, which is exactly why it can
run unchanged inside a foreachBatch micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class PrepOptions:
    """The per-document prep knobs (mirrors the prep_corpus CLI
    defaults)."""

    text_col: str = "text"
    id_col: str = "doc_id"
    langs: List[str] = field(default_factory=list)
    min_quality: float = 0.0
    min_tokens: int = 0
    max_tokens: int = 0  # 0 = unbounded
    max_top2_frac: float = 1.0
    max_dup3_frac: float = 1.0
    c4_min_lines: int = 0  # 0 = off
    strip_html: bool = False
    redact: bool = True
    # blocklist handling happens BEFORE annotate (raw-text URLs);
    # this only switches the counted rule on
    blocklist_rule: bool = False


def annotate_docs(docs: DataFrame, opts: PrepOptions) -> DataFrame:
    """The one-narrow-pass annotate battery: redaction, language
    hint, quality, token count, Gopher repetition signals, PII
    counts, optional C4 document signals — all computed from the RAW
    text (the r7 review rule: keep/drop must not depend on
    --no-redact). Passthrough columns (e.g. domain_blocked from a
    blocklist stage) ride along by name."""
    from bm25_chroma_spark.functions import text_analysis as ta

    t = F.col(opts.text_col)

    bl_cols = (
        [F.col("domain_blocked")] if opts.blocklist_rule else []
    )
    span_cols = (
        [F.col("n_removed")] if "n_removed" in docs.columns else []
    )
    c4_cols = []
    if opts.c4_min_lines:
        from bm25_chroma_spark.functions.web_clean import c4_signals

        c4_cols = [c4_signals(t).alias("_c4")]

    return docs.select(
        F.col(opts.id_col),
        (t if not opts.redact else ta.redact_pii(t)).alias(
            opts.text_col
        ),
        *bl_cols,
        *span_cols,
        *c4_cols,
        ta.lang_id(t).alias("lang_pred"),
        ta.quality_score(t).alias("quality"),
        ta.token_count_ws(t).cast("int").alias("n_tokens"),
        ta.duplicate_line_fraction(t).alias("dup_line_frac"),
        ta.top_ngram_fraction(t, 2).alias("top2_frac"),
        ta.duplicate_ngram_fraction(t, 3).alias("dup3_frac"),
        ta.pii_counts(t).alias("pii"),
    )


def prep_rules(opts: PrepOptions) -> Dict[str, Column]:
    """Named keep-conditions over an annotate_docs frame. Every rule
    becomes an ``_ok_<name>`` column and a ``dropped_<name>`` counter
    in the report."""
    rules: Dict[str, Column] = {
        "lang": F.col("lang_pred").isin(opts.langs)
        if opts.langs
        else F.lit(True),
        "quality": F.col("quality") >= opts.min_quality,
        "min_tokens": F.col("n_tokens") >= opts.min_tokens,
        "max_tokens": F.lit(True)
        if not opts.max_tokens
        else F.col("n_tokens") <= opts.max_tokens,
        "top2": F.col("top2_frac") <= opts.max_top2_frac,
        "dup3": F.col("dup3_frac") <= opts.max_dup3_frac,
    }
    if opts.c4_min_lines:
        c4 = F.col("_c4")
        rules["c4"] = (
            ~c4["has_lorem"]
            & ~c4["has_brace"]
            & (c4["n_kept"] >= opts.c4_min_lines)
        )
    if opts.blocklist_rule:
        rules["blocked_domain"] = ~F.col("domain_blocked")
    return rules


def flag_docs(
    annotated: DataFrame, rules: Dict[str, Column]
) -> DataFrame:
    """Attach one ``_ok_<name>`` column per rule plus the combined
    ``_keep`` — flag-not-drop, so counters can ride the write via
    observe() and callers filter afterwards."""
    flagged = annotated
    keep = F.lit(True)
    for name, cond in rules.items():
        flagged = flagged.withColumn(f"_ok_{name}", cond)
        keep = keep & F.col(f"_ok_{name}")
    return flagged.withColumn("_keep", keep)


def drop_metric_cols(rules: Dict[str, Column]) -> List[Column]:
    """The observe() aggregate set shared by the batch CLI and the
    per-micro-batch accumulator: input/kept counts, one
    dropped_<rule> counter each, PII totals."""
    return [
        F.count(F.lit(1)).alias("input_docs"),
        F.sum(F.col("_keep").cast("long")).alias("kept"),
        *[
            F.sum((~F.col(f"_ok_{name}")).cast("long")).alias(
                f"dropped_{name}"
            )
            for name in rules
        ],
        F.sum("pii.email").alias("pii_emails"),
        F.sum("pii.ip").alias("pii_ips"),
        F.sum("pii.phone").alias("pii_phones"),
    ]


def kept_docs(
    flagged: DataFrame, rules: Dict[str, Column], opts: PrepOptions
) -> DataFrame:
    """filter(_keep) and drop the bookkeeping columns."""
    return flagged.filter("_keep").drop(
        "_keep",
        *[f"_ok_{n}" for n in rules],
        *(["n_removed"] if "n_removed" in flagged.columns else []),
        *(["_c4"] if opts.c4_min_lines else []),
        *(["domain_blocked"] if opts.blocklist_rule else []),
    )
