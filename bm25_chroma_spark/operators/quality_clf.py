"""Curated-vs-crawl quality classifier — the discriminative filter
stage of the GPT-3 / LLaMA data recipes (Brown et al. 2020 Appendix A;
Touvron et al. 2023 train a "Wikipedia-reference" classifier): score
every document by how much its token distribution looks like a small
CURATED seed corpus versus the raw crawl, then keep the high end.

This is the complement of the Stupid-Backoff LM in ``operators/lm.py``
(generative perplexity against one corpus); here the signal is the
LOG-ODDS between two corpora. The published recipes use logistic
regression over hashed n-grams; this implementation is multinomial
Naive Bayes with add-one (Laplace) smoothing (Manning, Raghavan &
Schütze, IIR ch. 13) — chosen deliberately because its training is
pure COUNT arithmetic:

- **train**: one exploded token count per class — a single
  partial-aggregable groupBy(term) over the labeled union is the only
  shuffle. ``min_count`` / ``max_vocab`` prune the model
  BROADCASTABLE, exactly like the LM (Zipf: a min_count in the
  hundreds keeps 100 TB models at tens of MB).
- **score**: explode tokens, ONE broadcast join against the model,
  one partial-aggregable per-doc average — the corpus never shuffles
  except the final per-doc agg.
- Every step is closed-form count arithmetic, so the whole path is
  SQL-mirrorable (the ``nb_quality`` entry is oracle-checked against
  an independent DuckDB implementation) — unlike an iterative
  logistic-regression fit, which would be a rows-only check.

Scoring semantics (deterministic, engine-independent):

- tokens = lowercased whitespace words (the house ``_words`` rule);
  blank/NULL docs score NULL with ``n_tokens = 0``.
- per-token log-likelihood-ratio with Laplace smoothing::

      llr(w) = ln((pos_count(w) + 1) / (pos_tokens + V))
             - ln((neg_count(w) + 1) / (neg_tokens + V))

  where ``pos_tokens``/``neg_tokens``/``V`` are the PRE-pruning
  totals (pruned mass still weighs the denominators — the honest
  arithmetic, same contract as the LM's ``n_tokens``). Words absent
  from the pruned model (OOV or pruned) take ``count = 0`` through
  the same formula, so pruning only moves rare words onto the
  smoothed floor.
- doc score = ``avg(llr)`` over its tokens (length-normalized, so
  long documents aren't favored), rounded to ``round_to`` decimals
  if given (round-before-rank, the house cross-engine float
  contract). The class prior ``ln(P(pos)/P(neg))`` is deliberately
  NOT added: it reflects seed-corpus sizes, not document quality,
  and under length normalization it would shift short docs more
  than long ones.
- ``lm_buckets(scored, score_col="quality_logodds")`` cuts
  head/middle/tail exactly as for LM scores (it is score-column
  generic).

No reference-repo counterpart (/root/reference is a BM25/Chroma
engine); beyond-reference training-data pipeline family.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.text_analysis import _is_blank, _words


@dataclass(frozen=True)
class NBQualityModel:
    """A trained curated-vs-crawl Naive Bayes model.

    ``terms`` = (term, pos_count, neg_count) AFTER pruning;
    ``pos_tokens`` / ``neg_tokens`` = per-class token totals and
    ``vocab_size`` = distinct-term count, all BEFORE pruning (the
    smoothing denominators — see module docstring)."""

    terms: DataFrame
    pos_tokens: int
    neg_tokens: int
    vocab_size: int


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n, term) rows — one per token occurrence; blank/NULL
    docs emit nothing (reattached at score time)."""
    toks = _words(F.col(text_col))
    return (
        docs.filter(
            F.col(text_col).isNotNull() & ~_is_blank(F.col(text_col))
        )
        .select(F.col(id_col).alias("__id"), toks.alias("__toks"))
        .select(
            "__id",
            F.size("__toks").alias("n"),
            F.explode("__toks").alias("term"),
        )
    )


def train_nb_quality(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> NBQualityModel:
    """Count per-class unigrams over the labeled union and prune to a
    broadcastable model. One groupBy(term) shuffle covers BOTH
    classes (the label rides as a 0/1 column and the per-class counts
    are conditional sums — partial-aggregable map-side).

    ``min_count`` drops terms whose TOTAL count (pos + neg) is below
    the threshold; ``max_vocab`` keeps the top terms by (total desc,
    term asc — deterministic tie-break). Both only move words onto
    the smoothed OOV floor; the denominators stay pre-prune."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    labeled = pos_docs.select(
        F.lit(1).alias("__y"), F.col(text_col)
    ).unionByName(neg_docs.select(F.lit(0).alias("__y"), F.col(text_col)))
    toks = (
        labeled.filter(
            F.col(text_col).isNotNull() & ~_is_blank(F.col(text_col))
        )
        .select("__y", F.explode(_words(F.col(text_col))).alias("term"))
    )
    counts = toks.groupBy("term").agg(
        F.sum("__y").cast("long").alias("pos_count"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("neg_count"),
    )
    totals = counts.agg(
        F.sum("pos_count").alias("pt"),
        F.sum("neg_count").alias("nt"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    pos_tokens = int(totals["pt"] or 0)
    neg_tokens = int(totals["nt"] or 0)
    vocab_size = int(totals["v"] or 0)
    if pos_tokens == 0 or neg_tokens == 0:
        raise ValueError(
            "both classes need at least one training token "
            f"(pos={pos_tokens}, neg={neg_tokens})"
        )
    if min_count > 1:
        counts = counts.filter(
            F.col("pos_count") + F.col("neg_count") >= min_count
        )
    if max_vocab is not None:
        # deterministic cap; at 100 TB prefer a raised min_count
        # (no global sort) — the cap exists for exact budgets
        from pyspark.sql import Window

        w = Window.orderBy(
            (F.col("pos_count") + F.col("neg_count")).desc(),
            F.col("term").asc(),
        )
        counts = (
            counts.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= max_vocab)
            .drop("__r")
        )
    return NBQualityModel(
        terms=counts,
        pos_tokens=pos_tokens,
        neg_tokens=neg_tokens,
        vocab_size=vocab_size,
    )


def score_nb_quality(
    docs: DataFrame,
    model: NBQualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_logodds",
    round_to: int | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document: (id_col, n_tokens, ``score_col``) with
    score = avg per-token Laplace-smoothed log-likelihood-ratio
    (positive = curated-like; the GPT-3 recipe keeps the high end).
    Blank/NULL docs get n_tokens 0 and NULL score.

    ``broadcast_model=True`` (default) hints the single model join —
    correct whenever the model was pruned to fit; pass False for an
    unpruned corpus-sized model to let AQE pick a sort-merge join."""
    if model.pos_tokens <= 0 or model.neg_tokens <= 0:
        raise ValueError("model has no training tokens")
    hint = F.broadcast if broadcast_model else (lambda d: d)
    terms = hint(
        model.terms.select(
            F.col("term").alias("__m_term"),
            F.col("pos_count").alias("__m_pos"),
            F.col("neg_count").alias("__m_neg"),
        )
    )
    # exact-integer doubles (< 2^53): identical in every engine
    pos_den = float(model.pos_tokens + model.vocab_size)
    neg_den = float(model.neg_tokens + model.vocab_size)
    toks = _doc_tokens(docs, id_col, text_col)
    joined = toks.join(terms, toks["term"] == terms["__m_term"], "left")
    llr = F.log(
        (F.coalesce(F.col("__m_pos"), F.lit(0)).cast("double") + F.lit(1.0))
        / F.lit(pos_den)
    ) - F.log(
        (F.coalesce(F.col("__m_neg"), F.lit(0)).cast("double") + F.lit(1.0))
        / F.lit(neg_den)
    )
    score = F.avg(llr)
    if round_to is not None:
        score = F.round(score, round_to)
    scored = joined.groupBy(F.col("__id").alias(id_col)).agg(
        F.first("n").cast("int").alias("n_tokens"),
        score.alias(score_col),
    )
    blanks = (
        docs.filter(
            F.col(text_col).isNull() | _is_blank(F.col(text_col))
        )
        .select(
            F.col(id_col),
            F.lit(0).alias("n_tokens"),
            F.lit(None).cast("double").alias(score_col),
        )
    )
    return scored.unionByName(blanks)
