"""Substring-level exact deduplication: remove word spans that repeat
across documents — cross-document boilerplate (headers, license
blocks, templated pages) inside otherwise-unique documents, the one
dedup modality document-level MinHash/SimHash and benchmark
decontamination don't cover.

Public recipe: Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better" (ExactSubstr). Their single-machine
implementation builds a corpus suffix array and deletes every
occurrence of any sufficiently long substring that appears more than
once; the faithful distributed shape is fixed-length word shingles
(a span of >= ``span_tokens`` words repeats across docs iff all of
its length-``span_tokens`` shingles do), counted with one groupBy and
joined back by position. Like their released implementation, ALL
occurrences of a repeated span are removed (no canonical copy is
kept) — at LLM-corpus scale the text lost to "remove all" vs "keep
one" is negligible and the plan stays one-pass per stage.

Semantics (token-level, matching the rest of this package's text
pipeline):

* Tokens are whitespace-split after edge-whitespace stripping;
  shingles are matched LOWERCASED (``word_ngrams``) but removal
  rebuilds from the ORIGINAL-case tokens, so surviving text keeps its
  casing. Documents with no repeated span pass through byte-identical
  (original text, untouched whitespace).
* A span must appear in >= ``min_docs`` DISTINCT documents to be
  removed (cross-document boilerplate). Within-document repetition is
  a quality signal, not dedup — see
  functions/text_analysis.rep-signal helpers.
* Overlapping repeated shingles merge naturally: removal operates on
  the union of covered token positions, so a 60-token boilerplate
  block with span_tokens=50 disappears wholesale.

Design for 100 TB:

* Stage 1 (span discovery): per-doc DISTINCT shingles are exploded
  map-side (``array_distinct`` before the explode), so the document
  frequency is a plain ``count(*)`` with map-side partial
  aggregation — never a ``count_distinct`` shuffle of raw positions.
* With ``hash_grams=True`` (default) shingles become 8-byte xxhash64
  keys before the shuffle: fixed-width keys instead of ~300-byte
  strings on the wire. A 64-bit collision can at worst over-remove
  one span (the conservative direction for dedup); pass
  ``hash_grams=False`` for exact string matching (the oracle path).
* Stage 2 (position join): positions stream through the join against
  the (filtered, usually small) repeated-key set — non-repeated
  positions die in the join, so only boilerplate positions shuffle to
  the per-doc groupBy. No broadcast hint is forced: AQE converts the
  join at runtime when the key set is small, and degrades to a
  shuffle join when a pathological corpus has billions of repeated
  spans.
* Stage 3 (rebuild): one join back to the corpus on doc id, then a
  pure JVM expression pass. The token array is materialized in a
  projection below the join, so the per-element lambdas
  (``sequence`` fan-out, ``F.get`` picks) touch only bound variables
  and attributes — never a captured ``split(text)`` subtree (the
  interpreted-HOF quadratic documented in CLAUDE.md).

No counterpart exists in the reference repo (/root/reference) — this
is a beyond-reference training-data-pipeline operator; the recipe is
public (Lee et al. 2021, arXiv:2107.06499).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.text_analysis import (
    _is_blank,
    _words,
    word_ngrams,
)


def _gram_keys(col, span_tokens: int):
    """array<long> of shingle keys by start position — the
    hash_grams=True fast path. Instead of materializing each
    space-joined gram STRING (word_ngrams builds every gram through
    n-1 interpreted concat passes) and hashing it, this zips the n
    shifted token-array views into an array of n-field structs and
    takes ONE xxhash64 per position over the bound struct: same
    64-bit collision math, no per-gram string allocation. Measured
    HONESTLY at the 100k-doc bench shape: ~10% end-to-end (35s vs
    39s median at local[8]) — the tokenize+explode+shuffle dominate
    the pass, not gram-string building; kept for the allocation
    profile. Key VALUES differ from xxhash64(gram-string) — both
    discovery and position stages must use the same function, which
    remove_repeated_spans does (the hashed==string-keys equality
    test pins result parity)."""
    toks = _words(col)
    m = F.size(toks) - (span_tokens - 1)
    empty = F.slice(F.array(F.lit(0).cast("long")), 1, 0)
    zipped = F.arrays_zip(
        *[F.slice(toks, k + 1, m) for k in range(span_tokens)]
    )
    keys = F.transform(zipped, lambda s: F.xxhash64(s))
    return (
        F.when(_is_blank(col), empty)
        .when(F.size(toks) >= span_tokens, keys)
        .otherwise(empty)
    )


def _validate_span_params(span_tokens: int, min_docs: int) -> None:
    if span_tokens < 2:
        raise ValueError("span_tokens must be >= 2")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (cross-document spans)")


# Version of the hashed-key function (_gram_keys: xxhash64 over the
# n-field token struct). Bump whenever the key arithmetic changes so
# persisted keys frames from older builds are REJECTED instead of
# silently matching nothing (ADVICE r7).
SPAN_KEY_VERSION = 1


def _span_stamp_cols(span_tokens: int):
    return [
        F.lit(span_tokens).alias("_span_tokens"),
        F.lit(SPAN_KEY_VERSION).alias("_span_key_ver"),
    ]


def _check_keys_stamp(
    keys: DataFrame, span_tokens: int, hash_grams: bool
) -> None:
    """Reject a precomputed keys frame built with different
    parameters or an older hashed-key function. A mismatch used to be
    undetectable (the join keys simply never matched and nothing was
    removed); the stamp columns repeated_span_keys attaches make it a
    loud error at the cost of one tiny first() on the (filtered,
    small) keys frame."""
    missing = [
        c
        for c in ("_span_tokens", "_span_key_ver")
        if c not in keys.columns
    ]
    if missing:
        raise ValueError(
            f"precomputed keys frame lacks the stamp column(s) "
            f"{missing}: rebuild it with repeated_span_keys (which "
            f"stamps span_tokens and the key-function version), or "
            f"attach literal columns matching the build parameters"
        )
    meta = keys.select("_span_tokens", "_span_key_ver").first()
    if meta is None:
        return  # empty keys frame: nothing will be removed; vacuous
    if int(meta["_span_tokens"]) != span_tokens:
        raise ValueError(
            f"keys frame was built with span_tokens="
            f"{int(meta['_span_tokens'])}, caller asked for "
            f"{span_tokens} — shingle lengths must match"
        )
    if hash_grams and int(meta["_span_key_ver"]) != SPAN_KEY_VERSION:
        raise ValueError(
            f"keys frame carries hashed-key version "
            f"{int(meta['_span_key_ver'])}; this build uses "
            f"{SPAN_KEY_VERSION} — regenerate the keys"
        )


def repeated_span_keys(
    docs: DataFrame,
    span_tokens: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
    unique_ids: bool = True,
) -> DataFrame:
    """Shingle keys of length ``span_tokens`` that occur in at least
    ``min_docs`` distinct documents -> (gram_key long | gram string,
    n_docs long, _span_tokens int, _span_key_ver int — the last two
    are literal stamp columns remove_repeated_spans validates when
    the frame is persisted/reused).

    ``unique_ids=True`` (default) assumes one row per document id —
    the normal post-``dedup_exact`` pipeline state — so per-doc
    distinctness is established entirely map-side (``array_distinct``
    per row before the explode) and the aggregate is a
    partial-agg-friendly ``count(*)``: one shuffle, 8-byte keys by
    default. If the input may carry the same document in several rows
    (pre-dedup unions, re-ingests), pass ``unique_ids=False`` to
    count ``count_distinct(id_col)`` instead — correct under
    duplicate rows at the cost of carrying ids through the shuffle.
    """
    _validate_span_params(span_tokens, min_docs)
    grams = (
        _gram_keys(F.col(text_col), span_tokens)
        if hash_grams
        else word_ngrams(F.col(text_col), span_tokens)
    )
    key = "gram_key" if hash_grams else "gram"
    # the fast path never references id_col (df = count of rows whose
    # per-row distinct set contains the key), so a text-only frame
    # works with unique_ids=True; only distinct-id counting needs ids
    id_cols = [] if unique_ids else [F.col(id_col)]
    per_doc = docs.select(
        *id_cols, F.explode(F.array_distinct(grams)).alias(key)
    )
    agg = F.count("*") if unique_ids else F.count_distinct(F.col(id_col))
    return (
        per_doc.groupBy(key)
        .agg(agg.alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        # stamp the build parameters so a later remove_repeated_spans
        # can validate a persisted/shared frame (ADVICE r7)
        .select("*", *_span_stamp_cols(span_tokens))
    )


def remove_repeated_spans(
    docs: DataFrame,
    span_tokens: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
    keys: Optional[DataFrame] = None,
    unique_ids: bool = True,
    positions_path: Optional[str] = None,
) -> DataFrame:
    """Cut every occurrence of every word span repeated across
    >= ``min_docs`` documents -> (id_col, text_col, n_removed int,
    plus every other input column passed through unchanged — so
    upstream annotations like a blocklist flag survive the pass).

    ``n_removed`` counts removed tokens. Unaffected documents keep
    their ORIGINAL text byte-identical; affected documents are
    rebuilt as the space-join of their surviving original-case
    tokens (token-stream semantics, like Lee et al.'s ExactSubstr).

    ``keys`` lets a precomputed ``repeated_span_keys`` result (e.g.
    one shared across corpus shards, or persisted between runs) be
    reused. It MUST have been built with the same ``span_tokens``,
    ``hash_grams``, AND key-function version — all VALIDATED here
    against the stamp columns repeated_span_keys attaches
    (_span_tokens/_span_key_ver; a mismatch used to silently remove
    nothing, ADVICE r7), at the cost of one first() on the keys
    frame — NOTE: on a live (unpersisted) derived frame that first()
    re-runs the frame's whole discovery pipeline for one row, so
    frames shared across calls should be persisted or written/reloaded
    first (the parquet round-trip the persisted-reuse case does
    anyway). See ``unique_ids`` on repeated_span_keys for
    duplicate-row inputs.

    ``positions_path`` opts into the ONE-SCAN shape (VERDICT r7 #4):
    the posexploded (id, pos, key) frame is materialized to this
    caller-owned parquet path once, and BOTH discovery (when ``keys``
    is None: dropDuplicates(id, key) -> count, which is distinct-id
    counting regardless of ``unique_ids``) and the position join read
    the staged copy — one tokenize+shingle pass instead of two.
    Ignored when ``keys`` is provided (positions are then consumed
    only once and staging would be pure overhead).
    Measured at the bench shape (100k docs, 32 cores, healthy host):
    11.1 s vs 12.9 s for the default, checksum-identical
    (BENCH/r8_notes.md §3). The default stays two-scan because it
    needs NO scratch storage: the staged frame is ~tokens x 20 bytes
    — larger than the corpus — so at 100 TB the caller must point
    this at real shuffle-grade storage and delete it afterwards
    (prep_corpus --dedup-spans does both).
    """
    _validate_span_params(span_tokens, min_docs)
    key = "gram_key" if hash_grams else "gram"
    grams_expr = (
        _gram_keys(F.col(text_col), span_tokens)
        if hash_grams
        else word_ngrams(F.col(text_col), span_tokens)
    )

    # staging only pays off when the shingles are consumed TWICE
    # (discovery + position join); with a precomputed keys frame
    # discovery is skipped and they are consumed once — staging would
    # be a pure corpus-plus-sized write for zero scan savings
    # (review r8). r9: the staged frame holds the per-doc gram ARRAY
    # (one row per document) instead of the posexploded (id, pos,
    # key) rows — the same information in far fewer rows/bytes on
    # disk, discovery becomes a map-side array_distinct + explode
    # with partial aggregation (the exploded-row shape needed a full
    # dropDuplicates shuffle first), and positions posexplode from
    # the staged array on read (guide §2.3: aggregate before you
    # shuffle / shuffle fewer bytes).
    if positions_path is not None and keys is None:
        # repartition to the session's parallelism before the write:
        # the array-packed staged frame is MUCH smaller on disk than
        # the exploded rows it replaces (that was the point), so
        # without this the downstream posexplode + join would read it
        # as one or two input splits and run nearly serial — the r9
        # bench showed the whole pass stuck at ~2-task parallelism.
        # The repartition shuffles only the compact array rows.
        par = max(
            int(docs.sparkSession.sparkContext.defaultParallelism), 1
        )
        docs.select(
            F.col(id_col), grams_expr.alias("_grams")
        ).repartition(par).write.mode("overwrite").parquet(
            positions_path
        )
        staged = docs.sparkSession.read.parquet(positions_path)
        pos = staged.select(
            F.col(id_col), F.posexplode("_grams").alias("pos", key)
        )
        per_doc = staged.select(
            F.col(id_col),
            F.explode(F.array_distinct("_grams")).alias(key),
        )
        if not unique_ids:
            # duplicate-id inputs: distinct-id counting, like the
            # pre-r9 staged discovery (dropDuplicates on (id, key))
            per_doc = per_doc.dropDuplicates()
        keys = (
            per_doc.groupBy(key)
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
        )
    else:
        pos = docs.select(
            F.col(id_col),
            F.posexplode(grams_expr).alias("pos", key),
        )
        if keys is None:
            keys = repeated_span_keys(
                docs,
                span_tokens=span_tokens,
                min_docs=min_docs,
                text_col=text_col,
                id_col=id_col,
                hash_grams=hash_grams,
                unique_ids=unique_ids,
            )
        else:
            if key not in keys.columns:
                raise ValueError(
                    f"precomputed keys frame lacks the '{key}' column "
                    f"expected for hash_grams={hash_grams}; got "
                    f"{keys.columns}"
                )
            _check_keys_stamp(keys, span_tokens, hash_grams)
    # non-repeated positions die here; only boilerplate rows shuffle
    hits = (
        pos.join(keys.select(key), key)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_hits"))
    )

    # original-case tokens, materialized BELOW the join so the final
    # projection's lambdas reference an attribute, not a re-evaluated
    # split(text) subtree (interpreted-HOF quadratic, CLAUDE.md)
    extra = [c for c in docs.columns if c not in (id_col, text_col)]
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        *extra,
        F.split(
            F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""), r"\s+"
        ).alias("_toks"),
    )
    joined = base.join(hits, id_col, "left")

    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_hits"),
                lambda p: F.sequence(p, p + F.lit(span_tokens - 1)),
            )
        )
    )
    kept_idx = F.array_except(
        F.sequence(F.lit(0), F.size("_toks") - 1), covered
    )
    clean = F.array_join(
        F.transform(kept_idx, lambda i: F.get(F.col("_toks"), i)), " "
    )
    return joined.select(
        id_col,
        F.when(F.col("_hits").isNull(), F.col(text_col))
        .otherwise(clean)
        .alias(text_col),
        F.when(F.col("_hits").isNull(), F.lit(0))
        .otherwise(F.size(covered))
        .cast("int")
        .alias("n_removed"),
        *extra,
    )
