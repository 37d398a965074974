"""Web-corpus cleaning: C4-style line/document heuristics and URL
extraction — the standard first-pass filters for scraped training
text (Raffel et al. 2020, "Exploring the Limits of Transfer Learning
with a Unified Text-to-Text Transformer", §2.2 — public knowledge,
no reference-repo counterpart).

Everything is a pure JVM column expression (whole-stage codegen where
supported; the line lambdas are interpreted higher-order functions
whose bodies touch ONLY their bound line variable, so cost is linear
in total characters — the CLAUDE.md interpreted-HOF rule). Each
operator is a narrow map-side pass: scan-speed at 100 TB, no shuffle.

C4's published recipe, parametrized here:
* keep only lines ending in a terminal punctuation mark,
* drop lines with fewer than ``min_line_words`` words (C4: 3) or
  containing the word "javascript",
* drop whole documents containing "lorem ipsum" or a curly bracket
  (either one — C4 discards pages with any "{" or "}"),
  or with fewer than ``min_kept_lines`` surviving lines (C4: 5).

``strip_html`` is the stage BEFORE all of that: C4/CCNet assume
already-extracted text, so a corpus scraped as markup needs tag
removal + entity unescape first. The cheap standard version here is
an order-pinned regexp_replace chain (like ``redact_pii``), every
pattern RE2/Java-agreeing so the DuckDB oracle can run the same
steps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a line "ends in terminal punctuation" per C4: period, exclamation
# or question mark, or a closing quotation mark
TERMINAL_RE = r'[.!?]["”’]?$|["”’]$'

URL_RE = r"https?://[^\s<>\"]+"


def extract_urls(col: Column) -> Column:
    """Array of http(s) URLs appearing in the text (regex capture,
    RE2/Java-agreeing pattern — no lookaround)."""
    return F.regexp_extract_all(col, F.lit(URL_RE), F.lit(0))


def url_domains(col: Column) -> Column:
    """Lowercased registered-host part of every URL in the text (the
    blocklist-join key for domain filtering). Duplicates preserved in
    document order; dedupe with array_distinct at the call site."""
    return F.transform(
        extract_urls(col),
        lambda u: F.lower(
            F.regexp_extract(u, r"^https?://([^/:?#]+)", 1)
        ),
    )


# The strip_html pipeline, order-pinned (each step sees the previous
# step's output — reordering changes semantics, e.g. &amp; must
# unescape LAST so '&amp;lt;' becomes '&lt;', not '<'). Patterns are
# the RE2/Java common subset: inline (?i)/(?s) flags, lazy
# quantifiers, non-capturing groups; NO backreferences (RE2 lacks
# them — script/style get separate steps instead of a <(script|
# style)>...</\1> pattern). The oracle SQL is generated from this
# same table (the regex ENGINES still differ, which is what the
# cross-check exercises).
HTML_STRIP_STEPS: tuple = (
    # script/style blocks go first, WITH their contents
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines so the line structure
    # c4_clean reads survives extraction
    (r"(?i)<(?:br|hr)\b[^>]*>", "\n"),
    (r"(?i)</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote|title)\s*>",
     "\n"),
    # every remaining tag (incl. <!DOCTYPE ...>) becomes a space so
    # adjacent words don't glue together
    (r"(?s)</?[a-zA-Z!][^>]*>", " "),
    # common named/numeric entities; &amp; strictly last
    (r"(?i)&nbsp;", " "),
    (r"(?i)&lt;", "<"),
    (r"(?i)&gt;", ">"),
    (r"(?i)&quot;|&#34;", '"'),
    (r"(?i)&apos;|&#39;", "'"),
    (r"(?i)&amp;", "&"),
    # whitespace normalization: collapse horizontal runs, trim around
    # newlines (preserving blank-line counts), trim document edges
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"^\s+|\s+$", ""),
)


def strip_html(col: Column) -> Column:
    """Extract plain text from HTML markup: drop script/style blocks
    and comments, turn block-tag boundaries into newlines, drop all
    other tags, unescape the common entities, normalize whitespace.
    The cheap public recipe (C4/CCNet start AFTER this stage) — not a
    spec-complete HTML5 parser: attribute values containing '>' and
    exotic entities pass through imperfectly, which is the accepted
    tradeoff for a pure-JVM scan-speed pass (no Python, no shuffle).
    Compose as strip_html -> c4_clean for raw scraped corpora."""
    out = col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _strip(line: Column) -> Column:
    # NOT F.trim: that strips ASCII 0x20 only (CLAUDE.md), and
    # scraped lines carry tabs/CRs at the edges
    return F.regexp_replace(line, r"^\s+|\s+$", "")


def _lines_raw(col: Column) -> Column:
    return F.transform(F.split(col, r"\n"), _strip)


def _line_kept(line: Column, min_line_words: int) -> Column:
    """C4 line rules on an already-stripped line."""
    return (
        line.rlike(TERMINAL_RE)
        & (F.size(F.split(line, r"\s+")) >= min_line_words)
        & ~F.lower(line).rlike(r"\bjavascript\b")
    )


def c4_signals(col: Column, min_line_words: int = 3) -> Column:
    """struct(n_lines int, n_kept int, has_lorem boolean,
    has_brace boolean) — the per-document quantities C4's filters
    read, exposed for pipelines that want to annotate-then-decide
    instead of cleaning in place."""
    lines = F.filter(_lines_raw(col), lambda ln: F.length(ln) > 0)
    kept = F.filter(lines, lambda ln: _line_kept(ln, min_line_words))
    return F.struct(
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.lower(col).contains("lorem ipsum").alias("has_lorem"),
        # either bracket — C4 discards pages containing "{" OR "}"
        col.rlike(r"[{}]").alias("has_brace"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_kept_lines: int = 5,
) -> DataFrame:
    """Apply the C4 cleaning recipe -> (id_col, text_col [cleaned],
    n_kept int, n_dropped int, c4_keep boolean).

    ``text_col`` becomes the newline-join of the surviving lines
    (stripped); ``c4_keep`` is False for documents C4 discards
    entirely (lorem ipsum / curly brace / fewer than
    ``min_kept_lines`` surviving lines) — the rows are returned
    flagged rather than dropped so callers can count, inspect, or
    filter(c4_keep) in the same pass. One narrow projection: no
    Python, no shuffle, no explode.

    Cost note: the kept-lines expression is referenced by four output
    columns and interpreted higher-order functions are excluded from
    codegen subexpression elimination, so the line filter evaluates
    ~4x per row — a constant factor on a scan-speed op (the same
    tradeoff rep_signals documents), still linear in characters."""
    if min_line_words < 1 or min_kept_lines < 1:
        raise ValueError("min_line_words and min_kept_lines must be >= 1")
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        t.alias("_raw"),
        F.filter(
            _lines_raw(t), lambda ln: F.length(ln) > 0
        ).alias("_lines"),
    )
    kept = F.filter(
        F.col("_lines"), lambda ln: _line_kept(ln, min_line_words)
    )
    out = base.select(
        id_col,
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).cast("int").alias("n_kept"),
        (F.size("_lines") - F.size(kept)).cast("int").alias("n_dropped"),
        (
            ~F.lower(F.col("_raw")).contains("lorem ipsum")
            & ~F.col("_raw").rlike(r"[{}]")
            & (F.size(kept) >= min_kept_lines)
        ).alias("c4_keep"),
    )
    return out


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    broadcast_hits: bool = True,
) -> DataFrame:
    """Flag documents that link to a blocklisted domain -> the input
    columns + (domain_blocked boolean, blocked_domain string — the
    lexicographically first hit, null when clean). Flag-not-drop like
    ``c4_clean``: callers count/inspect/``filter(~domain_blocked)``
    in the same pass.

    Scale shape: the corpus side is reduced map-side to distinct
    (id, domain) pairs — documents with no URLs (the vast majority)
    produce NO rows and never reach the join; the blocklist
    (lowercased, deduped) is broadcast, so the only exchange is the
    tiny hit aggregation. The hit set (docs linking to a blocked
    domain) is then joined back; with ``broadcast_hits`` (default) it
    is broadcast on the documented assumption that blocked docs are a
    small fraction of the corpus — pass False for adversarial
    corpora to keep a shuffle join instead (the bounded-broadcast
    house pattern, cf. retriever._QDF_BROADCAST_ROWS)."""
    doms = df.select(
        F.col(id_col).alias("_fbd_id"),
        F.explode(
            F.array_distinct(url_domains(F.col(text_col)))
        ).alias("_fbd_dom"),
    )
    bl = (
        blocklist.select(
            F.lower(F.col(domain_col)).alias("_fbd_dom")
        ).dropDuplicates(["_fbd_dom"])
    )
    hits = (
        doms.join(F.broadcast(bl), "_fbd_dom")
        .groupBy("_fbd_id")
        .agg(F.min("_fbd_dom").alias("blocked_domain"))
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    return (
        df.join(hits, F.col(id_col) == F.col("_fbd_id"), "left")
        .drop("_fbd_id")
        .withColumn(
            "domain_blocked", F.col("blocked_domain").isNotNull()
        )
    )
