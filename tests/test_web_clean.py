"""C4-style cleaning + URL extraction (functions/web_clean.py),
pinned against the published rule set (Raffel et al. 2020 §2.2) and
an exact Python model."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.web_clean import (
    HTML_STRIP_STEPS,
    c4_clean,
    c4_signals,
    extract_urls,
    filter_blocked_domains,
    strip_html,
    url_domains,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_c4(text, min_line_words=3, min_kept_lines=5):
    lines = [
        re.sub(r"^\s+|\s+$", "", ln) for ln in text.split("\n")
    ]
    lines = [ln for ln in lines if ln]
    kept = [
        ln
        for ln in lines
        if re.search(r'[.!?]["”’]?$|["”’]$', ln)
        and len(re.split(r"\s+", ln)) >= min_line_words
        and not re.search(r"\bjavascript\b", ln.lower())
    ]
    keep = (
        "lorem ipsum" not in text.lower()
        and not re.search(r"[{}]", text)
        and len(kept) >= min_kept_lines
    )
    return "\n".join(kept), len(kept), len(lines) - len(kept), keep


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This sentence ends properly.",          # kept
            "short.",                                # < 3 words
            "no terminal punctuation at all",        # no terminal
            "Does a question mark count?",           # kept
            "An exclamation works too!",             # kept
            'He said it ends with a quote."',        # kept (quote)
            "Enable javascript to view this page.",  # javascript
            "  \tWhitespace   padded line stays.  ", # kept (stripped)
            "",                                      # blank
        ]
    )
    out = c4_clean(_df(spark, [(1, text)]), min_kept_lines=3).collect()[0]
    want_text, want_kept, want_dropped, want_keep = _py_c4(
        text, min_kept_lines=3
    )
    assert out["text"] == want_text
    assert out["n_kept"] == want_kept == 5
    assert out["n_dropped"] == want_dropped == 3
    assert out["c4_keep"] is True


def test_c4_document_rules(spark):
    good = "\n".join(
        f"Perfectly fine sentence number {i}." for i in range(6)
    )
    rows = [
        (0, good),
        (1, good + "\nAnd some Lorem Ipsum dolor text."),
        (2, good + "\nfunction() { return 1; }"),
        (3, "Only one good sentence here."),
        # C4 discards on EITHER bracket — a closing brace alone
        # (template debris, truncated code) kills the page too
        (4, good + "\nclosing bracket } alone."),
    ]
    out = {
        r["doc_id"]: r["c4_keep"]
        for r in c4_clean(_df(spark, rows)).collect()
    }
    assert out == {0: True, 1: False, 2: False, 3: False, 4: False}


def test_c4_signals_matches_clean(spark):
    text = "Good line one.\nbad\nAnother good line two.\n{x}"
    row = (
        _df(spark, [(1, text)])
        .select(c4_signals(F.col("text")).alias("s"))
        .collect()[0]["s"]
    )
    assert row["n_lines"] == 4
    assert row["n_kept"] == 2
    assert row["has_lorem"] is False
    assert row["has_brace"] is True


@pytest.mark.parametrize("seed", [1, 2])
def test_c4_matches_python_model_random(spark, seed):
    rng = random.Random(seed)
    pieces = [
        "A good solid sentence.",
        "short.",
        "no punct line here",
        "Ends with bang!",
        "javascript heavy page.",
        "lorem ipsum block.",
        "brace { line",
        "closing } only",
        "Tail line with question?",
        "",
        "   padded okay line.   ",
    ]
    rows = []
    for i in range(30):
        n = rng.randint(0, 8)
        rows.append(
            (i, "\n".join(rng.choice(pieces) for _ in range(n)))
        )
    got = {
        r["doc_id"]: (
            r["text"], r["n_kept"], r["n_dropped"], r["c4_keep"]
        )
        for r in c4_clean(_df(spark, rows), min_kept_lines=2).collect()
    }
    for i, text in rows:
        assert got[i] == _py_c4(text, min_kept_lines=2), (i, text)


def test_url_extraction_and_domains(spark):
    text = (
        "see https://Example.COM/page?x=1 and http://sub.test.org/p, "
        "plus https://dup.net and https://dup.net/again "
        "but not ftp://old.school or plain example.com"
    )
    row = (
        _df(spark, [(1, text)])
        .select(
            extract_urls(F.col("text")).alias("u"),
            url_domains(F.col("text")).alias("d"),
        )
        .collect()[0]
    )
    assert row["u"] == [
        "https://Example.COM/page?x=1",
        "http://sub.test.org/p,",
        "https://dup.net",
        "https://dup.net/again",
    ]
    assert row["d"] == [
        "example.com", "sub.test.org", "dup.net", "dup.net"
    ]


SAMPLE_HTML = (
    "<!DOCTYPE html><html><head><title>Doc 7 heading.</title>"
    '<style type="text/css">body { color: red; }</style>'
    "<script>var x = 1 && 2; // <b>not bold</b></script>"
    "</head><body><!-- hidden comment --><h1>Title 7 stands here.</h1>"
    "<p>First &amp; second &lt;tag&gt; &quot;quoted&quot; words.</p>"
    "<p>Some fixture word soup text lives here.</p>"
    "<br>Line after break.&nbsp;Extra&#39;s done. &amp;lt; stays."
    "</body></html>"
)


def _py_strip_html(text):
    out = text
    for pat, rep in HTML_STRIP_STEPS:
        out = re.sub(pat, rep, out)
    return out


def test_strip_html_matches_python_model(spark):
    """The Spark (Java-regex) chain produces exactly what the Python
    re model of the same step table produces — the DuckDB oracle runs
    this same table through RE2, so a three-way agreement pins the
    common-subset patterns."""
    got = (
        _df(spark, [(1, SAMPLE_HTML)])
        .select(strip_html(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    want = _py_strip_html(SAMPLE_HTML)
    assert got == want
    # spot semantics: script/style/comment gone, entities unescaped
    # exactly once, block tags became line breaks
    assert "color: red" not in got and "var x" not in got
    assert "hidden comment" not in got
    assert 'First & second <tag> "quoted" words.' in got
    assert "&lt; stays" in got  # double-escaped stays single-escaped
    assert got.startswith("Doc 7 heading.\n")


def test_strip_html_composes_with_c4(spark):
    """strip_html -> c4_clean keeps a page whose only braces live in
    a <style> block (removed before the document rule fires), while
    raw markup fails both the brace and terminal-punctuation rules."""
    stripped = c4_clean(
        _df(spark, [(1, SAMPLE_HTML)]).select(
            "doc_id", strip_html(F.col("text")).alias("text")
        ),
        min_kept_lines=3,
    ).collect()[0]
    assert stripped["c4_keep"] is True
    assert stripped["n_kept"] >= 3
    raw = c4_clean(
        _df(spark, [(1, SAMPLE_HTML)]), min_kept_lines=3
    ).collect()[0]
    assert raw["c4_keep"] is False  # style-block brace kills raw


def test_strip_html_plan_is_narrow(spark):
    plan = (
        _df(spark, [(1, SAMPLE_HTML)])
        .select(strip_html(F.col("text")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_filter_blocked_domains(spark):
    docs = _df(
        spark,
        [
            (0, "no links at all here"),
            (1, "see https://GOOD.example.org/x fine"),
            (2, "ads at https://Ads.Tracker.NET/pixel and more"),
            (3, "both https://good.example.org/a http://ads.tracker.net/b"),
            (4, "dup https://spam.co https://spam.co/again"),
        ],
    )
    bl = spark.createDataFrame(
        [("ADS.TRACKER.NET",), ("spam.co",), ("unused.example",)],
        "domain string",
    )
    out = {
        r["doc_id"]: (r["domain_blocked"], r["blocked_domain"])
        for r in filter_blocked_domains(docs, bl).collect()
    }
    assert out == {
        0: (False, None),
        1: (False, None),
        2: (True, "ads.tracker.net"),
        3: (True, "ads.tracker.net"),
        4: (True, "spam.co"),
    }
    # text column unchanged, flag-not-drop: all rows survive
    assert len(out) == 5


def test_filter_blocked_domains_plan(spark):
    """Both joins broadcast (blocklist in; hit set back out) — the
    corpus never shuffles; adversarial mode keeps a shuffle join."""
    docs = _df(spark, [(1, "x https://a.b/c")])
    bl = spark.createDataFrame([("a.b",)], "domain string")
    plan = (
        filter_blocked_domains(docs, bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    rows = filter_blocked_domains(
        docs, bl, broadcast_hits=False
    ).collect()
    assert rows[0]["domain_blocked"] is True


def test_c4_validation_and_plan(spark):
    docs = _df(spark, [(1, "A line that is fine.")])
    with pytest.raises(ValueError, match="min_line_words"):
        c4_clean(docs, min_line_words=0)
    plan = (
        c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # narrow map-side pass, no shuffle
