"""C4-style cleaning + URL extraction (functions/web_clean.py),
pinned against the published rule set (Raffel et al. 2020 §2.2) and
an exact Python model."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.functions.web_clean import (
    c4_clean,
    c4_signals,
    extract_urls,
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
        and "{" not in text
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
    ]
    out = {
        r["doc_id"]: r["c4_keep"]
        for r in c4_clean(_df(spark, rows)).collect()
    }
    assert out == {0: True, 1: False, 2: False, 3: False}


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


def test_c4_validation_and_plan(spark):
    docs = _df(spark, [(1, "A line that is fine.")])
    with pytest.raises(ValueError, match="min_line_words"):
        c4_clean(docs, min_line_words=0)
    plan = (
        c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # narrow map-side pass, no shuffle
