"""Substring-level exact dedup (operators/span_dedup.py): planted
cross-document boilerplate must be cut from every occurrence while
unique text survives losslessly; behavior is pinned against an exact
Python model of the same token-level semantics.

Recipe under test is public (Lee et al. 2021, arXiv:2107.06499 —
ExactSubstr via fixed-length shingle keys); no reference-repo
counterpart exists.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bm25_chroma_spark.operators.span_dedup import (
    remove_repeated_spans,
    repeated_span_keys,
)

BOILER = (
    "all rights reserved unsubscribe from this newsletter "
    "by clicking the link below"
)  # 12 tokens


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_remove(rows, span_tokens, min_docs):
    """Exact Python model of remove_repeated_spans' token semantics:
    lowercased shingle matching, original-case rebuild, remove-all
    occurrences, df = distinct docs."""
    import re

    toks = {}
    low = {}
    for did, text in rows:
        t = re.sub(r"^\s+|\s+$", "", text)
        toks[did] = re.split(r"\s+", t)
        low[did] = [w.lower() for w in toks[did]]
    df = {}
    for did, words in low.items():
        grams = {
            tuple(words[i : i + span_tokens])
            for i in range(len(words) - span_tokens + 1)
        } if len(words) >= span_tokens and words != [""] else set()
        for g in grams:
            df[g] = df.get(g, 0) + 1
    rep = {g for g, c in df.items() if c >= min_docs}
    out = {}
    for did, text in rows:
        words = low[did]
        covered = set()
        if len(words) >= span_tokens and words != [""]:
            for i in range(len(words) - span_tokens + 1):
                if tuple(words[i : i + span_tokens]) in rep:
                    covered.update(range(i, i + span_tokens))
        if not covered:
            out[did] = (text, 0)
        else:
            kept = [
                w for i, w in enumerate(toks[did]) if i not in covered
            ]
            out[did] = (" ".join(kept), len(covered))
    return out


def test_planted_boilerplate_removed_unique_survives(spark):
    # every token within span_tokens of the boilerplate boundary is
    # doc-specific, so no boundary-crossing shingle can repeat
    uniq = [
        "Unique preamble u%da u%db u%dc u%dd u%de" % (i, i, i, i, i)
        for i in range(6)
    ]
    rows = [
        (i, u + " " + BOILER if i % 2 == 0 else u)
        for i, u in enumerate(uniq)
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(
            _docs_df(spark, rows), span_tokens=5, min_docs=2
        ).collect()
    }
    for i, u in enumerate(uniq):
        if i % 2 == 0:
            # boilerplate gone from EVERY occurrence, unique tokens
            # survive in order with original casing
            assert out[i] == (u, 12), out[i]
        else:
            # untouched docs are byte-identical
            assert out[i] == (u, 0)


def test_unaffected_docs_byte_identical_including_whitespace(spark):
    rows = [
        (0, "  Tabs\tand  odd   spacing survive untouched  "),
        (1, "totally different text with nothing shared at all okay"),
        (2, ""),
        (3, " \t\n "),
    ]
    out = remove_repeated_spans(
        _docs_df(spark, rows), span_tokens=3, min_docs=2
    ).collect()
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in out}
    for did, text in rows:
        assert got[did] == (text, 0)


def test_overlapping_spans_merge_wholesale(spark):
    """A repeated block longer than span_tokens disappears entirely:
    covered positions are the union over all its shingles."""
    block = "one two three four five six seven eight"  # 8 tokens
    rows = [
        (0, "prefix words here " + block + " suffix tail"),
        (1, "other start " + block + " other end"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(
            _docs_df(spark, rows), span_tokens=4, min_docs=2
        ).collect()
    }
    assert out[0] == ("prefix words here suffix tail", 8)
    assert out[1] == ("other start other end", 8)


def test_within_doc_repetition_not_cross_document(spark):
    """A span repeated twice inside ONE doc but in no other doc is
    kept: min_docs counts DISTINCT documents."""
    rows = [
        (0, "echo delta echo delta echo delta echo delta"),
        (1, "nothing shared with the first document at all"),
    ]
    out = {
        r["doc_id"]: r["n_removed"]
        for r in remove_repeated_spans(
            _docs_df(spark, rows), span_tokens=3, min_docs=2
        ).collect()
    }
    assert out == {0: 0, 1: 0}


def test_case_insensitive_match_original_case_rebuild(spark):
    rows = [
        (0, "Keep Me ALL RIGHTS Reserved Unsubscribe Now Thanks"),
        (1, "start all rights reserved unsubscribe now end here"),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(
            _docs_df(spark, rows), span_tokens=5, min_docs=2
        ).collect()
    }
    assert out[0] == "Keep Me Thanks"
    assert out[1] == "start end here"


def test_hashed_and_string_keys_agree(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(20)
    ]
    a = remove_repeated_spans(
        _docs_df(spark, rows), span_tokens=4, min_docs=2,
        hash_grams=True,
    ).collect()
    b = remove_repeated_spans(
        _docs_df(spark, rows), span_tokens=4, min_docs=2,
        hash_grams=False,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matches_python_model_on_random_corpus(spark, seed):
    rng = random.Random(seed)
    vocab = ["red", "blue", "green", "up", "down", "Left", "RIGHT"]
    rows = []
    for i in range(25):
        n = rng.randint(0, 18)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4:
            words += BOILER.split()
        rows.append((i, " ".join(words)))
    span, mind = rng.choice([(3, 2), (4, 2), (5, 3)])
    expect = _py_remove(rows, span, mind)
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(
            _docs_df(spark, rows), span_tokens=span, min_docs=mind
        ).collect()
    }
    assert got == expect


def test_precomputed_keys_reused(spark):
    rows = [
        (0, "shared span alpha beta gamma delta tail one"),
        (1, "shared span alpha beta gamma delta tail two"),
        (2, "completely different content in this document body"),
    ]
    docs = _docs_df(spark, rows)
    keys = repeated_span_keys(docs, span_tokens=4, min_docs=2)
    assert keys.columns == [
        "gram_key", "n_docs", "_span_tokens", "_span_key_ver"
    ]
    via_keys = remove_repeated_spans(
        docs, span_tokens=4, min_docs=2, keys=keys
    ).collect()
    direct = remove_repeated_spans(
        docs, span_tokens=4, min_docs=2
    ).collect()
    assert sorted(map(tuple, via_keys)) == sorted(map(tuple, direct))


def test_validation(spark):
    docs = _docs_df(spark, [(0, "a b c")])
    with pytest.raises(ValueError, match="span_tokens"):
        repeated_span_keys(docs, span_tokens=1)
    with pytest.raises(ValueError, match="min_docs"):
        repeated_span_keys(docs, span_tokens=3, min_docs=1)


def test_plan_has_no_python_udf_and_one_window_free_shape(spark):
    """The rebuild is pure JVM: no BatchEvalPython / ArrowEval in the
    plan, and the discovery aggregate shows a partial_count (map-side
    combine) rather than a distinct expansion."""
    rows = [(i, "w%d " % i + BOILER) for i in range(8)]
    out = remove_repeated_spans(
        _docs_df(spark, rows), span_tokens=5, min_docs=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial_count" in plan


def test_keys_column_validation(spark):
    docs = _docs_df(spark, [(0, "a b c d e f")])
    bad = spark.createDataFrame([("x",)], "gram string")
    with pytest.raises(ValueError, match="gram_key"):
        remove_repeated_spans(docs, span_tokens=3, keys=bad)
    # and param validation applies on the keys path too
    ok = spark.createDataFrame([(1,)], "gram_key long")
    with pytest.raises(ValueError, match="span_tokens"):
        remove_repeated_spans(docs, span_tokens=1, keys=ok)


def test_keys_stamp_validation(spark):
    """A persisted keys frame built under different parameters or an
    older hashed-key function must be REJECTED loudly, not silently
    remove nothing (ADVICE r7): repeated_span_keys stamps
    span_tokens + key version; remove_repeated_spans validates."""
    rows = [
        (0, "shared span alpha beta gamma delta tail one"),
        (1, "shared span alpha beta gamma delta tail two"),
    ]
    docs = _docs_df(spark, rows)
    keys4 = repeated_span_keys(docs, span_tokens=4, min_docs=2)
    # wrong span_tokens at use time
    with pytest.raises(ValueError, match="span_tokens=4"):
        remove_repeated_spans(docs, span_tokens=5, keys=keys4)
    # unstamped frame (e.g. hand-built, or a pre-r8 persisted one)
    with pytest.raises(ValueError, match="stamp column"):
        remove_repeated_spans(
            docs, span_tokens=4,
            keys=keys4.select("gram_key", "n_docs"),
        )
    # stale key-function version
    stale = keys4.withColumn("_span_key_ver", F.lit(0))
    with pytest.raises(ValueError, match="version"):
        remove_repeated_spans(docs, span_tokens=4, keys=stale)
    # round-trip through parquet (the real persisted-reuse shape)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        keys4.write.mode("overwrite").parquet(f"{d}/keys")
        reloaded = spark.read.parquet(f"{d}/keys")
        via = remove_repeated_spans(
            docs, span_tokens=4, min_docs=2, keys=reloaded
        ).collect()
        direct = remove_repeated_spans(
            docs, span_tokens=4, min_docs=2
        ).collect()
        assert sorted(map(tuple, via)) == sorted(map(tuple, direct))


def test_unique_ids_false_counts_distinct_docs(spark):
    """A document duplicated under the SAME id (pre-dedup unions)
    must not self-promote its spans to 'cross-document' when the
    caller declares duplicate rows possible."""
    rows = [
        (0, "solo span alpha beta gamma delta only here"),
        (0, "solo span alpha beta gamma delta only here"),
        (1, "unrelated text body with different words entirely"),
    ]
    docs = _docs_df(spark, rows)
    # default fast path treats rows as docs: df=2 -> removed
    fast = {
        (r["doc_id"], r["n_removed"])
        for r in remove_repeated_spans(
            docs, span_tokens=4, min_docs=2
        ).collect()
    }
    assert (0, 8) in fast
    # distinct-id counting keeps it: one DISTINCT doc only
    strict = {
        r["n_removed"]
        for r in remove_repeated_spans(
            docs, span_tokens=4, min_docs=2, unique_ids=False
        ).collect()
    }
    assert strict == {0}


def test_repeated_span_keys_text_only_frame(spark):
    """The default fast path never references the id column, so key
    discovery works on a text-only frame (review r7); distinct-id
    counting is the mode that requires ids."""
    docs = spark.createDataFrame(
        [("shared span alpha beta gamma tail one",),
         ("shared span alpha beta gamma tail two",)],
        "text string",
    )
    keys = repeated_span_keys(docs, span_tokens=4, min_docs=2)
    assert keys.count() > 0
    with pytest.raises(Exception):
        repeated_span_keys(
            docs, span_tokens=4, min_docs=2, unique_ids=False
        ).collect()


def test_remove_spans_passes_extra_columns_through(spark):
    """Non-(id, text) input columns survive the pass unchanged (an
    upstream blocklist flag must ride the prep_corpus staged parquet
    through --dedup-spans)."""
    rows = [
        (1, f"unique one u1a u1b {BOILER}", True),
        (2, f"{BOILER} unique two u2a", False),
        (3, "nothing shared here at all today", True),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, flag boolean"
    )
    out = remove_repeated_spans(docs, span_tokens=6, min_docs=2)
    assert out.columns == ["doc_id", "text", "n_removed", "flag"]
    got = {r["doc_id"]: r["flag"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_one_scan_staged_positions_matches_default(spark, tmp_path):
    """positions_path (the one-scan shape prep_corpus and bench use)
    must produce exactly the default two-scan result, including
    passthrough columns, and leave the staged parquet for the caller
    to delete."""
    rows = [
        (1, f"unique one u1a u1b {BOILER}"),
        (2, f"{BOILER} unique two u2a"),
        (3, "nothing shared here at all today"),
        (4, f"prefix words {BOILER} suffix words"),
    ]
    docs = _docs_df(spark, rows)
    default = remove_repeated_spans(docs, span_tokens=6, min_docs=2)
    staged = remove_repeated_spans(
        docs, span_tokens=6, min_docs=2,
        positions_path=str(tmp_path / "pos"),
    )
    assert sorted(map(tuple, staged.collect())) == sorted(
        map(tuple, default.collect())
    )
    assert (tmp_path / "pos").exists()  # caller-owned scratch
    # string-key variant stages too
    staged_s = remove_repeated_spans(
        docs, span_tokens=6, min_docs=2, hash_grams=False,
        positions_path=str(tmp_path / "pos_s"),
    )
    assert sorted(map(tuple, staged_s.collect())) == sorted(
        map(tuple, default.collect())
    )
