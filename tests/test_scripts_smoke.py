"""Out-of-the-box smoke for the spark-submit entry points: the
DEFAULT config of scripts/build_index.py must produce an index whose
query path accepts hot terms (VERDICT r2 #3: the old default shipped
max_postings=5000, which the pre-r3 guard refused the moment a
queried term's df exceeded the cap). Runs both mains in-process
against a synthetic corpus with a genuinely hot term."""

from __future__ import annotations

import sys


def _run_main(mod_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    mod_main()


def test_build_then_query_defaults_hot_term(spark, tmp_path, monkeypatch):
    import scripts.build_index as build_mod
    import scripts.query_index as query_mod

    # 1500 docs all containing 'hot' (df 1500 — binds both reference
    # caps), ids via the production default xxhash64 id-expr
    src = str(tmp_path / "corpus.parquet")
    spark.range(1500).selectExpr(
        "concat('r', id) as repo",
        "concat('p', id, '.py') as path",
        "'c0' as commit",
        "'py' as lang",
        "concat('hot common def parser', id % 7, ' return') as content",
    ).write.parquet(src)

    out = str(tmp_path / "idx")
    _run_main(
        build_mod.main,
        [
            "build_index.py", "--corpus", src, "--out", out,
            "--buckets", "4", "--segments", "2", "--groups", "2",
        ],
        monkeypatch,
    )

    # default-config query path accepts the hot term (no cap refusal)
    for strategy in ("auto", "exhaustive", "wand"):
        _run_main(
            query_mod.main,
            [
                "query_index.py", "--index", out, "--top-k", "5",
                "--strategy", strategy, "hot parser3",
            ],
            monkeypatch,
        )

    # and the index really is lossless: stored df == true df
    import json
    from pathlib import Path

    stats = json.loads((Path(out) / "stats.json").read_text())
    assert stats["config"]["max_postings_per_term"] is None
    assert stats["config"]["query_postings_cap"] is None
    from pyspark.sql import functions as F

    from bm25_chroma_spark.index.shards import ShardedIndex

    idx = ShardedIndex(spark, out)
    df_hot = (
        idx.shards_for_terms(["hot"])
        .agg(F.sum("df").alias("df"))
        .collect()[0]["df"]
    )
    assert df_hot == 1500


def test_dedup_corpus_pipeline(spark, tmp_path, monkeypatch):
    """scripts/dedup_corpus.py end-to-end: exact dups collapse, LSH +
    Jaccard near-dups cluster to one survivor, distinct docs stay, and
    the JSON report is consistent with the written output."""
    import json

    import scripts.dedup_corpus as dd

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
    )
    rows = [
        (1, base + "alpha beta gamma delta"),
        (2, base + "alpha beta gamma delta"),        # exact dup of 1
        (3, base + "alpha beta gamma epsilon"),      # near-dup of 1
        (4, "completely different content about spark joins"),
        (5, "another unrelated document on varint posting lists"),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    out = str(tmp_path / "deduped.parquet")
    rpt = str(tmp_path / "report.json")

    monkeypatch.setattr(
        __import__("sys"),
        "argv",
        [
            "dedup_corpus.py", "--input", src, "--output", out,
            "--report", rpt, "--method", "minhash",
            "--threshold", "0.6",
        ],
    )
    dd.main()

    report = json.loads(open(rpt).read())
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 4, 5}  # 2 exact-dropped, 3 clustered into 1
    assert report["input_docs"] == 5
    assert report["after_exact"] == 4
    assert report["survivors"] == 3
    assert report["removed_exact"] == 1
    assert report["removed_near"] == 1


def test_ann_index_build_then_query(spark, tmp_path, monkeypatch, capsys):
    """scripts/ann_index.py: build trains + materializes the
    cell-partitioned store with persisted centroids; query returns the
    queried id itself as the top hit (self-similarity 1.0)."""
    import json
    import sys

    import scripts.ann_index as ai

    store = str(tmp_path / "ivf")
    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "build",
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--out", store, "--cells", "8", "--train-iters", "2",
    ])
    ai.main()
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["vectors"] == 500 and built["cells"] == 8
    assert (tmp_path / "ivf" / "centroids.json").exists()

    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "query", "--store", store,
        "--vec-id", "3", "--k", "5", "--nprobe", "4",
    ])
    ai.main()
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    top = res["results"]["0"][0]
    assert top["vec_id"] == 3 and top["dist"] < 1e-9


def test_prep_corpus_pipeline(spark, tmp_path, monkeypatch):
    """scripts/prep_corpus.py end-to-end: annotate -> redact ->
    filter (per-rule drop counts) -> decontaminate -> split, written
    partitioned by split, with a consistent JSON report."""
    import json
    import sys

    import scripts.prep_corpus as pc

    good = (
        "the quick brown fox is one of the many animals that it "
        "jumps over for the fun of it in the story "
    )
    rows = [
        (1, good + "alpha beta gamma delta epsilon zeta"),
        (2, good + "omega psi chi phi upsilon tau contact "
            "bob@example.com today"),
        (3, "x " * 3),                     # too few tokens
        (4, "spam spam spam spam spam spam spam spam spam spam "
            "spam spam spam spam spam spam spam spam spam spam"),
        (5, good + "shared span kappa lambda mu nu xi omicron pi "
            "rho sigma"),                  # contaminated (see bench)
    ]
    bench_rows = [
        (100, "totally different preamble shared span kappa lambda "
              "mu nu xi omicron pi rho sigma closing words here"),
    ]
    src = str(tmp_path / "docs.parquet")
    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    spark.createDataFrame(
        bench_rows, "doc_id long, text string"
    ).write.parquet(bench)
    out = str(tmp_path / "prepped")
    rpt = str(tmp_path / "prep_report.json")

    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--benchmark", bench, "--decon-n", "8",
        "--min-tokens", "5", "--max-top2-frac", "0.5",
        "--weights", "train=0.5,val=0.25,test=0.25", "--salt", "s",
    ])
    pc.main()

    report = json.loads(open(rpt).read())
    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.collect()}
    # 3 dropped by min_tokens, 4 by the top-2-gram rule ("spam spam"
    # is every 2-gram), 5 by decontamination -> 1 and 2 survive
    assert ids == {1, 2}
    assert report["input_docs"] == 5
    assert report["dropped_min_tokens"] == 1
    # rule counts are independent, not exclusive: doc 3's only
    # 2-gram ("x x") also repeats, so it fails top2 AND min_tokens
    assert report["dropped_top2"] == 2
    assert report["dropped_contaminated"] == 1
    assert report["output_docs"] == 2
    assert sum(report["splits"].values()) == 2
    # PII was counted and redacted
    assert report["pii_emails"] == 1
    texts = {r["doc_id"]: r["text"] for r in got.collect()}
    assert "bob@example.com" not in texts[2]
    assert "<EMAIL>" in texts[2]
    # split column is a partition column readers can prune on
    assert "split" in got.columns


def test_prep_corpus_dedup_spans(spark, tmp_path, monkeypatch):
    """--dedup-spans runs repeated-span removal before annotation:
    planted boilerplate is cut from every doc, the removed-token
    count rides the report, and the n_removed helper column does not
    leak into the output."""
    import json
    import sys

    import scripts.prep_corpus as pc

    boiler = (
        "all rights reserved unsubscribe from this newsletter "
        "by clicking the link below"
    )  # 12 tokens
    rows = [
        (1, "unique one u1a u1b u1c u1d u1e " + boiler),
        (2, "unique two u2a u2b u2c u2d u2e " + boiler),
        (3, "another entirely different document body with plenty "
            "of words to pass the filters here"),
    ]
    src = str(tmp_path / "sdocs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    out = str(tmp_path / "sprepped")
    rpt = str(tmp_path / "sreport.json")
    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--dedup-spans", "6", "--salt", "s",
    ])
    pc.main()

    report = json.loads(open(rpt).read())
    assert report["span_tokens_removed"] == 24  # 12 tokens x 2 docs
    # the corpus-sized staged copy is deleted by default
    import os
    assert not os.path.exists(out + "_spandedup")
    assert "span_staged_path" not in report
    got = spark.read.parquet(out)
    assert "n_removed" not in got.columns
    texts = {r["doc_id"]: r["text"] for r in got.collect()}
    assert set(texts) == {1, 2, 3}
    assert "unsubscribe" not in texts[1] and "unsubscribe" not in texts[2]
    assert texts[1].startswith("unique one u1a")
    assert texts[3] == rows[2][1]  # untouched doc byte-identical


def test_prep_corpus_c4_rule(spark, tmp_path, monkeypatch):
    """--c4-min-lines adds the C4 document rules to the filter
    battery: lorem-ipsum/brace/thin docs drop with a counted
    reason."""
    import json
    import sys

    import scripts.prep_corpus as pc

    good = "\n".join(
        f"A perfectly fine sentence number {i} here." for i in range(4)
    )
    rows = [
        (1, good),
        (2, good + "\nsome lorem ipsum filler text."),
        (3, good + "\ncode sample { inline }"),
        (4, "Just one good sentence."),
    ]
    src = str(tmp_path / "c4docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    out = str(tmp_path / "c4prepped")
    rpt = str(tmp_path / "c4report.json")
    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--c4-min-lines", "3", "--salt", "s",
    ])
    pc.main()
    report = json.loads(open(rpt).read())
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {1}
    assert report["dropped_c4"] == 3


def test_prep_corpus_c4_rule_uses_raw_text(spark, tmp_path, monkeypatch):
    """The C4 rule must read RAW text like every other annotate
    signal: a qualifying line whose word count only drops below the
    minimum after PII redaction ('Phone 555 123 4567.' -> 'Phone
    <PHONE>.') must still count as kept (review r7)."""
    import json
    import sys

    import scripts.prep_corpus as pc

    rows = [
        (1, "A good first sentence here.\n"
            "A good second sentence too.\n"
            "Phone 555 123 4567."),
    ]
    src = str(tmp_path / "c4raw.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    out = str(tmp_path / "c4rawout")
    rpt = str(tmp_path / "c4rawrpt.json")
    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--c4-min-lines", "3", "--salt", "s",
    ])
    pc.main()
    report = json.loads(open(rpt).read())
    assert report["dropped_c4"] == 0
    got = spark.read.parquet(out)
    assert got.count() == 1
    assert "_c4" not in got.columns
    # and the output text IS redacted
    assert "<PHONE>" in got.collect()[0]["text"]


def test_prep_corpus_strip_html_and_blocklist(spark, tmp_path, monkeypatch):
    """--strip-html extracts prose before annotation; --blocklist
    drops docs linking to a blocked domain with a counted reason,
    read from the RAW text (the href URL only exists pre-strip)."""
    import json
    import sys

    import scripts.prep_corpus as pc

    rows = [
        (1, '<html><body><p>Fine sentence one here today.</p>'
            '<a href="https://Bad.Tracker.example/x">click</a>'
            '</body></html>'),
        (2, '<p>Fine sentence two here today.</p>'
            '<a href="https://ok.example/y">link</a>'),
        (3, "Plain text sentence three here today."),
    ]
    src = str(tmp_path / "htmldocs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    blp = str(tmp_path / "blocklist.parquet")
    spark.createDataFrame(
        [("bad.tracker.example",), ("other.blocked",)], "domain string"
    ).write.parquet(blp)
    out = str(tmp_path / "htmlprepped")
    rpt = str(tmp_path / "htmlreport.json")
    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--strip-html", "--blocklist", blp,
        "--salt", "s",
    ])
    pc.main()
    report = json.loads(open(rpt).read())
    assert report["dropped_blocked_domain"] == 1
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {2, 3}
    assert "<p>" not in got[2] and "href" not in got[2]
    assert "Fine sentence two here today." in got[2]
    assert "domain_blocked" not in spark.read.parquet(out).columns


def test_prep_corpus_mix_and_shards(spark, tmp_path, monkeypatch):
    """--mix-rates drops per-group with a counted report entry riding
    the write; --shards partitions the output by (split, shard_id)
    with the deterministic md5 assignment."""
    import hashlib
    import json
    import sys

    import scripts.prep_corpus as pc

    en = ("the quick fox and the dog is one of many that it has "
          "for you in this story today ")
    und = ("zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj "
           "ii hh gg ff ee dd cc ")
    rows = [(i, en + f"tail{i} extra words here") for i in range(10)]
    rows += [(100 + i, und + f"t{i} more filler body") for i in range(10)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "mixed")
    rpt = str(tmp_path / "mix_report.json")
    monkeypatch.setattr(sys, "argv", [
        "prep_corpus.py", "--input", src, "--output", out,
        "--report", rpt, "--mix-rates", "en=1.0,und=0.0",
        "--mix-salt", "m", "--shards", "2", "--shard-salt", "w",
        "--weights", "train=1.0", "--salt", "s",
    ])
    pc.main()

    report = json.loads(open(rpt).read())
    assert report["input_docs"] == 20
    assert report["dropped_mix"] == 10          # every 'und' doc
    assert report["output_docs"] == 10
    got = spark.read.parquet(out)
    assert {r["lang_pred"] for r in got.select("lang_pred").collect()} \
        == {"en"}
    # shard ids match the deterministic md5 model, and the report map
    # agrees with what landed
    by_shard = {}
    for r in got.select("doc_id", "shard_id").collect():
        h = hashlib.md5(f"{r['doc_id']}w".encode()).hexdigest()
        assert r["shard_id"] == int(h[:8], 16) % 2
        by_shard[r["shard_id"]] = by_shard.get(r["shard_id"], 0) + 1
    assert report["shard_docs"] == {
        str(k): v for k, v in by_shard.items()
    }
    assert "shard_id" in got.columns and "split" in got.columns


def test_lm_score_corpus_cli(spark, tmp_path, monkeypatch):
    """scripts/lm_score_corpus.py: train on --ref, score the corpus,
    bucket, and report — fluent text outscores gibberish."""
    import json
    import sys

    import scripts.lm_score_corpus as ls

    fluent = "the cat sat on the mat and the dog ran to the cat "
    ref_rows = [(i, fluent) for i in range(20)]
    corpus_rows = [
        (0, fluent),
        (1, fluent + "and the dog sat on the mat"),
        (2, "qq ww ee rr tt yy uu ii oo pp"),   # all OOV
        (3, "   "),                              # blank -> NULL score
    ]
    src = str(tmp_path / "corpus.parquet")
    refp = str(tmp_path / "ref.parquet")
    spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    ).write.parquet(src)
    spark.createDataFrame(
        ref_rows, "doc_id long, text string"
    ).write.parquet(refp)
    out = str(tmp_path / "scores")
    rpt = str(tmp_path / "lm_report.json")
    monkeypatch.setattr(sys, "argv", [
        "lm_score_corpus.py", "--input", src, "--ref", refp,
        "--output", out, "--report", rpt, "--min-count", "2",
        "--buckets", "2",
    ])
    ls.main()

    report = json.loads(open(rpt).read())
    assert report["scored_docs"] == 4
    assert report["train_tokens"] == 20 * len(fluent.split())
    assert report["vocab_size"] > 0 and report["bigrams"] > 0
    assert sum(report["bucket_docs"].values()) >= 3  # NULL may be absent
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[0]["avg_logprob"] > rows[2]["avg_logprob"]
    assert rows[3]["avg_logprob"] is None and rows[3]["n_tokens"] == 0
    assert rows[0]["lm_bucket"] == 0        # head bucket
    assert rows[2]["lm_bucket"] == 1        # tail
    assert rows[3]["lm_bucket"] is None


def test_quality_clf_corpus_cli(spark, tmp_path, monkeypatch):
    """scripts/quality_clf_corpus.py: train on --pos vs the corpus,
    score, bucket, and report — curated-like text outscores spam."""
    import json
    import sys

    import scripts.quality_clf_corpus as qc

    curated = "the article explains the theorem with cited sources "
    # each spam word appears twice so it survives --min-count 2 and
    # scores BELOW the smoothed OOV floor (negative evidence beats
    # no evidence); doc2's all-OOV floor then sits between spam and
    # curated, making the 2-bucket cut deterministic
    spam = "click click buy buy cheap cheap pills pills win win "
    pos_rows = [(i, curated) for i in range(10)]
    corpus_rows = [
        (0, curated + "and the proof"),
        (1, spam),
        (2, "zz qq ww"),   # all OOV -> constant smoothed floor
        (3, None),          # NULL -> n_tokens 0, NULL score
    ]
    src = str(tmp_path / "corpus.parquet")
    posp = str(tmp_path / "pos.parquet")
    spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    ).write.parquet(src)
    spark.createDataFrame(
        pos_rows, "doc_id long, text string"
    ).write.parquet(posp)
    out = str(tmp_path / "q_scores")
    rpt = str(tmp_path / "q_report.json")
    monkeypatch.setattr(sys, "argv", [
        "quality_clf_corpus.py", "--input", src, "--pos", posp,
        "--output", out, "--report", rpt, "--min-count", "2",
        "--buckets", "2",
    ])
    qc.main()

    report = json.loads(open(rpt).read())
    assert report["scored_docs"] == 4
    assert report["pos_tokens"] == 10 * len(curated.split())
    assert report["vocab_size"] > 0 and report["model_terms"] > 0
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[0]["quality_logodds"] > rows[1]["quality_logodds"]
    assert rows[3]["quality_logodds"] is None and rows[3]["n_tokens"] == 0
    assert rows[0]["q_bucket"] == 0         # head bucket
    assert rows[1]["q_bucket"] == 1         # tail
    assert rows[3]["q_bucket"] is None
