"""HTML stripping, C4 line filtering, and corpus-level line dedup
(operators/text.py additions)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import text as T


def _one(spark, text, fn):
    df = spark.createDataFrame([Row(text=text)], schema="text string")
    return df.select(fn(F.col("text")).alias("o")).first()["o"]


def test_strip_html_basic(spark):
    html = (
        "<html><head><style>body{color:red}</style>"
        "<script>var x = 1;</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; welcome.</p>"
        "<div>Second&nbsp;line.</div><!-- note --></body></html>"
    )
    out = _one(spark, html, T.strip_html)
    assert "script" not in out and "var x" not in out and "color:red" not in out
    assert "<" not in out and ">" not in out.replace("&gt;", "")
    lines = [l.strip() for l in out.split("\n") if l.strip()]
    assert lines == ["Title", "Hello & welcome.", "Second line."]


def test_strip_html_malformed_degrades_to_text(spark):
    out = _one(spark, "no markup at all, 3 < 5 but x > y", T.strip_html)
    assert "no markup at all" in out


def test_c4_line_filter(spark):
    doc = "\n".join(
        [
            "This is a proper sentence with enough words.",
            "short line.",                       # < 3 words
            "No terminal punctuation here at all",
            "Enable javascript to continue.",    # banned word
            "function() { return 1; }",          # braces
            "We use lorem ipsum filler text sometimes.",  # banned phrase
            "Another good line survives the filter!",
        ]
    )
    out = _one(spark, doc, T.c4_line_filter)
    assert out.split("\n") == [
        "This is a proper sentence with enough words.",
        "Another good line survives the filter!",
    ]
    # all-bad document → empty string
    assert _one(spark, "tiny.", T.c4_line_filter) == ""


def test_dedup_lines_across_corpus(spark):
    boiler = "subscribe to our newsletter for updates"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique first line one\n{boiler}\nclosing line one here"),
            Row(doc_id=2, text=f"{boiler}\nunique second line two"),
            Row(doc_id=3, text=f"unique third line three\n{boiler}"),
            Row(doc_id=4, text="entirely unique document four"),
            Row(doc_id=5, text=f"{boiler}"),
        ]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in T.dedup_lines_across_corpus(docs, max_occurrences=1).collect()
    }
    assert out[1] == "unique first line one\nclosing line one here"
    assert out[2] == "unique second line two"
    assert out[3] == "unique third line three"
    assert out[4] == "entirely unique document four"
    assert out[5] == ""  # every line was boilerplate
    # schema and row count preserved
    assert set(out) == {1, 2, 3, 4, 5}


def test_dedup_lines_short_lines_exempt_and_within_doc_once(spark):
    docs = spark.createDataFrame(
        [
            # "- item" is short (< 10 chars): repeated everywhere, exempt
            Row(doc_id=1, text="- item\na sufficiently long repeated line\na sufficiently long repeated line"),
            Row(doc_id=2, text="- item\nsomething entirely different here"),
        ]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in T.dedup_lines_across_corpus(docs, max_occurrences=1).collect()
    }
    # within-doc repetition counts ONCE → not corpus-boilerplate; the
    # short bullet survives in both docs
    assert out[1].split("\n") == [
        "- item",
        "a sufficiently long repeated line",
        "a sufficiently long repeated line",
    ]
    assert out[2].split("\n") == ["- item", "something entirely different here"]


def test_dedup_lines_threshold(spark):
    line = "a repeated but acceptable disclaimer line"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"{line}\nunique tail {i} padded out") for i in range(1, 4)]
    )
    # max_occurrences=3: appears in exactly 3 docs → kept
    out3 = T.dedup_lines_across_corpus(docs, max_occurrences=3)
    assert all(line in r["text"] for r in out3.collect())
    # max_occurrences=2: 3 > 2 → removed everywhere
    out2 = T.dedup_lines_across_corpus(docs, max_occurrences=2)
    assert all(line not in r["text"] for r in out2.collect())


def test_curate_documents_cleanup_gates(spark):
    from pyspark.sql import Row
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    boiler = "subscribe to our newsletter for updates today."
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=(
                    f"<p>A perfectly reasonable opening sentence number {i} here.</p>"
                    f"<p>{boiler}</p>"
                    "<script>nav()</script>"
                    f"<p>Another unique closing thought for document {i} follows.</p>"
                ),
            )
            for i in range(1, 5)
        ]
        + [Row(doc_id=99, text="<div><script>only_code()</script></div>")]
    )
    out = pipelines.curate_documents(
        docs,
        html=True,
        c4_clean=True,
        max_line_occurrences=1,
        chunk_tokens=8,
        overlap=0,
        token_budget=64,
    )
    text_cols = [c for c in out.columns if "text" in c]
    assert text_cols, out.columns
    texts = " ".join(
        " ".join(str(r[c]) for c in text_cols) for r in out.collect()
    )
    # boilerplate line is gone, scripts are gone, unique content survives
    assert "subscribe to our newsletter" not in texts
    assert "nav()" not in texts and "only_code" not in texts
    assert "reasonable opening sentence" in texts


def test_remove_duplicate_spans_exactsubstr(spark):
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    para = " ".join(f"w{i}" for i in range(12))  # a 12-token span
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha beta {para} gamma delta"),
            Row(doc_id=2, text=f"{para} something else entirely here"),
            Row(doc_id=3, text="no duplication in this document at all"),
            Row(doc_id=4, text="short doc"),
        ]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, span_tokens=12).collect()
    }
    # first occurrence (doc 1, smallest (doc,pos)) keeps the paragraph
    assert para in out[1]
    assert out[1] == f"alpha beta {para} gamma delta"
    # the later occurrence is excised, surrounding text intact
    assert "w0" not in out[2] and "w11" not in out[2]
    assert out[2] == "something else entirely here"
    # untouched docs pass through verbatim
    assert out[3] == "no duplication in this document at all"
    assert out[4] == "short doc"


def test_remove_duplicate_spans_within_doc_and_long_runs(spark):
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    para = " ".join(f"x{i}" for i in range(10))
    # the same 10-token paragraph twice inside ONE document
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=f"{para} middle words here {para} tail")]
    )
    [r] = remove_duplicate_spans(docs, span_tokens=10).collect()
    toks = r["text"].split()
    # exactly one copy survives plus the unique text
    assert toks.count("x0") == 1 and toks.count("x9") == 1
    assert "middle" in toks and "tail" in toks
    # determinism
    [r2] = remove_duplicate_spans(docs, span_tokens=10).collect()
    assert r2["text"] == r["text"]


def test_remove_duplicate_spans_hot_key_boilerplate(spark):
    """One boilerplate paragraph planted in EVERY document (the 100 TB
    failure shape: a license header in millions of docs).  Keeper
    selection must be an aggregate, not a window over the span hash —
    and exactly one global-first occurrence survives."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"unique{i} opener {boiler} unique{i} closer")
            for i in range(1, 201)
        ]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, span_tokens=10).collect()
    }
    survivors = [d for d, t in out.items() if "b0" in t.split()]
    assert survivors == [1]  # global-first (smallest doc_id, pos) keeps
    # every doc's unique text is untouched
    for d, t in out.items():
        assert f"unique{d}" in t and "closer" in t


def test_remove_duplicate_spans_plan_has_no_window(spark):
    """The keeper-selection plan must contain NO window operator: a
    window partitioned by the span hash cannot be split under skew
    (AQE can split a skewed equi-join, not a window partition)."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text=" ".join("a" * 20))])
    plan = remove_duplicate_spans(docs, span_tokens=10)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_top_ngrams_boilerplate_miner(spark):
    """The planted boilerplate phrase ranks first; per-doc distinctness
    means a phrase-spamming single doc votes once."""
    from bigdataproject_formula1_telemetry_spark.operators.text import top_ngrams

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words here {boiler} tail{i}") for i in range(30)]
        + [(100, ("spam phrase here " * 50).strip())],  # one spammer doc
        "doc_id long, text string",
    )
    # exactly 3 shared 4-token windows span the planted phrase; they tie
    # at count 30 above everything else (deterministic ngram-asc order)
    top = top_ngrams(docs, n=4, k=3).collect()
    assert all(r["c"] == 30 for r in top)
    assert boiler in {r["ngram"] for r in top}
    # the spammer's repeated phrase counts ONCE (per-doc distinct)
    spam_counts = [r["c"] for r in top if "spam" in r["ngram"]]
    assert all(c == 1 for c in spam_counts)


def test_blocklist_filter_page_and_line_modes(spark):
    from bigdataproject_formula1_telemetry_spark.operators.text import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (1, "a perfectly clean document about sports"),
            (2, "contains the word BADWORD in its body"),
            (3, "good line one\nthis line has badword here\ngood line two"),
            (4, "assess the association assets"),  # no scunthorpe match on "ass"
            (5, None),
        ],
        "doc_id long, text string",
    )
    page = blocklist_filter(docs, ["badword", "ass"], mode="page")
    assert {r["doc_id"] for r in page.collect()} == {1, 4, 5}
    line = {r["doc_id"]: r["text"]
            for r in blocklist_filter(docs, ["badword"], mode="line").collect()}
    assert line[3] == "good line one\ngood line two"
    assert line[1] == "a perfectly clean document about sports"
    assert line[5] is None
    # pure expression: no shuffle
    plan = blocklist_filter(docs, ["badword"], mode="page") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    import pytest as _pt
    with _pt.raises(ValueError, match="mode"):
        blocklist_filter(docs, ["x"], mode="bogus")
    # empty blocklist is the identity
    assert blocklist_filter(docs, [], mode="page").count() == docs.count()


def test_extract_main_content_link_density(spark):
    """Nav/footer (short, link-dense) blocks drop; the article body
    (long, link-sparse) survives — including a body block containing
    ONE inline link, which a whole-page link heuristic would overkill.
    Contrast: strip_html keeps the nav labels."""
    article1 = ("This is the opening paragraph of a genuinely informative "
                "article about an interesting subject with plenty of prose.")
    article2 = ("A second substantial paragraph continues the discussion "
                'with an inline <a href="/ref">reference link</a> amid '
                "otherwise ordinary running text of reasonable length.")
    html = (
        '<nav><a href="/">Home</a> <a href="/news">News</a> '
        '<a href="/about">About</a></nav>'
        f"<p>{article1}</p>"
        f"<p>{article2}</p>"
        '<div><a href="/a">Related one</a> <a href="/b">Related two</a> '
        '<a href="/c">Related three</a></div>'
        '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>'
        "<script>nav();</script>"
    )
    out = _one(spark, html, T.extract_main_content)
    assert "opening paragraph" in out
    assert "reference link" in out  # inline link text kept inside body
    assert "Home" not in out and "Related one" not in out
    assert "Terms" not in out and "nav();" not in out
    # strip_html, by contrast, keeps the nav labels
    naive = _one(spark, html, T.strip_html)
    assert "Home" in naive
    # malformed markup degrades, never crashes; long plain text survives
    plain = "just a long enough plain text line " * 4
    assert "plain text" in _one(spark, "<p>" + plain, T.extract_main_content)
    # all-boilerplate page -> empty string
    assert _one(spark, '<nav><a href="/">x</a></nav>', T.extract_main_content) == ""


def test_gopher_stats_and_filter(spark):
    """Every Gopher rule (Rae et al. 2021 A1.1) individually rejects its
    crafted violator while the compliant document passes all of them."""
    good_words = ("the quick brown fox and the lazy dog have decided to "
                  "wander off with great purpose across that wide field "
                  "of golden wheat because exploration is rewarding and "
                  "adventure builds character for everyone involved today "
                  "with more words that keep the total comfortably high "
                  "and a further clause extends the passage well beyond "
                  "the fifty word minimum that the published rule demands")
    docs = {
        "good": good_words,
        "too_short": "the and of that have with be to",
        "long_words": " ".join(["pneumonoultramicroscopic"] * 60) + " the of and",
        "symbols": " ".join(["tag#word"] * 30 + ["more..."] * 30) + " the of and",
        "bullets": "\n".join(["- item one of the list here"] * 10),
        "ellipses": "\n".join([f"{good_words} truncated..."] * 10),
        "numeric": " ".join(str(i) for i in range(60)) + " the of and",
        "no_stopwords": " ".join(f"w{i}x" for i in range(60)),
    }
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )
    kept = {r["doc_id"] for r in T.gopher_filter(sdf).collect()}
    assert kept == {"good"}
    # stats are exact on a crafted doc
    s = (
        spark.createDataFrame([("x", "aaa bb# ...\n- bullet the of")],
                              "doc_id string, text string")
        .select(T.gopher_stats(F.col("text")).alias("s"))
        .first()["s"]
    )
    assert s["n_words"] == 7
    assert abs(s["symbol_ratio"] - 2 / 7) < 1e-9   # one '#', one '...'
    assert abs(s["bullet_line_frac"] - 0.5) < 1e-9  # 1 of 2 lines
    assert s["stopword_hits"] == 2                  # 'the', 'of'


def test_fineweb_line_stats_and_filter(spark):
    good = "\n".join(
        [
            "A full sentence that ends with terminal punctuation properly.",
            "Another complete line of reasonable length ends here too!",
            "And a third one keeps the punctuation fraction high enough.",
        ]
    )
    unpunct = "\n".join(["a line with no end mark at all of decent size"] * 5)
    shorty = "\n".join(["tiny."] * 9 + ["One acceptable full-length sentence here."])
    dupheavy = "\n".join(
        ["This exact long duplicated line is repeated verbatim often."] * 4
        + ["One unique closing line finishes the document properly."]
    )
    sdf = spark.createDataFrame(
        [("good", good), ("unpunct", unpunct), ("short", shorty),
         ("dup", dupheavy)],
        "doc_id string, text string",
    )
    kept = {r["doc_id"] for r in T.fineweb_filter(sdf).collect()}
    assert kept == {"good"}
    # exact stats on a crafted doc: 2 lines, one punct-terminated, the
    # short one (<30 chars) duplicated... keep it simple & exact:
    s = (
        spark.createDataFrame(
            [("x", "dup line here\ndup line here\nA long properly terminated closing sentence.")],
            "doc_id string, text string",
        )
        .select(T.fineweb_line_stats(F.col("text")).alias("s"))
        .first()["s"]
    )
    assert abs(s["punct_line_frac"] - 1 / 3) < 1e-9
    assert abs(s["short_line_frac"] - 2 / 3) < 1e-9
    dup_mass = 2 * len("dup line here")
    total = dup_mass + len("A long properly terminated closing sentence.")
    assert abs(s["dup_line_char_frac"] - dup_mass / total) < 1e-9


def test_blocklist_filter_counts_occurrences_not_distinct(spark):
    """``min_hits`` counts OCCURRENCES (r6 ADVICE): one blocked word
    repeated ``min_hits`` times trips the gate — the earlier
    array_intersect form used set semantics and could never count a
    single blocked word past 1."""
    from bigdataproject_formula1_telemetry_spark.operators.text import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (1, "badword again and badword"),
            (2, "badword appears once only"),
            (3, "clean text here"),
        ],
        "doc_id long, text string",
    )
    out = blocklist_filter(docs, ["badword"], mode="page", min_hits=2)
    assert {r["doc_id"] for r in out.collect()} == {2, 3}

    # line mode: only the >=2-occurrence line is removed
    docs2 = spark.createDataFrame(
        [(1, "badword badword spam\nbadword just once")],
        "doc_id long, text string",
    )
    line = blocklist_filter(docs2, ["badword"], mode="line", min_hits=2).first()
    assert line["text"] == "badword just once"


# --------------------------------------------------------- sentence chunks


def test_sentence_chunks_never_split_mid_sentence(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as TX

    text = (
        "First sentence has five words. Second one is short! "
        "Third sentence question mark? Fourth closes it all."
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = TX.sentence_chunks(docs, chunk_tokens=10).orderBy("chunk_idx").collect()
    # every chunk ends at a sentence boundary
    assert all(r["chunk_text"][-1] in ".!?" for r in out)
    # reconstruction: chunks concatenated == original
    assert " ".join(r["chunk_text"] for r in out) == text
    # budget respected (no sentence here exceeds it)
    assert all(r["n_tokens"] <= 10 for r in out)
    # greedy: first two sentences (5 + 5 = 10 tokens) share a chunk
    assert out[0]["chunk_text"] == "First sentence has five words. Second one is short!"


def test_sentence_chunks_oversized_sentence_is_own_chunk(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as TX

    long_s = " ".join(f"w{i}" for i in range(30)) + "."
    text = f"Short one. {long_s} Tail sentence here."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = TX.sentence_chunks(docs, chunk_tokens=8).orderBy("chunk_idx").collect()
    texts = [r["chunk_text"] for r in out]
    assert long_s in texts  # never split, surfaced whole
    over = [r for r in out if r["chunk_text"] == long_s]
    assert over[0]["n_tokens"] == 30  # visible over-budget marker
    assert " ".join(texts) == text


def test_sentence_chunks_empty_null_and_no_punct(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "no terminal punctuation at all")],
        "doc_id long, text string",
    )
    out = TX.sentence_chunks(docs, chunk_tokens=50).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert 1 not in by and 2 not in by  # empty/NULL -> zero chunks
    assert by[3] == ["no terminal punctuation at all"]


def test_sentence_chunks_compose_with_packing(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as TX

    rows = [
        (i, " ".join(f"Sent number {i} word {j} end." for j in range(6)))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = TX.sentence_chunks(docs, chunk_tokens=12).withColumn(
        "shard", F.col("doc_id") % 4
    )
    packed = TX.pack_sequences(
        chunks, token_budget=24, partition_by="shard"
    )
    assert packed.count() > 0
    # budget invariant carries through
    agg = packed.groupBy("seq_id", "shard").agg(
        F.sum("n_tokens").alias("t")
    )
    assert agg.where(F.col("t") > 24).count() == 0


def test_curate_documents_sentence_chunking(spark):
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    rows = [
        (i, " ".join(f"Doc {i} sentence {j} content words end." for j in range(8)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = P.curate_documents(
        docs, sentence_chunking=True, chunk_tokens=14, token_budget=28,
        n_pack_shards=2,
    )
    out = packed.collect()
    assert len(out) > 0
    # every chunk in the release ends at a sentence boundary
    assert all(r["chunk_text"].rstrip()[-1] in ".!?" for r in out)


class TestNormalizeText:
    def test_nfc_combining_to_precomposed(self, spark):
        df = spark.createDataFrame(
            [(1, "Café"), (2, "Café"), (3, None)],
            "i long, t string",
        )
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", T.normalize_text(F.col("t")).alias("n")
            ).collect()
        }
        assert got[1] == got[2] == "Café"  # both forms converge
        assert got[3] is None

    def test_forms_match_python_unicodedata(self, spark):
        import unicodedata

        samples = ["ﬁle", "Ｆｕｌｌｗｉｄｔｈ", "x̣́y", "½ + ¼"]
        df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                                   "i long, t string")
        for form in ("NFC", "NFKC", "NFD", "NFKD"):
            got = {
                r["i"]: r["n"]
                for r in df.select(
                    "i", T.unicode_normalize(F.col("t"), form).alias("n")
                ).collect()
            }
            for i, s in enumerate(samples):
                assert got[i] == unicodedata.normalize(form, s), (form, s)

    def test_control_strip_and_whitespace_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, "a\x07b\x00c"), (2, "  a\t\tb\n\nc  "), (3, "a \x0b b")],
            "i long, t string",
        )
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", T.normalize_text(F.col("t"), form=None).alias("n")
            ).collect()
        }
        assert got[1] == "abc"      # bell/NUL stripped, no space left
        assert got[2] == "a b c"    # runs collapse + trim
        assert got[3] == "a b"      # VT stripped, then runs collapse

    def test_layout_invariant_fingerprinting(self, spark):
        """The reason the op exists: byte-different layouts of one text
        normalize to one hash key."""
        df = spark.createDataFrame(
            [("same text here",), ("same\ttext\n here ",),
             ("same  text  here",)],
            "t string",
        )
        n = df.select(
            F.md5(T.normalize_text(F.col("t"), form=None)).alias("h")
        )
        assert n.distinct().count() == 1

    def test_pure_jvm_when_form_none(self, spark):
        df = spark.createDataFrame([("x",)], "t string")
        plan = (
            df.select(T.normalize_text(F.col("t"), form=None).alias("n"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_bad_form_raises(self, spark):
        with pytest.raises(ValueError, match="unknown form"):
            T.unicode_normalize(F.lit("x"), "NFX")
