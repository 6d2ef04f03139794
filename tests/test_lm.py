"""Unigram-LM perplexity scoring (operators/lm.py): training math,
expression-vs-Arrow A/B equivalence, OOV handling, vocab capping, and
the curate_documents perplexity gate."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import lm as L


@pytest.fixture(scope="module")
def docs(spark):
    return io.read_table(spark, SF_SMOKE, "documents")


def test_unigram_lm_math(spark):
    # corpus: "a a b" / "b c" → counts a=2 b=2 c=1, N=5, V=3
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a A b"), Row(doc_id=2, text="b c")]
    )
    rows = {r["tok"]: r for r in L.unigram_lm(df).collect()}
    assert set(rows) == {"a", "b", "c"}
    denom = 5.0 + 1.0 * (3.0 + 1.0)
    assert rows["a"]["logp"] == pytest.approx(math.log(3.0 / denom))
    assert rows["c"]["logp"] == pytest.approx(math.log(2.0 / denom))
    assert rows["a"]["unk_logp"] == pytest.approx(math.log(1.0 / denom))


def test_doc_perplexity_expression_math(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a A b"), Row(doc_id=2, text="b c")]
    )
    model = L.unigram_lm(df)
    out = {r["doc_id"]: r for r in L.doc_perplexity(df, model).collect()}
    denom = 9.0
    lp1 = 2 * math.log(3 / denom) + math.log(3 / denom)
    assert out[1]["n_tokens"] == 3
    assert out[1]["ppl"] == pytest.approx(math.exp(-lp1 / 3))
    lp2 = math.log(3 / denom) + math.log(2 / denom)
    assert out[2]["ppl"] == pytest.approx(math.exp(-lp2 / 2))


def test_vocab_cap_and_oov_mass(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b b zzz"), Row(doc_id=2, text="a qqq")]
    )
    # top-2 vocab = {a, b}; zzz/qqq flow through unk
    model = L.unigram_lm(df, vocab_size=2)
    rows = {r["tok"]: r for r in model.collect()}
    assert set(rows) == {"a", "b"}
    denom = 6.0 + 1.0 * (2.0 + 1.0)  # kept N=6 (a=4,b=2), V=2
    unk = math.log(1.0 / denom)
    assert rows["a"]["unk_logp"] == pytest.approx(unk)
    out = {r["doc_id"]: r for r in L.doc_perplexity(df, model).collect()}
    lp2 = math.log(5.0 / denom) + unk
    assert out[2]["ppl"] == pytest.approx(math.exp(-lp2 / 2))


def test_vocab_cap_deterministic_tiebreak(spark):
    # b and c tie at count 1 → token-asc keeps b
    df = spark.createDataFrame([Row(doc_id=1, text="a a c b")])
    kept = {r["tok"] for r in L.unigram_lm(df, vocab_size=2).collect()}
    assert kept == {"a", "b"}


def test_arrow_form_matches_expression_form(spark, docs):
    model = L.unigram_lm(docs, vocab_size=500)
    logp, unk = L.collect_lm(model)
    assert len(logp) <= 500 and unk < 0
    a = (
        L.doc_perplexity(docs, model)
        .orderBy("doc_id")
        .toPandas()
    )
    b = (
        L.doc_perplexity_arrow(docs, logp, unk)
        .orderBy("doc_id")
        .toPandas()
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tokens"].tolist() == b["n_tokens"].tolist()
    assert a["ppl"].to_numpy() == pytest.approx(b["ppl"].to_numpy(), rel=1e-9)


def test_arrow_form_is_shuffle_free(spark, docs):
    model = L.unigram_lm(docs, vocab_size=500)
    logp, unk = L.collect_lm(model)
    plan = L.doc_perplexity_arrow(docs, logp, unk)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tokenless_docs_emit_no_row_in_both_forms(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="   "), Row(doc_id=3, text=None)]
    )
    model = L.unigram_lm(df)
    logp, unk = L.collect_lm(model)
    assert {r["doc_id"] for r in L.doc_perplexity(df, model).collect()} == {1}
    assert {r["doc_id"] for r in L.doc_perplexity_arrow(df, logp, unk).collect()} == {1}


def test_gibberish_scores_higher_ppl_than_modal_text(spark, docs):
    # score a planted doc set under the corpus LM: a document made of
    # common corpus tokens must score lower ppl than unseen gibberish
    model = L.unigram_lm(docs, vocab_size=1000)
    common = [
        r["tok"]
        for r in L.token_counts(docs).orderBy(F.desc("c"), "tok").limit(8).collect()
    ]
    probe = docs.sparkSession.createDataFrame(
        [
            Row(doc_id=-1, text=" ".join(common)),
            Row(doc_id=-2, text="zzqx vgrp mmmw qqqa zzqx vgrp mmmw qqqa"),
        ]
    )
    out = {r["doc_id"]: r["ppl"] for r in L.doc_perplexity(probe, model).collect()}
    assert out[-1] < out[-2]


def test_curate_documents_ppl_gate(spark, docs):
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    base = pipelines.curate_documents(docs)
    # permissive gate keeps everything → identical output
    loose = pipelines.curate_documents(docs, max_ppl=1e12)
    assert sorted(base.collect()) == sorted(loose.collect())
    # a strict gate drops some docs but still packs a valid corpus
    model = L.unigram_lm(docs)
    med = (
        L.doc_perplexity(docs, model)
        .agg(F.expr("percentile_approx(ppl, 0.5)"))
        .first()[0]
    )
    tight = pipelines.curate_documents(docs, max_ppl=float(med))
    n_base = base.count()
    n_tight = tight.count()
    assert 0 < n_tight < n_base


def test_bigram_lm_matches_python_reference(spark):
    """(v, w, log_cond) must equal a from-scratch python bigram count on
    the same tokenization."""
    import math
    from collections import Counter
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps",
        "a lazy dog sleeps all day",
        "single",
        "",
        None,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["v"], r["w"]): r["log_cond"] for r in L.bigram_lm(docs).collect()
    }
    pairs = Counter()
    for t in texts:
        toks = (t or "").lower().split()
        pairs.update(zip(toks, toks[1:]))
    ctx = Counter()
    for (v, _), c in pairs.items():
        ctx[v] += c
    ref = {p: math.log(c / ctx[p[0]]) for p, c in pairs.items()}
    assert set(got) == set(ref)
    for p in ref:
        assert abs(got[p] - ref[p]) < 1e-12, p


def test_bigram_order_sensitivity_vs_unigram(spark):
    """The capability the unigram gate provably lacks: a document and
    its word-shuffled scramble have IDENTICAL unigram perplexity (same
    bag), but the bigram model scores the in-order version strictly
    better — order is signal."""
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    sent = "the quick brown fox jumps over the lazy dog".split()
    train_texts = [" ".join(sent)] * 50 + [
        "a very different sentence about other things entirely",
    ] * 10
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    uni = L.unigram_lm(train)
    logp, unk = L.collect_lm(uni)
    big = L.collect_bigram_lm(L.bigram_lm(train))

    rng = np.random.default_rng(9)
    shuffled = list(sent)
    while shuffled == sent:
        rng.shuffle(shuffled)
    probe = spark.createDataFrame(
        [(1, " ".join(sent)), (2, " ".join(shuffled))],
        "doc_id long, text string",
    )
    u = {r["doc_id"]: r["ppl"] for r in
         L.doc_perplexity_arrow(probe, logp, unk).collect()}
    assert abs(u[1] - u[2]) < 1e-9  # unigram: bag-identical → equal
    b = {r["doc_id"]: r["ppl"] for r in
         L.doc_order_perplexity_arrow(probe, big, logp, unk).collect()}
    assert b[1] < b[2] * 0.5, b  # bigram: order separates decisively


def test_bigram_cap_and_backoff(spark):
    """max_bigrams keeps the most frequent pairs deterministically;
    dropped pairs flow through the 0.4-penalty unigram backoff (score
    finite, worse than the retained-pair score)."""
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    texts = ["a b " * 50 + "c d", "a b a b", "c d c d x y"]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    capped = L.bigram_lm(docs, max_bigrams=2).collect()
    kept = {(r["v"], r["w"]) for r in capped}
    assert ("a", "b") in kept and len(kept) == 2
    logp, unk = L.collect_lm(L.unigram_lm(docs))
    big = {(r["v"], r["w"]): r["log_cond"] for r in capped}
    probe = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y x y")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["ppl"] for r in
           L.doc_order_perplexity_arrow(probe, big, logp, unk).collect()}
    assert 0 < out[1] < out[2] < float("inf")  # backoff path finite, worse


def test_curate_documents_order_ppl_gate_kills_scrambled_spam(spark):
    """The pipeline composition the bigram model exists for: scrambled
    word-salad is BAG-identical to clean text (passes token/quality/
    unigram gates by construction) but the order gate drops it."""
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    sent = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight").split()
    rng = np.random.default_rng(3)
    scrambled = list(sent)
    while scrambled == sent:
        rng.shuffle(scrambled)
    train = spark.createDataFrame(
        [(i, " ".join(sent)) for i in range(40)], "doc_id long, text string"
    )
    uni_d, unk_d = L.collect_lm(L.unigram_lm(train))
    big_d = L.collect_bigram_lm(L.bigram_lm(train))
    # threshold between the two scores
    probe = spark.createDataFrame(
        [(1, " ".join(sent)), (2, " ".join(scrambled))],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["ppl"] for r in
              L.doc_order_perplexity_arrow(probe, big_d, uni_d, unk_d).collect()}
    cut = (scores[1] + scores[2]) / 2
    out = P.curate_documents(
        probe, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        max_order_ppl=cut, order_lm=(big_d, uni_d, unk_d),
    ).toPandas()
    assert set(out["doc_id"]) == {1}  # clean survives, scramble dies
