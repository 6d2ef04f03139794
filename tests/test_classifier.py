"""Trained quality classifier (operators/classifier.py): exact gradient
parity vs a single-process numpy reference, separable-corpus accuracy,
repartition-invariance, zero-shuffle serving plan, and the pipeline
gate."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import classifier as CL
from bigdataproject_formula1_telemetry_spark.operators.embed import _embed_matrix

DIM = 128


def _corpus(n_per_class=40, seed=5):
    rng = np.random.default_rng(seed)
    good_vocab = [f"insight{i}" for i in range(30)]
    spam_vocab = [f"clickbait{i}" for i in range(30)]
    shared = [f"the{i}" for i in range(10)]
    rows = []
    for i in range(n_per_class):
        g = list(rng.choice(good_vocab, 12)) + list(rng.choice(shared, 4))
        s = list(rng.choice(spam_vocab, 12)) + list(rng.choice(shared, 4))
        rows.append((2 * i, " ".join(g), 1))
        rows.append((2 * i + 1, " ".join(s), 0))
    return rows


def test_distributed_gradient_matches_numpy_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = np.linspace(-0.5, 0.5, DIM + 1)
    grad, loss, n = CL._gradient(
        df.select("text", F.col("label").cast("double").alias("label")),
        w, "text", "label", DIM, "quality-clf",
    )
    # reference: same features, one process
    X = _embed_matrix([t for _, t, _ in rows], DIM, "quality-clf", {})
    y = np.array([l for *_, l in rows], dtype=np.float64)
    p = 1.0 / (1.0 + np.exp(-(X @ w[:-1] + w[-1])))
    ref = np.concatenate([X.T @ (p - y), [float((p - y).sum())]])
    assert n == len(rows)
    assert np.allclose(grad, ref, atol=1e-9)
    eps = 1e-12
    ref_loss = -float(
        np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    )
    assert abs(loss - ref_loss) < 1e-6


def test_train_separates_and_is_repartition_invariant(spark):
    rows = _corpus()
    train = spark.createDataFrame(rows[:60], "doc_id long, text string, label int")
    w = CL.train_text_classifier(train, dim=DIM, epochs=25)
    # held-out rows classified perfectly (vocabulary fully separable)
    held = spark.createDataFrame(rows[60:], "doc_id long, text string, label int")
    scored = CL.score_text_classifier(held, w).collect()
    for r in scored:
        assert (r["quality_prob"] >= 0.5) == (r["label"] == 1), r
    # retraining on a different partitioning agrees to float tolerance
    w2 = CL.train_text_classifier(train.repartition(7), dim=DIM, epochs=25)
    assert np.allclose(w, w2, atol=1e-8)


def test_scoring_plan_is_shuffle_free(spark):
    rows = _corpus(n_per_class=5)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = np.zeros(DIM + 1)
    plan = (
        CL.score_text_classifier(df, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_null_and_empty_text_score_the_prior(spark):
    w = np.zeros(DIM + 1)
    w[-1] = 1.5  # bias only
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "insight0 insight1")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_prob"] for r in
           CL.score_text_classifier(df, w).collect()}
    prior = 1.0 / (1.0 + np.exp(-1.5))
    assert abs(got[1] - prior) < 1e-12 and abs(got[2] - prior) < 1e-12


def test_train_rejects_empty_and_bad_epochs(spark):
    df = spark.createDataFrame([], "text string, label int")
    with pytest.raises(ValueError, match="no labeled rows"):
        CL.train_text_classifier(df, dim=16, epochs=1)
    with pytest.raises(ValueError, match="epochs"):
        CL.train_text_classifier(df, dim=16, epochs=0)


def test_curate_documents_quality_classifier_gate(spark):
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    rows = _corpus(n_per_class=20)
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = CL.train_text_classifier(train, dim=DIM, epochs=25)
    # fresh docs, ids disjoint from training, same two vocabularies
    docs = spark.createDataFrame(
        [(1000 + i, t) for i, (_, t, _) in enumerate(_corpus(n_per_class=10, seed=11))],
        "doc_id long, text string",
    )
    out = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        quality_classifier=(w, 0.5),
    ).toPandas()
    kept = set(out["doc_id"])
    # even-index rows were good, odd spam (by _corpus construction)
    assert kept and all((d - 1000) % 2 == 0 for d in kept)
    assert len(kept) == 10


# ------------------------------------------------------------ multiclass


def _multi_corpus(spark, n_per=40):
    vocab = {
        "en": "the quick brown fox jumps over the lazy dog",
        "de": "der schnelle braune fuchs springt über den faulen hund",
        "fr": "le rapide renard brun saute par dessus le chien",
    }
    rows = []
    i = 0
    for lang, base in vocab.items():
        words = base.split()
        for k in range(n_per):
            rows.append((i, " ".join(words[k % 3 :] + words[: k % 3]), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_multiclass_gradient_matches_numpy(spark):
    docs = _multi_corpus(spark, n_per=10)
    dim = 64
    classes = ["de", "en", "fr"]
    rng = np.random.default_rng(3)
    W = rng.standard_normal((3, dim + 1))
    G, loss, n = CL._gradient_multi(
        docs, W, classes, "text", "label", dim, "domain-clf"
    )
    pdf = docs.orderBy("doc_id").toPandas()
    X = _embed_matrix(pdf["text"].tolist(), dim, "domain-clf", {})
    y = np.array([classes.index(v) for v in pdf["label"]])
    Z = X @ W[:, :-1].T + W[:, -1][None, :]
    Z -= Z.max(axis=1, keepdims=True)
    P = np.exp(Z) / np.exp(Z).sum(axis=1, keepdims=True)
    Y = np.zeros_like(P)
    Y[np.arange(len(y)), y] = 1.0
    R = P - Y
    G_ref = np.concatenate([R.T @ X, R.sum(axis=0)[:, None]], axis=1)
    loss_ref = -float(np.log(P[np.arange(len(y)), y] + 1e-12).sum())
    assert n == len(y)
    assert np.allclose(G, G_ref, atol=1e-9)
    assert abs(loss - loss_ref) < 1e-6


def test_multiclass_trains_separates_and_is_layout_invariant(spark):
    docs = _multi_corpus(spark)
    model = CL.train_text_multiclass(docs, dim=256, epochs=25)
    classes, W = model
    assert classes == ["de", "en", "fr"] and W.shape == (3, 257)
    scored = CL.score_text_multiclass(docs, model)
    rows = scored.collect()
    acc = sum(1 for r in rows if r["label_pred"] == r["label"]) / len(rows)
    assert acc == 1.0  # fully separable vocabularies
    assert all(0 < r["label_prob"] <= 1.0 for r in rows)
    # layout invariance of predictions
    scored2 = CL.score_text_multiclass(docs.repartition(13), model)
    a = {r["doc_id"]: r["label_pred"] for r in scored.collect()}
    b = {r["doc_id"]: r["label_pred"] for r in scored2.collect()}
    assert a == b


def test_multiclass_recovers_weak_domain_signal_on_real_text(spark):
    """Realistic setting: real corpus text (shared vocabulary) with a
    FAINT domain marker appended — 3 marker tokens on ~40-token docs.
    The classifier must recover the domain on a held-out split.  (The
    testdata's ``lang`` column itself is an arbitrary label — the text
    is the same word distribution for every language, verified
    unlearnable — so domain recovery is planted, not pretended.)"""
    from tests.conftest import SF_CORRECT
    from bigdataproject_formula1_telemetry_spark import io as _io
    from bigdataproject_formula1_telemetry_spark.operators import sampling

    markers = {0: "forum thread reply", 1: "shop cart checkout", 2: "paper abstract citation"}
    # 15 real tokens of shared-vocabulary noise + a 3-token marker: a
    # learnable but non-trivial signal (numpy-probed: full-batch GD at
    # lr 4 converges to 100% held-out by ~30 epochs; the full 40-token
    # noise floor needs ~150 — too many driver rounds for a unit test)
    docs = (
        _io.read_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .withColumn("label", (F.col("doc_id") % 3).cast("string"))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.array_join(
                    F.slice(F.split(F.col("text"), r"\s+"), 1, 15), " "
                ),
                F.element_at(
                    F.array(*[F.lit(markers[k]) for k in range(3)]),
                    (F.col("doc_id") % 3).cast("int") + 1,
                ),
            ),
        )
    )
    train = sampling.deterministic_sample(docs, ["doc_id"], 0.5, salt="mc")
    test = docs.join(train.select("doc_id"), "doc_id", "left_anti")
    model = CL.train_text_multiclass(train, dim=2048, epochs=30, lr=4.0)
    rows = CL.score_text_multiclass(test, model).collect()
    acc = sum(1 for r in rows if r["label_pred"] == r["label"]) / len(rows)
    assert acc >= 0.95, acc


def test_multiclass_bad_args(spark):
    docs = _multi_corpus(spark, n_per=2)
    with pytest.raises(ValueError):
        CL.train_text_multiclass(docs, epochs=0)
    one = docs.where(F.col("label") == "en")
    with pytest.raises(ValueError):
        CL.train_text_multiclass(one)
