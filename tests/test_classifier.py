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
