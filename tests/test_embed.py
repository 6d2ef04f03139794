"""Hashed-BoW embeddings + semantic decontamination (operators/embed.py):
from-scratch oracle, order invariance, zero-shuffle plan, and the
catches-what-8-grams-miss contrast."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import embed as E


@pytest.fixture(scope="module")
def docs(spark):
    return io.read_table(spark, SF_SMOKE, "documents")


def test_matches_from_scratch_oracle(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="The cat sat the MAT")])
    [row] = E.hashed_embedding(df, dim=32, salt="s").collect()
    v = np.zeros(32)
    for tok in ["the", "cat", "sat", "the", "mat"]:
        b, s = E.token_bucket_sign(tok, 32, "s")
        v[b] += s
    v /= np.linalg.norm(v)
    assert np.allclose(np.array(row["embedding"]), v)


def test_unit_norm_zero_and_determinism(spark, docs):
    out = E.hashed_embedding(docs, dim=64)
    norms = [
        float(np.linalg.norm(r["embedding"]))
        for r in out.select("embedding").collect()
    ]
    assert all(n == pytest.approx(1.0) for n in norms)
    a = {r["doc_id"]: r["embedding"] for r in out.collect()}
    b = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_embedding(docs.repartition(7), dim=64).collect()
    }
    for k in a:
        assert np.allclose(a[k], b[k])
    # token-less text → zero vector (the documented degradation path)
    z = spark.createDataFrame([Row(doc_id=1, text="   "), Row(doc_id=2, text=None)])
    for r in E.hashed_embedding(z, dim=16).collect():
        assert all(v == 0.0 for v in r["embedding"])


def test_bag_of_words_order_invariance(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="epsilon delta gamma beta alpha"),
            Row(doc_id=3, text="totally different words here now"),
        ]
    )
    out = {r["doc_id"]: np.array(r["embedding"]) for r in E.hashed_embedding(df).collect()}
    assert np.allclose(out[1], out[2])
    assert abs(float(out[1] @ out[3])) < 0.9


def test_plan_is_shuffle_free(spark, docs):
    plan = (
        E.hashed_embedding(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_feeds_similarity_operators(spark, docs):
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim

    emb = E.hashed_embedding(docs, dim=128).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    # a planted exact copy of doc 0's text must be its top neighbor
    first = docs.orderBy("doc_id").first()
    probe = E.hashed_embedding(
        spark.createDataFrame([Row(vec_id=-1, text=first["text"] )]),
        dim=128,
    ).select("vec_id", "embedding")
    out = sim.knn_bruteforce_arrow(emb, probe, k=1).collect()
    assert out[0]["neighbor_id"] == first["doc_id"]
    assert out[0]["cos_sim"] == pytest.approx(1.0)


def test_semantic_decontaminate_catches_shuffled_text(spark):
    import random

    bench_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    words = bench_text.split()
    rng = random.Random(3)
    shuffled = " ".join(rng.sample(words, len(words)))
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=bench_text),          # verbatim
            Row(doc_id=2, text=shuffled),             # word-shuffled
            Row(doc_id=3, text="completely unrelated content about formula one telemetry"),
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=100, text=bench_text)])

    kept = {r["doc_id"] for r in E.semantic_decontaminate(corpus, bench, 0.95).collect()}
    assert kept == {3}

    # the contrast that motivates the operator: 8-gram decontamination
    # keeps the shuffled copy (no 8-gram survives a word shuffle)
    from bigdataproject_formula1_telemetry_spark.operators import dedup as D

    kept8 = {r["doc_id"] for r in D.decontaminate(corpus, bench).collect()}
    assert 2 in kept8 and 1 not in kept8

    pairs = E.semantic_contamination_pairs(corpus, bench, 0.95).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in pairs} == {(1, 100), (2, 100)}
    assert all(r["cos_sim"] == pytest.approx(1.0) for r in pairs)


def test_empty_benchmark_keeps_everything(spark, docs):
    bench = docs.where(F.lit(False))
    assert E.semantic_decontaminate(docs, bench).count() == docs.count()
    assert E.semantic_contamination_pairs(docs, bench).count() == 0


def test_curate_documents_semantic_gate(spark, docs):
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    bench = docs.orderBy("doc_id").limit(3)
    base = pipelines.curate_documents(docs, benchmark=bench)
    # verbatim benchmark members are already gone via 8-grams; the
    # semantic pass composes without disturbing the rest at a threshold
    # only near-copies can reach
    sem = pipelines.curate_documents(
        docs, benchmark=bench, semantic_threshold=0.999
    )
    assert sorted(sem.collect()) == sorted(base.collect())
    # an aggressive threshold drops additional (topically-similar) docs
    tight = pipelines.curate_documents(
        docs, benchmark=bench, semantic_threshold=0.3
    )
    assert tight.count() < base.count()


def test_tokenless_docs_always_survive(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="   "), Row(doc_id=2, text="a b c")]
    )
    bench = spark.createDataFrame([Row(doc_id=9, text="a b c")])
    kept = {r["doc_id"] for r in E.semantic_decontaminate(corpus, bench, 0.9).collect()}
    assert kept == {1}
