"""Temperature-mixture sampling (operators/mixing.py): allocation math,
deterministic realization, latent-cluster composition."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import mixing as M
from bigdataproject_formula1_telemetry_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    # sf0.01: 500 docs, langs en=218 zh=75 es=73 de=70 fr=64 — skewed
    # enough that temperature visibly rebalances
    return io.read_table(spark, SF_CORRECT, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return io.read_table(spark, SF_CORRECT, "embeddings")


def test_tau1_is_uniform_rate(spark, docs):
    f = M.temperature_fractions(docs, "lang", temperature=1.0, target_rows=250)
    # natural proportions: every domain keeps the same global rate
    assert set(f) == {"en", "zh", "es", "de", "fr"}
    for v in f.values():
        assert v == pytest.approx(0.5)


def test_tau0_is_equal_allocation(spark, docs):
    f = M.temperature_fractions(docs, "lang", temperature=0.0, target_rows=250)
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    # 50 rows per domain → rate 50/n_c
    for k, v in f.items():
        assert v == pytest.approx(min(1.0, 50.0 / counts[k]))


def test_small_domain_capped_at_whole(spark, docs):
    f = M.temperature_fractions(docs, "lang", temperature=0.0, target_rows=5000)
    assert all(v == 1.0 for v in f.values())


def test_tau_between_upweights_tail(spark, docs):
    f = M.temperature_fractions(docs, "lang", temperature=0.5, target_rows=250)
    # smoothing: tail domains keep a HIGHER rate than the head
    assert f["fr"] > f["en"]
    # expected realized total ≈ target
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    exp_total = sum(f[k] * counts[k] for k in f)
    assert exp_total == pytest.approx(250, abs=1e-6)


def test_mixture_sample_realization_and_determinism(spark, docs):
    out = M.mixture_sample(
        docs, "lang", ["doc_id"], temperature=0.5, target_rows=250, salt="e0"
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    f = M.temperature_fractions(docs, "lang", 0.5, 250)
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    for k in counts:
        exp = f[k] * counts[k]
        tol = 3 * math.sqrt(exp * (1 - f[k])) + 1  # ~3σ binomial band
        assert abs(got.get(k, 0) - exp) <= tol, (k, got.get(k), exp)
    # identical under repartitioning (hash gate, not rand())
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in M.mixture_sample(
            docs.repartition(17), "lang", ["doc_id"], temperature=0.5,
            target_rows=250, salt="e0",
        ).collect()
    )
    assert a == b
    # different salt → different (overlapping) subset
    c = sorted(
        r["doc_id"]
        for r in M.mixture_sample(
            docs, "lang", ["doc_id"], temperature=0.5, target_rows=250, salt="e1"
        ).collect()
    )
    assert a != c


def test_precomputed_fractions_drop_unseen_domains(spark, docs):
    f = {"en": 0.5, "fr": 1.0}
    out = M.mixture_sample(docs, "lang", ["doc_id"], fractions=f, salt="e0")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "fr"}


def test_cluster_mixture_sample(spark, emb):
    C = sim.ivf_centroids(emb, n_clusters=4, max_iter=2)
    out = M.cluster_mixture_sample(
        emb, C, ["vec_id"], temperature=0.0, target_rows=200
    )
    assert "cluster" in out.columns
    got = {
        r["cluster"]: r["n"]
        for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["cluster"]: r["n"]
        for r in M.cluster_assign(emb, C)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) <= set(sizes) and len(sizes) == 4
    # tau=0: every cluster targets 50 rows (capped by its size)
    for k, n in sizes.items():
        exp = min(50.0, float(n))
        frac = exp / n
        tol = 3 * math.sqrt(exp * (1 - frac)) + 1
        assert abs(got.get(k, 0) - exp) <= tol, (k, got.get(k), exp)
    # the gate never invents rows
    assert out.count() <= emb.count()
