"""PCA compression tests: model equality against the exact numpy PCA,
partitioning invariance of the float fold, transform/inverse round trip,
and the serving property that matters — kNN overlap on compressed
vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import pca, similarity as sim
from tests.conftest import SF_SMOKE


def np_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    W = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(W[i])))
        if W[i, j] < 0:
            W[i] = -W[i]
    return mean, W, evals[order]


@pytest.fixture(scope="module")
def anis(spark):
    """Anisotropic corpus: variance concentrated in a few directions —
    the shape PCA exists for."""
    rng = np.random.default_rng(61)
    d, n = 16, 400
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    scales = np.array([10, 6, 4, 2] + [0.3] * (d - 4))
    X = (rng.standard_normal((n, d)) * scales) @ basis.T + rng.standard_normal(d)
    sdf = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    return X, sdf


def test_model_matches_numpy(spark, anis):
    X, sdf = anis
    m = pca.pca_train(sdf, k=4)
    mean, W, ev = np_pca(X, 4)
    assert np.allclose(m["mean"], mean, atol=1e-9)
    assert np.allclose(m["components"], W, atol=1e-8)
    assert np.allclose(m["explained_variance"], ev, rtol=1e-9)
    # the 4 real directions carry ~all the variance
    assert sum(m["explained_variance"]) / m["total_variance"] > 0.97


def test_partitioning_invariance(spark, anis):
    X, _ = anis
    rows = [(i, x.tolist()) for i, x in enumerate(X)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    b = spark.createDataFrame(rows[::-1], "vec_id long, embedding array<double>").repartition(13)
    ma = pca.pca_train(a, k=3)
    mb = pca.pca_train(b, k=3)
    assert np.allclose(ma["components"], mb["components"], atol=1e-9)
    assert np.allclose(ma["mean"], mb["mean"], atol=1e-12)
    # MORE partitions than fold buckets: in-bucket folds genuinely
    # multi-row, and the driver still sees exactly fold_buckets rows
    c = spark.createDataFrame(
        rows[::3] + rows[1::3] + rows[2::3],
        "vec_id long, embedding array<double>",
    ).repartition(97)
    mc = pca.pca_train(c, k=3, fold_buckets=8)
    assert np.allclose(ma["components"], mc["components"], atol=1e-9)
    assert np.allclose(ma["mean"], mc["mean"], atol=1e-12)


def test_transform_and_inverse_roundtrip(spark, anis):
    X, sdf = anis
    m = pca.pca_train(sdf, k=4)
    proj = pca.pca_transform(sdf, m)
    got = {r.vec_id: np.asarray(r.embedding_pca) for r in proj.collect()}
    mean = np.asarray(m["mean"])
    W = np.asarray(m["components"])
    for i, x in enumerate(X):
        assert np.allclose(got[i], (x - mean) @ W.T, atol=1e-3)
    # rank-4 reconstruction captures ~all of this corpus's structure
    rec = pca.pca_inverse_transform(proj, m)
    err = (
        rec.select(
            F.aggregate(
                F.zip_with(
                    "embedding", "embedding_approx", lambda a, b: (a - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("se")
        )
        .agg(F.avg("se"))
        .first()[0]
    )
    tot = float(np.var(X, axis=0, ddof=1).sum())
    assert err / tot < 0.05


def test_null_vectors_project_to_null(spark):
    sdf = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, None), (2, [0.0, 1.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    m = pca.pca_train(sdf, k=2)
    rows = {r.vec_id: r.embedding_pca for r in pca.pca_transform(sdf, m).collect()}
    assert rows[1] is None and rows[0] is not None


def test_knn_overlap_on_compressed_embeddings(spark):
    """The point of the operator: top-10 kNN on the k-dim projection
    approximates the float top-10 — on an ANISOTROPIC corpus, PCA's
    applicability condition.  (The synthetic testdata embeddings are
    i.i.d.-isotropic — flat spectrum, k=32 keeps only ~65% variance —
    so no linear projection can preserve neighborhoods there; real text
    embeddings concentrate variance, which is why the operator exists.)"""
    rng = np.random.default_rng(67)
    d, n = 64, 600
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    scales = np.concatenate([np.linspace(8, 1, 16), np.full(d - 16, 0.05)])
    X = (rng.standard_normal((n, d)) * scales) @ basis.T
    emb = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    m = pca.pca_train(emb, k=16)
    assert sum(m["explained_variance"]) / m["total_variance"] > 0.95
    proj = pca.pca_transform(emb, m).select(
        "vec_id", F.col("embedding_pca").alias("embedding")
    )
    q_f = emb.where(F.col("vec_id") < 20)
    q_p = proj.where(F.col("vec_id") < 20)
    f_top = sim.knn_bruteforce_arrow(emb, q_f, k=10).collect()
    p_top = sim.knn_bruteforce_arrow(proj, q_p, k=10).collect()
    fa, pa = {}, {}
    for r in f_top:
        fa.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in p_top:
        pa.setdefault(r.query_id, set()).add(r.neighbor_id)
    overlap = sum(len(s & pa.get(q, set())) / 10.0 for q, s in fa.items()) / len(fa)
    assert overlap >= 0.8  # 4x compression, 95%+ variance kept


def test_bad_args(spark):
    sdf = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be"):
        pca.pca_train(sdf, k=0)
    with pytest.raises(ValueError, match="exceeds"):
        pca.pca_train(sdf, k=5)
    with pytest.raises(ValueError, match="empty"):
        pca.pca_train(sdf.where("vec_id < 0"), k=1)


def test_pca_then_pq_retrieval_composition(spark):
    """Compression stacking: PCA (4×) then PQ on the reduced vectors
    (16×) — a 1%-perturbed probe still retrieves its source in the
    top-10 via ADC, demonstrating the 64×-at-rest serving stack."""
    from bigdataproject_formula1_telemetry_spark.operators import pq as PQ

    rng = np.random.default_rng(71)
    d, n = 64, 500
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    scales = np.concatenate([np.linspace(8, 1, 16), np.full(d - 16, 0.05)])
    X = (rng.standard_normal((n, d)) * scales) @ basis.T
    emb = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    m = pca.pca_train(emb, k=16)
    red = pca.pca_transform(emb, m).select(
        "vec_id", F.col("embedding_pca").cast("array<double>").alias("embedding")
    )
    books = PQ.pq_train(red, m=8, n_codes=64, max_iter=3)
    codes = PQ.pq_encode(red, books)

    probes_np = X[:20] + 0.01 * rng.standard_normal((20, d))
    probes = pca.pca_transform(
        spark.createDataFrame(
            [(1_000 + i, v.tolist()) for i, v in enumerate(probes_np)],
            "vec_id long, embedding array<double>",
        ),
        m,
    ).select(
        "vec_id", F.col("embedding_pca").cast("array<double>").alias("embedding")
    )
    got = PQ.knn_pq_adc(codes, probes, books, k=10).collect()
    tops: dict[int, list] = {}
    for r in got:
        tops.setdefault(r.query_id, []).append((r.adc_dist, r.neighbor_id))
    hits = sum(
        1
        for qid, lst in tops.items()
        if (qid - 1_000) in [nid for _, nid in sorted(lst)]
    )
    assert hits >= 18  # ≥90% source-in-top10 through the 64× stack
