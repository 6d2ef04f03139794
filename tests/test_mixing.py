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


# ---------------------------------------------------------------- UniMax


@pytest.fixture(scope="module")
def toks(docs):
    # token counts per doc: the UniMax unit is tokens, not rows
    return docs.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))),
    )


def _brute_unimax(counts, budget, max_epochs, iters=200_000):
    """Independent reference: binary-search the uniform level L such
    that sum(min(cap_c, L)) == min(budget, sum(cap_c)) — the waterfill
    fixed point — then alloc_c = min(cap_c, L)."""
    caps = {k: max_epochs * n for k, n in counts.items()}
    total = min(budget, sum(caps.values()))
    lo, hi = 0.0, max(caps.values()) if caps else 0.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps.values()) < total:
            lo = mid
        else:
            hi = mid
    return {k: min(c, hi) for k, c in caps.items()}


def test_unimax_waterfill_matches_binary_search_reference(spark, toks):
    budget = 30_000.0
    got = M.unimax_budgets(toks, "lang", budget, max_epochs=2.0)
    counts = {
        r["lang"]: float(r["t"])
        for r in toks.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    want = _brute_unimax(counts, budget, 2.0)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    # budget fully spent (no cap binds globally here <=> sum caps >= budget)
    assert sum(got.values()) == pytest.approx(min(budget, 2.0 * sum(counts.values())), rel=1e-12)


def test_unimax_small_domain_caps_then_slack_respreads(spark):
    rows = [(i, "tiny" if i < 5 else ("mid" if i < 55 else "big"), 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    # caps: tiny 1000, mid 10000, big 189000 (max_epochs=2)
    got = M.unimax_budgets(df, "lang", 24_000.0, max_epochs=2.0)
    # fair share 8000 > tiny's cap 1000 -> tiny saturates; slack respreads
    assert got["tiny"] == pytest.approx(1000.0)
    # remaining 23000 over two domains = 11500 each; mid caps at 10000
    assert got["mid"] == pytest.approx(10_000.0)
    assert got["big"] == pytest.approx(13_000.0)


def test_unimax_budget_above_total_capacity_saturates_all(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "doc_id long, lang string, n_tokens long"
    )
    got = M.unimax_budgets(df, "lang", 1e9, max_epochs=3.0)
    assert got == {"a": pytest.approx(30.0), "b": pytest.approx(60.0)}


def test_unimax_sample_epochs_and_fractional_band(spark):
    # one domain, rate 2.4: every row appears in epochs 0 and 1; the
    # fractional epoch 2 admits ~40% deterministically
    n = 2000
    df = spark.createDataFrame(
        [(i, "en", 10) for i in range(n)], "doc_id long, lang string, n_tokens long"
    )
    kept, report = M.unimax_sample(
        df, "lang", ["doc_id"], token_budget=2.4 * 10 * n, max_epochs=4.0
    )
    rep = {r["domain"]: r for r in report.collect()}
    assert rep["en"]["epochs"] == 2
    assert rep["en"]["fraction_last_epoch"] == pytest.approx(0.4, abs=1e-9)
    per_epoch = {
        r["epoch"]: r["n"]
        for r in kept.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_epoch[0] == n and per_epoch[1] == n
    # fractional epoch: binomial(2000, 0.4) -> 3 sigma ~ 66
    assert abs(per_epoch[2] - 0.4 * n) < 70
    # full epochs carry every doc exactly once
    assert kept.where(F.col("epoch") < 2).select("doc_id", "epoch").distinct().count() == 2 * n


def test_unimax_sample_deterministic_and_partitioning_invariant(spark, toks):
    a, _ = M.unimax_sample(toks, "lang", ["doc_id"], 20_000.0, max_epochs=2.0)
    b, _ = M.unimax_sample(
        toks.repartition(17), "lang", ["doc_id"], 20_000.0, max_epochs=2.0
    )
    ka = sorted((r["doc_id"], r["epoch"]) for r in a.select("doc_id", "epoch").collect())
    kb = sorted((r["doc_id"], r["epoch"]) for r in b.select("doc_id", "epoch").collect())
    assert ka == kb and len(ka) > 0


def test_unimax_sample_realized_tokens_near_allocation(spark, toks):
    budget = 20_000.0
    kept, report = M.unimax_sample(toks, "lang", ["doc_id"], budget, max_epochs=2.0)
    realized = {
        r["lang"]: float(r["t"])
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for r in report.collect():
        # expected mass = allocation; fractional-epoch variance only
        assert realized[r["domain"]] == pytest.approx(
            r["allocated_tokens"], rel=0.12
        ), r["domain"]


def test_unimax_bad_args(spark, toks):
    with pytest.raises(ValueError):
        M.unimax_budgets(toks, "lang", 0.0)
    with pytest.raises(ValueError):
        M.unimax_budgets(toks, "lang", 10.0, max_epochs=0.0)
