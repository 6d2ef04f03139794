"""DSIR importance-resampling tests: exact numpy oracle for the hashed
ngram models and log weights, a sharp planted-selection outcome, and
the determinism/partitioning-invariance the Gumbel-key design claims."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import dsir

DIM = 512
SALT = "t-dsir"


def _np_ngrams(text: str, use_bigrams: bool = True) -> list[str]:
    import re

    toks = [t for t in re.split(r"\s+", (text or "").strip().lower()) if t]
    out = list(toks)
    if use_bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _np_model(texts, dim=DIM, alpha=1.0):
    counts = np.zeros(dim)
    for t in texts:
        for ng in _np_ngrams(t):
            counts[dsir.np_bucket(ng, dim, SALT)] += 1
    return np.log((counts + alpha) / (counts.sum() + alpha * dim))


PHYS = [
    f"quantum field theory lecture {i} covers gauge symmetry and "
    f"renormalization with rigorous operator formalism"
    for i in range(30)
]
SPAM = [
    f"buy cheap pills now offer {i} click here winner prize money "
    f"free bonus casino jackpot"
    for i in range(90)
]


def test_model_and_weights_match_numpy(spark):
    target = spark.createDataFrame([(i, t) for i, t in enumerate(PHYS[:10])],
                                   "doc_id long, text string")
    raw_rows = [(i, t) for i, t in enumerate(PHYS[10:20] + SPAM[:20])]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    p = dsir.fit_hashed_ngram_model(target, dim=DIM, salt=SALT)
    q = dsir.fit_hashed_ngram_model(raw, dim=DIM, salt=SALT)
    np_p = _np_model(PHYS[:10])
    np_q = _np_model([t for _, t in raw_rows])
    assert np.allclose(p, np_p, atol=1e-12)
    assert np.allclose(q, np_q, atol=1e-12)

    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir.dsir_log_weights(raw, p, q, salt=SALT).collect()
    }
    lam = np_p - np_q
    for i, t in raw_rows:
        want = sum(lam[dsir.np_bucket(ng, DIM, SALT)] for ng in _np_ngrams(t))
        assert got[i] == pytest.approx(want, abs=1e-9)
    # physics docs weigh decisively above spam under a physics target
    phys_min = min(v for i, v in got.items() if i < 10)
    spam_max = max(v for i, v in got.items() if i >= 10)
    assert phys_min > spam_max + 6.0  # dominates any Gumbel draw in practice


def test_planted_selection_is_all_target_like(spark):
    """Sharp outcome: with a physics target over a 25/75 physics/spam
    raw pool and k = n_physics, every selected doc is physics — the
    log-weight gap (tens of nats) dominates Gumbel noise (std ≈ 1.28)."""
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PHYS[:15])], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(PHYS[15:30])]
        + [(1000 + i, t) for i, t in enumerate(SPAM)],
        "doc_id long, text string",
    )
    sel = dsir.dsir_select(raw, target, k=15, dim=DIM, salt=SALT, seed=3)
    picked = sorted(r["doc_id"] for r in sel.collect())
    assert len(picked) == 15
    assert all(100 <= i < 1000 for i in picked)
    assert set(sel.columns) == set(raw.columns) | {"log_w"}


def test_selection_deterministic_and_partitioning_invariant(spark):
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PHYS[:10])], "doc_id long, text string"
    )
    rows = [(100 + i, t) for i, t in enumerate(PHYS[10:20] + SPAM[:40])]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(rows[::-1], "doc_id long, text string").repartition(13)
    pa_ = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(a, target, k=12, dim=DIM, salt=SALT, seed=7).collect()
    )
    pb = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(b, target, k=12, dim=DIM, salt=SALT, seed=7).collect()
    )
    assert pa_ == pb
    # a different seed reshuffles the Gumbel keys (same weights)
    pc = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(a, target, k=12, dim=DIM, salt=SALT, seed=8).collect()
    )
    assert len(pc) == 12  # may or may not equal pa_ — but must be valid


def test_empty_and_null_text_score_zero_and_bad_args(spark):
    target = spark.createDataFrame(
        [(0, PHYS[0])], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, SPAM[0])],
        "doc_id long, text string",
    )
    p = dsir.fit_hashed_ngram_model(target, dim=DIM, salt=SALT)
    q = dsir.fit_hashed_ngram_model(raw, dim=DIM, salt=SALT)
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir.dsir_log_weights(raw, p, q, salt=SALT).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert set(got) == {1, 2, 3, 4}  # featureless docs present, not dropped
    with pytest.raises(ValueError, match="dim"):
        dsir.fit_hashed_ngram_model(target, dim=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir.fit_hashed_ngram_model(target, alpha=0.0)
    with pytest.raises(ValueError, match="k must be"):
        dsir.dsir_select(raw, target, k=0)
    with pytest.raises(ValueError, match="shapes"):
        dsir.dsir_log_weights(raw, p, np.zeros(7))


def test_weights_plan_shape(spark):
    """The log-ratio table joins BROADCAST and the per-doc sum groups on
    the uniform id key — no global sort, no content-keyed window."""
    target = spark.createDataFrame([(0, PHYS[0])], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPAM[:10])], "doc_id long, text string"
    )
    p = dsir.fit_hashed_ngram_model(target, dim=DIM, salt=SALT)
    q = dsir.fit_hashed_ngram_model(raw, dim=DIM, salt=SALT)
    plan = (
        dsir.dsir_log_weights(raw, p, q, salt=SALT)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # selection plans as distributed TakeOrdered, not a global sort
    sel_plan = (
        dsir.dsir_select(raw, target, k=3, dim=DIM, salt=SALT)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in sel_plan


def test_gumbel_key_non_null_at_hash_extremes(spark):
    """Hashes within 1024 of +2⁶³ round to 2⁶³ as doubles, driving the
    unclamped uniform to exactly 1.0 where ``log(-log(u))`` NULLs the
    Gumbel sort key (the row would silently sort last regardless of
    weight); −2⁶³ drives it to exactly 0.0 where the inner log is −inf.
    Both extremes must yield finite, non-NULL keys."""
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark.operators.dsir import _gumbel_u

    df = spark.createDataFrame(
        [(2**63 - 1,), (2**63 - 1024,), (-(2**63),), (0,)], "h long"
    )
    got = df.select(
        _gumbel_u(F.col("h")).alias("u"),
        F.log(-F.log(_gumbel_u(F.col("h")))).alias("log_neg_log_u"),
    ).collect()
    for r in got:
        assert r["u"] is not None and 0.0 < r["u"] < 1.0
        assert r["log_neg_log_u"] is not None
        assert r["log_neg_log_u"] == r["log_neg_log_u"]  # not NaN
