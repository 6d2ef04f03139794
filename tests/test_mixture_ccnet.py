"""CCNet perplexity buckets and fixed-weight mixture sampling —
planted-outcome tests with exact expectations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import lm as LM
from bigdataproject_formula1_telemetry_spark.operators import sampling as SA


def test_ppl_buckets_exact_terciles_per_lang(spark):
    """9 docs per language with distinct ppl ranks → exactly 3/3/3 in
    head/middle/tail PER language, head = lowest ppl, and a doc that is
    'head' in a high-ppl language would be 'tail' in a low-ppl one (the
    per-language normalization CCNet exists for)."""
    rows = []
    for li, lang in enumerate(("en", "de")):
        for j in range(9):
            # en: ppl 10..18, de: ppl 100..180 (disjoint scales)
            rows.append((li * 100 + j, lang, float(10 + j) * (10 ** li)))
    scored = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = LM.ppl_buckets(scored).collect()
    got = {r["doc_id"]: r["ppl_bucket"] for r in out}
    for li in (0, 1):
        for j in range(9):
            want = "head" if j < 3 else ("middle" if j < 6 else "tail")
            assert got[li * 100 + j] == want, (li, j)
    # the column composes as the CCNet head+middle gate
    kept = LM.ppl_buckets(scored).where(F.col("ppl_bucket") != "tail")
    assert kept.count() == 12


def test_ppl_buckets_null_handling_and_whole_corpus_mode(spark):
    scored = spark.createDataFrame(
        [(1, "en", 10.0), (2, "en", 20.0), (3, "en", 30.0),
         (4, "en", None), (5, None, 15.0)],
        "doc_id long, lang string, ppl double",
    )
    got = {r["doc_id"]: r["ppl_bucket"] for r in LM.ppl_buckets(scored).collect()}
    assert got[4] is None          # NULL ppl → NULL bucket
    assert got[5] is not None      # NULL lang is a population, not lost
    assert got[1] == "head" and got[3] == "tail"
    # lang_col=None: one global population
    g = {
        r["doc_id"]: r["ppl_bucket"]
        for r in LM.ppl_buckets(scored, lang_col=None).collect()
    }
    assert g[1] == "head" and g[3] == "tail" and g[4] is None
    with pytest.raises(ValueError, match="already exists"):
        LM.ppl_buckets(scored.withColumn("ppl_bucket", F.lit("x")))


def test_ppl_buckets_plan_has_no_window(spark):
    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(20)],
        "doc_id long, lang string, ppl double",
    )
    plan = (
        LM.ppl_buckets(scored)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_mixture_sample_hits_targets_and_reports_shortfall(spark):
    """Three domains with known token mass; budget splits 50/30/20.
    The rare domain cannot fill its target → fraction 1.0 and an exact
    shortfall row; the big domains sample at target/available with
    realized mass concentrating around target."""
    rng = np.random.default_rng(5)
    rows = []
    for d, n, tok in (("web", 20_000, 100), ("code", 10_000, 100), ("wiki", 30, 100)):
        for i in range(n):
            rows.append((f"{d}-{i}", d, tok))
    df = spark.createDataFrame(rows, "doc_id string, domain string, n_tokens long")
    budget = 1_000_000.0  # web target 500k/2M avail, code 300k/1M, wiki 200k/3k
    sampled, report = SA.mixture_sample(
        df, "domain", {"web": 0.5, "code": 0.3, "wiki": 0.2}, budget
    )
    rep = {r["domain"]: r for r in report.collect()}
    assert rep["web"]["fraction"] == pytest.approx(0.25)
    assert rep["code"]["fraction"] == pytest.approx(0.3)
    assert rep["wiki"]["fraction"] == 1.0
    assert rep["wiki"]["shortfall_tokens"] == pytest.approx(200_000.0 - 3_000.0)
    got = {
        r["domain"]: r["t"]
        for r in sampled.groupBy("domain").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert got["wiki"] == 3_000  # fraction 1.0 keeps EVERY row
    assert abs(got["web"] - 500_000) / 500_000 < 0.05
    assert abs(got["code"] - 300_000) / 300_000 < 0.05


def test_mixture_sample_deterministic_and_drops_unlisted_domains(spark):
    rows = [(i, "a" if i % 2 else "b", 10) for i in range(1000)]
    rows += [(10_000 + i, "junk", 10) for i in range(100)]
    a = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    b = spark.createDataFrame(rows[::-1], "doc_id long, domain string, n_tokens long").repartition(7)
    s1, _ = SA.mixture_sample(a, "domain", {"a": 1.0, "b": 1.0}, 4_000.0)
    s2, _ = SA.mixture_sample(b, "domain", {"a": 1.0, "b": 1.0}, 4_000.0)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2
    assert all(i < 10_000 for i in ids1)  # 'junk' never sampled
    with pytest.raises(ValueError, match="token_budget"):
        SA.mixture_sample(a, "domain", {"a": 1.0}, 0.0)
    with pytest.raises(ValueError, match="non-empty"):
        SA.mixture_sample(a, "domain", {}, 10.0)
    with pytest.raises(ValueError, match="negative weight"):
        SA.mixture_sample(a, "domain", {"a": -1.0}, 10.0)
