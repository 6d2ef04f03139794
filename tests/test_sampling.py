"""Deterministic sampling: rate concentration, reproducibility, strata."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import sampling
from tests.conftest import SF_SMOKE


def test_rate_and_determinism(spark):
    o = io.read_table(spark, SF_SMOKE, "orders")
    n = o.count()
    s1 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="a")
    k1 = s1.count()
    assert abs(k1 / n - 0.2) < 0.05
    # identical sample on re-run (no rand())
    k2 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="a")
    assert (
        s1.select("o_orderkey").subtract(k2.select("o_orderkey")).count() == 0
    )
    # different salt → different (but same-rate) sample
    s3 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="b")
    overlap = s1.select("o_orderkey").intersect(s3.select("o_orderkey")).count()
    assert overlap < k1  # not the same set


def test_nested_fractions_subset_property(spark):
    """A 10% sample is a subset of the 20% sample (same salt) — the
    threshold gate is monotone, enabling progressive dataset growth."""
    o = io.read_table(spark, SF_SMOKE, "orders")
    s10 = sampling.deterministic_sample(o, ["o_orderkey"], 0.1)
    s20 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2)
    assert s10.select("o_orderkey").subtract(s20.select("o_orderkey")).count() == 0


def test_stratified_rates(spark):
    docs = io.read_table(spark, SF_SMOKE, "documents")
    out = sampling.stratified_sample(
        docs, "lang", {"en": 0.3, "zh": 1.0}, ["doc_id"]
    )
    pdf = out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    base = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    assert pdf.get("zh", 0) == base["zh"]  # keep-all stratum
    assert 0.1 < pdf.get("en", 0) / base["en"] < 0.5  # ~30%
    # unlisted strata default to 0
    assert set(pdf.index) <= {"en", "zh"}


def test_sample_by_key_keeps_whole_groups(spark):
    ev = io.read_table(spark, SF_SMOKE, "events")
    kept = sampling.sample_by_key(ev, ["user_id"], 0.3)
    per_user_kept = kept.groupBy("user_id").count()
    per_user_all = ev.groupBy("user_id").count().withColumnRenamed("count", "all")
    j = per_user_kept.join(per_user_all, "user_id").where(
        F.col("count") != F.col("all")
    )
    assert j.count() == 0  # every kept user keeps ALL their events


def test_fraction_one_keeps_every_row(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"id": range(2000)}))
    assert sampling.deterministic_sample(df, ["id"], 1.0).count() == 2000


def test_null_ids_gate_independently(spark):
    """Null-id rows must not share one all-or-nothing gate decision: with
    a second non-null id column varying, ~frac of null-id rows survive."""
    import pandas as pd

    pdf = pd.DataFrame({"a": [None] * 1000, "b": range(1000)})
    df = spark.createDataFrame(pdf)
    n = sampling.deterministic_sample(df, ["a", "b"], 0.5).count()
    assert 350 < n < 650, n
    # all id columns null: same single gate per distinct identity, but the
    # sentinel makes the decision deterministic, not dependent on frac of
    # the OTHER columns' hash  (documented contract)
    pdf2 = pd.DataFrame({"a": [None] * 10, "b": [None] * 10})
    df2 = spark.createDataFrame(pdf2, schema="a string, b string")
    k = sampling.deterministic_sample(df2, ["a", "b"], 0.5).count()
    assert k in (0, 10)
