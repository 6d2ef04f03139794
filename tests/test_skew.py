"""Skew utilities: salted results must equal their unsalted equivalents."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 has 50x the rows of the others
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame(
        {
            "k": np.concatenate([np.zeros(5000, dtype=np.int64),
                                 rng.integers(1, 20, 100)]),
            "v": rng.normal(10, 2, 5100),
            "rid": np.arange(5100, dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf)


def test_salted_agg_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("v"), 6).alias("s"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        skew.salted_agg(
            skewed,
            ["k"],
            {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
            {"cnt": F.sum("cnt").cast("long"), "s": F.round(F.sum("s"), 6)},
            n_salts=8,
            id_cols=["rid"],
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (plain["cnt"].to_numpy() == salted["cnt"].to_numpy()).all()
    assert np.allclose(plain["s"], salted["s"], atol=1e-4)


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(20, dtype=np.int64), "name": [f"n{i}" for i in range(20)]})
    )
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = skew.salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k", "name").count()
    a = plain.toPandas().sort_values("k").reset_index(drop=True)
    b = salted.toPandas().sort_values("k").reset_index(drop=True)
    assert (a["count"].to_numpy() == b["count"].to_numpy()).all()
    assert (a["name"] == b["name"]).all()


def test_salt_is_deterministic(spark, skewed):
    a = skew.with_salt(skewed, 8, ["rid"]).select("rid", "__salt").toPandas()
    b = skew.with_salt(skewed, 8, ["rid"]).select("rid", "__salt").toPandas()
    m = a.merge(b, on="rid")
    assert (m["__salt_x"] == m["__salt_y"]).all()
    assert a["__salt"].nunique() == 8


def test_salted_join_rejects_nonequivalent_join_types(spark, skewed):
    dim = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(5, dtype=np.int64), "name": ["x"] * 5})
    )
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(skewed, dim, ["k"], how=how)


def test_salted_join_left_matches_plain(spark, skewed):
    # small side misses key 0 (the hot key) → left join has unmatched rows
    dim = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(1, 20, dtype=np.int64),
                      "name": [f"n{i}" for i in range(1, 20)]})
    )
    plain = skewed.join(dim, "k", "left").groupBy("k", "name").count()
    salted = (
        skew.salted_join(skewed, dim, ["k"], n_salts=8, how="left")
        .groupBy("k", "name")
        .count()
    )
    a = plain.toPandas().sort_values(["k"]).reset_index(drop=True)
    b = salted.toPandas().sort_values(["k"]).reset_index(drop=True)
    assert (a["count"].to_numpy() == b["count"].to_numpy()).all()
    assert a["name"].fillna("-").equals(b["name"].fillna("-"))


def test_salted_join_accepts_spark_aliases(spark, skewed):
    """Spark-accepted aliases of the supported join types must work
    (ADVICE r2): 'semi'/'leftsemi'/'anti'/'leftanti'/'leftouter'."""
    dim = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(1, 20, dtype=np.int64),
                      "name": [f"n{i}" for i in range(1, 20)]})
    )
    for how, ref_how in (
        ("semi", "left_semi"), ("leftsemi", "left_semi"),
        ("anti", "left_anti"), ("leftanti", "left_anti"),
        ("leftouter", "left"), ("LEFT_OUTER", "left"),
    ):
        plain = skewed.join(dim, ["k"], ref_how).count()
        salted = skew.salted_join(skewed, dim, ["k"], n_salts=4, how=how).count()
        assert salted == plain, how
