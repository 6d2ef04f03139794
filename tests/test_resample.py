"""W8 resampler golden tests: both modes vs an independent numpy oracle.

The oracle uses a different formulation (segment-index lerp via
searchsorted / argmin-nearest) than the operator's np.interp-based kernel,
so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import resample


def oracle_linear_extrap(xg, x, y):
    idx = np.clip(np.searchsorted(x, xg), 1, len(x) - 1)
    x0, x1, y0, y1 = x[idx - 1], x[idx], y[idx - 1], y[idx]
    return y0 + (xg - x0) * (y1 - y0) / (x1 - x0)


def oracle_nearest(xg, x, y):
    return np.array([y[np.argmin(np.abs(x - g))] for g in xg])


def make_laps(n_laps=6, seed=3):
    rng = np.random.default_rng(seed)
    frames = []
    for lap in range(1, n_laps + 1):
        n = int(rng.integers(30, 80))
        x = np.sort(rng.uniform(5, 5000, size=n))
        x = np.unique(x)
        frames.append(
            pd.DataFrame(
                {
                    "lap": lap,
                    "x": x,
                    "a": rng.normal(100, 30, len(x)),
                    "b": rng.integers(0, 8, len(x)).astype(float),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def laps_pdf():
    return make_laps()


def test_grouped_parity_linear_and_nearest(spark, laps_pdf):
    sdf = spark.createDataFrame(laps_pdf)
    out = resample.resample_grouped(
        sdf,
        keys=["lap"],
        x_col="x",
        linear_cols=["a"],
        nearest_cols=["b"],
        step=10.0,
        start=0.0,
        min_rows=10,
        min_extent=None,
    ).toPandas()
    assert len(out) > 0
    for lap, grp in laps_pdf.groupby("lap"):
        got = out[out["lap"] == lap].sort_values("x")
        x = grp["x"].to_numpy()
        xg = np.arange(0.0, x.max(), 10.0)
        assert np.allclose(got["x"].to_numpy(), xg), f"grid mismatch lap {lap}"
        exp_a = oracle_linear_extrap(xg, x, grp["a"].to_numpy())
        assert np.allclose(got["a"].to_numpy(), exp_a, rtol=1e-9, atol=1e-9)
        exp_b = oracle_nearest(xg, x, grp["b"].to_numpy())
        # midpoint ties: both sides take the left sample
        assert np.allclose(got["b"].to_numpy(), exp_b)


def test_grouped_guards_drop_bad_laps(spark):
    pdf = pd.concat(
        [
            pd.DataFrame({"lap": 1, "x": np.linspace(0, 5000, 50), "a": 1.0}),
            pd.DataFrame({"lap": 2, "x": np.linspace(0, 5000, 5), "a": 1.0}),  # <10 rows
            pd.DataFrame({"lap": 3, "x": np.linspace(0, 1500, 50), "a": 1.0}),  # short
        ],
        ignore_index=True,
    )
    out = resample.resample_grouped(
        spark.createDataFrame(pdf),
        keys=["lap"],
        x_col="x",
        linear_cols=["a"],
        step=10.0,
        min_rows=10,
        min_extent=2000.0,
    ).toPandas()
    assert set(out["lap"].unique()) == {1}


def test_sql_mode_matches_oracle_interior(spark, laps_pdf):
    sdf = spark.createDataFrame(laps_pdf)
    out = resample.resample_linear_sql(
        sdf, ["lap"], "x", ["a"], step=25.0, start=None, edge="clamp"
    ).toPandas()
    for lap, grp in laps_pdf.groupby("lap"):
        got = out[out["lap"] == lap].sort_values("x")
        x = grp["x"].to_numpy()
        a = grp["a"].to_numpy()
        n_steps = int(np.ceil((x.max() - x.min()) / 25.0))
        xg = x.min() + 25.0 * np.arange(n_steps)
        assert np.allclose(got["x"].to_numpy(), xg), f"grid mismatch lap {lap}"
        exp = oracle_linear_extrap(xg, x, a)  # interior only: grid ⊂ [min,max]
        assert np.allclose(got["a"].to_numpy(), exp, rtol=1e-9, atol=1e-9)


def test_sql_mode_exact_hits_and_single_sample(spark):
    pdf = pd.DataFrame({"k": [1] * 3 + [2], "x": [0.0, 10.0, 20.0, 7.0], "v": [1.0, 2.0, 3.0, 9.0]})
    out = resample.resample_linear_sql(
        spark.createDataFrame(pdf), ["k"], "x", ["v"], step=10.0, start=0.0
    ).toPandas()
    g1 = out[out["k"] == 1].sort_values("x")
    assert list(g1["x"]) == [0.0, 10.0]  # arange end-exclusive: 20 excluded
    assert list(g1["v"]) == [1.0, 2.0]  # exact sample hits
    assert len(out[out["k"] == 2]) == 1  # grid [0) → single point, clamped
    assert out[out["k"] == 2]["v"].iloc[0] == 9.0
