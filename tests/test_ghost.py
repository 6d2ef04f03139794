"""Ghost-car path (U4/U5) + streaming scoring (T6) tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import ml
from bigdataproject_formula1_telemetry_spark.streaming import scoring


def make_traces(n_groups=2, n_points=600, seed=9):
    """Per-group AR-ish speed traces: next value is a noisy linear function
    of the recent past → a window-linear model can actually learn it."""
    rng = np.random.default_rng(seed)
    frames = []
    for g in range(n_groups):
        x = np.zeros(n_points)
        x[0] = 200.0
        for i in range(1, n_points):
            x[i] = 0.7 * x[i - 1] + 0.3 * (200 + 30 * np.sin(i / 25)) + rng.normal(0, 0.5)
        frames.append(
            pd.DataFrame({"circuit": g, "pos": np.arange(n_points, dtype=np.int64),
                          "speed": x})
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def traces(spark):
    return spark.createDataFrame(make_traces())


def test_ghost_train_and_infer(spark, traces):
    models = ml.train_ghost_per_group(
        traces, ["circuit"], ["pos"], ["speed"], "speed", length=20, min_rows=100
    )
    m = models.toPandas()
    assert len(m) == 2
    assert (m["rmse"] < 2.0).all()  # learnable AR structure
    preds = ml.ghost_inference(
        traces, models, ["circuit"], ["pos"], ["speed"],
        length=20, stride=5, strict_factor=1.05,
    ).toPandas()
    assert len(preds) > 0
    # stride applied: 1/5th of eligible windows per group
    per_g = preds.groupby("circuit").size()
    assert all(abs(n - (600 - 20) / 5) <= 2 for n in per_g)
    # predictions track the signal (×1.05 boost): within 10% of boosted truth
    err = np.abs(preds["ghost_pred"] / 1.05 - preds["speed"]) / preds["speed"]
    assert float(np.median(err)) < 0.05


def test_ghost_min_sequences_guard(spark):
    small = spark.createDataFrame(make_traces(n_groups=1, n_points=80))
    models = ml.train_ghost_per_group(
        small, ["circuit"], ["pos"], ["speed"], "speed", length=20, min_rows=100
    )
    assert models.count() == 0  # <100 sequences → skipped, like the reference


def test_score_stream_matches_batch(spark, traces, tmp_path):
    models = ml.train_global(traces, ["pos"], "speed")
    src = str(tmp_path / "src")
    traces.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(traces.schema).parquet(src)

    sink_dir = str(tmp_path / "scored")

    def sink(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    q = (
        scoring.score_stream(stream, models, ["pos"], sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    got = spark.read.parquet(sink_dir)
    exp = ml.predict_global(traces, models, ["pos"])
    assert got.count() == exp.count()
    g = got.toPandas().sort_values(["circuit", "pos"]).reset_index(drop=True)
    e = exp.toPandas().sort_values(["circuit", "pos"]).reset_index(drop=True)
    assert np.allclose(g["prediction"], e["prediction"])


def test_ghost_mlp_window_model(spark, traces):
    """U4/U5 with the nonlinear numpy window network (mlp_fit_fn): blob
    artifacts train per group and score through ghost_inference's
    mapInPandas path, tracking the signal at least as well as the linear
    window model."""
    models = ml.train_ghost_per_group(
        traces, ["circuit"], ["pos"], ["speed"], "speed",
        length=20, min_rows=100, fit_fn=ml.mlp_fit_fn(epochs=30),
    )
    m = models.toPandas()
    assert len(m) == 2
    assert m["coef"].isna().all() and m["model_blob"].notna().all()
    assert (m["rmse"] < 2.0).all()

    preds = ml.ghost_inference(
        traces, models, ["circuit"], ["pos"], ["speed"],
        length=20, stride=5, strict_factor=1.05,
    ).toPandas()
    per_g = preds.groupby("circuit").size()
    assert all(abs(n - (600 - 20) / 5) <= 2 for n in per_g)
    err = np.abs(preds["ghost_pred"] / 1.05 - preds["speed"]) / preds["speed"]
    assert float(np.median(err)) < 0.05

    # determinism: refit produces the identical artifact
    again = ml.train_ghost_per_group(
        traces, ["circuit"], ["pos"], ["speed"], "speed",
        length=20, min_rows=100, fit_fn=ml.mlp_fit_fn(epochs=30),
    ).toPandas()
    a = {r["circuit"]: bytes(r["model_blob"]) for _, r in m.iterrows()}
    b = {r["circuit"]: bytes(r["model_blob"]) for _, r in again.iterrows()}
    assert a == b


def test_mlp_fit_fn_learns_nonlinear_function():
    rng = np.random.default_rng(4)
    X = rng.uniform(-2, 2, size=(3000, 2))
    y = np.sin(2 * X[:, 0]) * X[:, 1]
    _, ridge_pred = ml.ridge_fit_fn()(X, y)
    _, mlp_pred = ml.mlp_fit_fn(hidden=48, epochs=120)(X, y)
    ridge_rmse = float(np.sqrt(np.mean((ridge_pred - y) ** 2)))
    mlp_rmse = float(np.sqrt(np.mean((mlp_pred - y) ** 2)))
    assert mlp_rmse < 0.35 * ridge_rmse, (ridge_rmse, mlp_rmse)
