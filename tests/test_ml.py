"""ML surface tests: per-group training recovers known coefficients,
JVM-side inference matches numpy, e2e pace-model on the telemetry
fixtures, degradation curve, coaching report."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import ml, schemas
from bigdataproject_formula1_telemetry_spark.plans import pipelines as P
from tests import fixtures


def make_linear_groups(seed=11):
    rng = np.random.default_rng(seed)
    frames = []
    truths = {}
    for g in range(3):
        n = 200
        X = rng.normal(0, 1, size=(n, 2))
        w = rng.normal(0, 2, size=2)
        b = float(rng.normal(0, 1))
        y = X @ w + b + rng.normal(0, 0.01, n)
        truths[g] = (w, b)
        frames.append(
            pd.DataFrame({"g": g, "x1": X[:, 0], "x2": X[:, 1], "y": y})
        )
    return pd.concat(frames, ignore_index=True), truths


def test_train_per_group_recovers_coefficients(spark):
    pdf, truths = make_linear_groups()
    models = ml.train_per_group(
        spark.createDataFrame(pdf), ["g"], ["x1", "x2"], "y"
    ).toPandas()
    assert len(models) == 3
    for _, row in models.iterrows():
        w, b = truths[row["g"]]
        assert np.allclose(row["coef"], w, atol=1e-2)
        assert abs(row["intercept"] - b) < 1e-2
        assert row["rmse"] < 0.05


def test_min_rows_guard(spark):
    pdf, _ = make_linear_groups()
    small = pd.DataFrame({"g": 99, "x1": [1.0] * 5, "x2": [2.0] * 5, "y": [3.0] * 5})
    models = ml.train_per_group(
        spark.createDataFrame(pd.concat([pdf, small])), ["g"], ["x1", "x2"], "y",
        min_rows=20,
    ).toPandas()
    assert 99 not in set(models["g"])


def test_predict_matches_numpy(spark):
    pdf, _ = make_linear_groups()
    sdf = spark.createDataFrame(pdf)
    models = ml.train_per_group(sdf, ["g"], ["x1", "x2"], "y")
    scored = ml.predict(sdf, models, ["g"], ["x1", "x2"]).toPandas()
    mpdf = models.toPandas().set_index("g")
    for g, grp in scored.groupby("g"):
        w = np.array(mpdf.loc[g, "coef"])
        b = mpdf.loc[g, "intercept"]
        exp = grp[["x1", "x2"]].to_numpy() @ w + b
        assert np.allclose(grp["prediction"].to_numpy(), exp, rtol=1e-9)


def test_e2e_pace_model_on_fixtures(spark):
    bronze = spark.createDataFrame(
        fixtures.gen_telemetry_raw(), schema=schemas.TELEMETRY_RAW
    )
    feats = P.add_pace_features(P.build_lap_dataset(P.build_warehouse(bronze)))
    model = ml.train_global(
        feats,
        ["TyreLife_max", "Compound_Encoded", "Prev_Pace_Ratio"],
        "Pace_Ratio",
    )
    m = model.toPandas()
    assert len(m) == 1
    # pace ratios live in [1, 1.07] after the rule — rmse must be tiny
    assert m["rmse"].iloc[0] < 0.1
    scored = ml.predict_global(
        feats, model, ["TyreLife_max", "Compound_Encoded", "Prev_Pace_Ratio"]
    )
    assert scored.count() == feats.count()


def test_degradation_curve(spark):
    base = spark.createDataFrame(
        pd.DataFrame({"base_time": [90.0], "Compound_Encoded": [2]})
    )
    out = ml.degradation_curve(base, n_laps=40).toPandas()
    assert len(out) == 40
    assert out["predicted_time"].iloc[0] == pytest.approx(90.0 * (1 + 0.005 * 1 * 2))
    assert out["predicted_time"].iloc[-1] == pytest.approx(90.0 * (1 + 0.005 * 40 * 2))
    assert out["predicted_time"].is_monotonic_increasing


def test_coaching_report_flags_slow_zone(spark):
    grid = np.arange(0.0, 3000.0, 10.0)
    teacher = pd.DataFrame({"Distance": grid, "Speed": np.full(len(grid), 250.0)})
    student_speed = np.full(len(grid), 248.0)
    zone = (grid >= 1000) & (grid <= 1300)
    student_speed[zone] = 215.0  # 35 km/h loss zone
    student = pd.DataFrame({"Distance": grid, "Speed": student_speed})
    rep = ml.coaching_report(
        spark.createDataFrame(teacher), spark.createDataFrame(student)
    ).toPandas()
    assert len(rep) == 1
    assert rep["start_m"].iloc[0] >= 990 and rep["end_m"].iloc[0] <= 1310
    assert rep["max_loss"].iloc[0] == pytest.approx(35.0)
    assert rep["advice"].iloc[0].startswith("CRITICAL")


class _MeanModel:
    """Picklable stand-in for a non-linear estimator (module-level so
    executor workers can import it when unpickling)."""

    def __init__(self, mean: float):
        self.mean = mean

    def predict(self, X):
        return np.full(len(X), self.mean)


def test_pluggable_fit_fn_blob_roundtrip(spark):
    """A custom fit_fn emitting a pickled model must train per group and
    score through predict_blob (the xgboost orchestration shape)."""
    import pickle

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 30 + ["b"] * 30,
            "x1": np.arange(60, dtype=float),
            "y": [2.0] * 30 + [7.0] * 30,
        }
    )
    sdf = spark.createDataFrame(pdf)

    def mean_fit(X, y):
        m = _MeanModel(float(np.mean(y)))
        return {"model_blob": pickle.dumps(m)}, m.predict(X)

    models = ml.train_per_group(sdf, ["g"], ["x1"], "y", fit_fn=mean_fit)
    mm = {r["g"]: r for r in models.collect()}
    assert mm["a"]["coef"] is None and mm["a"]["model_blob"] is not None
    assert mm["a"]["rmse"] == pytest.approx(0.0)

    scored = ml.predict_blob(sdf, models, ["g"], ["x1"]).toPandas()
    assert len(scored) == 60
    assert (scored.loc[scored["g"] == "a", "prediction"] == 2.0).all()
    assert (scored.loc[scored["g"] == "b", "prediction"] == 7.0).all()

    # groups without a model are dropped (inner-join semantics)
    extra = spark.createDataFrame(
        pd.DataFrame({"g": ["zz"], "x1": [1.0], "y": [0.0]})
    )
    assert ml.predict_blob(extra, models, ["g"], ["x1"]).count() == 0


@pytest.mark.skipif(not ml.HAS_XGBOOST, reason="xgboost not installed")
def test_xgboost_fit_fn_reproduces_reference_model(spark):
    """Where xgboost exists, the gated path must beat ridge on a
    non-linear target (the reference's v2->v4 RMSE ladder direction,
    P1-F1_Tyre_Strategy_Predict_Model.ipynb:479-488)."""
    rng = np.random.default_rng(7)
    x = rng.uniform(-3, 3, 400)
    pdf = pd.DataFrame({"g": ["c"] * 400, "x1": x, "y": np.sin(x) * 5 + x * x})
    sdf = spark.createDataFrame(pdf)
    linear = ml.train_per_group(sdf, ["g"], ["x1"], "y").collect()[0]
    boosted = ml.train_per_group(
        sdf, ["g"], ["x1"], "y", fit_fn=ml.xgboost_fit_fn()
    ).collect()[0]
    assert boosted["rmse"] < linear["rmse"] / 2
    scored = ml.predict_blob(sdf, spark.createDataFrame([boosted]), ["g"], ["x1"])
    assert scored.count() == 400


def test_xgboost_fit_fn_raises_without_xgboost():
    if not ml.HAS_XGBOOST:
        with pytest.raises(ImportError, match="xgboost"):
            ml.xgboost_fit_fn()


def test_gbt_beats_ridge_on_nonlinear_target():
    """The pure-numpy boosted-trees estimator must model a nonlinear
    interaction the linear stand-in can't (the reference's headline
    estimator is gradient-boosted trees; this is its no-xgboost
    replacement, not a linear approximation)."""
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, size=(4000, 3))
    y = np.sin(2 * X[:, 0]) + 0.5 * X[:, 1] * X[:, 2] + 0.05 * rng.normal(size=4000)

    _, ridge_pred = ml.ridge_fit_fn()(X, y)
    art, gbt_pred = ml.gbt_fit_fn(n_estimators=150)(X, y)
    ridge_rmse = float(np.sqrt(np.mean((ridge_pred - y) ** 2)))
    gbt_rmse = float(np.sqrt(np.mean((gbt_pred - y) ** 2)))
    assert gbt_rmse < 0.4 * ridge_rmse, (ridge_rmse, gbt_rmse)

    # holdout generalization, not just train-set memorization
    Xt = rng.uniform(-2, 2, size=(1000, 3))
    yt = np.sin(2 * Xt[:, 0]) + 0.5 * Xt[:, 1] * Xt[:, 2]
    import pickle

    model = pickle.loads(art["model_blob"])
    test_rmse = float(np.sqrt(np.mean((model.predict(Xt) - yt) ** 2)))
    assert test_rmse < 0.35, test_rmse

    # deterministic: identical artifact bytes on refit
    art2, _ = ml.gbt_fit_fn(n_estimators=150)(X, y)
    assert art["model_blob"] == art2["model_blob"]


def test_gbt_through_spark_train_and_predict_blob(spark):
    """gbt_fit_fn artifacts flow through the same per-group train +
    mapInPandas scoring seam as xgboost blobs."""
    import pandas as pd

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "g": np.repeat([1, 2], 300),
            "x1": rng.uniform(-2, 2, 600),
            "x2": rng.uniform(-2, 2, 600),
        }
    )
    # different nonlinear shape per group
    pdf["y"] = np.where(
        pdf["g"] == 1, np.sin(2 * pdf["x1"]), pdf["x1"] * pdf["x2"]
    )
    sdf = spark.createDataFrame(pdf)
    models = ml.train_per_group(
        sdf, ["g"], ["x1", "x2"], "y", fit_fn=ml.gbt_fit_fn(n_estimators=60)
    )
    rows = {r["g"]: r for r in models.collect()}
    assert set(rows) == {1, 2}
    # target std is ~1.3 per group; ≤0.35 train RMSE = a real nonlinear fit
    assert all(r["model_blob"] is not None and r["rmse"] < 0.35 for r in rows.values())

    scored = ml.predict_blob(sdf, models, ["g"], ["x1", "x2"]).toPandas()
    assert len(scored) == 600
    rmse = float(np.sqrt(np.mean((scored["prediction"] - scored["y"]) ** 2)))
    assert rmse < 0.35, rmse


def _gen_lap_ladder_fixture(seed=42):
    """Synthetic lap corpus with the structure that drives the reference's
    v2→v4 RMSE ladder (BASELINE.md: ±8.45 → ±1.22 → ±0.60 s,
    P1-F1_Tyre_Strategy_Predict_Model.ipynb:157,371,523):

    - circuits with widely different base lap times (multiplicative), so
      an absolute-seconds model wastes capacity re-learning the bases;
    - per-driver multiplicative skill + compound/tyre-age degradation in
      *ratio* space (clean once the base is divided out);
    - an AR(1) "traffic" component: unpredictable from static features,
      partially predictable from the previous laps' observed pace — the
      signal lag features exist to capture.
    """
    rng = np.random.default_rng(seed)
    circuits = 12
    drivers = 8
    laps = 30
    base = 70.0 + 35.0 * rng.random(circuits)
    skill = 1.0 + 0.015 * rng.standard_normal(drivers)
    deg_rate = {0: 0.0030, 1: 0.0018, 2: 0.0010}  # SOFT/MED/HARD per-lap
    rows = []
    for c in range(circuits):
        for d in range(drivers):
            comp = (c + d) % 3
            traffic = 0.0
            for lap in range(1, laps + 1):
                traffic = 0.85 * traffic + 0.004 * rng.standard_normal()
                ratio = (
                    skill[d]
                    * (1.0 + deg_rate[comp] * lap + 2e-5 * lap * lap)
                    + traffic
                    + 0.002 * rng.standard_normal()
                )
                rows.append(
                    dict(
                        circuit=c,
                        driver=d,
                        compound=comp,
                        tyre_life=lap,
                        lap_no=lap,
                        lap_time=float(base[c] * ratio),
                    )
                )
    return pd.DataFrame(rows)


def test_rmse_ladder_absolute_to_ratio_to_lag(spark):
    """Reproduce the reference's v2→v4 modelling arc with the in-engine
    numpy GBT (ml.gbt_fit_fn) on the synthetic lap fixture, asserting the
    ORDERING — ratio-space beats absolute seconds, lag features beat both
    — not the reference's exact numbers (those need its 73k-lap FastF1
    corpus and xgboost; BASELINE.md rows v2/v3/v4)."""
    from bigdataproject_formula1_telemetry_spark.operators import windows as W

    pdf = _gen_lap_ladder_fixture()
    sdf = spark.createDataFrame(pdf).withColumn("g", F.lit(0))

    # deterministic 25% holdout, same split for all three models
    split = F.abs(F.hash("circuit", "driver", "lap_no")) % 4
    sdf = sdf.withColumn("is_test", split == 0)

    # per-circuit base pace estimated from TRAIN rows only (the
    # reference's quali-pace denominator re-expressed as a train median)
    bases = (
        sdf.where(~F.col("is_test"))
        .groupBy("circuit")
        .agg(F.expr("percentile_approx(lap_time, 0.5, 10000)").alias("base_pace"))
    )
    sdf = sdf.join(F.broadcast(bases), "circuit").withColumn(
        "pace_ratio", F.col("lap_time") / F.col("base_pace")
    )
    # W2 lag features over the stint ordering — the v4 ingredient
    sdf = W.lag_features(
        sdf, ["circuit", "driver"], ["lap_no"], ["pace_ratio"], offset=1
    )
    sdf = W.lag_features(
        sdf, ["circuit", "driver"], ["lap_no"], ["pace_ratio"], offset=2,
        prefix="Prev2_",
    )
    sdf = sdf.dropna(subset=["Prev_pace_ratio", "Prev2_pace_ratio"]).cache()

    static = ["circuit", "driver", "compound", "tyre_life", "lap_no"]
    lagged = static + ["Prev_pace_ratio", "Prev2_pace_ratio"]
    gbt = ml.gbt_fit_fn(n_estimators=120, max_depth=3)

    def holdout_rmse(feature_cols, label, to_seconds):
        train = sdf.where(~F.col("is_test"))
        test = sdf.where(F.col("is_test"))
        models = ml.train_per_group(
            train, ["g"], feature_cols, label, fit_fn=gbt
        )
        scored = ml.predict_blob(test, models, ["g"], feature_cols)
        err = to_seconds(scored).select(
            F.sqrt(F.avg(F.pow(F.col("err_sec"), 2))).alias("rmse")
        )
        return float(err.first()["rmse"])

    rmse_v2 = holdout_rmse(
        static, "lap_time",
        lambda s: s.withColumn("err_sec", F.col("prediction") - F.col("lap_time")),
    )
    rmse_v3 = holdout_rmse(
        static, "pace_ratio",
        lambda s: s.withColumn(
            "err_sec", F.col("prediction") * F.col("base_pace") - F.col("lap_time")
        ),
    )
    rmse_v4 = holdout_rmse(
        lagged, "pace_ratio",
        lambda s: s.withColumn(
            "err_sec", F.col("prediction") * F.col("base_pace") - F.col("lap_time")
        ),
    )
    sdf.unpersist()

    # the reference's arc: each step strictly improves, ratio-space is a
    # big step, lags a further real one (margins chosen ~2x looser than
    # measured so the assertion tests structure, not noise)
    assert rmse_v3 < 0.75 * rmse_v2, (rmse_v2, rmse_v3, rmse_v4)
    assert rmse_v4 < 0.85 * rmse_v3, (rmse_v2, rmse_v3, rmse_v4)
