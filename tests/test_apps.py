"""Apps-layer tests: dashboard/analyzer workloads as engine clients, plus
ingest feeder and dim upsert."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import apps, io, ml, schemas
from bigdataproject_formula1_telemetry_spark.plans import pipelines as P
from bigdataproject_formula1_telemetry_spark.sources import ingest
from tests import fixtures


@pytest.fixture(scope="module")
def warehouse_root(spark, tmp_path_factory):
    bronze = spark.createDataFrame(
        fixtures.gen_telemetry_raw(), schema=schemas.TELEMETRY_RAW
    )
    wh = P.build_warehouse(bronze)
    root = str(tmp_path_factory.mktemp("app") / "wh")
    io.write_partitioned(wh, root, ("Year", "Round"))
    return root


def test_explorer_flow(spark, warehouse_root):
    circuit = apps.load_circuit(spark, warehouse_root, 2023, 1).cache()
    drivers = apps.explorer_drivers(circuit).toPandas()["Driver"].tolist()
    assert drivers == sorted(drivers) and len(drivers) >= 3
    trace = apps.explorer_lap_trace(circuit, drivers[0], 1).toPandas()
    assert len(trace) > 100
    assert trace["Distance"].is_monotonic_increasing


def test_strategy_flow(spark, warehouse_root):
    circuit = apps.load_circuit(spark, warehouse_root, 2023, 1)
    base = apps.strategy_base_time(circuit).collect()[0]["base_time"]
    # fixture includes an injected 30 s outlier lap (killed later by the
    # 107% rule, but the dashboard's base-time guard is only > 10)
    assert base > 10
    wh = spark.read.parquet(warehouse_root)
    feats = P.add_pace_features(P.build_lap_dataset(wh))
    models = ml.train_global(
        feats, ["TyreLife_max", "Compound_Encoded", "Prev_Pace_Ratio"], "Pace_Ratio"
    )
    out = apps.strategy_what_if(spark, models, base, 20.0, 3, 1.02).toPandas()
    assert len(out) == 1
    # ratio-space prediction restored to seconds around the base time
    assert 0.8 * base < out["predicted_lap_time"].iloc[0] < 1.5 * base


def test_fastest_lap_overlay(spark, warehouse_root):
    wh = spark.read.parquet(warehouse_root)
    overlay = apps.fastest_lap_overlay(wh, [2023, 2024]).toPandas()
    assert set(overlay["Year"].unique()) == {2023, 2024}
    # exactly one lap per year → trace lengths equal lap grid sizes
    per_year = overlay.groupby("Year").size()
    assert (per_year > 100).all()


def test_ghost_vs_human_flow(spark, warehouse_root):
    circuit = apps.load_circuit(spark, warehouse_root, 2023, 1)
    drivers = apps.explorer_drivers(circuit).toPandas()["Driver"].tolist()
    d = drivers[0]
    trace = circuit.where(F.col("Driver") == d).select(
        "Driver", "Distance", F.col("Speed").cast("double").alias("Speed"), "LapNumber"
    )
    models = ml.train_ghost_per_group(
        trace, ["Driver"], ["LapNumber", "Distance"], ["Speed"], "Speed",
        length=20, min_rows=50,
    )
    if models.count() == 0:
        pytest.skip("not enough sequences in fixture")
    out = apps.ghost_vs_human(circuit, models, d).toPandas()
    assert set(out["series"].unique()) == {"human", "ghost"}
    n_h = (out["series"] == "human").sum()
    n_g = (out["series"] == "ghost").sum()
    assert n_g > 0 and n_g < n_h  # strided ghost is sparser than the trace


def test_ingest_feeder(spark, tmp_path):
    sched = spark.createDataFrame(
        [(2024, 1, "conventional"), (2024, 2, "testing"), (2024, 3, "sprint")],
        "Year long, Round long, EventFormat string",
    )
    keep = ingest.filter_schedule(sched).select("Year", "Round").collect()
    wanted = [(r["Year"], r["Round"]) for r in keep]
    assert wanted == [(2024, 1), (2024, 3)]

    calls = []

    def fetch(year, rnd):
        calls.append((year, rnd))
        # frames missing Compound/TyreLife → NULL normalization path
        return [
            pd.DataFrame(
                {
                    "Driver": 1,
                    "LapNumber": 1,
                    "Time": np.linspace(0, 90, 50),
                    "Distance": np.linspace(0, 5000, 50),
                    "Speed": 200.0,
                    "RPM": 9000.0,
                    "Throttle": 50.0,
                    "Brake": 0.0,
                    "nGear": 5.0,
                    "DRS": 0.0,
                }
            )
        ]

    root = str(tmp_path / "bronze")
    n = ingest.ingest_rounds(spark, root, wanted, fetch, min_rows=None)
    assert n == 2 and sorted(calls) == wanted
    back = spark.read.parquet(root)
    assert back.count() == 100
    assert back.where(F.col("Compound").isNull()).count() == 100
    # second run: idempotent skip, no network calls
    calls.clear()
    assert ingest.ingest_rounds(spark, root, wanted, fetch, min_rows=None) == 0
    assert calls == []


def test_upsert_dim(spark, tmp_path):
    path = str(tmp_path / "race_meta")
    v1 = spark.createDataFrame(
        [(2024, 1, "GP A"), (2024, 2, "GP B")], "year long, round long, event_name string"
    )
    io.upsert_dim(spark, v1, path, ("year", "round"))
    v2 = spark.createDataFrame(
        [(2024, 2, "GP B-renamed"), (2024, 3, "GP C")],
        "year long, round long, event_name string",
    )
    out = io.upsert_dim(spark, v2, path, ("year", "round")).toPandas()
    assert len(out) == 3
    names = out.set_index(["year", "round"])["event_name"]
    assert names[(2024, 2)] == "GP B-renamed"  # new row wins
    assert names[(2024, 1)] == "GP A"  # untouched row survives


def test_upsert_dim_schema_drift_propagates(spark, tmp_path):
    """A broken merge against an EXISTING table must raise, not silently
    overwrite the dimension with only the new rows (ADVICE r1)."""
    import pandas as pd
    import pytest

    path = str(tmp_path / "dim")
    v1 = spark.createDataFrame(
        pd.DataFrame({"year": [2024], "round": [1], "name": ["a"]})
    )
    io.upsert_dim(spark, v1, path, ("year", "round"))
    # an unresolvable merge key → analysis error; the bare-except fallback
    # used to swallow this and overwrite the table with only the new rows
    v2 = spark.createDataFrame(
        pd.DataFrame({"year": [2024], "round": [2], "name": ["b"]})
    )
    with pytest.raises(Exception, match="no_such_key|CANNOT_RESOLVE|UNRESOLVED"):
        io.upsert_dim(spark, v2, path, ("year", "no_such_key"))
    # table unchanged
    assert spark.read.parquet(path).count() == 1


def test_existing_partitions_error_narrowing(spark, tmp_path):
    """Only a missing root means "no partitions yet"; any other read
    failure must propagate instead of silently re-planning a full
    re-ingest (VERDICT r2)."""
    import pandas as pd
    import pytest

    # missing root → empty set (the planner's "fresh lake" case)
    assert io.existing_partitions(spark, str(tmp_path / "nope"), ("year",)) == set()

    # readable table but a broken partition-column reference → propagate
    path = str(tmp_path / "wh")
    spark.createDataFrame(
        pd.DataFrame({"year": [2024], "v": [1.0]})
    ).write.parquet(path)
    with pytest.raises(Exception, match="no_such_col|CANNOT_RESOLVE|UNRESOLVED"):
        io.existing_partitions(spark, path, ("no_such_col",))
    # sanity: the healthy path still lists partitions
    assert io.existing_partitions(spark, path, ("year",)) == {(2024,)}


def test_ann_method_report(spark, tmp_path):
    from pyspark.sql import functions as F
    from bigdataproject_formula1_telemetry_spark import apps, io, sinks
    from tests.conftest import SF_CORRECT

    emb = io.read_table(spark, SF_CORRECT, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    rep = apps.ann_method_report(emb, queries, k=10)
    rows = {r["method"]: r for r in rep.collect()}
    assert set(rows) == {
        "exact_bruteforce", "ivf", "int8_bruteforce", "pq_adc",
        "pca_k32_bruteforce",
    }
    assert rows["exact_bruteforce"]["recall_at_k"] == 1.0
    # int8 is near-exact; the lossy methods stay above chance (10/500)
    assert rows["int8_bruteforce"]["recall_at_k"] >= 0.9
    assert rows["ivf"]["recall_at_k"] > 0.1
    assert rows["pq_adc"]["recall_at_k"] > 0.1
    # PCA halves the dim; on this ISOTROPIC corpus that costs real
    # recall (documented floor) but stays far above chance
    assert rows["pca_k32_bruteforce"]["recall_at_k"] > 0.1
    # feeds the report sink
    out = str(tmp_path / "ann.html")
    assert sinks.write_html_report(rep, out, "ann report") == 5
