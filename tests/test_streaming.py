"""Streaming tests (T2-T5): latest-value merge (batch + stateful stream),
throttled sampling, last-complete-lap, watermarked windowed agg — all on
the decoded live-telemetry fixture, batch results as the oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from bigdataproject_formula1_telemetry_spark.streaming import merge, throttle
from tests import fixtures

LIVE_SCHEMA = StructType(
    [
        StructField("Timestamp", DoubleType()),
        StructField("packet", StringType()),
        StructField("Speed", DoubleType()),
        StructField("Throttle", DoubleType()),
        StructField("Brake", DoubleType()),
        StructField("Gear", DoubleType()),
        StructField("RPM", DoubleType()),
        StructField("Distance", DoubleType()),
        StructField("LapNumber", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def live_pdf():
    pdf = fixtures.gen_live_decoded()
    for c in ["Speed", "Throttle", "Brake", "Gear", "RPM", "Distance", "LapNumber"]:
        pdf[c] = pdf[c].astype(float)
    return pdf


@pytest.fixture(scope="module")
def live_df(spark, live_pdf):
    return spark.createDataFrame(live_pdf, schema=LIVE_SCHEMA).withColumn(
        "key", F.lit(0).cast("long")
    )


def pandas_merge_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reference-style dict merge: iterate in ts order, hold last lap
    values, emit telemetry rows once both sides seen."""
    out = []
    held = {"Distance": None, "LapNumber": None}
    for _, r in pdf.sort_values("Timestamp").iterrows():
        if r["packet"] == "lap":
            held = {"Distance": r["Distance"], "LapNumber": r["LapNumber"]}
        elif held["Distance"] is not None:
            m = r.to_dict()
            m.update(held)
            out.append(m)
    return pd.DataFrame(out)


def test_batch_merge_matches_reference_loop(live_df, live_pdf):
    got = (
        merge.latest_value_merge_batch(live_df, ["key"])
        .toPandas()
        .sort_values("Timestamp")
        .reset_index(drop=True)
    )
    exp = pandas_merge_oracle(live_pdf).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["Distance"], exp["Distance"])
    assert np.allclose(got["LapNumber"], exp["LapNumber"])
    assert np.allclose(got["Speed"], exp["Speed"])


def test_stream_merge_matches_batch(spark, live_df, live_pdf, tmp_path):
    src = str(tmp_path / "src")
    # two files → at least the parquet source sees multiple splits
    half = len(live_pdf) // 2
    sorted_pdf = live_pdf.sort_values("Timestamp")
    spark.createDataFrame(sorted_pdf.iloc[:half], LIVE_SCHEMA).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    spark.createDataFrame(sorted_pdf.iloc[half:], LIVE_SCHEMA).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(LIVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("key", F.lit(0).cast("long"))
    )
    q = (
        merge.latest_value_merge_stream(stream, ["key"])
        .writeStream.format("memory")
        .queryName("merged")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM merged").toPandas().sort_values("Timestamp")
    exp = (
        merge.latest_value_merge_batch(live_df, ["key"])
        .toPandas()
        .sort_values("Timestamp")
    )
    assert len(got) == len(exp)
    assert np.allclose(got["Distance"].to_numpy(), exp["Distance"].to_numpy())
    assert np.allclose(got["LapNumber"].to_numpy(), exp["LapNumber"].to_numpy())


def test_throttled_sample_rate(live_df):
    tel = live_df.where(F.col("packet") == "telemetry")
    out = throttle.throttled_sample(tel, ["key"], period_s=0.1).toPandas()
    n_in = tel.count()
    # 60 Hz → 10 Hz: at most one row per 100 ms bucket
    buckets = np.floor(out["Timestamp"].to_numpy() / 0.1)
    assert len(buckets) == len(np.unique(buckets))
    assert len(out) < n_in / 4
    # keeper is the newest row of its bucket
    pdf = tel.toPandas()
    pdf["bucket"] = np.floor(pdf["Timestamp"] / 0.1)
    exp_last = pdf.sort_values("Timestamp").groupby("bucket")["Timestamp"].max()
    got = out.sort_values("Timestamp")
    assert np.allclose(np.sort(got["Timestamp"].to_numpy()), np.sort(exp_last.to_numpy()))


def test_drop_incomplete_tail_lap(live_df):
    merged = merge.latest_value_merge_batch(live_df, ["key"])
    complete = merge.drop_incomplete_tail_lap(merged, ["key"])
    max_all = merged.agg(F.max("LapNumber")).collect()[0][0]
    max_kept = complete.agg(F.max("LapNumber")).collect()[0][0]
    assert max_kept == max_all - 1


def test_watermark_drops_late_data_append_mode(spark, tmp_path):
    """Real watermark semantics (the idiomatic upgrade over the
    reference's wall-clock throttle): in append mode a window is emitted
    once the watermark passes its end, and rows arriving after the
    watermark are dropped."""
    import pandas as pd

    src = str(tmp_path / "late")
    base = pd.Timestamp("2026-01-01 00:00:00")
    mk = lambda secs: pd.DataFrame(
        {"ts": [base + pd.Timedelta(seconds=s) for s in secs],
         "v": [1.0] * len(secs)}
    )
    schema = "ts timestamp, v double"
    import time as _time

    # batch 0: 10 on-time rows in window [0,10) + one row at t=30 that
    # advances the watermark to 25s
    spark.createDataFrame(mk(list(range(10)) + [30]), schema).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    _time.sleep(1.2)  # file-source batch order follows modification time
    # batch 1: t=50 → watermark 45; window [0,10) is emitted and evicted
    # during this batch's state cleanup
    spark.createDataFrame(mk([50]), schema).coalesce(1).write.parquet(src, mode="append")
    _time.sleep(1.2)
    # batch 2: a VERY late row at t=3 — its window was already emitted and
    # evicted, so it must be ignored (append mode never re-emits a window)
    spark.createDataFrame(mk([3, 100]), schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "5 seconds")
    )
    agg = stream.groupBy(F.window("ts", "10 seconds").alias("win")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT win.start AS s, n FROM late_windows")
        .toPandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    secs = [(r["s"].second + r["s"].minute * 60) for _, r in got.iterrows()]
    emitted = dict(zip(secs, got["n"]))
    # each window emitted at most once (append-mode contract)
    assert len(secs) == len(set(secs))
    # window [0,10): the 10 on-time rows; the t=3 row that arrived after
    # emission+eviction was ignored
    assert emitted.get(0) == 10
    assert emitted.get(30) == 1 and emitted.get(50) == 1
    # window [100,110) never finalized (watermark stopped at 95)
    assert 100 not in emitted


def test_windowed_agg_stream_matches_batch(spark, live_pdf, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(live_pdf, LIVE_SCHEMA).write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema(LIVE_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.timestamp_seconds("Timestamp"))
    )
    q = (
        throttle.windowed_agg(
            stream, "ts", "10 seconds", "30 seconds",
            aggs={"n": F.count(F.lit(1)), "avg_speed": F.avg("Speed")},
        )
        .writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT win.start AS s, n, avg_speed FROM winagg").toPandas()
    batch_src = spark.createDataFrame(live_pdf, LIVE_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("Timestamp")
    )
    exp_n = (
        batch_src.groupBy(F.window("ts", "10 seconds").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("s"), "n")
        .toPandas()
    )
    got_s = got.sort_values("s").reset_index(drop=True)
    exp_s = exp_n.sort_values("s").reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    assert (got_s["n"].to_numpy() == exp_s["n"].to_numpy()).all()


@pytest.mark.skipif(
    not merge.HAS_TWS_RUNTIME,
    reason="transformWithState needs the protobuf package at runtime",
)
def test_tws_merge_matches_batch_and_v1(spark, live_df, live_pdf, tmp_path):
    """The transformWithStateInPandas merge must equal both the batch
    window form and the applyInPandasWithState form (same oracle)."""
    src = str(tmp_path / "src_tws")
    half = len(live_pdf) // 2
    sorted_pdf = live_pdf.sort_values("Timestamp")
    spark.createDataFrame(sorted_pdf.iloc[:half], LIVE_SCHEMA).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    spark.createDataFrame(sorted_pdf.iloc[half:], LIVE_SCHEMA).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(LIVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("key", F.lit(0).cast("long"))
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            merge.latest_value_merge_stream_tws(stream, ["key"])
            .writeStream.format("memory")
            .queryName("merged_tws")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = spark.sql("SELECT * FROM merged_tws").toPandas().sort_values("Timestamp")
    exp = (
        merge.latest_value_merge_batch(live_df, ["key"])
        .toPandas()
        .sort_values("Timestamp")
    )
    assert len(got) == len(exp)
    assert np.allclose(got["Distance"].to_numpy(), exp["Distance"].to_numpy())
    assert np.allclose(got["LapNumber"].to_numpy(), exp["LapNumber"].to_numpy())
    assert np.allclose(got["Speed"].to_numpy(), exp["Speed"].to_numpy())


def test_windowed_agg_stream_matches_q24_registry_query(spark, tmp_path):
    """Bridge the registry's batch tumbling window (q24, oracle-checked)
    to the streaming surface: the same events through a file stream +
    `throttle.windowed_agg` must produce identical per-hour aggregates."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import queries as Q
    from bigdataproject_formula1_telemetry_spark.streaming.throttle import (
        windowed_agg,
    )

    ev = io.read_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_stream_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_agg(
        stream,
        "ts",
        "1 hour",
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), 4),
        },
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("q24_stream_twin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["win"]["start"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from q24_stream_twin").collect()
    }
    exp = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in Q.QUERIES["q24_tumbling_window"](spark, SF_SMOKE).collect()
    }
    assert got == exp and len(got) > 0
