"""S14 decoder tests: pack → decode roundtrip, player-car indexing,
per-wheel arrays, demux, and garbage resilience."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import schemas
from bigdataproject_formula1_telemetry_spark.sources import telemetry as tel


def make_raw(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    cars = [{"speed": 100 + i, "throttle": 0.5, "brake": 0.25, "gear": 3,
             "rpm": 9000 + i, "drs": 1,
             "brake_temps": [400 + i, 401, 402, 403],
             "tyre_pressures": [21.5, 21.6, 21.7, 21.8]} for i in range(tel.N_CARS)]
    laps = [{"last_lap_time_ms": 92000, "current_lap_time_ms": 15000 + i,
             "lap_distance": 1234.5 + i, "total_distance": 9876.5, "lap_num": 7}
            for i in range(tel.N_CARS)]
    rows = [
        (t0, tel.encode_telemetry_packet(4, cars)),
        (t0 + dt.timedelta(milliseconds=16), tel.encode_telemetry_packet(4, cars)),
        (t0 + dt.timedelta(milliseconds=500), tel.encode_lap_packet(4, laps)),
        (t0 + dt.timedelta(milliseconds=600), b"\x00\x01"),        # truncated
        (t0 + dt.timedelta(milliseconds=700), b"\xe9\x07\x09\x00" + b"x" * 50),  # unknown id
    ]
    return spark.createDataFrame(rows, schema=schemas.LIVE_PACKET_RAW)


def test_decode_roundtrip(spark):
    decoded = tel.decode_packets(make_raw(spark)).toPandas()
    # garbage rows dropped
    assert len(decoded) == 3
    t = decoded[decoded["packet_id"] == tel.PACKET_ID_TELEMETRY]
    assert len(t) == 2
    # player car 4 selected out of the 22-car array
    assert (t["Speed"] == 104.0).all()
    assert (t["RPM"] == 9004.0).all()
    # 0-1 floats scaled to percent like the recorder
    assert (t["Throttle"] == 50.0).all()
    assert (t["Brake"] == 25.0).all()
    assert list(t["BrakeTemps"].iloc[0]) == [404, 401, 402, 403]
    assert list(t["TyrePressures"].iloc[0]) == pytest.approx([21.5, 21.6, 21.7, 21.8], abs=1e-4)
    l = decoded[decoded["packet_id"] == tel.PACKET_ID_LAP]
    assert len(l) == 1
    assert l["LapNumber"].iloc[0] == 7
    assert l["CurrentLapTimeMs"].iloc[0] == 15004
    assert l["LapDistance"].iloc[0] == pytest.approx(1238.5, abs=1e-3)


def test_demux(spark):
    decoded = tel.decode_packets(make_raw(spark))
    t, l = tel.demux(decoded)
    assert t.count() == 2 and l.count() == 1
    assert "LapNumber" in l.columns and "Speed" in t.columns


def test_decode_streaming(spark, tmp_path):
    raw = make_raw(spark)
    src = str(tmp_path / "raw")
    raw.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(schemas.LIVE_PACKET_RAW).parquet(src)
    q = (
        tel.decode_packets(stream)
        .writeStream.format("memory")
        .queryName("decoded_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM decoded_stream").toPandas()
    assert len(got) == 3


def test_q41_literal_oracle_matches_recomputed_decode():
    """The q41 oracle is a hand-maintained literal constant; any edit to
    the encoders (telemetry.py:encode_telemetry_packet/encode_lap_packet)
    silently invalidates it until the driver run fails.  Recompute the
    expected summary from the *decode path* (pure Python, no Spark) over
    the exact corpus q41 builds, evaluate the registered literal SQL in
    DuckDB, and compare — an encoder/decoder edit now fails fast here."""
    import duckdb

    from bigdataproject_formula1_telemetry_spark.plans.queries import ORACLES

    # the same corpus q41_decode_packets constructs
    payloads: list[bytes] = []
    for i in range(60):
        cars = [{"speed": 100 + i + c, "rpm": 9000 + c} for c in range(tel.N_CARS)]
        payloads.append(tel.encode_telemetry_packet(4, cars))
        if i % 30 == 0:
            laps = [{"lap_num": 1 + i // 30, "lap_distance": 100.0 * i}] * tel.N_CARS
            payloads.append(tel.encode_lap_packet(4, laps))
    payloads.append(b"\x00\x01")  # truncated garbage must be skipped

    groups: dict[int, dict] = {}
    for p in payloads:
        d = tel._decode_payload(p)
        if d is None:
            continue
        g = groups.setdefault(d["packet_id"], {"n": 0, "speeds": [], "laps": []})
        g["n"] += 1
        if d.get("Speed") is not None:
            g["speeds"].append(d["Speed"])
        if d.get("LapNumber") is not None:
            g["laps"].append(d["LapNumber"])

    recomputed = sorted(
        (
            pid,
            g["n"],
            round(sum(g["speeds"]) / len(g["speeds"]), 6) if g["speeds"] else None,
            max(g["laps"]) if g["laps"] else None,
        )
        for pid, g in groups.items()
    )
    oracle = [
        tuple(r)
        for r in duckdb.sql(ORACLES["q41_decode_packets"]).fetchall()
    ]
    assert recomputed == oracle, (recomputed, oracle)
