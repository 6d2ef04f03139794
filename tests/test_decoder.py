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
