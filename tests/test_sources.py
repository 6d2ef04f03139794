"""Source tests: live UDP ingestion end-to-end (send real datagrams →
streaming decode), replay stream, incremental partition planner."""

from __future__ import annotations

import datetime as dt
import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.plans import incremental
from bigdataproject_formula1_telemetry_spark.sources import telemetry as tel
from bigdataproject_formula1_telemetry_spark.sources import udp as udpsrc

UDP_PORT = 29777


@pytest.mark.skipif(not udpsrc.HAS_DATASOURCE_API, reason="needs pyspark>=4")
def test_udp_source_live(spark):
    spark.dataSource.register(udpsrc.UdpDataSource)
    cars = [{"speed": 200 + i} for i in range(tel.N_CARS)]
    payloads = [tel.encode_telemetry_packet(3, cars) for _ in range(25)]

    stream = (
        spark.readStream.format("udp")
        .option("port", str(UDP_PORT))
        .option("host", "127.0.0.1")
        .load()
    )
    decoded = tel.decode_packets(
        stream.withColumn("arrival_ts", F.timestamp_seconds("arrival_ts"))
    )
    q = (
        decoded.writeStream.format("memory")
        .queryName("udp_live")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    stop = threading.Event()

    def send():
        # the reader binds lazily in its first micro-batch (timing varies
        # under load) — keep producing like a real 60 Hz game until the
        # stream has observably consumed something
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not stop.is_set():
            for p in payloads:
                if stop.is_set():
                    break
                s.sendto(p, ("127.0.0.1", UDP_PORT))
                time.sleep(0.004)
        s.close()

    t = threading.Thread(target=send, daemon=True)
    t.start()
    deadline = time.time() + 60
    n = 0
    try:
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM udp_live").collect()[0][0]
            if n >= 1:
                break
            time.sleep(0.5)
    finally:
        stop.set()
        t.join(timeout=5)
        q.stop()
    assert n >= 1, "no datagrams made it through the UDP source"
    row = spark.sql(
        "SELECT Speed, packet_id, player_car_index FROM udp_live LIMIT 1"
    ).collect()[0]
    assert row["Speed"] == 203.0  # player car 3
    assert row["packet_id"] == tel.PACKET_ID_TELEMETRY


def test_replay_stream(spark, tmp_path):
    from bigdataproject_formula1_telemetry_spark import schemas

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (t0 + dt.timedelta(milliseconds=16 * i),
         tel.encode_telemetry_packet(0, [{"speed": 100 + i}]))
        for i in range(50)
    ]
    log = str(tmp_path / "log")
    spark.createDataFrame(rows, schemas.LIVE_PACKET_RAW).write.parquet(log)
    q = (
        tel.decode_packets(udpsrc.replay_stream(spark, log))
        .writeStream.format("memory")
        .queryName("replayed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT count(*) AS n, max(Speed) AS mx FROM replayed").collect()[0]
    assert got["n"] == 50 and got["mx"] == 149.0


def test_incremental_planner(spark, tmp_path):
    root = str(tmp_path / "inc")
    wanted = [(2023, 1), (2023, 2), (2024, 1)]

    def build(todo):
        rows = [(y, r, i) for (y, r) in todo for i in range(100)]
        return spark.createDataFrame(rows, "Year long, Round long, v long")

    # first run: everything missing
    todo = incremental.plan_refresh(spark, root, ["Year", "Round"], wanted)
    assert todo == sorted(wanted)
    assert incremental.refresh_partitions(build, todo, root, ["Year", "Round"]) == 3

    # second run: nothing to do (idempotent skip — the count>10000 check)
    todo2 = incremental.plan_refresh(spark, root, ["Year", "Round"], wanted)
    assert todo2 == []

    # new round appears + one partition undersized → replanned
    spark.createDataFrame([(2024, 1, 0)], "Year long, Round long, v long").write.mode(
        "overwrite"
    ).partitionBy("Year", "Round").parquet(root)
    wanted3 = wanted + [(2024, 2)]
    todo3 = incremental.plan_refresh(
        spark, root, ["Year", "Round"], wanted3, min_rows=50
    )
    assert (2024, 2) in todo3 and (2024, 1) in todo3
    assert (2023, 1) not in todo3
    incremental.refresh_partitions(build, todo3, root, ["Year", "Round"])
    back = spark.read.parquet(root)
    assert back.where((F.col("Year") == 2024) & (F.col("Round") == 1)).count() == 100
    # untouched partition survived the dynamic overwrite
    assert back.where((F.col("Year") == 2023) & (F.col("Round") == 1)).count() == 100
