"""S13/S14 — binary telemetry packet format + vectorized decoder.

The reference parses 60 Hz UDP datagrams from the F1-25 game with ctypes
``LittleEndianStructure`` (``_pack_=1``) structs, dispatching on
``m_packet_id`` (6=car telemetry, 2=lap data) and indexing the 22-car
array by ``m_player_car_index`` (F1-25_Telemetry_DB_Record.py:38-135,
155-178).

Here the wire format is a little-endian packed layout with the same shape
(header + 22-car array of fixed-size records, including per-wheel arrays),
and decoding is a ``mapInPandas`` batch UDF around ``struct.unpack_from``
— Arrow-batched, no per-row Python round trips through the JVM.  Dispatch
on packet id is a plain ``filter``/``when`` on the decoded column
(SURVEY §2.1 S14 mapping).

Scale note: decode is stateless per row → fully parallel over partitions;
the output schema is explicit so streaming and batch paths share it.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

N_CARS = 22

#: header: packet_format u16, packet_id u8, player_car_index u8
HEADER_FMT = "<HBB"
HEADER_SIZE = struct.calcsize(HEADER_FMT)

#: per-car telemetry record (id=6): speed u16, throttle f32, steer f32,
#: brake f32, gear i8, rpm u16, drs u8, brakes_temperature u16*4,
#: tyres_pressure f32*4  (shape mirrors CarTelemetryData,
#: F1-25_Telemetry_DB_Record.py:69-82)
CAR_TEL_FMT = "<HfffbHB4H4f"
CAR_TEL_SIZE = struct.calcsize(CAR_TEL_FMT)

#: per-car lap record (id=2): last_lap_time_ms u32, current_lap_time_ms u32,
#: lap_distance f32, total_distance f32, current_lap_num u8
CAR_LAP_FMT = "<IIffB"
CAR_LAP_SIZE = struct.calcsize(CAR_LAP_FMT)

PACKET_ID_LAP = 2
PACKET_ID_TELEMETRY = 6

DECODED_SCHEMA = StructType(
    [
        StructField("arrival_ts", TimestampType()),
        StructField("packet_id", LongType()),
        StructField("player_car_index", LongType()),
        StructField("Speed", DoubleType()),
        StructField("Throttle", DoubleType()),
        StructField("Brake", DoubleType()),
        StructField("Gear", LongType()),
        StructField("RPM", DoubleType()),
        StructField("DRS", LongType()),
        StructField("BrakeTemps", ArrayType(LongType())),
        StructField("TyrePressures", ArrayType(DoubleType())),
        StructField("LastLapTimeMs", LongType()),
        StructField("CurrentLapTimeMs", LongType()),
        StructField("LapDistance", DoubleType()),
        StructField("TotalDistance", DoubleType()),
        StructField("LapNumber", LongType()),
    ]
)


# --------------------------------------------------------------------------
# Encoding (fixture/replay side)
# --------------------------------------------------------------------------

def encode_telemetry_packet(player_idx: int, cars: list[dict]) -> bytes:
    """Pack a telemetry datagram (id=6) for ``N_CARS`` cars; missing cars
    are zero-filled."""
    out = struct.pack(HEADER_FMT, 2025, PACKET_ID_TELEMETRY, player_idx)
    for i in range(N_CARS):
        c = cars[i] if i < len(cars) else {}
        out += struct.pack(
            CAR_TEL_FMT,
            int(c.get("speed", 0)),
            float(c.get("throttle", 0.0)),
            float(c.get("steer", 0.0)),
            float(c.get("brake", 0.0)),
            int(c.get("gear", 0)),
            int(c.get("rpm", 0)),
            int(c.get("drs", 0)),
            *[int(x) for x in c.get("brake_temps", [0, 0, 0, 0])],
            *[float(x) for x in c.get("tyre_pressures", [0.0, 0.0, 0.0, 0.0])],
        )
    return out


def encode_lap_packet(player_idx: int, cars: list[dict]) -> bytes:
    """Pack a lap-data datagram (id=2)."""
    out = struct.pack(HEADER_FMT, 2025, PACKET_ID_LAP, player_idx)
    for i in range(N_CARS):
        c = cars[i] if i < len(cars) else {}
        out += struct.pack(
            CAR_LAP_FMT,
            int(c.get("last_lap_time_ms", 0)),
            int(c.get("current_lap_time_ms", 0)),
            float(c.get("lap_distance", 0.0)),
            float(c.get("total_distance", 0.0)),
            int(c.get("lap_num", 0)),
        )
    return out


# --------------------------------------------------------------------------
# Decoding (engine side)
# --------------------------------------------------------------------------

def _decode_payload(payload: bytes) -> dict | None:
    """Decode one datagram to the player car's record (the recorder only
    persists the player car, F1-25_Telemetry_DB_Record.py:160-178)."""
    if payload is None or len(payload) < HEADER_SIZE:
        return None
    _fmt, packet_id, player_idx = struct.unpack_from(HEADER_FMT, payload, 0)
    rec: dict = {"packet_id": packet_id, "player_car_index": player_idx}
    if packet_id == PACKET_ID_TELEMETRY:
        off = HEADER_SIZE + player_idx * CAR_TEL_SIZE
        if len(payload) < off + CAR_TEL_SIZE:
            return None
        v = struct.unpack_from(CAR_TEL_FMT, payload, off)
        rec.update(
            {
                "Speed": float(v[0]),
                # game floats are 0-1; the recorder scales to percent
                # (F1-25_Telemetry_DB_Record.py:165-166)
                "Throttle": float(v[1]) * 100.0,
                "Brake": float(v[3]) * 100.0,
                "Gear": int(v[4]),
                "RPM": float(v[5]),
                "DRS": int(v[6]),
                "BrakeTemps": [int(x) for x in v[7:11]],
                "TyrePressures": [float(x) for x in v[11:15]],
            }
        )
    elif packet_id == PACKET_ID_LAP:
        off = HEADER_SIZE + player_idx * CAR_LAP_SIZE
        if len(payload) < off + CAR_LAP_SIZE:
            return None
        v = struct.unpack_from(CAR_LAP_FMT, payload, off)
        rec.update(
            {
                "LastLapTimeMs": int(v[0]),
                "CurrentLapTimeMs": int(v[1]),
                "LapDistance": float(v[2]),
                "TotalDistance": float(v[3]),
                "LapNumber": int(v[4]),
            }
        )
    else:
        return None
    return rec


def decode_packets(
    df: DataFrame, payload_col: str = "payload", ts_col: str = "arrival_ts"
) -> DataFrame:
    """Decode raw (arrival_ts, payload) rows into typed records.

    ``mapInPandas``: each Arrow batch is decoded in one Python call;
    unknown/truncated datagrams are dropped (the recorder's silent skip).
    Works identically on batch and streaming DataFrames.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            recs = []
            for ts, payload in zip(pdf[ts_col], pdf[payload_col]):
                rec = _decode_payload(payload)
                if rec is not None:
                    rec["arrival_ts"] = ts
                    recs.append(rec)
            out = pd.DataFrame(recs)
            for c in cols:
                if c not in out.columns:
                    out[c] = None
            # mixed packet types in one batch leave NaN in the array
            # columns (BrakeTemps/TyrePressures); Arrow needs real None there
            for c in ("BrakeTemps", "TyrePressures"):
                if len(out):
                    out[c] = out[c].where(pd.notna(out[c]), None)
            yield out[cols] if len(out) else pd.DataFrame(columns=cols)

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def demux(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """T2 — split the decoded stream by packet id into (telemetry, lap)."""
    tel = decoded.where(F.col("packet_id") == PACKET_ID_TELEMETRY).select(
        "arrival_ts",
        "Speed",
        "Throttle",
        "Brake",
        "Gear",
        "RPM",
        "DRS",
        "BrakeTemps",
        "TyrePressures",
    )
    lap = decoded.where(F.col("packet_id") == PACKET_ID_LAP).select(
        "arrival_ts",
        "LastLapTimeMs",
        "CurrentLapTimeMs",
        "LapDistance",
        "TotalDistance",
        "LapNumber",
    )
    return tel, lap
