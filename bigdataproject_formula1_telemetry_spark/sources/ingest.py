"""S1/S2 — external ingest feeder (FastF1 → bronze).

The reference's collector (F1_Data_Collect.ipynb:79-173) is a driver-side
network job: per year it scans the event schedule, skips testing events
and already-collected rounds, loads each session via the FastF1 HTTP API,
and appends per-lap telemetry frames to the lake.

The network dependency (fastf1) is not in this runtime, so the API client
is gated behind an import-try; everything around it — schedule filtering,
incremental skip planning, frame→bronze normalization, idempotent
partition writes — is real engine code, exercised in tests with synthetic
schedules/frames.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io, schemas
from bigdataproject_formula1_telemetry_spark.plans import incremental

try:  # pragma: no cover - network client not present in this runtime
    import fastf1  # noqa: F401

    HAS_FASTF1 = True
except Exception:  # pragma: no cover
    HAS_FASTF1 = False


def filter_schedule(schedule: DataFrame) -> DataFrame:
    """S2 — drop testing events (``EventFormat != 'testing'``,
    F1_Data_Collect.ipynb:85-86)."""
    return schedule.where(F.col("EventFormat") != "testing")


def normalize_frames(spark: SparkSession, frames: Iterable[pd.DataFrame]) -> DataFrame:
    """Per-lap pandas frames (what ``lap.get_car_data().add_distance()``
    yields) → one bronze DataFrame with the declared schema; missing
    channels become NULL (the reference's Compound/TyreLife absence
    handling, F1_Data_PreProcessing.ipynb:97-99)."""
    cols = [f.name for f in schemas.TELEMETRY_RAW.fields]
    normed = []
    for pdf in frames:
        pdf = pdf.copy()
        for c in cols:
            if c not in pdf.columns:
                pdf[c] = None
        normed.append(pdf[cols])
    all_pdf = pd.concat(normed, ignore_index=True) if normed else pd.DataFrame(columns=cols)
    return spark.createDataFrame(all_pdf, schema=schemas.TELEMETRY_RAW)


def ingest_rounds(
    spark: SparkSession,
    bronze_root: str,
    wanted: list[tuple[int, int]],
    fetch_round: Callable[[int, int], Iterable[pd.DataFrame]],
    min_rows: int | None = 10_000,
) -> int:
    """S1+S5 — incremental, idempotent ingest: plan missing/undersized
    (year, round) partitions, fetch each via ``fetch_round`` (the FastF1
    call — or any feeder), and dynamic-overwrite exactly those
    partitions.  Returns the number of refreshed rounds."""
    todo = incremental.plan_refresh(
        spark, bronze_root, ["Year", "Round"], wanted, min_rows=min_rows
    )
    if not todo:
        return 0

    def build(batch: list[tuple]) -> DataFrame:
        dfs = [
            normalize_frames(spark, fetch_round(y, r)).withColumn(
                "Year", F.lit(int(y)).cast("long")
            ).withColumn("Round", F.lit(int(r)).cast("long"))
            for (y, r) in batch
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    return incremental.refresh_partitions(build, todo, bronze_root, ["Year", "Round"])
