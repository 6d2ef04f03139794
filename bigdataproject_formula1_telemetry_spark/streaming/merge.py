"""T3 — latest-value stream merge.

The reference's recorder holds the most recent telemetry packet and the
most recent lap packet in two dicts and writes a merged row only when both
are present (F1-25_Telemetry_DB_Record.py:146-191).  Two re-expressions:

- ``latest_value_merge_batch``: union + ordered window with
  ``last(..., ignorenulls=True)`` — the replayable/backfill form; one
  shuffle + sort per key, linear in input.
- ``latest_value_merge_stream``: ``applyInPandasWithState`` — true
  streaming form with the held-value dict as typed group state, so the
  merge survives micro-batch boundaries exactly like the recorder's loop
  survives poll iterations.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

try:  # pragma: no cover - container-dependent
    # transformWithStateInPandas' Python state server speaks protobuf to
    # the JVM; without the protobuf package the streaming worker crashes
    # at runtime even though the API imports fine.
    from google.protobuf import descriptor  # noqa: F401

    HAS_TWS_RUNTIME = True
except ImportError:  # pragma: no cover
    HAS_TWS_RUNTIME = False

#: columns held from the lap-packet side (2 Hz) onto telemetry rows (60 Hz)
LAP_STATE_COLS = ["Distance", "LapNumber"]
TEL_COLS = ["Speed", "Throttle", "Brake", "Gear", "RPM"]

MERGED_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("Timestamp", DoubleType()),
        StructField("Speed", DoubleType()),
        StructField("Throttle", DoubleType()),
        StructField("Brake", DoubleType()),
        StructField("Gear", DoubleType()),
        StructField("RPM", DoubleType()),
        StructField("Distance", DoubleType()),
        StructField("LapNumber", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("Distance", DoubleType()),
        StructField("LapNumber", DoubleType()),
    ]
)


def latest_value_merge_batch(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "Timestamp",
    packet_col: str = "packet",
) -> DataFrame:
    """Batch/backfill merge: telemetry rows enriched with the latest
    preceding lap values; rows before the first lap packet are dropped
    ("emit only when both present")."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in LAP_STATE_COLS:
        held = F.when(F.col(packet_col) == "lap", F.col(c))
        out = out.withColumn(c, F.last(held, ignorenulls=True).over(w))
    out = out.where(F.col(packet_col) == "telemetry")
    return out.na.drop(subset=list(LAP_STATE_COLS))


def latest_value_merge_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "Timestamp",
    packet_col: str = "packet",
) -> DataFrame:
    """Streaming merge with explicit group state (the recorder's
    ``curr_lap`` dict).  Per micro-batch and key: sort by ts, forward-fill
    lap values seeded from state, emit completed telemetry rows, store the
    newest lap values back into state."""

    def merge_fn(key, pdfs, state: GroupState):
        held = dict(zip(LAP_STATE_COLS, state.get)) if state.exists else {
            c: None for c in LAP_STATE_COLS
        }
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            lap_vals = pdf[LAP_STATE_COLS].copy()
            is_tel = pdf[packet_col].to_numpy() == "telemetry"
            lap_vals[is_tel] = None
            for c in LAP_STATE_COLS:
                filled = lap_vals[c].ffill()
                if held[c] is not None:
                    filled = filled.fillna(held[c])
                pdf[c] = filled
                if filled.notna().any():
                    held[c] = filled.iloc[-1]
            out = pdf[is_tel].dropna(subset=LAP_STATE_COLS)
            if len(out):
                out = out.assign(key=key[0])
                yield out[[f.name for f in MERGED_SCHEMA.fields]]
        if all(v is not None for v in held.values()):
            state.update(tuple(float(held[c]) for c in LAP_STATE_COLS))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        merge_fn,
        outputStructType=MERGED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_value_merge_stream_tws(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "Timestamp",
    packet_col: str = "packet",
) -> DataFrame:
    """T3 on ``transformWithStateInPandas`` (Spark 4's arbitrary-state v2
    API, the forward-compatible successor of ``applyInPandasWithState``):
    identical held-value semantics, with the recorder dict as a named
    ``ValueState`` on a ``StatefulProcessor``.

    Requires the RocksDB state store provider::

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    (transformWithState queries reject the default HDFS-backed provider.)

    Runtime dependency: the ``protobuf`` package (``HAS_TWS_RUNTIME``) —
    PySpark's state server uses it for Python↔JVM state transport.  This
    container lacks it, so the equivalence test is skip-marked; the
    ``applyInPandasWithState`` form is the always-available path.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    merged_cols = [f.name for f in MERGED_SCHEMA.fields]

    class _LatestValueProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._held = handle.getValueState("held", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            if self._held.exists():
                held = dict(zip(LAP_STATE_COLS, tuple(self._held.get())))
            else:
                held = {c: None for c in LAP_STATE_COLS}
            for pdf in rows:
                pdf = pdf.sort_values(ts_col)
                lap_vals = pdf[LAP_STATE_COLS].copy()
                is_tel = pdf[packet_col].to_numpy() == "telemetry"
                lap_vals[is_tel] = None
                for c in LAP_STATE_COLS:
                    filled = lap_vals[c].ffill()
                    if held[c] is not None:
                        filled = filled.fillna(held[c])
                    pdf[c] = filled
                    if filled.notna().any():
                        held[c] = filled.iloc[-1]
                out = pdf[is_tel].dropna(subset=LAP_STATE_COLS)
                if len(out):
                    out = out.assign(key=key[0])
                    yield out[merged_cols]
            if all(v is not None for v in held.values()):
                self._held.update(tuple(float(held[c]) for c in LAP_STATE_COLS))

        def close(self) -> None:
            pass

    return stream.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_LatestValueProcessor(),
        outputStructType=MERGED_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def drop_incomplete_tail_lap(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """T5 — "last complete lap": drop each key's maximum LapNumber group
    (the in-progress lap), mirroring the analyzer's ``laps[-2]`` pick
    (F1-25_analyze_my_session.py:44-50)."""
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__max_lap", F.max("LapNumber").over(w))
        .where(F.col("LapNumber") < F.col("__max_lap"))
        .drop("__max_lap")
    )
