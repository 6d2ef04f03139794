"""T4 — sink throttling / sampled emit.

The recorder gates Mongo inserts to one per 0.1 s wall-clock
(F1-25_Telemetry_DB_Record.py:183-191).  The declarative equivalent:
bucket event time to the emit period and keep the last row per bucket —
deterministic, replayable, and in streaming it composes with
``trigger(processingTime=...)`` for the wall-clock half."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttled_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "Timestamp",
    period_s: float = 0.1,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per (key, period bucket): 60 Hz → 10 Hz at the
    default period.  One window pass; bucket ids are derived, so the
    shuffle key is (key, bucket) — uniformly distributed at any rate."""
    bucket = F.floor(F.col(ts_col) / F.lit(float(period_s)))
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*key_cols, "__bucket").orderBy(*order)
    return (
        df.withColumn("__bucket", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__bucket", "__rn")
    )


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    aggs: dict | None = None,
):
    """Watermarked event-time tumbling window aggregation — the idiomatic
    upgrade the reference lacks (SURVEY §2.9 note).  Works on both
    streaming and batch DataFrames (batch ignores the watermark)."""
    exprs = aggs or {"n": F.count(F.lit(1))}
    agg_cols = [v.alias(k) for k, v in exprs.items()]
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(F.col(ts_col), window_duration).alias("win")).agg(
        *agg_cols
    )
