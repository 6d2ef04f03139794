"""T6 — real-time model scoring (the recorder's "AI coaching" placeholder,
F1-25_Telemetry_DB_Record.py:194-195, made real).

``foreachBatch`` applies the same broadcast-join + JVM dot-product
inference used in batch (ml.predict) to every micro-batch and hands the
scored frame to a sink callback — so batch and streaming scoring share
one code path and one model artifact table."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from bigdataproject_formula1_telemetry_spark import ml


def score_stream(
    stream: DataFrame,
    models: DataFrame,
    feature_cols: Sequence[str],
    sink: Callable[[DataFrame, int], None],
    group_cols: Sequence[str] | None = None,
):
    """Returns a started-ready writeStream: every micro-batch is scored
    and passed to ``sink(scored_df, batch_id)``.  ``models`` is a static
    (small) artifact table — broadcast per batch."""
    feature_cols = list(feature_cols)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if group_cols:
            scored = ml.predict(batch_df, models, list(group_cols), feature_cols)
        else:
            scored = ml.predict_global(batch_df, models, feature_cols)
        sink(scored, batch_id)

    return stream.writeStream.foreachBatch(process)
