"""Window / ordered analytics (SURVEY §2.5: W1-W7, W9).

These are the reference's most important computations — pandas
``transform('min')`` / ``shift`` / ``cumsum`` / gaps-and-islands scans —
re-expressed as ``pyspark.sql.Window`` so they run distributed with
partial aggregation and never materialize a group on the driver.

Scale notes: every function partitions its window by the caller's group
keys, so work distributes by key; none of them collect.  Ordering columns
should always include a unique tiebreaker (row identity) so results are
deterministic under Spark's non-stable shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _win(partition_by: Sequence[str], order_by: Sequence[str | Column] = ()) -> WindowSpec:
    w = Window.partitionBy(*partition_by)
    if order_by:
        w = w.orderBy(*order_by)
    return w


def group_min_ratio(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_col: str = "ratio",
    best_col: str | None = None,
) -> DataFrame:
    """W1 — broadcast the per-group minimum back to every row and take the
    ratio against it (pandas ``groupby(...).transform('min')`` at
    P1-F1_Tyre_Strategy_Predict_Model.ipynb:263-267).

    A window-min with no ordering is a single partial+final aggregation —
    no sort, one shuffle on the partition keys.
    """
    w = _win(partition_by)
    best = F.min(value_col).over(w)
    out = df.withColumn(out_col, F.col(value_col) / best)
    if best_col:
        out = out.withColumn(best_col, best)
    return out


def lag_features(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    cols: Sequence[str],
    offset: int = 1,
    prefix: str = "Prev_",
) -> DataFrame:
    """W2 — per-group lag features (pandas ``groupby(...).shift(1)`` at
    P1-...ipynb:456-457)."""
    w = _win(partition_by, order_by)
    for c in cols:
        df = df.withColumn(f"{prefix}{c}", F.lag(c, offset).over(w))
    return df


def cumulative_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    out_col: str = "cum_sum",
) -> DataFrame:
    """W3 — running sum in order (pandas ``cumsum`` at P1-...ipynb:585)."""
    w = _win(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    n: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """W4 / J5 — top-N rows per group via ``row_number``.

    Replaces the reference's sort-then-``index[0]`` / ``idxmin`` pattern
    (P3-...ipynb:57-62, F1_Preprocessed_Data_test.ipynb:67-68).  Callers
    must pass a unique tiebreaker in ``order_by`` for determinism.
    """
    w = _win(partition_by, order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)


def ordered_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """W7 — consecutive-row difference (position-aligned delta arrays in
    F1-25_analyze_my_session.py:111)."""
    w = _win(partition_by, order_by)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, 1).over(w))


def segments(
    df: DataFrame,
    flag: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    seg_col: str = "seg_id",
) -> DataFrame:
    """W6 — gaps-and-islands segmentation ("slow zones",
    P3-...ipynb:147-170): assign a segment id that increments whenever the
    boolean ``flag`` changes value along the per-group order.

    Downstream: ``df.where(flag).groupBy(*partition_by, seg_col).agg(...)``
    gives per-segment extents exactly like the reference's scan loop, but
    distributed.  Two window passes over one sort — the sort is reused by
    Catalyst since both windows share partitioning and ordering.
    """
    w = _win(partition_by, order_by)
    flag_i = flag.cast("int")
    changed = (
        F.when(F.lag(flag_i, 1).over(w).isNull(), F.lit(1))
        .when(F.lag(flag_i, 1).over(w) != flag_i, F.lit(1))
        .otherwise(F.lit(0))
    )
    df = df.withColumn("__flag", flag_i).withColumn("__chg", changed)
    w2 = _win(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(seg_col, F.sum("__chg").over(w2)).drop("__chg")


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_by: Sequence[str | Column] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Session assignment: a new session starts when the gap to the previous
    event exceeds ``gap_seconds``.  Batch analog of the streaming session
    window; gaps-and-islands on the time axis."""
    ob = list(order_by) if order_by else [ts_col]
    w = _win(partition_by, ob)
    prev_ts = F.lag(ts_col, 1).over(w)
    new_sess = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(
            F.col(ts_col).cast("double") - prev_ts.cast("double") > gap_seconds,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    df = df.withColumn("__new_sess", new_sess)
    w2 = _win(partition_by, ob).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, F.sum("__new_sess").over(w2)).drop("__new_sess")


def sliding_sequences(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    feature_cols: Sequence[str],
    length: int = 20,
    out_col: str = "sequence",
    lookback_only: bool = False,
) -> DataFrame:
    """W5 — fixed-length sliding windows of feature vectors (the reference's
    20-step × 5-feature LSTM windows, train_by_circuit.py:164-167).

    ``collect_list`` over a bounded rows frame keeps at most ``length``
    arrays per row — memory is O(length × features) per row, independent of
    group size, so this scales to arbitrarily long laps.  Rows with fewer
    than ``length`` predecessors are dropped (parity with ``range(20, n)``).

    ``lookback_only=True`` excludes the current row (frame [-length, -1]) —
    the supervised form where the current row's value is the label
    (``X = scaled[i-20:i]; y = scaled[i]``).
    """
    frame = (-length, -1) if lookback_only else (-(length - 1), 0)
    w = _win(partition_by, order_by).rowsBetween(*frame)
    feat = F.array(*[F.col(c).cast("double") for c in feature_cols])
    out = df.withColumn(out_col, F.collect_list(feat).over(w))
    return out.where(F.size(out_col) == length)
