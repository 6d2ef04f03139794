"""Relational recipes (SURVEY §2.2-2.4, §2.6-2.7).

Almost everything here is a thin, named composition of built-in DataFrame
ops — the value is the declared, oracle-tested semantics, plus the scale
decisions (broadcast hints, window-instead-of-self-join) baked in once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import windows as W


def dedup_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """P9 — deterministic dedup: keep the first row per key under an explicit
    order (vs pandas ``drop_duplicates`` whose keeper is positional,
    F1_Data_PreProcessing.ipynb:70).  ``dropDuplicates`` keeps an arbitrary
    row under shuffle; the explicit ``row_number`` makes the keeper stable
    and oracle-checkable."""
    return W.top_n_per_group(df, keys, order_by, n=1)


def pct_of_group_min_filter(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    pct: float = 1.07,
    lower_bound: float | None = None,
) -> DataFrame:
    """P7 — the 107%-rule filter: keep rows with
    ``value <= pct * min(value) over group`` (and optionally ``value >
    lower_bound``), F1_Data_PreProcessing.ipynb:313-326.

    The reference loops over pandas groups; here it's one window-min (single
    shuffle, partial agg) + a filter — no correlated subquery, no collect.
    """
    grp_min = F.min(value_col).over(Window.partitionBy(*partition_by))
    cond = F.col(value_col) <= F.lit(pct) * F.col("__grp_min")
    if lower_bound is not None:
        cond = cond & (F.col(value_col) > F.lit(lower_bound))
    return df.withColumn("__grp_min", grp_min).where(cond).drop("__grp_min")


def group_size_filter(
    df: DataFrame,
    partition_by: Sequence[str],
    min_count: int | None = None,
    extent_col: str | None = None,
    min_extent: float | None = None,
) -> DataFrame:
    """P8 — drop whole groups that are too small or too short
    (``len(group) < 10 or max(Distance) < 2000``,
    F1_Data_PreProcessing.ipynb:71).  Window aggregates avoid the
    agg + semi-join round trip (one shuffle instead of two)."""
    w = Window.partitionBy(*partition_by)
    out = df
    if min_count is not None:
        out = out.withColumn("__cnt", F.count(F.lit(1)).over(w)).where(
            F.col("__cnt") >= min_count
        ).drop("__cnt")
    if extent_col is not None and min_extent is not None:
        out = out.withColumn("__ext", F.max(extent_col).over(w)).where(
            F.col("__ext") >= min_extent
        ).drop("__ext")
    return out


def left_join_audit(
    expected: DataFrame,
    actual: DataFrame,
    keys: Sequence[str],
    fill_zero_cols: Sequence[str],
) -> DataFrame:
    """J1 — planned-vs-collected reconciliation: left join the expectation
    dim to per-key aggregates, NaN→0 for missing keys
    (F1_Data_Test.ipynb:174-178).  The dim side is broadcast."""
    joined = F.broadcast(expected).join(actual, list(keys), "left")
    return joined.na.fill(0, subset=list(fill_zero_cols))


def aligned_diff(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    value_col: str,
    out_col: str = "diff",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """J2/W7 — align two entity streams on a key and diff their values
    (two drivers' per-lap times, P1-...ipynb:605-616)."""
    lcol, rcol = value_col + suffixes[0], value_col + suffixes[1]
    l = left.select(*on, F.col(value_col).alias(lcol))
    r = right.select(*on, F.col(value_col).alias(rcol))
    return l.join(r, list(on), "inner").withColumn(out_col, F.col(lcol) - F.col(rcol))


def custom_order(col: Column, ordering: Sequence[str], default_rank: int | None = None) -> Column:
    """O4 — categorical sort order (``pd.Categorical`` with explicit
    categories, F1_Data_Interactive_Analysis.ipynb:66-68) as a rank
    expression usable in ``orderBy`` or as a projected column."""
    expr = F.lit(default_rank if default_rank is not None else len(ordering) + 1)
    for rank, val in reversed(list(enumerate(ordering, start=1))):
        expr = F.when(col == val, F.lit(rank)).otherwise(expr)
    return expr
