"""As-of (latest-value) joins — SURVEY §2.3 J3 / §2.9 T3, batch form.

The reference's recorder holds the latest telemetry packet and the latest
lap packet in two dicts and emits merged rows (F1-25_Telemetry_DB_Record.py:
146-191).  The batch re-expression: union both sides into one ordered
stream per key and carry the right side's last non-null value forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Why union+window instead of a range/cross join: one shuffle + one sort per
key, linear in input size — the classic scalable as-of plan (a range join
would be O(n·m) per key without interval binning).  Spark has no native
as-of join; this is the composition-of-builtins path (instruction (a) for
custom operators).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the most recent ``value_cols`` from
    ``right`` with ``right.ts <= left.ts`` (``<`` when ``strict``), per
    ``on`` key group.

    Left rows with no prior right row get NULLs (left-outer as-of).
    Output: all left columns + the as-of ``value_cols``.
    """
    on = list(on)
    lcols = left.columns
    # Tag sides; right rows sort before left rows at equal ts so a same-ts
    # right value is visible to the left row (non-strict semantics).
    side_rank_right = 0 if not strict else 1
    side_rank_left = 1 if not strict else 0

    l = left.withColumn("__side", F.lit(side_rank_left))
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(side_rank_right).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *(
            [F.col(tiebreak_col).alias("__tb")]
            if tiebreak_col is not None
            else []
        ),
    )
    if tiebreak_col is not None:
        # the tiebreak disambiguates equal-ts RIGHT rows (last one wins);
        # left rows carry NULL — they never compete with each other here
        l = l.withColumn("__tb", F.lit(None).cast(r.schema["__tb"].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))

    order = [F.col(ts_col), F.col("__side")]
    if tiebreak_col is not None:
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"__last_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    out = unioned.where(F.col("__side") == side_rank_left)
    return out.select(
        *lcols, *[F.col(f"__last_{c}").alias(f"asof_{c}") for c in value_cols]
    )
